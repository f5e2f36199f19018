"""Measure the serving daemon under a mixed request burst.

Drives jobs/serve.py as a REAL subprocess (its own JVM — the deployment
shape) with the same deterministic 100-request mix that produced
BENCH/serve_loop.json, over either daemon transport:

  python jobs/bench_serve.py --transport socket   # AF_UNIX socket mode
  python jobs/bench_serve.py --transport loop     # stdin/stdout mode

Builds a sf0.01 at-rest index in a temp dir (tmpfs when available), starts
the daemon warm-session process, pipelines the burst through ONE client
connection (socket) or the stdin pipe (loop), and writes the daemon's own
--report latency artifact plus mix/config annotations to
BENCH/serve_<transport>.json. Client-side wall clock is recorded next to
the daemon-side numbers so transport overhead (socket framing vs pipe) is
visible rather than assumed.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SERVE_SF", "/root/testdata/sf0.01")


def request_mix() -> list[dict]:
    """The BENCH/serve_loop.json mix: 25x slot+snippets re-paged through
    continuation (5 page shapes), 25x bm25 top-10 (4 texts), 25x
    collocations, 25x top_terms — deterministic, no RNG."""
    reqs: list[dict] = []
    pages = [(0, 5), (5, 10), (10, 15), (0, 3), (3, 6)]
    for i in range(25):
        skip, until = pages[i % len(pages)]
        reqs.append({"slots": [{"word": "fast"}, {"pattern": "h*"}],
                     "dists": [[1, 4]], "skip": skip, "until": until,
                     "width": 2})
    texts = ["fast hash join", "sorted merge", "stream filter scan",
             "index block cache"]
    for i in range(25):
        reqs.append({"bm25": texts[i % len(texts)], "k": 10})
    for _ in range(25):
        reqs.append({"collocations": "fast", "window": 3, "min_count": 2,
                     "k": 10})
    for _ in range(25):
        reqs.append({"top_terms": 50, "pattern": "s*"})
    return reqs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--transport", choices=("socket", "loop"),
                    default="socket")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out_path = args.out or os.path.join(
        REPO, "BENCH", f"serve_{args.transport}.json")

    if os.path.isdir("/dev/shm"):
        tempfile.tempdir = "/dev/shm"
    work = tempfile.mkdtemp(prefix="fm_serve_")
    idx_path = os.path.join(work, "idx")

    # build the at-rest index once, in a separate process so the daemon
    # under test pays its own full cold start (the honest shape)
    build = subprocess.run(
        [sys.executable, "-c", f"""
import sys; sys.path.insert(0, {REPO!r})
from fastmorph_spark.session import get_spark
from fastmorph_spark.sources import read_documents
from fastmorph_spark.index.io import write_index
spark = get_spark(master="local[8]", shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")
write_index(spark, read_documents(spark, {SF!r}), {idx_path!r},
            doc_shard_size=1000, block_size=64)
print("built")
"""],
        capture_output=True, text=True, cwd=REPO, timeout=1800,
    )
    assert build.returncode == 0, build.stderr[-2000:]

    report = os.path.join(work, "report.json")
    reqs = request_mix()
    cmd = [sys.executable, os.path.join(REPO, "jobs", "serve.py"),
           "--index", idx_path, "--docs", f"docs:{SF}", "--report", report]
    env = {**os.environ, "SPARK_GRAFT_MASTER": "local[8]"}

    t_client = time.perf_counter()
    if args.transport == "socket":
        sock_path = os.path.join(work, "fm.sock")
        proc = subprocess.Popen(cmd + ["--socket", sock_path],
                                stdout=subprocess.DEVNULL,
                                stderr=subprocess.PIPE, text=True,
                                cwd=REPO, env=env)
        try:
            deadline = time.time() + 600
            while not os.path.exists(sock_path):
                assert proc.poll() is None, proc.stderr.read()[-2000:]
                assert time.time() < deadline, "daemon never bound"
                time.sleep(0.2)
            t_client = time.perf_counter()  # exclude daemon cold start
            c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            c.connect(sock_path)
            f = c.makefile("rwb")
            n_err = 0
            for r in reqs:
                f.write((json.dumps(r) + "\n").encode())
                f.flush()
                resp = json.loads(f.readline())
                n_err += 1 if "error" in resp else 0
            f.write(b'{"shutdown": true}\n')
            f.flush()
            assert json.loads(f.readline()) == {"ok": True}
            f.close()
            c.close()
            proc.wait(timeout=300)
        finally:
            if proc.poll() is None:
                proc.kill()
    else:
        proc = subprocess.Popen(cmd + ["--loop"], stdin=subprocess.PIPE,
                                stdout=subprocess.PIPE,
                                stderr=subprocess.DEVNULL, text=True,
                                cwd=REPO, env=env)
        n_err = 0
        for r in reqs:
            proc.stdin.write(json.dumps(r) + "\n")
            proc.stdin.flush()
            resp = json.loads(proc.stdout.readline())
            n_err += 1 if "error" in resp else 0
        proc.stdin.close()
        proc.wait(timeout=300)
    client_wall = time.perf_counter() - t_client

    with open(report) as f:
        stats = json.load(f)
    stats.update({
        "transport": args.transport,
        "client_wall_s": round(client_wall, 3),
        "protocol": (f"jobs/serve.py --{args.transport}: 100 NDJSON requests "
                     "through ONE warm SparkSession (local[8], sf0.01 at-rest "
                     "index, doc_shard=1000 block=64), one client connection, "
                     "responses flushed per request, session continuation ON"),
        "request_mix": ("25x slot+snippets (5 page shapes re-paged via "
                        "continuation), 25x bm25 top-10 (4 query texts), "
                        "25x collocations(fast,w=3), 25x top_terms(50, s*)"),
        "errors": n_err,
        "note": ("first-of-shape requests pay codegen/Arrow warmup inside "
                 "the loop (cold-included numbers); client_wall_s counts "
                 + ("from socket-ready, so daemon cold start is excluded"
                    if args.transport == "socket" else
                    "from process launch (stdin mode has no ready signal), "
                    "so daemon cold start is included")),
    })
    with open(out_path, "w") as f:
        json.dump(stats, f, indent=1)
    print(json.dumps(stats))

    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
