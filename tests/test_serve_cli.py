"""jobs/serve.py end-to-end: the spark-submit serving transport over the
request protocol [PK-high, SURVEY.md §3.1 entry point 2]. Builds a tiny
at-rest index, runs the job as a real subprocess (its own JVM — exactly
the deployment shape), and pins: one response line per request line, the
slot response equal to the in-process handle_request answer, the bm25
form served, and malformed/invalid requests answered with {"error": ...}
lines instead of a crashed server."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from fastmorph_spark.index.io import read_index, write_index
from fastmorph_spark.search.protocol import handle_request
from fastmorph_spark.sources import read_documents
from tests.conftest import SF0001

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REQUESTS = [
    {"slots": [{"word": "fast"}, {"pattern": "h*"}], "dists": [[1, 4]],
     "skip": 0, "until": 5, "width": 2},
    {"bm25": "fast hash join", "k": 5},
    {"collocations": "fast", "window": 3, "min_count": 2, "k": 5},
    "this line is not json",
    {"slots": [{"word": "fast", "case": True}], "dists": [], "until": 3},
    {"frobnicate": 1},
]


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve_cli")
    idx_path = str(tmp / "idx")
    docs = read_documents(spark, SF0001)
    write_index(spark, docs, idx_path, doc_shard_size=200, block_size=64)
    req_path, out_path = str(tmp / "reqs.jsonl"), str(tmp / "resp.jsonl")
    with open(req_path, "w") as f:
        for r in REQUESTS:
            f.write((r if isinstance(r, str) else json.dumps(r)) + "\n")
        f.write("\n")  # blank lines are skipped, not answered
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "serve.py"),
         "--index", idx_path, "--docs", f"docs:{SF0001}",
         "--requests", req_path, "--out", out_path],
        capture_output=True, text=True, timeout=420, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    with open(out_path) as f:
        responses = [json.loads(line) for line in f]
    return idx_path, summary, responses


def test_one_response_per_request(served):
    _, summary, responses = served
    assert summary["requests_answered"] == len(REQUESTS)
    assert len(responses) == len(REQUESTS)


def test_slot_response_matches_in_process(spark, served):
    idx_path, _, responses = served
    docs = read_documents(spark, SF0001)
    expected = handle_request(docs, read_index(spark, idx_path), REQUESTS[0])
    assert responses[0] == expected
    assert responses[0]["total_docs"] > 0
    assert all(m["snippet"] for r in responses[0]["results"] for m in r["matches"])


def test_bm25_response_served(served):
    _, _, responses = served
    r = responses[1]
    assert r["query"] == "fast hash join" and len(r["results"]) == 5
    scores = [m["score"] for m in r["results"]]
    assert scores == sorted(scores, reverse=True)
    assert [m["rank"] for m in r["results"]] == [1, 2, 3, 4, 5]


def test_collocations_response_served(spark, served):
    idx_path, _, responses = served
    r = responses[2]
    assert (r["target"], r["window"], r["k"]) == ("fast", 3, 5)
    expected = handle_request(read_documents(spark, SF0001),
                              read_index(spark, idx_path), REQUESTS[2])
    assert r == expected and len(r["results"]) == 5
    pmis = [m["pmi"] for m in r["results"]]
    assert pmis == sorted(pmis, reverse=True)


def test_bad_requests_get_error_lines(served):
    _, _, responses = served
    assert "not valid JSON" in responses[3]["error"]
    assert "case-preserving twin" in responses[4]["error"]  # no cs twin built
    assert "unknown request fields" in responses[5]["error"]


def test_session_cache_pages_match_stateless(spark, served, tmp_path):
    """--session-cache: paged requests of one slot shape answer
    identically to stateless serving (continuation reuses the match set;
    pins freed at exit)."""
    idx_path, _, _ = served
    pages = [
        {"slots": [{"word": "fast"}, {"pattern": "h*"}], "dists": [[1, 4]],
         "skip": 0, "until": 5, "width": 2},
        {"slots": [{"word": "fast"}, {"pattern": "h*"}], "dists": [[1, 4]],
         "skip": 5, "until": 10, "width": 2},
    ]
    req_path, out_path = str(tmp_path / "reqs.jsonl"), str(tmp_path / "resp.jsonl")
    with open(req_path, "w") as f:
        for r in pages:
            f.write(json.dumps(r) + "\n")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "serve.py"),
         "--index", idx_path, "--docs", f"docs:{SF0001}",
         "--requests", req_path, "--out", out_path, "--session-cache"],
        capture_output=True, text=True, timeout=420, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    with open(out_path) as f:
        responses = [json.loads(line) for line in f]
    docs = read_documents(spark, SF0001)
    idx = read_index(spark, idx_path)
    for resp, req in zip(responses, pages):
        assert resp == handle_request(docs, idx, req)
    assert responses[0]["total_matches"] == responses[1]["total_matches"] > 0


def test_loop_daemon_serves_sequential_requests(spark, served, tmp_path):
    """--loop (VERDICT r04 #3): ONE warm process answers requests
    INTERACTIVELY — each response line is flushed before the next request
    is even written (proved by reading it first), across request forms,
    with error lines for garbage, and a --report latency artifact at EOF."""
    idx_path, _, _ = served
    report = str(tmp_path / "loop_report.json")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "jobs", "serve.py"),
         "--index", idx_path, "--docs", f"docs:{SF0001}",
         "--loop", "--report", report],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, cwd=REPO,
    )
    try:
        def ask(req):
            proc.stdin.write((req if isinstance(req, str) else json.dumps(req)) + "\n")
            proc.stdin.flush()
            line = proc.stdout.readline()
            assert line, "daemon died before answering"
            return json.loads(line)

        r1 = ask(REQUESTS[0])                       # slot request
        assert r1["total_docs"] > 0
        r2 = ask({"bm25": "fast hash join", "k": 3})  # second form, same process
        assert [m["rank"] for m in r2["results"]] == [1, 2, 3]
        r3 = ask("garbage")                          # error answered, not a crash
        assert "not valid JSON" in r3["error"]
        # continuation: page 2 of r1's shape through the warm session
        r4 = ask({"slots": [{"word": "fast"}, {"pattern": "h*"}],
                  "dists": [[1, 4]], "skip": 5, "until": 10, "width": 2})
        assert r4["total_matches"] == r1["total_matches"]
        proc.stdin.close()
        proc.wait(timeout=120)
        assert proc.returncode == 0, proc.stderr.read()[-2000:]
    finally:
        if proc.poll() is None:
            proc.kill()
    docs = read_documents(spark, SF0001)
    idx = read_index(spark, idx_path)
    assert r1 == handle_request(docs, idx, REQUESTS[0])
    with open(report) as f:
        stats = json.load(f)
    assert stats["n"] == 4 and stats["p50_ms"] > 0 and stats["rps"] > 0


def test_socket_daemon_serves_clients(spark, served, tmp_path):
    """--socket (round 5): the reference's LITERAL transport [PK-high] —
    an AF_UNIX stream socket answering NDJSON. Pins: two SEPARATE client
    connections served by one warm daemon (second client sees the same
    process: its slot answer equals the in-process oracle computed once),
    pipelined requests within a connection, error lines for garbage, a
    client disconnecting WITHOUT shutdown not killing the daemon, clean
    {"shutdown": true} stop, a --report artifact, and the socket file
    removed on exit."""
    import socket
    import time

    idx_path, _, _ = served
    sock_path = str(tmp_path / "fm.sock")
    report = str(tmp_path / "sock_report.json")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "jobs", "serve.py"),
         "--index", idx_path, "--docs", f"docs:{SF0001}",
         "--socket", sock_path, "--report", report],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO,
    )
    try:
        deadline = time.time() + 300
        while not os.path.exists(sock_path):
            assert proc.poll() is None, proc.stderr.read()[-2000:]
            assert time.time() < deadline, "daemon never bound its socket"
            time.sleep(0.2)

        def client():
            c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            c.connect(sock_path)
            return c, c.makefile("rwb")

        def ask(f, req):
            f.write(((req if isinstance(req, str) else json.dumps(req))
                     + "\n").encode())
            f.flush()
            line = f.readline()
            assert line, "daemon died before answering"
            return json.loads(line)

        # client 1: pipeline two forms + a garbage line, then just vanish
        c1, f1 = client()
        r1 = ask(f1, REQUESTS[0])
        assert r1["total_docs"] > 0
        r2 = ask(f1, {"bm25": "fast hash join", "k": 3})
        assert [m["rank"] for m in r2["results"]] == [1, 2, 3]
        r3 = ask(f1, "garbage")
        assert "not valid JSON" in r3["error"]
        # no shutdown: the daemon must survive this. Close the makefile
        # too — the underlying fd stays open until BOTH drop it, and the
        # daemon (correctly) waits for EOF, not for socket.close()
        f1.close()
        c1.close()

        # client 2: a fresh connection hits the SAME warm process —
        # continuation re-pages client 1's persisted match set
        c2, f2 = client()
        r4 = ask(f2, {"slots": [{"word": "fast"}, {"pattern": "h*"}],
                      "dists": [[1, 4]], "skip": 5, "until": 10, "width": 2})
        assert r4["total_matches"] == r1["total_matches"]
        assert ask(f2, {"shutdown": True}) == {"ok": True}
        f2.close()
        c2.close()
        proc.wait(timeout=120)
        assert proc.returncode == 0, proc.stderr.read()[-2000:]
    finally:
        if proc.poll() is None:
            proc.kill()
    assert not os.path.exists(sock_path)
    docs = read_documents(spark, SF0001)
    idx = read_index(spark, idx_path)
    assert r1 == handle_request(docs, idx, REQUESTS[0])
    with open(report) as f:
        stats = json.load(f)
    assert stats["n"] == 4 and stats["p50_ms"] > 0 and stats["rps"] > 0
