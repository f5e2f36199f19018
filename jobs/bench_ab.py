"""Same-window A/B headline bench (VERDICT r04 #6).

A raw BENCH_rN.json number is uninterpretable on a shared host whose
capacity drifts 1.2-1.3x across hours (four same-code control re-runs
documented in BENCH/scaling_attempts.json; the r04 driver bench read
1.35x slower while an adjacent-window A/B measured 0.96x). The honest
headline is therefore PAIRED: run HEAD and a baseline commit alternately
in ONE window and report per-query paired ratios next to the raw number.

    python jobs/bench_ab.py --baseline <commit> [--rounds 3] \
        [--sf /root/testdata/sf0.1] [--cpus 32] [--tag r05]

Writes, from the SAME run:
  BENCH/headline.json          — HEAD's canonical refresh (median across
                                 rounds, bench.py schema + commit stamp)
  BENCH/ab_headline_<tag>.json — paired per-query + total ratios,
                                 HEAD vs baseline, with all raw rounds

Protocol: the baseline checks out into a git worktree (its OWN source
tree — the shipped-zip discipline of jobs/build_index.py); each round
runs baseline and HEAD once each as fresh subprocesses (fresh JVM, so
JIT warmup is inside bench.py's excluded warmup section), alternating
which goes first round to round so a monotone host drift cancels in the
pairing. Ratios use the per-round pairing; the reported number is the
median across rounds.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(tree: str, sf: str, cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run([sys.executable, os.path.join(tree, "bench.py")],
                         capture_output=True, text=True, env=env,
                         cwd=tree, timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(f"bench failed in {tree}: {out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", required=True,
                    help="commit to pair against (e.g. the previous round's HEAD)")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--tag", default="r05")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH"))
    args = ap.parse_args()

    head = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
                          capture_output=True, text=True).stdout.strip()
    base = subprocess.run(["git", "rev-parse", "--short", args.baseline],
                          cwd=REPO, capture_output=True, text=True).stdout.strip()

    wt = tempfile.mkdtemp(prefix=f"ab-{base}-")
    subprocess.run(["git", "worktree", "add", "--detach", wt, args.baseline],
                   cwd=REPO, check=True, capture_output=True)
    try:
        head_runs, base_runs = [], []
        for i in range(args.rounds):
            order = [("head", REPO), ("base", wt)] if i % 2 == 0 \
                else [("base", wt), ("head", REPO)]
            for which, tree in order:
                r = _run_bench(tree, args.sf, args.cpus)
                (head_runs if which == "head" else base_runs).append(r)
                print(json.dumps({"round": i, "which": which,
                                  "total": r["value"]}), flush=True)
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt], cwd=REPO,
                       capture_output=True)

    # paired ratios: per round, per query (queries present in both)
    shared = sorted(set(head_runs[0]["queries"]) & set(base_runs[0]["queries"]))
    per_query = {
        q: round(statistics.median(
            h["queries"][q] / b["queries"][q]
            for h, b in zip(head_runs, base_runs)), 3)
        for q in shared
    }
    total_ratio = round(statistics.median(
        h["value"] / b["value"] for h, b in zip(head_runs, base_runs)), 3)

    canonical = dict(min(head_runs, key=lambda r: abs(
        r["value"] - statistics.median(x["value"] for x in head_runs))))
    canonical["commit"] = head
    with open(os.path.join(args.out, "headline.json"), "w") as f:
        json.dump(canonical, f)
    ab = {
        "head_commit": head,
        "base_commit": base,
        "rounds": args.rounds,
        "sf": args.sf,
        "cpus": args.cpus,
        "total_ratio_head_over_base_median": total_ratio,
        "per_query_ratio_median": per_query,
        "head_totals": [r["value"] for r in head_runs],
        "base_totals": [r["value"] for r in base_runs],
        "head_raw": head_runs,
        "base_raw": base_runs,
    }
    with open(os.path.join(args.out, f"ab_headline_{args.tag}.json"), "w") as f:
        json.dump(ab, f, indent=1)
    print(json.dumps({"total_ratio": total_ratio,
                      "headline": canonical["value"],
                      "out": f"ab_headline_{args.tag}.json"}))


if __name__ == "__main__":
    main()
