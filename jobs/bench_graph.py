"""Dependency-graph scale evidence (round 5 graph wave).

The 40-repo registry fixture exercises correctness; this job measures
the wave's SCALING SHAPE on a larger deterministic corpus, per the
driver's two-parallelism-levels instruction: the same
import_edges -> pagerank pipeline at N and 4N local cores on the same
input, paired back-to-back rounds (the BENCH/scaling.json protocol),
reporting docs/sec at both levels + paired efficiency. The parse is a
narrow codegen'd regexp pass; the edge groupBy shuffles at repo-pair
cardinality; each PageRank round is one |edges| join + one |nodes|-row
materialization — so the job should scale near-linearly until the
host's idle-core budget bites.

Corpus (no RNG, byte-reproducible): doc i lives in repo-(i % R),
declares mod(i % R), and imports mod((i*m + o) % R) for the three
affine maps of the registry fixture, plus a filler line. R defaults to
10,000 repos so the graph (≤30k weighted edges) is non-trivial while
edges stay far below doc count — the at-scale shape.

  python jobs/bench_graph.py --out BENCH/graph_scale.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _synth_corpus(spark, n_docs: int, n_repos: int, partitions: int):
    from pyspark.sql import functions as F

    d = F.col("id")
    parts = [F.lit("# module mod"), (d % n_repos).cast("string")]
    for m, o in ((3, 1), (5, 2), (7, 4)):
        parts += [F.lit("\nimport mod"), ((d * m + o) % n_repos).cast("string")]
    parts.append(F.lit("\ndef main():\n    return 0\n"))
    return spark.range(0, n_docs, numPartitions=partitions).select(
        F.concat(F.lit("repo-"), (d % n_repos).cast("string")).alias("repo"),
        F.concat(*parts).alias("content"),
    )


def _run_level(cores: int, n_docs: int, n_repos: int, iters: int,
               stage: str) -> float:
    from fastmorph_spark.ops.graph import import_edges, pagerank
    from fastmorph_spark.session import get_spark

    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=2 * cores,
                      app_name=f"fastmorph-bench-graph-{cores}")
    spark.sparkContext.setLogLevel("ERROR")
    # range(numPartitions=4*cores) sizes the input without a repartition
    # shuffle — generation is untimed but real wall-clock
    corpus = _synth_corpus(spark, n_docs, n_repos, 4 * cores).persist()
    corpus.count()  # materialize input outside the timed window
    t0 = time.monotonic()
    if stage == "edges":
        # the corpus-bound stage: at a real 100 TB this is ~all the work
        # (the graph itself is |repos|-sized, independent of corpus)
        n = import_edges(corpus).count()
        assert n > 0
    else:
        pr = pagerank(import_edges(corpus), iters=iters)
        n = pr.count()
        assert n == n_repos, n
    wall = time.monotonic() - t0
    spark.stop()
    return wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2, help="narrow level cores")
    ap.add_argument("--n-docs", type=int, default=1_000_000)
    ap.add_argument("--n-repos", type=int, default=10_000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--stage", choices=("full", "edges"), default="full")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH/graph_scale.json"))
    args = ap.parse_args()

    levels = (args.n, 4 * args.n)
    rounds = []
    for r in range(args.rounds):
        pair = {}
        for cores in levels:  # back-to-back pairing absorbs host drift
            wall = _run_level(cores, args.n_docs, args.n_repos, args.iters,
                              args.stage)
            pair[cores] = args.n_docs / wall
            print(f"round {r} cores={cores}: {pair[cores]:,.0f} docs/s "
                  f"({wall:.2f}s)", flush=True)
        pair["eff"] = (pair[levels[1]] / pair[levels[0]]) / 4.0
        rounds.append(pair)
    report = {
        "n_docs": args.n_docs, "n_repos": args.n_repos, "iters": args.iters,
        "stage": args.stage,
        "levels": list(levels),
        "rounds": rounds,
        "throughput_n": statistics.median(p[levels[0]] for p in rounds),
        "throughput_4n": statistics.median(p[levels[1]] for p in rounds),
        "eff_paired_median": statistics.median(p["eff"] for p in rounds),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "rounds"}))


if __name__ == "__main__":
    main()
