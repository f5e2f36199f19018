"""k-means scale evidence (round 5 closing wave, SURVEY §2.4 A17).

The fixture embeddings (500 rows) exercise correctness; this job
measures the operator's SCALING SHAPE on a larger deterministic vector
set, per the driver's two-parallelism-levels instruction: the same
kmeans_assign job at N and 4N local cores on the same input, paired
back-to-back rounds (the BENCH/scaling.json protocol), reporting
vectors/sec at both levels + paired efficiency. Assignment is a narrow
map against broadcast centroid literals (zero exchanges, plan-audited in
test/SURVEY); the centroid update is the only shuffle and is map-side
partial-aggregated to partitions x k x d rows — so the job should scale
near-linearly until the host's idle-core budget bites.

Vectors (no RNG, reproducible byte-for-byte): vec i, component j =
((i * 37 + j * 11) % 1000) / 1000 + (i % 8) — eight well-separated
integer-offset bands so the clustering is non-degenerate.

  python jobs/bench_kmeans.py --out BENCH/kmeans_scale.json
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


def _run_level(cores: int, n_vecs: int, dim: int, k: int, iters: int) -> float:
    """One cold-session run at `cores`; returns wall seconds for
    kmeans_assign (count() materializes the final assignment)."""
    from pyspark.sql import functions as F

    from fastmorph_spark.ops.clustering import kmeans_assign
    from fastmorph_spark.session import get_spark

    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=2 * cores,
                      app_name=f"fastmorph-bench-kmeans-{cores}")
    spark.sparkContext.setLogLevel("ERROR")
    vecs = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (((F.col("id") * 37 + j * 11) % 1000) / 1000.0
                       + (F.col("id") % 8)).cast("float"),
        ).alias("embedding"),
    ).repartition(4 * cores).persist()
    vecs.count()  # materialize input outside the timed window
    t0 = time.monotonic()
    n = kmeans_assign(vecs, k=k, iters=iters).count()
    wall = time.monotonic() - t0
    assert n == n_vecs
    spark.stop()
    return wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2, help="narrow level cores")
    ap.add_argument("--n-vecs", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH/kmeans_scale.json"))
    args = ap.parse_args()

    levels = (args.n, 4 * args.n)
    rounds = []
    for r in range(args.rounds):
        pair = {}
        for cores in levels:  # back-to-back pairing absorbs host drift
            wall = _run_level(cores, args.n_vecs, args.dim, args.k, args.iters)
            pair[cores] = args.n_vecs / wall
            print(f"round {r} cores={cores}: {pair[cores]:,.0f} vec/s "
                  f"({wall:.2f}s)", flush=True)
        pair["eff"] = (pair[levels[1]] / pair[levels[0]]) / 4.0
        rounds.append(pair)
    report = {
        "n_vecs": args.n_vecs, "dim": args.dim, "k": args.k,
        "iters": args.iters, "levels": list(levels),
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
