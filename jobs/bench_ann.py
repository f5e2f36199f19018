"""ANN LSH plane-count evidence (VERDICT r02 next-round item #7).

The fixture-scaled driver query uses 6 planes (64 buckets). At real scale
more planes are needed for selectivity; this job shows recall@k stays
high at 12-16 planes on a LARGER synthetic embedding set, with bucket
(partition) pruning still engaged — the input_files check proves the
probe reads only its probe buckets' files.

Synthetic set: deterministic clustered unit vectors (numpy PCG64 seed 0):
`n_clusters` centers on the unit sphere, `per_cluster` members each =
center + small Gaussian noise, renormalized. Clustered data is the regime
LSH serves (a random-points query's neighbors are near-orthogonal and
no sublinear method helps); the noise scale puts genuine neighbors at
cos ~0.99, i.e. a few degrees — the "same document, different crop"
shape of embedding dedup/search corpora.

  python jobs/bench_ann.py --out BENCH/ann_recall.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_embeddings(n_clusters: int, per_cluster: int, dim: int, noise: float):
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, per_cluster, axis=0)
    vecs = vecs + noise * rng.standard_normal(vecs.shape) / np.sqrt(dim)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    # the query: one more member of cluster 0, held out of the set
    q = centers[0] + noise * rng.standard_normal(dim) / np.sqrt(dim)
    q /= np.linalg.norm(q)
    return vecs.astype(np.float32), [float(x) for x in q]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--n-clusters", type=int, default=400)
    ap.add_argument("--per-cluster", type=int, default=100)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--noise", type=float, default=0.1)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--planes", type=int, nargs="+", default=[6, 12, 16])
    ap.add_argument("--probe-hamming", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH/ann_recall.json"))
    args = ap.parse_args()

    from fastmorph_spark.ops.similarity import (
        bucketed_topk,
        cosine_topk,
        query_buckets,
        write_bucketed_embeddings,
    )
    from fastmorph_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cores}]", shuffle_partitions=2 * args.cores,
                      app_name="fastmorph-bench-ann")
    vecs, qv = make_embeddings(args.n_clusters, args.per_cluster, args.dim, args.noise)
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    n = emb.count()

    exact_ids = {r["vec_id"] for r in cosine_topk(emb, qv, args.k).collect()}
    results = []
    with tempfile.TemporaryDirectory() as td:
        for p in args.planes:
            path = os.path.join(td, f"planes_{p}")
            write_bucketed_embeddings(emb, path, n_planes=p)
            probes = query_buckets(qv, p, args.probe_hamming)
            t0 = time.perf_counter()
            approx = bucketed_topk(spark, path, qv, args.k, p, args.probe_hamming)
            approx_ids = {r["vec_id"] for r in approx.collect()}
            wall = time.perf_counter() - t0
            # partition pruning evidence: the probe reads only probe-bucket
            # files (runtime input_file_name, the actually-read set —
            # .inputFiles() lists pre-pruning)
            from pyspark.sql import functions as F

            pruned = spark.read.parquet(path).filter(F.col("bucket").isin(probes))
            files_read = pruned.select(F.input_file_name()).distinct().count()
            files_total = spark.read.parquet(path).select(F.input_file_name()).distinct().count()
            cand = pruned.count()
            results.append({
                "n_planes": p,
                "n_buckets": 2 ** p,
                "probe_hamming": args.probe_hamming,
                "n_probe_buckets": len(probes),
                "candidates_scanned": cand,
                "candidate_frac": round(cand / n, 5),
                "files_read": files_read,
                "files_total": files_total,
                "pruning_engaged": files_read < files_total,
                "recall_at_k": round(len(exact_ids & approx_ids) / args.k, 3),
                "query_wall_sec": round(wall, 3),
            })
            print(json.dumps(results[-1]))

    out = {
        "n_vectors": n,
        "dim": args.dim,
        "n_clusters": args.n_clusters,
        "noise": args.noise,
        "k": args.k,
        "levels": results,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
