"""Deterministic k-means + cluster-balanced sampling (ops/clustering.py):
pinned Lloyd trace vs a numpy brute-force oracle, DuckDB oracle parity,
recovery of well-separated synthetic clusters, empty-cluster dropout,
sample balance, and repartition determinism."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from fastmorph_spark import registry
from fastmorph_spark.ops.clustering import cluster_sample, kmeans_assign
from fastmorph_spark.sources import read_table
from tests.conftest import SF0001, assert_frames_match, register_views

K, ITERS, PER = registry.KMEANS_K, registry.KMEANS_ITERS, registry.KMEANS_SAMPLE


def _python_kmeans(vecs: dict[int, np.ndarray], k: int, iters: int):
    """Exhaustive mirror of the pinned semantics: md5-ordered init,
    round(dist, 6) argmin with smallest-cluster ties, round(mean, 6)
    centroid updates, empty clusters dropping out."""
    order = sorted(vecs, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cents = {c: vecs[i].astype(np.float64) for c, i in enumerate(order[:k])}

    def assign():
        out = {}
        for i, v in vecs.items():
            best = min(
                (round(float(np.sum((v - cent) ** 2)), 6), c)
                for c, cent in cents.items()
            )
            out[i] = best  # (dist, cluster)
        return out

    for _ in range(iters):
        a = assign()
        new = {}
        for c in cents:
            members = [vecs[i] for i, (_d, ci) in a.items() if ci == c]
            if members:
                new[c] = np.round(np.mean(np.stack(members), axis=0), 6)
        cents = new
    return {i: (c, d) for i, (d, c) in assign().items()}


@pytest.fixture(scope="module")
def emb(spark):
    return read_table(spark, SF0001, "embeddings")


def test_python_oracle_parity(spark, emb):
    vecs = {
        int(r["vec_id"]): np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    want = _python_kmeans(vecs, K, ITERS)
    got = {
        int(r["vec_id"]): (int(r["cluster"]), float(r["dist"]))
        for r in kmeans_assign(emb, k=K, iters=ITERS).collect()
    }
    assert len(got) == len(want)
    for i, (c, d) in want.items():
        assert got[i][0] == c, f"vec {i}: cluster {got[i][0]} != {c}"
        assert abs(got[i][1] - d) < 1e-9


def test_duckdb_parity(spark, duck, emb):
    register_views(duck, SF0001)
    sqls = registry.oracle_sqls()
    assert_frames_match(registry.q_kmeans_clusters(spark, SF0001),
                        duck.sql(sqls["kmeans_clusters"]))
    assert_frames_match(registry.q_cluster_sample(spark, SF0001),
                        duck.sql(sqls["cluster_sample"]))


def test_recovers_separated_clusters(spark):
    """Three well-separated blobs, k=3: after 2 iterations every blob
    maps to exactly one learned cluster (purity 1.0)."""
    rng = np.random.RandomState(7)
    rows = []
    for g, center in enumerate(((0.0, 0.0), (50.0, 0.0), (0.0, 50.0))):
        for j in range(30):
            v = rng.normal(center, 0.5, size=2)
            rows.append((g * 100 + j, [float(v[0]), float(v[1])], g))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = kmeans_assign(df, k=3, iters=2).collect()
    by_truth: dict[int, set] = {}
    for r in got:
        by_truth.setdefault(int(r["vec_id"]) // 100, set()).add(int(r["cluster"]))
    assert all(len(s) == 1 for s in by_truth.values())
    assert len(set.union(*by_truth.values())) == 3


def test_empty_cluster_drops_out(spark):
    """All-identical vectors, k=2: both init centroids coincide, every
    row ties and breaks to cluster 0 — cluster 1 vanishes (pinned
    GROUP-BY dropout semantics)."""
    df = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    got = kmeans_assign(df, k=2, iters=2).collect()
    assert len(got) == 6
    assert {int(r["cluster"]) for r in got} == {0}
    assert all(float(r["dist"]) == 0.0 for r in got)


def test_cluster_sample_balance(spark, emb):
    assigned = {int(r["vec_id"]): int(r["cluster"])
                for r in kmeans_assign(emb, k=K, iters=ITERS).collect()}
    samp = cluster_sample(emb, k=K, iters=ITERS, per_cluster=PER).collect()
    counts: dict[int, int] = {}
    for r in samp:
        # sample members carry their true final-assignment cluster
        assert assigned[int(r["vec_id"])] == int(r["cluster"])
        counts[int(r["cluster"])] = counts.get(int(r["cluster"]), 0) + 1
    sizes: dict[int, int] = {}
    for c in assigned.values():
        sizes[c] = sizes.get(c, 0) + 1
    for c, n in counts.items():
        assert n == min(PER, sizes[c])


def test_repartition_determinism(spark, emb):
    a = sorted(tuple(r) for r in kmeans_assign(emb, k=K, iters=ITERS).collect())
    b = sorted(tuple(r)
               for r in kmeans_assign(emb.repartition(7), k=K, iters=ITERS).collect())
    assert a == b
