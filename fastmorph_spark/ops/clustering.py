"""Deterministic k-means over the embedding column + cluster-balanced
sampling — the semantic-clustering leg of the LLM-curation surface.

Large-scale pipelines cluster document embeddings to diversify training
mixes, find semantic duplicates at the cluster level, and rebalance
domains (cluster-balanced sampling). This module implements Lloyd's
algorithm with every nondeterminism pinned so a DuckDB oracle can verify
the FULL iteration trace, not just "some clustering":

- init: the k vectors with the smallest ``(md5(CAST(vec_id AS STRING)),
  vec_id)`` — the repo's md5-family substitute for RNG seeding (same
  discipline as sample_10pct / MinHash); cluster ids 0..k-1 in that
  order;
- a fixed number of Lloyd iterations (no convergence test — the
  iteration count IS part of the pinned semantics);
- distance = squared L2 in float64, ROUNDED to SCORE_DECIMALS before
  the argmin, tie → smallest cluster id. Rounding makes the comparison
  itself engine-portable: both engines sum ~1e-16-noise-apart doubles,
  but they argmin over identical rounded values;
- centroid update = per-component mean, ROUNDED to SCORE_DECIMALS —
  each iteration re-pins cross-engine state at the boundary, so float
  noise cannot compound across iterations;
- a cluster left empty by an assignment round simply drops out
  (GROUP BY produces no row for it) — pinned, mirrored by the oracle.

Scale shape (10^9+ vectors): assignment is a narrow map against k
BROADCAST centroid literals (no shuffle, no join); the update is ONE
groupBy (cluster, component) over posexploded rows whose map-side
partial aggregation reduces shuffle volume to partitions x k x d; the
only driver materialization is the k x d centroid matrix per iteration —
the same pattern MLlib's KMeans uses. Iterations are a fixed small
constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastmorph_spark.constants import SCORE_DECIMALS

_SAMPLE_SALT = 32  # cluster_sample pre-prune fan-out (result-invariant)


def _collect_centroids(rows, k_col: str, idx_col: str, val_col: str):
    """(cluster -> dense component list) from collected grouped rows."""
    cents: dict[int, dict[int, float]] = {}
    for r in rows:
        cents.setdefault(int(r[k_col]), {})[int(r[idx_col])] = float(r[val_col])
    return {
        c: [comps[i] for i in sorted(comps)] for c, comps in sorted(cents.items())
    }


def _assign_expr(vec, centroids: dict[int, list[float]]):
    """(cluster, dist) struct: argmin over the k centroid literals —
    array_min over (dist, cluster) structs compares fields in order, so
    ties break to the smallest cluster id."""
    dists = [
        F.struct(
            F.round(
                F.aggregate(
                    F.zip_with(vec, F.array(*[F.lit(x) for x in cent]),
                               lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                SCORE_DECIMALS,
            ).alias("dist"),
            F.lit(c).cast("long").alias("cluster"),
        )
        for c, cent in centroids.items()
    ]
    return F.array_min(F.array(*dists))


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster, dist) after ``iters`` pinned Lloyd iterations.

    ``dist`` is the (rounded) squared L2 distance to the FINAL round's
    centroid — the per-row quality signal a pipeline thresholds on
    (outlier docs sit far from every centroid). Output ordered by the
    driver's order-insensitive compare; no sort is imposed.
    """
    vecs = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    init_rows = (
        vecs.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(k)
        .collect()
    )
    centroids = {c: list(r["v"]) for c, r in enumerate(init_rows)}
    for _ in range(iters):
        assigned = vecs.select(
            "vec_id", "v", _assign_expr(F.col("v"), centroids).alias("a")
        ).select("vec_id", "v", F.col("a.cluster").alias("cluster"),
                 F.col("a.dist").alias("dist"))
        upd = (
            assigned.select("cluster", F.posexplode("v").alias("idx", "val"))
            .groupBy("cluster", "idx")
            .agg(F.round(F.avg("val"), SCORE_DECIMALS).alias("val"))
            .collect()
        )
        centroids = _collect_centroids(upd, "cluster", "idx", "val")
    final = vecs.select(
        "vec_id", _assign_expr(F.col("v"), centroids).alias("a")
    )
    return final.select(
        "vec_id",
        F.col("a.cluster").alias("cluster"),
        F.col("a.dist").alias("dist"),
    )


def cluster_sample(
    embeddings: DataFrame,
    k: int = 4,
    iters: int = 2,
    per_cluster: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-BALANCED deterministic subsample: the ``per_cluster``
    members of each final k-means cluster with the smallest
    ``(md5(CAST(vec_id AS STRING)), vec_id)`` — equal representation per
    semantic region regardless of how skewed the cluster masses are (the
    diversity-rebalance step of a curation pipeline; same md5-rank
    device as ops.text.stratified_sample, with LEARNED groups).

    Returns (vec_id, cluster). A single per-cluster rank window would
    sort ENTIRE clusters (10^9/k rows each at scale), so the cut is
    two-phase (the O2 pre-prune discipline): a salted window keeps
    ``per_cluster`` per (cluster, salt) sub-partition — each 1/SALT the
    cluster's size — then the final window ranks the surviving
    <= SALT * per_cluster rows per cluster. Exact: the global top-N by a
    total order is contained in the union of per-salt top-Ns.
    """
    assigned = kmeans_assign(embeddings, k=k, iters=iters,
                             id_col=id_col, vec_col=vec_col)
    key = [F.md5(F.col("vec_id").cast("string")), F.col("vec_id")]
    salt = F.pmod(F.xxhash64("vec_id"), F.lit(_SAMPLE_SALT))
    w1 = Window.partitionBy("cluster", "salt").orderBy(*key)
    w2 = Window.partitionBy("cluster").orderBy(*key)
    return (
        assigned.withColumn("salt", salt)
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= per_cluster)
        .withColumn("rn2", F.row_number().over(w2))
        .filter(F.col("rn2") <= per_cluster)
        .select("vec_id", "cluster")
    )
