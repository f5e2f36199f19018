"""Similarity search over an embedding column (array<float>).

- cosine_topk:        exact brute-force top-k vs a query vector — the
                      correctness baseline. Dot products via zip_with +
                      aggregate (JVM higher-order functions, codegen'd).
- cosine_topk_arrow:  the same, vectorized in one Arrow batch kernel
                      (mapInPandas + numpy matmul) — the throughput path.
- lsh_bucketed_topk:  the scale path: random-hyperplane LSH (deterministic
                      hyperplanes derived from md5 of (plane, dim) — no
                      RNG) buckets vectors; the query probes only its own
                      bucket (+ optional multi-probe); exact rescoring
                      inside the bucket. Recall < 1 by design; the bucket
                      sweep replaces an all-pairs scan at 10^11 vectors.
- cosine_neardup_pairs: all pairs with cosine >= threshold via the same
                      LSH bucketing (embedding-space near-dup dedup).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastmorph_spark.constants import SCORE_DECIMALS


def _dot(a, b):
    # cast each element to double BEFORE multiplying — float32 products
    # would diverge from the numpy/DuckDB float64 paths
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity (rank, vec_id, cos). Ties break on
    vec_id ASC. Entirely JVM-side: zip_with/aggregate fold, then
    TakeOrderedAndProject — no Python, no shuffle beyond the final top-k."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"),
        (_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))).alias("cos"),
    )
    topk = scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
    rank = F.row_number().over(Window.orderBy(F.desc("cos"), F.asc("vec_id")))
    return topk.select(rank.cast("long").alias("rank"), "vec_id",
                       F.round("cos", SCORE_DECIMALS).alias("cos"))


def cosine_topk_arrow(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Same result as cosine_topk, but per-partition numpy matmul top-k via
    mapInPandas (one BLAS call per Arrow batch), then a global k-merge —
    the pattern that wins when dims are wide and rows are billions."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt(q @ q))

    def kern(it):
        for pdf in it:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cos = (m @ q) / (np.sqrt((m * m).sum(axis=1)) * qn)
            order = np.lexsort((pdf[id_col].to_numpy(), -cos))[:k]
            yield pd.DataFrame({"vec_id": pdf[id_col].to_numpy()[order], "cos": cos[order]})

    local = embeddings.select(id_col, vec_col).mapInPandas(kern, "vec_id long, cos double")
    topk = local.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
    rank = F.row_number().over(Window.orderBy(F.desc("cos"), F.asc("vec_id")))
    return topk.select(rank.cast("long").alias("rank"), "vec_id",
                       F.round("cos", SCORE_DECIMALS).alias("cos"))


def _hyperplanes(n_planes: int, dim: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: component (p, d) derives
    from md5(f"{p}_{d}") -> uniform in [-1, 1). No RNG state."""
    import hashlib

    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for d in range(dim):
            h = int.from_bytes(hashlib.md5(f"{p}_{d}".encode()).digest()[:8], "big")
            out[p, d] = (h / 2**63) - 1.0
    return out


def lsh_bucket_expr(vec_col, planes: np.ndarray):
    """Sign-bit bucket id of a vector column under fixed hyperplanes
    (column expression: one aggregate fold per plane)."""
    bits = []
    for p in range(planes.shape[0]):
        arr = F.array(*[F.lit(float(x)) for x in planes[p]])
        dot = _dot(F.col(vec_col) if isinstance(vec_col, str) else vec_col, arr)
        bits.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total.cast("int")


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: score ONLY the query's LSH bucket (approximate recall,
    exact scores). At scale the bucket column is a partition key — the
    probe reads one partition instead of the corpus."""
    dim = len(query_vec)
    planes = _hyperplanes(n_planes, dim)
    q = np.asarray(query_vec, dtype=np.float64)
    qbucket = int(sum((1 << p) for p in range(n_planes) if planes[p] @ q >= 0))
    bucketed = embeddings.withColumn("bucket", lsh_bucket_expr(vec_col, planes))
    return cosine_topk(bucketed.filter(F.col("bucket") == qbucket), query_vec, k, id_col, vec_col)


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs (a < b, cos >= threshold), candidates
    proposed by shared LSH bucket, verified exactly. High-cosine pairs
    collide with probability (1 - angle/pi)^n_planes."""
    # dim from one row (driver-side peek; schema has no fixed length)
    dim = len(embeddings.select(vec_col).first()[0])
    planes = _hyperplanes(n_planes, dim)
    b = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v"),
        lsh_bucket_expr(vec_col, planes).alias("bucket"),
    )
    l, r = b.alias("l"), b.alias("r")
    cand = l.join(r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.vid") < F.col("r.vid")))
    cos = _dot(F.col("l.v"), F.col("r.v")) / (_norm(F.col("l.v")) * _norm(F.col("r.v")))
    return (
        cand.select(
            F.col("l.vid").alias("vec_a"), F.col("r.vid").alias("vec_b"),
            F.round(cos, SCORE_DECIMALS).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
