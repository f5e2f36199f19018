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


def query_buckets(query_vec: list[float], n_planes: int, probe_hamming: int = 1) -> list[int]:
    """Deterministic multi-probe bucket set: the query's own sign-bit
    bucket plus every bucket within Hamming distance ``probe_hamming``
    (flipping the planes most likely to be misassigned is the classic
    multi-probe refinement; flipping ALL 1-2 bit combinations is its
    exhaustive, parameter-free form — 1+n+n(n-1)/2 buckets of 2^n)."""
    import itertools

    planes = _hyperplanes(n_planes, len(query_vec))
    q = np.asarray(query_vec, dtype=np.float64)
    base = int(sum((1 << p) for p in range(n_planes) if planes[p] @ q >= 0))
    out = {base}
    for h in range(1, probe_hamming + 1):
        for flips in itertools.combinations(range(n_planes), h):
            out.add(base ^ sum(1 << f for f in flips))
    return sorted(out)


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 6,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: score only the query's multi-probe LSH bucket set
    (approximate recall, exact scores within the probed set). With the
    bucket materialized as a partition key (write_bucketed_embeddings),
    the probe is a partition-pruned read of ~|probes|/2^n_planes of the
    corpus instead of a full scan."""
    dim = len(query_vec)
    planes = _hyperplanes(n_planes, dim)
    probes = query_buckets(query_vec, n_planes, probe_hamming)
    bucketed = embeddings.withColumn("bucket", lsh_bucket_expr(vec_col, planes))
    return cosine_topk(bucketed.filter(F.col("bucket").isin(probes)), query_vec, k, id_col, vec_col)


def write_bucketed_embeddings(
    embeddings: DataFrame,
    out_path: str,
    n_planes: int = 6,
    vec_col: str = "embedding",
) -> None:
    """Materialize the LSH bucket layout: parquet partitioned by bucket.
    A probe then reads ONLY its probe buckets' directories (partition
    pruning — verified by test_similarity_layout's input_files check)."""
    dim = len(embeddings.select(vec_col).first()[0])
    planes = _hyperplanes(n_planes, dim)
    (
        embeddings.withColumn("bucket", lsh_bucket_expr(vec_col, planes))
        .repartition("bucket")
        .write.partitionBy("bucket").mode("overwrite").parquet(out_path)
    )


def bucketed_topk(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 6,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a materialized bucket layout: partition-pruned scan of the
    probe buckets only, exact rescoring inside."""
    probes = query_buckets(query_vec, n_planes, probe_hamming)
    df = spark.read.parquet(path).filter(F.col("bucket").isin(probes))
    return cosine_topk(df, query_vec, k, id_col, vec_col)


def lsh_recall_at_k(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 6,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """1-row (k, n_hits, recall): overlap of the multi-probe LSH top-k with
    the exact top-k — the deterministic recall evidence for the ANN path."""
    exact = cosine_topk(embeddings, query_vec, k, id_col, vec_col).select("vec_id")
    approx = lsh_bucketed_topk(embeddings, query_vec, k, n_planes, probe_hamming,
                               id_col, vec_col).select("vec_id")
    hits = exact.join(approx, "vec_id", "left_semi")
    return hits.agg(
        F.lit(k).cast("long").alias("k"),
        F.count("*").cast("long").alias("n_hits"),
        F.round(F.count("*") / F.lit(float(k)), SCORE_DECIMALS).alias("recall"),
    )


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    bands: int = 6,
    planes_per_band: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs (vec_a < vec_b, cos >= threshold).

    Banded (OR-amplified) random-hyperplane LSH: ``bands`` independent
    bucketings of ``planes_per_band`` sign bits each; a pair is a candidate
    iff it shares a bucket in ANY band; exact cosine verifies. A pair at
    angle θ collides with P = 1 - (1 - (1-θ/π)^r)^L — e.g. r=2, L=6 at
    cos 0.45 gives ~0.96, at cos 0.9 gives ~0.9996. Recall < 1 by design
    (the oracle mirrors the banding, so correctness is exact over the
    DEFINED semantics); tune (r, L) to the target threshold.

    Scale shape: candidates come from the band-bucket self-join — never
    the n² cross join; the verify touches candidate pairs only.
    """
    dim = len(embeddings.select(vec_col).first()[0])
    n_planes = bands * planes_per_band
    planes = _hyperplanes(n_planes, dim)
    band_structs = []
    for bi in range(bands):
        bits = []
        for j in range(planes_per_band):
            p = bi * planes_per_band + j
            arr = F.array(*[F.lit(float(x)) for x in planes[p]])
            bits.append(F.when(_dot(F.col("v"), arr) >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
        key = bits[0]
        for x in bits[1:]:
            key = key + x
        band_structs.append(F.struct(F.lit(bi).alias("band"), key.cast("int").alias("key")))
    b = (
        embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
        .select("vid", "v", F.explode(F.array(*band_structs)).alias("bk"))
        .select("vid", "v", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )
    l, r = b.alias("l"), b.alias("r")
    cand = (
        l.join(r, (F.col("l.band") == F.col("r.band")) & (F.col("l.key") == F.col("r.key"))
               & (F.col("l.vid") < F.col("r.vid")))
        .select(F.col("l.vid").alias("vec_a"), F.col("r.vid").alias("vec_b"),
                F.col("l.v").alias("va"), F.col("r.v").alias("vb"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        cand.select("vec_a", "vec_b", F.round(cos, SCORE_DECIMALS).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
