"""M1 — logical (uncompressed) index tables: docs, postings, dictionary,
doc stats (SURVEY.md §1.3 schemas).

The reference interns words/lemmas/tags into integer-ID arrays at load
time [PK-med, SURVEY.md §1.1]; the Spark-native analog is these DataFrame
aggregations — Catalyst plans partial (map-side) + final hash aggregation,
so tf counting never ships raw token rows across the shuffle unreduced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastmorph_spark.tokenize import tokens_with_positions


def build_docs(corpus: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Doc registry: identity + the per-row sha256 invariant
    (BASELINE.json input_hint: content sha256 equality vs source)."""
    cols = [c for c in ("repo", "path", "commit", "lang") if c in corpus.columns]
    text_col = "content" if "content" in corpus.columns else "text"
    return corpus.select(
        F.col(id_col),
        *cols,
        F.sha2(F.col(text_col), 256).alias("content_sha256"),
        # token count == number of [a-z0-9_]+ runs; regexp_count avoids
        # materializing the token array (split() allocates ~len(doc)
        # UTF8Strings per row and turns the job GC-bound — measured flat
        # 15s at ANY core count on 100k docs vs <2s with regexp_count)
        F.regexp_count(F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(r"[a-z0-9_]+"))
        .cast("long").alias("doc_len"),
    )


def build_postings(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exploded postings: (term, doc_id, tf, positions sorted ascending).

    positions are 0-based token indexes (the posexplode index); the
    array is collected per (term, doc) then sorted — order-insensitive
    to shuffle nondeterminism.
    """
    toks = tokens_with_positions(documents, text_col=text_col, id_cols=(id_col,))
    return (
        toks.groupBy("term", id_col)
        .agg(
            F.count("*").cast("int").alias("tf"),
            F.array_sort(F.collect_list(F.col("pos").cast("int"))).alias("positions"),
        )
        .withColumnRenamed(id_col, "doc_id")
    )


def build_dictionary(postings: DataFrame) -> DataFrame:
    """(term, df, cf): document frequency + collection frequency.
    df is exact (rank-identity needs exact idf), never approximate."""
    return postings.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )


def build_doc_lens(documents: DataFrame, postings: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, dl) for ALL docs — empty docs keep dl=0 so N/avgdl are
    over the full corpus."""
    dl = postings.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    return (
        documents.select(F.col(id_col).alias("doc_id"))
        .join(dl, "doc_id", "left")
        .select("doc_id", F.coalesce("dl", F.lit(0)).cast("long").alias("dl"))
    )


def global_stats(doc_lens: DataFrame) -> DataFrame:
    """1-row (n_docs, avgdl)."""
    return doc_lens.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
