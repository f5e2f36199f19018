"""Driver-facing query registry: every implemented operator from
SURVEY.md §2 gets a (spark, sf_dir) -> DataFrame callable here plus a
matching DuckDB oracle in ``oracle_sqls()`` (same column names, same
rounding, same tie-breaks — the driver hash-compares them at sf0.01).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastmorph_spark import oracles
from fastmorph_spark.constants import SCORE_DECIMALS
from fastmorph_spark.index import (
    build_dictionary,
    build_doc_lens,
    build_docs,
    build_postings,
    global_stats,
)
from fastmorph_spark.search.bm25 import bm25_topk_expression
from fastmorph_spark.sources import read_documents
from fastmorph_spark.tokenize import tokenize_py

FLAGSHIP_QUERY = "fast hash join"
LANG_QUERY = "table index scan"
LANG_FILTER = "en"


# ---------------------------------------------------------------- FTS core


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_documents(spark, sf_dir)
    return bm25_topk_expression(docs, FLAGSHIP_QUERY, k=10, round_score=True) \
        .withColumn("rank", F.col("rank").cast("long"))


def q_bm25_topk_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_documents(spark, sf_dir)
    return bm25_topk_expression(docs, LANG_QUERY, k=10, lang=LANG_FILTER, round_score=True) \
        .withColumn("rank", F.col("rank").cast("long"))


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_documents(spark, sf_dir)
    postings = build_postings(docs)
    gs = global_stats(build_doc_lens(docs, postings))
    return gs.select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round("avgdl", SCORE_DECIMALS).alias("avgdl"),
    )


def q_dictionary_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_documents(spark, sf_dir)
    d = build_dictionary(build_postings(docs))
    return d.orderBy(F.desc("df"), F.asc("term")).limit(100)


def q_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_documents(spark, sf_dir)
    return build_docs(docs).select("doc_id", "doc_len", "content_sha256")


def q_match_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — total OR/AND hit counts for the flagship query."""
    docs = read_documents(spark, sf_dir)
    qterms = sorted(set(tokenize_py(FLAGSHIP_QUERY)))
    postings = build_postings(docs).filter(F.col("term").isin(qterms))
    per_doc = postings.groupBy("doc_id").agg(F.countDistinct("term").alias("nt"))
    return per_doc.agg(
        F.count("*").cast("long").alias("docs_or"),
        F.coalesce(
            F.sum(F.when(F.col("nt") == len(qterms), 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("docs_and"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_topk": q_bm25_topk,
        "bm25_topk_lang": q_bm25_topk_lang,
        "doc_stats": q_doc_stats,
        "dictionary_top100": q_dictionary_top100,
        "doc_lengths": q_doc_lengths,
        "match_counts": q_match_counts,
    }


def oracle_sqls() -> dict[str, str]:
    return {
        "bm25_topk": oracles.bm25_topk_sql(FLAGSHIP_QUERY, k=10),
        "bm25_topk_lang": oracles.bm25_topk_sql(LANG_QUERY, k=10, lang=LANG_FILTER),
        "doc_stats": oracles.doc_stats_sql(),
        "dictionary_top100": oracles.dictionary_sql(100),
        "doc_lengths": oracles.doc_lengths_sql(),
        "match_counts": oracles.match_counts_sql(FLAGSHIP_QUERY),
    }
