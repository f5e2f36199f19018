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
from fastmorph_spark.search import engine
from fastmorph_spark.search.bm25 import bm25_topk_expression
from fastmorph_spark.sources import read_documents
from fastmorph_spark.tokenize import tokenize_py

FLAGSHIP_QUERY = "fast hash join"
LANG_QUERY = "table index scan"
LANG_FILTER = "en"
PHRASE_QUERY = "order fast"          # present at sf0.001 (51 occurrences)
PHRASE3_QUERY = "the fast hash"      # 3-gram, may be absent -> 0 rows is valid
PROX_T1, PROX_T2, PROX_FROM, PROX_TO = "fast", "join", 1, 5
WILDCARD_PATTERN = "s*"              # scan slow small sort spark stream
PAGE_SKIP, PAGE_UNTIL = 10, 20


def _index_tables(spark: SparkSession, sf_dir: str):
    docs = read_documents(spark, sf_dir)
    postings = build_postings(docs)
    doc_lens = build_doc_lens(docs, postings)
    dictionary = build_dictionary(postings)
    stats = global_stats(doc_lens)
    return docs, postings, dictionary, doc_lens, stats


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


# ------------------------------------------------- M1: fastmorph semantics


def q_bm25_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same flagship query through the index-backed path (J1/J2/A5/O1) —
    must hash-match the expression path's oracle."""
    _, postings, dictionary, doc_lens, stats = _index_tables(spark, sf_dir)
    return engine.search_topk(postings, dictionary, doc_lens, stats,
                              FLAGSHIP_QUERY, k=10, round_score=True)


def q_bm25_topk_wand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query through the FULL physical path: pack (delta+varbyte
    blocks, doc-shard salting) -> Block-Max WAND kernel. Must hash-match
    the same oracle as the expression path."""
    from fastmorph_spark.index.io import build_index_frames
    from fastmorph_spark.search.wand import search_wand

    docs = read_documents(spark, sf_dir)
    idx = build_index_frames(docs, doc_shard_size=1000, block_size=64)
    return search_wand(idx, FLAGSHIP_QUERY, k=10, round_score=True)


def q_and_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, postings, *_ = _index_tables(spark, sf_dir)
    return engine.and_search(postings, FLAGSHIP_QUERY)


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, postings, *_ = _index_tables(spark, sf_dir)
    return engine.phrase_search(postings, PHRASE_QUERY)


def q_phrase3_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, postings, *_ = _index_tables(spark, sf_dir)
    return engine.phrase_search(postings, PHRASE3_QUERY)


def q_proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, postings, *_ = _index_tables(spark, sf_dir)
    return engine.proximity_search(postings, PROX_T1, PROX_T2, PROX_FROM, PROX_TO)


def q_wildcard_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, postings, dictionary, *_ = _index_tables(spark, sf_dir)
    return engine.wildcard_terms(dictionary, WILDCARD_PATTERN)


def q_wildcard_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, postings, dictionary, *_ = _index_tables(spark, sf_dir)
    return engine.wildcard_docs(postings, dictionary, WILDCARD_PATTERN)


def q_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranks (10, 20] of the flagship query (O4 — fastmorph skip/until)."""
    docs = read_documents(spark, sf_dir)
    _, postings, dictionary, doc_lens, stats = _index_tables(spark, sf_dir)
    qterms = sorted(set(tokenize_py(FLAGSHIP_QUERY)))
    from fastmorph_spark.search.bm25 import bm25_score_col

    matched = postings.filter(F.col("term").isin(qterms))
    scored = (
        matched.join(F.broadcast(dictionary.filter(F.col("term").isin(qterms)).select("term", "df")), "term")
        .join(doc_lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("term_score", bm25_score_col(F.col("tf"), F.col("df"), F.col("n_docs"), F.col("dl"), F.col("avgdl")))
    )
    from fastmorph_spark.search.bm25 import sum_term_scores

    scored = sum_term_scores(scored)
    # rank on the UNROUNDED score (matching the oracle), round only for output
    return engine.paginate(scored, PAGE_SKIP, PAGE_UNTIL) \
        .withColumn("score", F.round("score", SCORE_DECIMALS))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_topk": q_bm25_topk,
        "bm25_topk_lang": q_bm25_topk_lang,
        "doc_stats": q_doc_stats,
        "dictionary_top100": q_dictionary_top100,
        "doc_lengths": q_doc_lengths,
        "match_counts": q_match_counts,
        "bm25_topk_indexed": q_bm25_topk_indexed,
        "bm25_topk_wand": q_bm25_topk_wand,
        "and_search": q_and_search,
        "phrase_search": q_phrase_search,
        "phrase3_search": q_phrase3_search,
        "proximity_search": q_proximity_search,
        "wildcard_terms": q_wildcard_terms,
        "wildcard_docs": q_wildcard_docs,
        "pagination": q_pagination,
    }


def oracle_sqls() -> dict[str, str]:
    return {
        "bm25_topk": oracles.bm25_topk_sql(FLAGSHIP_QUERY, k=10),
        "bm25_topk_lang": oracles.bm25_topk_sql(LANG_QUERY, k=10, lang=LANG_FILTER),
        "doc_stats": oracles.doc_stats_sql(),
        "dictionary_top100": oracles.dictionary_sql(100),
        "doc_lengths": oracles.doc_lengths_sql(),
        "match_counts": oracles.match_counts_sql(FLAGSHIP_QUERY),
        "bm25_topk_indexed": oracles.bm25_topk_sql(FLAGSHIP_QUERY, k=10),
        "bm25_topk_wand": oracles.bm25_topk_sql(FLAGSHIP_QUERY, k=10),
        "and_search": oracles.and_search_sql(FLAGSHIP_QUERY),
        "phrase_search": oracles.phrase_search_sql(PHRASE_QUERY),
        "phrase3_search": oracles.phrase_search_sql(PHRASE3_QUERY),
        "proximity_search": oracles.proximity_search_sql(PROX_T1, PROX_T2, PROX_FROM, PROX_TO),
        "wildcard_terms": oracles.wildcard_terms_sql(WILDCARD_PATTERN),
        "wildcard_docs": oracles.wildcard_docs_sql(WILDCARD_PATTERN),
        "pagination": oracles.pagination_sql(FLAGSHIP_QUERY, PAGE_SKIP, PAGE_UNTIL),
    }
