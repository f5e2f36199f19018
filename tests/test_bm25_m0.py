"""M0 gate: expression-BM25 is rank-identical to the pure-Python oracle."""

from __future__ import annotations

import math

import pytest

from fastmorph_spark.search.bm25 import bm25_topk_expression
from fastmorph_spark.sources import read_documents
from tests.conftest import SF0001
from tests.oracle_bm25 import OracleIndex, load_documents

QUERIES = [
    "fast hash join",
    "table",
    "zzz_not_in_corpus",
    "the",                       # hot term
    "merge sort scan key order", # many terms
    "fast fast fast",            # dup terms (set semantics)
]


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex(load_documents(SF0001))


@pytest.mark.parametrize("q", QUERIES)
def test_rank_identical_topk(spark, oracle, q):
    docs = read_documents(spark, SF0001)
    got = bm25_topk_expression(docs, q, k=10).collect()
    exp = oracle.topk(q, 10)
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert math.isclose(r["score"], s, rel_tol=1e-9), (r, s)
    assert [r["rank"] for r in got] == list(range(1, len(exp) + 1))


def test_smoke_expectation(spark):
    """Pinned expectation from SURVEY.md §5.1 (independent DuckDB+Python
    verification this session): top-3 for 'fast hash join' on sf0.001."""
    docs = read_documents(spark, SF0001)
    got = bm25_topk_expression(docs, "fast hash join", k=3).collect()
    assert [r["doc_id"] for r in got] == [406, 22, 491]
    for r, s in zip(got, [1.331924, 1.295801, 1.286012]):
        assert math.isclose(r["score"], s, abs_tol=5e-7), (r["doc_id"], r["score"], s)


def test_lang_filter_matches_oracle(spark):
    """Subcorpus filter (P2): stats universe = the filtered docs."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF0001}/documents.parquet", columns=["doc_id", "text", "lang"])
    sub = {d: x for d, x, g in zip(*[t[c].to_pylist() for c in ("doc_id", "text", "lang")]) if g == "en"}
    oracle = OracleIndex(sub)
    docs = read_documents(spark, SF0001)
    got = bm25_topk_expression(docs, "table index scan", k=10, lang="en").collect()
    exp = oracle.topk("table index scan", 10)
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]


def test_partitioning_invariance(spark):
    """shuffle.partitions / input layout must not change results
    (SURVEY.md §4 determinism rules)."""
    docs = read_documents(spark, SF0001)
    a = bm25_topk_expression(docs, "fast hash join", k=10).collect()
    b = bm25_topk_expression(docs.repartition(17), "fast hash join", k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [(r["doc_id"], r["score"]) for r in b]


def test_partition_local_postings_equals_shuffle_groupby(spark):
    """The mapInPandas partition-local build must equal the declarative
    explode+groupBy formulation, under any input partitioning."""
    from pyspark.sql import functions as F

    from fastmorph_spark.index.build import build_postings
    from fastmorph_spark.tokenize import tokens_with_positions

    docs = spark.createDataFrame(
        [(0, "a b a c a"), (1, "b b"), (2, ""), (3, None), (4, "c a c")],
        "doc_id long, text string",
    )
    ref = (
        tokens_with_positions(docs)
        .groupBy("term", "doc_id")
        .agg(
            F.count("*").cast("int").alias("tf"),
            F.array_sort(F.collect_list(F.col("pos").cast("int"))).alias("positions"),
        )
    )
    want = {(r.term, r.doc_id): (r.tf, r.positions) for r in ref.collect()}
    for parts in (1, 7):
        got_rows = build_postings(docs.repartition(parts)).collect()
        got = {(r.term, r.doc_id): (r.tf, r.positions) for r in got_rows}
        assert got == want


@pytest.mark.parametrize("q", ["", "   ", "!!! ??? ...", None])
def test_degenerate_queries_all_paths(spark, q):
    """Empty / whitespace / punctuation-only / None queries: every query
    path returns 0 rows — never a crash (verify-skill probes)."""
    from fastmorph_spark.index.build import build_dictionary, build_postings
    from fastmorph_spark.index.io import build_index_frames
    from fastmorph_spark.search import engine
    from fastmorph_spark.search.bm25 import bm25_topk_expression
    from fastmorph_spark.search.wand import search_wand

    docs = read_documents(spark, SF0001).limit(50)
    postings = build_postings(docs)
    dictionary = build_dictionary(postings)
    qs = q if q is not None else ""
    assert bm25_topk_expression(docs, qs, k=5).count() == 0
    idx = build_index_frames(docs, doc_shard_size=100, block_size=16,
                             pack_partitions=4)
    assert search_wand(idx, qs, k=5).count() == 0
    assert engine.and_search(postings, qs).count() == 0
    assert engine.or_search(postings, qs).count() == 0
    assert engine.phrase_search(postings, qs).count() == 0
    assert engine.stem_search(postings, dictionary, "zzznot").count() == 0
