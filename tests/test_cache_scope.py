"""Cache-lifetime hardening (VERDICT r03 #7): operators that persist
intermediates backing their returned plan accept scope=CacheScope; a
serving loop of 100 requests inside scopes ends with ZERO pinned storage
blocks (asserted via the JVM persistent-RDD registry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fastmorph_spark.cache import CacheScope, pinned_rdd_count
from fastmorph_spark.index.build import build_dictionary, build_postings
from fastmorph_spark.ops import dedup
from fastmorph_spark.search import engine
from fastmorph_spark.search.bm25 import bm25_topk_expression


def _tiny_docs(spark):
    rows = [
        (0, "fast hash join wins"),
        (1, "fast join fast hash"),
        (2, "slow scan order the"),
        (3, "fast hash join wins"),
        (4, "fast hash join winning streak"),
        (5, "the a of and or"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_search_request_loop_leaks_nothing(spark):
    """100 search_requests, each consumed inside its own CacheScope →
    pinned-RDD count returns to its baseline (the VERDICT #7 done bar)."""
    docs = _tiny_docs(spark)
    postings = build_postings(docs)
    dictionary = build_dictionary(postings)
    base = pinned_rdd_count(spark)
    for i in range(100):
        with CacheScope() as cs:
            out = engine.search_request(
                docs, postings, dictionary,
                [{"term": "fast"}, {"term": "hash"}], [(1, 2)],
                skip=0, until=10, width=1, scope=cs,
            )
            rows = out.collect()
            assert len(rows) > 0
    assert pinned_rdd_count(spark) == base


def test_scope_frees_dedup_pipeline(spark):
    docs = _tiny_docs(spark)
    base = pinned_rdd_count(spark)
    with CacheScope() as cs:
        pairs = dedup.minhash_lsh_pairs(docs, n=2, num_hashes=8, bands=4,
                                        threshold=0.5, scope=cs)
        groups = dedup.dup_groups(pairs, scope=cs)
        assert groups.count() >= 2
        assert pinned_rdd_count(spark) > base  # pinned while in scope
    assert pinned_rdd_count(spark) == base

    with CacheScope() as cs:
        drops = dedup.drop_list(docs, n=2, num_hashes=8, bands=4,
                                threshold=0.5, scope=cs)
        assert drops.count() >= 1
    assert pinned_rdd_count(spark) == base


def test_scope_frees_bm25_expression(spark):
    docs = _tiny_docs(spark)
    base = pinned_rdd_count(spark)
    for _ in range(5):
        with CacheScope() as cs:
            got = bm25_topk_expression(docs, "fast hash", k=3, scope=cs).collect()
            assert len(got) == 3
    assert pinned_rdd_count(spark) == base


def test_scope_none_keeps_caller_owned_contract(spark):
    """scope=None (default) must behave exactly as before: the block
    (r06: the narrow per-doc tf frame) stays pinned until clearCache()."""
    docs = _tiny_docs(spark)
    base = pinned_rdd_count(spark)
    got = bm25_topk_expression(docs, "fast hash", k=3).collect()
    assert len(got) == 3
    assert pinned_rdd_count(spark) > base
    spark.catalog.clearCache()


def test_scope_close_idempotent_and_try_finally(spark):
    docs = _tiny_docs(spark)
    base = pinned_rdd_count(spark)
    cs = CacheScope()
    try:
        bm25_topk_expression(docs, "fast join", k=2, scope=cs).collect()
    finally:
        cs.close()
        cs.close()  # idempotent
    assert pinned_rdd_count(spark) == base
