"""Synonym query expansion (search/expand.py): expansion-set pinning,
recall behavior on a synthetic synonym corpus, DuckDB oracle parity,
n_expand=0 ≡ plain BM25, and the join/tokenize round-trip."""

from __future__ import annotations

import pytest

from fastmorph_spark import registry
from fastmorph_spark.search.bm25 import bm25_topk_expression
from fastmorph_spark.search.expand import expand_terms, expanded_bm25
from fastmorph_spark.search.thesaurus import thesaurus
from fastmorph_spark.sources import read_documents
from fastmorph_spark.tokenize import tokenize_py
from tests.conftest import SF0001, assert_frames_match, register_views


@pytest.fixture(scope="module")
def fixture_docs(spark):
    return read_documents(spark, SF0001)


def test_expansion_set_is_thesaurus_union(spark, fixture_docs):
    got = expand_terms(fixture_docs, registry.EXPAND_QUERY,
                       n_expand=registry.EXPAND_N,
                       window=registry.EXPAND_WINDOW,
                       min_shared=registry.EXPAND_MIN_SHARED)
    qterms = sorted(set(tokenize_py(registry.EXPAND_QUERY)))
    want = set(qterms)
    for t in qterms:
        rows = thesaurus(fixture_docs, t, window=registry.EXPAND_WINDOW,
                         min_shared=registry.EXPAND_MIN_SHARED,
                         k=registry.EXPAND_N).collect()
        want.update(r["term"] for r in rows)
    assert got == sorted(want)
    assert len(got) > len(qterms), "fixture corpus must actually expand"
    # the join/tokenize round-trip is lossless
    assert sorted(set(tokenize_py(" ".join(got)))) == got


def test_synonym_recall(spark):
    """A doc sharing NO query term but containing a distributional
    synonym becomes reachable only through expansion."""
    rows = [
        # 'car' and 'auto' share contexts -> thesaurus neighbors
        (0, "the red car drives on the road today"),
        (1, "the red auto drives on the road today"),
        (2, "a blue car parks near the road again"),
        (3, "a blue auto parks near the road again"),
        (4, "shiny auto engine runs well"),      # no 'car' anywhere
        (5, "nothing relevant in this text"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    plain = {r["doc_id"] for r in
             bm25_topk_expression(docs, "car engine", k=10).collect()}
    exp = {r["doc_id"] for r in
           expanded_bm25(docs, "car engine", n_expand=2, window=3,
                         min_shared=1, k=10).collect()}
    assert 4 in exp  # reachable via 'auto' (and engine), boosted by expansion
    assert exp >= plain


def test_duckdb_parity(spark, duck, fixture_docs):
    register_views(duck, SF0001)
    assert_frames_match(
        registry.q_bm25_expanded(spark, SF0001),
        duck.sql(registry.oracle_sqls()["bm25_expanded"]),
    )


def test_n_expand_zero_is_plain_bm25(spark, fixture_docs):
    a = [tuple(r) for r in
         expanded_bm25(fixture_docs, registry.EXPAND_QUERY, n_expand=0,
                       k=10).collect()]
    b = [tuple(r) for r in
         bm25_topk_expression(fixture_docs, registry.EXPAND_QUERY, k=10,
                              round_score=True).collect()]
    assert a == b


def test_empty_query(spark, fixture_docs):
    assert expand_terms(fixture_docs, "  ") == []
    assert expanded_bm25(fixture_docs, "  ").count() == 0
