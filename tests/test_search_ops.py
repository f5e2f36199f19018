"""M1 — fastmorph-semantics operators (AND/phrase/proximity/wildcard/
pagination) vs the pure-Python oracle, plus index path ≡ expression path."""

from __future__ import annotations

import re

import pytest

from fastmorph_spark.index import (
    build_dictionary,
    build_doc_lens,
    build_postings,
    global_stats,
)
from fastmorph_spark.search import engine
from fastmorph_spark.search.bm25 import bm25_topk_expression
from fastmorph_spark.sources import read_documents
from tests.conftest import SF0001
from tests.oracle_bm25 import OracleIndex, load_documents


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex(load_documents(SF0001))


@pytest.fixture(scope="module")
def tables(spark):
    docs = read_documents(spark, SF0001)
    postings = build_postings(docs).cache()
    doc_lens = build_doc_lens(docs, postings).cache()
    dictionary = build_dictionary(postings).cache()
    stats = global_stats(doc_lens)
    return docs, postings, dictionary, doc_lens, stats


def test_indexed_equals_expression(spark, tables):
    docs, postings, dictionary, doc_lens, stats = tables
    for q in ["fast hash join", "dup", "the", "zzz"]:
        a = bm25_topk_expression(docs, q, k=10).collect()
        b = engine.search_topk(postings, dictionary, doc_lens, stats, q, k=10).collect()
        assert [(r["rank"], r["doc_id"], r["score"]) for r in a] == \
               [(r["rank"], r["doc_id"], r["score"]) for r in b]


@pytest.mark.parametrize("q", ["fast hash join", "dup table", "zzz", "the"])
def test_and_search(tables, oracle, q):
    _, postings, *_ = tables
    got = [r["doc_id"] for r in engine.and_search(postings, q).orderBy("doc_id").collect()]
    assert got == oracle.and_docs(q)


@pytest.mark.parametrize("phrase", ["order fast", "the fast hash", "dup dup", "fast fast"])
def test_phrase_search(tables, oracle, phrase):
    _, postings, *_ = tables
    got = [r["doc_id"] for r in engine.phrase_search(postings, phrase).collect()]
    assert got == oracle.phrase_docs(phrase)


@pytest.mark.parametrize("t1,t2,d1,d2", [
    ("fast", "join", 1, 5),
    ("fast", "join", 1, 1),
    ("order", "fast", 0, 0),   # same position impossible -> empty
    ("hash", "hash", 1, 3),    # self-proximity
    ("fast", "join", -3, 3),   # negative distances (t2 before t1)
])
def test_proximity_search(tables, oracle, t1, t2, d1, d2):
    _, postings, *_ = tables
    got = [r["doc_id"] for r in engine.proximity_search(postings, t1, t2, d1, d2).collect()]
    assert got == oracle.proximity_docs(t1, t2, d1, d2)


def test_wildcard_terms(tables, oracle):
    _, postings, dictionary, *_ = tables
    got = {r["term"]: (r["df"], r["cf"]) for r in engine.wildcard_terms(dictionary, "s*").collect()}
    pat = re.compile(r"s[a-z0-9_]*$")
    exp = {
        t: (len(d), sum(len(v) for v in d.values()))
        for t, d in oracle.postings.items()
        if pat.match(t)
    }
    assert got == exp


def test_wildcard_docs(tables, oracle):
    _, postings, dictionary, *_ = tables
    got = [r["doc_id"] for r in engine.wildcard_docs(postings, dictionary, "gro?p").collect()]
    exp = sorted(set(oracle.postings.get("group", {})))
    assert got == exp


def test_pagination_window(tables, oracle, spark):
    """Ranks 11..20 == oracle top-20 minus top-10."""
    docs, postings, dictionary, doc_lens, stats = tables
    from pyspark.sql import functions as F

    from fastmorph_spark.search.bm25 import bm25_score_col

    q = "fast hash join"
    qterms = sorted(set(q.split()))
    matched = postings.filter(F.col("term").isin(qterms))
    scored = (
        matched.join(F.broadcast(dictionary.select("term", "df")), "term")
        .crossJoin(F.broadcast(stats))  # postings carry dl
        .withColumn("ts", bm25_score_col(F.col("tf"), F.col("df"), F.col("n_docs"), F.col("dl"), F.col("avgdl")))
        .groupBy("doc_id").agg(F.sum("ts").alias("score"))
    )
    got = engine.paginate(scored, 10, 20).collect()
    exp = oracle.topk(q, 20)[10:20]
    assert [(r["rank"], r["doc_id"]) for r in got] == [(i + 11, d) for i, (d, _) in enumerate(exp)]
