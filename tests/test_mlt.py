"""More-like-this (search/mlt.py): pinned semantics vs a brute-force
Python oracle, DuckDB oracle parity (the driver's exact compare), packed
twin ≡ corpus path, and edge cases (source excluded, empty source)."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from fastmorph_spark import registry
from fastmorph_spark.constants import BM25_B, BM25_K1
from fastmorph_spark.index.io import build_index_frames
from fastmorph_spark.search.mlt import more_like_this, more_like_this_packed
from fastmorph_spark.sources import read_documents
from fastmorph_spark.tokenize import tokenize_py
from tests.conftest import SF0001, assert_frames_match, register_views
from tests.oracle_bm25 import load_documents

SRC, M, K = registry.MLT_SRC_DOC, registry.MLT_M, registry.MLT_K


def _python_mlt(docs: dict[int, str], src: int, m: int, k: int):
    """Exhaustive mirror of the pinned semantics: doc_keywords' tfidf
    term cut, then the canonical BM25 disjunction, source excluded."""
    tf = {d: Counter(tokenize_py(t)) for d, t in docs.items()}
    n = len(docs)
    dl = {d: sum(c.values()) for d, c in tf.items()}
    avgdl = sum(dl.values()) / n
    df: Counter = Counter()
    for c in tf.values():
        df.update(c.keys())
    src_terms = sorted(
        ((tfv * math.log((n + 1.0) / (df[t] + 1.0)), t)
         for t, tfv in tf[src].items()),
        key=lambda x: (-x[0], x[1]),
    )
    qterms = sorted(t for _, t in src_terms[:m])
    scores: dict[int, float] = {}
    for d, c in tf.items():
        if d == src:
            continue
        s = 0.0
        hit = False
        for t in qterms:  # sorted-term left fold (A5 discipline)
            if t not in c:
                continue
            hit = True
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            tfd = float(c[t])
            s += idf * (tfd * (BM25_K1 + 1.0)
                        / (tfd + BM25_K1 * (1.0 - BM25_B + BM25_B * dl[d] / avgdl)))
        if hit:
            scores[d] = s
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(i + 1, d, round(s, 6)) for i, (d, s) in enumerate(top)]


@pytest.fixture(scope="module")
def fixture_docs(spark):
    return read_documents(spark, SF0001)


def test_python_oracle_parity(spark, fixture_docs):
    got = [(r["rank"], r["doc_id"], r["score"])
           for r in more_like_this(fixture_docs, SRC, m=M, k=K).collect()]
    want = _python_mlt(load_documents(SF0001), SRC, M, K)
    assert got == want


def test_duckdb_parity(spark, duck, fixture_docs):
    register_views(duck, SF0001)
    assert_frames_match(
        registry.q_more_like_this(spark, SF0001),
        duck.sql(registry.oracle_sqls()["more_like_this"]),
    )


def test_packed_twin_identical(spark, fixture_docs):
    idx = build_index_frames(fixture_docs, doc_shard_size=100, block_size=16)
    corpus = more_like_this(fixture_docs, SRC, m=M, k=K).collect()
    packed = more_like_this_packed(idx, fixture_docs, SRC, m=M, k=K).collect()
    assert [tuple(r) for r in packed] == [tuple(r) for r in corpus]


def test_packed_respects_tombstones(spark, fixture_docs):
    """A tombstoned doc vanishes from the similar-docs list (pre-purge
    Lucene delete semantics): remaining results keep their relative
    order and ranks stay dense."""
    import dataclasses

    from pyspark.sql import functions as F

    idx = build_index_frames(fixture_docs, doc_shard_size=100, block_size=16)
    base = more_like_this_packed(idx, fixture_docs, SRC, m=M, k=K).collect()
    victim = base[0]["doc_id"]
    tomb = fixture_docs.select("doc_id").filter(F.col("doc_id") == victim)
    got = more_like_this_packed(dataclasses.replace(idx, tombstones=tomb),
                                fixture_docs, SRC, m=M, k=K).collect()
    assert all(r["doc_id"] != victim for r in got)
    survivors = [r["doc_id"] for r in base if r["doc_id"] != victim]
    # the first k-1 survivors must reappear in order with dense ranks
    assert [r["doc_id"] for r in got][:len(survivors)] == survivors
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))


def test_source_doc_excluded(spark, fixture_docs):
    rows = more_like_this(fixture_docs, SRC, m=M, k=K).collect()
    assert rows, "fixture source doc must have neighbours"
    assert all(r["doc_id"] != SRC for r in rows)
    # ranks are 1..n dense and scores non-increasing
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_empty_source_doc(spark):
    docs = spark.createDataFrame(
        [(0, ""), (1, "alpha beta"), (2, "beta gamma")],
        "doc_id long, text string",
    )
    assert more_like_this(docs, 0, m=M, k=K).count() == 0


def test_m_bounds_query(spark):
    """m=1 keeps only the single strongest source term: every returned
    neighbour must actually contain it."""
    docs = spark.createDataFrame(
        [(0, "zeta zeta common"), (1, "zeta common"), (2, "common only"),
         (3, "nothing shared")],
        "doc_id long, text string",
    )
    rows = more_like_this(docs, 0, m=1, k=10).collect()
    assert {r["doc_id"] for r in rows} == {1}
