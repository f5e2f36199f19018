"""NRT composed search (search/nrt.py): packed base index ∪ unindexed
tail must be RANK-IDENTICAL to a full single-index rebuild over base∪tail
— the Lucene NRT-reader contract.

Equivalences pinned here:
- exact identity with the expression path over the whole corpus at 10%,
  50% tail splits (fixture corpus) and on synthetic corpora;
- empty tail ≡ plain packed search; empty query ≡ empty result;
- a term that exists ONLY in the tail (absent from the base dictionary)
  still contributes its df and gets scored;
- avgdl DRIFT in both directions: a tail of much longer docs grows the
  combined avgdl past the pack-time one (the impact_slack bound must keep
  WAND pruning exact — prune=True ≡ prune=False ≡ expression), a shorter
  tail shrinks it (slack stays 1);
- tombstoned base docs are excluded under Lucene stale-stats semantics;
- result is invariant under tail repartitioning;
- DuckDB oracle parity for the registry key (the driver's exact check).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from fastmorph_spark import registry
from fastmorph_spark.index.io import build_index_frames
from fastmorph_spark.search.bm25 import bm25_topk_expression
from fastmorph_spark.search.nrt import search_nrt
from fastmorph_spark.sources import read_documents
from tests.conftest import SF0001, assert_frames_match, register_views

Q = "fast hash join"


def _index_over(docs, **kw):
    idx = build_index_frames(docs, doc_shard_size=kw.pop("doc_shard_size", 100),
                             block_size=kw.pop("block_size", 16), **kw)
    idx.postings = idx.postings.persist()
    idx.dictionary = idx.dictionary.persist()
    return idx


def _rows(df):
    return [tuple(r) for r in df.collect()]


@pytest.fixture(scope="module")
def fixture_docs(spark):
    return read_documents(spark, SF0001).persist()


@pytest.mark.parametrize("mod,rem", [(10, 7), (2, 0)])
def test_rank_identity_fixture_splits(spark, fixture_docs, mod, rem):
    base = fixture_docs.filter(F.col("doc_id") % mod != rem)
    tail = fixture_docs.filter(F.col("doc_id") % mod == rem)
    idx = _index_over(base)
    got = _rows(search_nrt(idx, tail, Q, k=10, round_score=True))
    want = _rows(bm25_topk_expression(fixture_docs, Q, k=10, round_score=True))
    assert got == want


def test_empty_tail_equals_packed(spark, fixture_docs):
    idx = _index_over(fixture_docs)
    tail = fixture_docs.filter(F.lit(False))
    got = _rows(search_nrt(idx, tail, Q, k=10, round_score=True))
    want = _rows(bm25_topk_expression(fixture_docs, Q, k=10, round_score=True))
    assert got == want


def test_empty_query_and_no_matches(spark, fixture_docs):
    idx = _index_over(fixture_docs.limit(50))
    tail = fixture_docs.filter(F.lit(False))
    assert search_nrt(idx, tail, "", k=10).count() == 0
    assert search_nrt(idx, tail, "zzzzqqqq", k=10).count() == 0


def test_tail_only_term_scored(spark):
    # "zebra" never appears in the base -> no dictionary row, df comes
    # entirely from the tail; the query still matches tail docs and the
    # composition equals the full rebuild
    base_rows = [(i, f"alpha beta doc{i} common words here") for i in range(40)]
    tail_rows = [(100 + i, f"zebra common alpha word{i}") for i in range(5)]
    full = spark.createDataFrame(base_rows + tail_rows, "doc_id long, text string")
    base = spark.createDataFrame(base_rows, "doc_id long, text string")
    tail = spark.createDataFrame(tail_rows, "doc_id long, text string")
    idx = _index_over(base)
    got = _rows(search_nrt(idx, tail, "zebra alpha", k=10, round_score=True))
    want = _rows(bm25_topk_expression(full, "zebra alpha", k=10, round_score=True))
    assert got == want
    assert any(d >= 100 for _, d, _ in got)  # tail docs actually surface


@pytest.mark.parametrize("tail_word_reps", [60, 1])  # avgdl grows / shrinks
def test_avgdl_drift_prune_exact(spark, tail_word_reps):
    # long tail: combined avgdl ≈ 3x the pack-time one -> impact_slack > 1
    # must keep Block-Max pruning EXACT (prune on ≡ prune off ≡ expression);
    # one-word tail: avgdl shrinks -> slack stays 1 (the other branch)
    base_rows = [(i, f"alpha beta gamma doc{i}") for i in range(60)]
    filler = " ".join(f"pad{j}" for j in range(tail_word_reps))
    tail_rows = [(200 + i, f"alpha {filler}") for i in range(20)]
    full = spark.createDataFrame(base_rows + tail_rows, "doc_id long, text string")
    base = spark.createDataFrame(base_rows, "doc_id long, text string")
    tail = spark.createDataFrame(tail_rows, "doc_id long, text string")
    idx = _index_over(base, block_size=8)
    pruned = _rows(search_nrt(idx, tail, "alpha gamma", k=10, round_score=True))
    unpruned = _rows(search_nrt(idx, tail, "alpha gamma", k=10,
                                round_score=True, prune=False))
    want = _rows(bm25_topk_expression(full, "alpha gamma", k=10, round_score=True))
    assert pruned == unpruned == want


def test_tombstones_stale_stats(spark, fixture_docs, tmp_path):
    # Lucene delete semantics through the NRT composition: the deleted
    # base doc vanishes; everyone else keeps PRE-delete scores, i.e. the
    # full-corpus ranking minus the deleted doc, re-cut to k
    from fastmorph_spark.index.io import read_index, write_index
    from fastmorph_spark.index.tombstones import delete_docs

    mod, rem = 10, 7
    base = fixture_docs.filter(F.col("doc_id") % mod != rem)
    tail = fixture_docs.filter(F.col("doc_id") % mod == rem)
    full_rank = _rows(bm25_topk_expression(fixture_docs, Q, k=20, round_score=True))
    victim = next(d for _, d, _ in full_rank if d % mod != rem)

    out = str(tmp_path / "idx")
    write_index(spark, base, out, doc_shard_size=100, block_size=16)
    delete_docs(spark, out, [victim])
    idx = read_index(spark, out)
    got = _rows(search_nrt(idx, tail, Q, k=10, round_score=True))
    survivors = [(d, s) for _, d, s in full_rank if d != victim][:10]
    assert [(d, s) for _, d, s in got] == survivors


def test_tail_repartition_deterministic(spark, fixture_docs):
    base = fixture_docs.filter(F.col("doc_id") % 10 != 7)
    tail = fixture_docs.filter(F.col("doc_id") % 10 == 7)
    idx = _index_over(base)
    a = _rows(search_nrt(idx, tail, Q, k=10, round_score=True))
    b = _rows(search_nrt(idx, tail.repartition(7), Q, k=10, round_score=True))
    assert a == b


def test_registry_oracle_parity(spark):
    con = duckdb.connect()
    register_views(con, SF0001)
    assert_frames_match(
        registry.queries()["bm25_topk_nrt"](spark, SF0001),
        con.execute(registry.oracle_sqls()["bm25_topk_nrt"]),
    )
