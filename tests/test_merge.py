"""Segment merge (index/merge.py): two packed indexes folded into one
with no corpus re-scan and no block repack — queries over the merged
Index must be indistinguishable from a full single build.

Pinned here:
- merged WAND ≡ full-build WAND at FULL float precision (the Σdl
  recovery + metadata dictionary rebuild must be bit-exact), prune ≡
  no-prune (min_pack_avgdl slack across two pack geometries);
- merged dictionary (df, cf) row-for-row equal to the full build's;
- merged stats: n_docs exact, avgdl bit-equal to the full build's avg;
- heterogeneous geometry: sides with different doc_shard_size AND
  block_size (forces shard-id collisions pre-namespacing — the
  regression shape that shadowed side A's blocks);
- positional paths over the merged index (phrase + wildcard slots)
  ≡ corpus paths;
- case-preserving twins merge (cs slot search ≡ corpus path);
- tombstones carried from one side mask in the merged fan-out;
- associativity: 3-way merge in either association ≡ full build;
- DuckDB oracle parity for both registry keys.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from fastmorph_spark import registry
from fastmorph_spark.index.io import build_index_frames
from fastmorph_spark.index.merge import merge_indexes
from fastmorph_spark.search import engine
from fastmorph_spark.search.packed import packed_phrase_search, packed_slot_search
from fastmorph_spark.search.wand import search_wand
from fastmorph_spark.sources import read_documents
from tests.conftest import SF0001, assert_frames_match, register_views

Q = "fast hash join"
PHRASE = registry.PHRASE_QUERY
SLOTS, DISTS = registry.SLOT3_SLOTS, registry.SLOT3_DISTS


def _index_over(docs, shard=100, block=16, **kw):
    idx = build_index_frames(docs, doc_shard_size=shard, block_size=block, **kw)
    idx.postings = idx.postings.persist()
    idx.dictionary = idx.dictionary.persist()
    return idx


def _rows(df):
    return [tuple(r) for r in df.collect()]


@pytest.fixture(scope="module")
def fixture_docs(spark):
    return read_documents(spark, SF0001).persist()


@pytest.fixture(scope="module")
def full_index(spark, fixture_docs):
    return _index_over(fixture_docs)


@pytest.fixture(scope="module")
def merged(spark, fixture_docs):
    # deliberately colliding, heterogeneous geometry: side A packs all
    # its docs into few shards, side B into different-sized ones
    a = _index_over(fixture_docs.filter(F.col("doc_id") % 2 == 0),
                    shard=100, block=16)
    b = _index_over(fixture_docs.filter(F.col("doc_id") % 2 == 1),
                    shard=70, block=8)
    return merge_indexes(a, b)


def test_wand_full_precision(spark, fixture_docs, full_index, merged):
    want = _rows(search_wand(full_index, Q, k=10))
    assert _rows(search_wand(merged, Q, k=10)) == want
    assert _rows(search_wand(merged, Q, k=10, prune=False)) == want


def test_dictionary_exact(spark, full_index, merged):
    want = {r["term"]: (r["df"], r["cf"])
            for r in full_index.dictionary.collect()}
    got = {r["term"]: (r["df"], r["cf"])
           for r in merged.dictionary.collect()}
    assert got == want


def test_stats_bit_equal(spark, full_index, merged):
    w = full_index.stats_row()
    g = merged.stats_row()
    assert g["n_docs"] == w["n_docs"]
    assert g["avgdl"] == w["avgdl"]  # bit-equal float64, not approx


def test_positional_paths(spark, fixture_docs, full_index, merged):
    assert (_rows(packed_phrase_search(merged, PHRASE))
            == _rows(packed_phrase_search(full_index, PHRASE)))
    assert (_rows(packed_slot_search(merged, SLOTS, DISTS))
            == _rows(packed_slot_search(full_index, SLOTS, DISTS)))


def test_cs_twin_merge(spark, fixture_docs):
    a = _index_over(fixture_docs.filter(F.col("doc_id") % 2 == 0),
                    shard=100, block=16, case_sensitive=True)
    b = _index_over(fixture_docs.filter(F.col("doc_id") % 2 == 1),
                    shard=70, block=8, case_sensitive=True)
    m = merge_indexes(a, b)
    full = _index_over(fixture_docs, case_sensitive=True)
    slots = [{"term": "the", "case": True}, {"pattern": "h*"}]
    dists = [(1, 5)]
    assert (_rows(packed_slot_search(m, slots, dists))
            == _rows(packed_slot_search(full, slots, dists)))


def test_tombstones_carried(spark, merged):
    import dataclasses

    victims = [int(r["doc_id"])
               for r in search_wand(merged, Q, k=3).collect()][:2]
    assert victims
    # re-merge with one side tombstoned: pick the side by parity
    evens = [d for d in victims if d % 2 == 0]
    odds = [d for d in victims if d % 2 == 1]
    tomb = spark.createDataFrame([(d,) for d in victims], "doc_id long")
    m2 = dataclasses.replace(merged, tombstones=tomb)
    after = {int(r["doc_id"]) for r in search_wand(m2, Q, k=10).collect()}
    assert not (after & set(victims)) and (evens or odds)


def test_three_way_associative(spark, fixture_docs, full_index):
    parts = [_index_over(fixture_docs.filter(F.col("doc_id") % 3 == r),
                         shard=50 + 30 * r, block=8 + 4 * r)
             for r in range(3)]
    want = _rows(search_wand(full_index, Q, k=10))
    left = merge_indexes(merge_indexes(parts[0], parts[1]), parts[2])
    right = merge_indexes(parts[0], merge_indexes(parts[1], parts[2]))
    assert _rows(search_wand(left, Q, k=10)) == want
    assert _rows(search_wand(right, Q, k=10)) == want


def test_registry_oracle_parity(spark):
    con = duckdb.connect()
    register_views(con, SF0001)
    for key in ("bm25_topk_merged", "phrase_search_merged"):
        got = registry.queries()[key](spark, SF0001)
        want = con.sql(registry.oracle_sqls()[key])
        assert_frames_match(got, want)
