"""Fuzzy (edit-distance) SLOTS inside multi-slot token patterns — corpus
path, packed path, and the DuckDB oracle must agree on the typo-bearing
fixture corpus."""

from __future__ import annotations

import pytest

from fastmorph_spark import oracles
from fastmorph_spark.index import build_dictionary, build_postings
from fastmorph_spark.search import engine
from fastmorph_spark.search.fuzzy import FUZZY_TEXT_SQL, fuzzy_text_col
from fastmorph_spark.sources import read_documents
from tests.conftest import SF0001, assert_frames_match, register_views

FUZZY_SLOTS = [{"fuzzy": "fasst", "dist": 1}, {"pattern": "h*"}]
FUZZY_DISTS = [(1, 4)]


@pytest.fixture(scope="module")
def duck1(duck):
    register_views(duck, SF0001)
    return duck


@pytest.fixture(scope="module")
def tables(spark):
    docs = read_documents(spark, SF0001).select(
        "doc_id", fuzzy_text_col().alias("text"))
    postings = build_postings(docs).cache()
    dictionary = build_dictionary(postings).cache()
    return docs, postings, dictionary


def test_fuzzy_slot_matches_oracle(spark, tables, duck1):
    _, postings, dictionary = tables
    got = engine.slot_search(postings, dictionary, FUZZY_SLOTS, FUZZY_DISTS)
    sql = oracles.slot_search_sql(FUZZY_SLOTS, FUZZY_DISTS,
                                  text_expr=FUZZY_TEXT_SQL)
    assert_frames_match(got, duck1.sql(sql))
    assert got.count() > 0, "fuzzy slot must be non-vacuous on the fixture"


def test_fuzzy_slot_covers_all_variants(spark, tables):
    """The dist-1 neighborhood of 'fasst' is {fasst, fast} (NOT fst,
    which is 2 edits away) — the slot must match exactly the union of
    the equivalent exact-term slot queries."""
    _, postings, dictionary = tables
    got = {r["doc_id"]: r["match_starts"] for r in
           engine.slot_search(postings, dictionary,
                              FUZZY_SLOTS, FUZZY_DISTS).collect()}
    union: dict[int, set] = {}
    for t in ("fasst", "fast"):
        rows = engine.slot_search(postings, dictionary,
                                  [{"term": t}, {"pattern": "h*"}],
                                  FUZZY_DISTS).collect()
        for r in rows:
            union.setdefault(r["doc_id"], set()).update(
                r["match_starts"].split(","))
    assert {d: set(s.split(",")) for d, s in got.items()} == union


def test_fuzzy_slot_direct_predicate_mode(spark, tables):
    """D=None (the packed predicate-direct regime) must agree with the
    dictionary-first expansion."""
    _, postings, dictionary = tables
    a = engine.slot_search(postings, dictionary,
                           FUZZY_SLOTS, FUZZY_DISTS).collect()
    b = engine.slot_search(postings, None,
                           FUZZY_SLOTS, FUZZY_DISTS).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_fuzzy_slot_packed_parity(spark, tables, tmp_path):
    """Index-backed fuzzy slots: write the index, query through the
    packed path, compare with the corpus path."""
    from fastmorph_spark.index.io import read_index, write_index
    from fastmorph_spark.search.packed import packed_slot_search

    docs, postings, dictionary = tables
    path = str(tmp_path / "fuzzy_idx")
    write_index(spark, docs, path)
    idx = read_index(spark, path)
    a = engine.slot_search(postings, dictionary,
                           FUZZY_SLOTS, FUZZY_DISTS).collect()
    b = packed_slot_search(idx, FUZZY_SLOTS, FUZZY_DISTS).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_fuzzy_slot_rejects_case(spark, tables):
    _, postings, dictionary = tables
    with pytest.raises(ValueError):
        engine.slot_search(postings, dictionary,
                           [{"fuzzy": "fast", "case": True}], [])
