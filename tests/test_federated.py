"""Federated sharded search (search/federated.py): scatter-gather BM25
over a doc-disjoint shard fleet must be RANK-IDENTICAL to one global
index — the exact distributed-IDF (dfs_query_then_fetch) contract.

Equivalences pinned here:
- per-lang fleet ≡ expression path over the full corpus (the registry
  key's exact shape, incl. the DuckDB oracle parity check);
- modular 3-way split ≡ single-index WAND at FULL float precision (no
  rounding — the fold/stat recombination must be bit-identical);
- degenerate single-shard fleet ≡ plain search_wand;
- prune=True ≡ prune=False under foreign (combined) stats — the
  block-max bounds stay exact when a shard's pack-time avgdl differs
  from the combined one in either direction;
- a term missing from some shards' dictionaries still gets the right
  combined df;
- per-shard tombstones are masked in the fan-out;
- empty query and no-hit query return empty.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from fastmorph_spark import registry
from fastmorph_spark.index.io import build_index_frames
from fastmorph_spark.search.bm25 import bm25_topk_expression
from fastmorph_spark.search.federated import search_federated
from fastmorph_spark.search.wand import search_wand
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


@pytest.fixture(scope="module")
def lang_fleet(spark, fixture_docs):
    langs = sorted(r[0] for r in fixture_docs.select("lang").distinct().collect())
    assert len(langs) >= 2  # the fleet must be a real fan-out
    return [_index_over(fixture_docs.filter(F.col("lang") == lang)) for lang in langs]


@pytest.fixture(scope="module")
def mod3_fleet(spark, fixture_docs):
    return [_index_over(fixture_docs.filter(F.col("doc_id") % 3 == r)) for r in range(3)]


def test_lang_fleet_matches_expression(spark, fixture_docs, lang_fleet):
    got = _rows(search_federated(lang_fleet, Q, k=10, round_score=True))
    want = _rows(bm25_topk_expression(fixture_docs, Q, k=10, round_score=True))
    assert got == want


def test_mod3_fleet_full_precision(spark, fixture_docs, mod3_fleet):
    """No rounding: stat recombination + the sorted-term left fold must be
    float64-bit-identical to the single-index kernel."""
    single = _index_over(fixture_docs)
    got = _rows(search_federated(mod3_fleet, Q, k=10))
    want = _rows(search_wand(single, Q, k=10))
    assert got == want


def test_single_shard_degenerates_to_wand(spark, fixture_docs):
    idx = _index_over(fixture_docs)
    got = _rows(search_federated([idx], Q, k=10))
    want = _rows(search_wand(idx, Q, k=10))
    assert got == want


def test_prune_identity_under_combined_stats(spark, mod3_fleet):
    """Combined avgdl differs from every shard's pack-time avgdl — the
    impact-slack bound must keep pruning exact in both directions."""
    got = _rows(search_federated(mod3_fleet, Q, k=10, prune=True))
    want = _rows(search_federated(mod3_fleet, Q, k=10, prune=False))
    assert got == want


def test_term_missing_from_some_shards(spark, fixture_docs, lang_fleet):
    """A rarer multi-term query where not every shard holds every term:
    combined df must sum only over the shards that do."""
    q = "varbyte compression dictionary"
    got = _rows(search_federated(lang_fleet, q, k=10, round_score=True))
    want = _rows(bm25_topk_expression(fixture_docs, q, k=10, round_score=True))
    assert got == want


def test_shard_tombstones_masked(spark, mod3_fleet):
    """Deleting docs in ONE shard excludes them from the federated top-k
    (Lucene stale-stats delete semantics, per shard — the kernel mask
    runs inside each shard's own fan-out leg)."""
    import dataclasses

    victims = [int(r["doc_id"])
               for r in search_federated(mod3_fleet, Q, k=5).collect()][:2]
    assert victims
    by_shard: dict[int, list[int]] = {}
    for d in victims:
        by_shard.setdefault(d % 3, []).append(d)
    fleet = list(mod3_fleet)
    for s, ds in by_shard.items():
        fleet[s] = dataclasses.replace(
            fleet[s],
            tombstones=spark.createDataFrame([(d,) for d in ds], "doc_id long"))
    after = {int(r["doc_id"])
             for r in search_federated(fleet, Q, k=10).collect()}
    assert not (after & set(victims))


def test_empty_query_and_no_hits(spark, lang_fleet):
    assert search_federated(lang_fleet, "", k=10).count() == 0
    assert search_federated(lang_fleet, "zzqqxx notaword", k=10).count() == 0


def test_registry_oracle_parity(spark):
    """The driver's exact check: the registry key vs the full-corpus
    DuckDB BM25 oracle at sf0.001."""
    got = registry.queries()["bm25_topk_federated"](spark, SF0001)
    con = duckdb.connect()
    register_views(con, SF0001)
    want = con.sql(registry.oracle_sqls()["bm25_topk_federated"])
    assert_frames_match(got, want)
