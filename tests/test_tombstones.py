"""Tombstone deletes (index/tombstones.py): immediate exclusion on every
packed query path with pre-delete stats, then exact stats + physical
removal at purge — the Lucene delete model over the block layout.

Equivalences pinned here:
- WAND after delete ≡ full ranking under ORIGINAL stats minus deleted,
  re-cut to k (stale-stats semantics are part of the contract).
- slot/phrase after delete ≡ brute-force matches minus deleted (no stats
  involved — exact).
- after purge: rank-identical to a FRESH build over the surviving corpus
  (stats exact again), tombstones gone, only affected shards repacked.
"""

from __future__ import annotations

import math

import pytest

from fastmorph_spark.index.io import read_index, write_index
from fastmorph_spark.index.tombstones import (
    delete_docs,
    purge_tombstones,
    read_tombstones,
)
from fastmorph_spark.search.packed import packed_phrase_search, packed_slot_search
from fastmorph_spark.search.wand import search_wand
from fastmorph_spark.sources import read_documents
from tests.conftest import SF0001
from tests.oracle_bm25 import OracleIndex, load_documents

SHARD = 100
BLOCK = 16
# deletes confined to shard 1 (doc_ids 100..199) so purge's
# affected-shard accounting is observable
DELETED = [101, 105, 150, 199]


@pytest.fixture(scope="module")
def deleted_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tomb") / "idx")
    docs = read_documents(spark, SF0001)
    write_index(spark, docs, out, doc_shard_size=SHARD, block_size=BLOCK)
    delete_docs(spark, out, DELETED)
    return out, read_index(spark, out)


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex(load_documents(SF0001))


def _stale_topk(oracle, q, k):
    """Full ranking under ORIGINAL stats, deleted dropped, cut to k."""
    full = oracle.topk(q, k=oracle.n_docs)
    dead = set(DELETED)
    return [(d, s) for d, s in full if d not in dead][:k]


QUERIES = ["fast hash join", "dup", "the", "merge sort scan key order"]


@pytest.mark.parametrize("q", QUERIES)
def test_wand_excludes_deleted_stale_stats(deleted_index, oracle, q):
    _, idx = deleted_index
    assert idx.tombstones is not None
    got = search_wand(idx, q, k=10).collect()
    assert not {r["doc_id"] for r in got} & set(DELETED)
    exp = _stale_topk(oracle, q, 10)
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert math.isclose(r["score"], s, rel_tol=1e-9)


def test_phrase_and_slots_exclude_deleted(deleted_index, oracle):
    _, idx = deleted_index
    phrase = "hash join"
    got = sorted(r["doc_id"] for r in packed_phrase_search(idx, phrase).collect())
    exp = [d for d in oracle.phrase_docs(phrase) if d not in set(DELETED)]
    assert got == sorted(exp)
    # wildcard slot goes through the grouped decode path
    rows = packed_slot_search(
        idx, [{"pattern": "ha*"}, {"term": "join"}], [(1, 1)]
    ).collect()
    assert not {r["doc_id"] for r in rows} & set(DELETED)


def test_delete_noops_and_read_shapes(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tomb_noop") / "idx")
    docs = read_documents(spark, SF0001)
    write_index(spark, docs, out, doc_shard_size=SHARD, block_size=BLOCK)
    assert read_tombstones(spark, out) is None
    assert delete_docs(spark, out, []) == {"n_requested": 0}
    assert read_tombstones(spark, out) is None
    # duplicate + never-indexed ids: read side dedups, purge intersects
    delete_docs(spark, out, [5, 5, 10**9])
    t = read_tombstones(spark, out)
    assert sorted(r["doc_id"] for r in t.collect()) == [5, 10**9]
    r = purge_tombstones(spark, out, doc_shard_size=SHARD, block_size=BLOCK)
    assert r["n_deleted"] == 1  # only doc 5 was in the index
    assert read_tombstones(spark, out) is None


def test_purge_restores_exact_stats_and_ranks(spark, tmp_path_factory, oracle):
    out = str(tmp_path_factory.mktemp("tomb_purge") / "idx")
    docs = read_documents(spark, SF0001)
    write_index(spark, docs, out, doc_shard_size=SHARD, block_size=BLOCK)
    n_before = read_index(spark, out).n_docs
    delete_docs(spark, out, DELETED)
    res = purge_tombstones(spark, out, doc_shard_size=SHARD, block_size=BLOCK)
    assert res["n_deleted"] == len(DELETED)
    assert res["n_docs"] == n_before - len(DELETED)
    # deletes were confined to one doc shard: most blocks pass through
    assert res["blocks_kept"] > 0 and res["blocks_repacked"] > 0

    idx = read_index(spark, out)
    assert idx.tombstones is None
    assert idx.n_docs == n_before - len(DELETED)
    # rank-identical (scores included) to a FRESH build on the survivors
    from pyspark.sql import functions as F

    survivors = docs.filter(~F.col("doc_id").isin(DELETED))
    fresh_out = str(tmp_path_factory.mktemp("tomb_fresh") / "idx")
    write_index(spark, survivors, fresh_out, doc_shard_size=SHARD, block_size=BLOCK)
    fresh = read_index(spark, fresh_out)
    for q in QUERIES:
        a = search_wand(idx, q, k=10).collect()
        b = search_wand(fresh, q, k=10).collect()
        assert [(r["doc_id"], r["score"]) for r in a] == \
               [(r["doc_id"], r["score"]) for r in b], q
    # dictionary df no longer counts deleted docs
    surviving_docs = {d: t for d, t in load_documents(SF0001).items()
                      if d not in set(DELETED)}
    o2 = OracleIndex(surviving_docs)
    df_the = idx.dictionary.filter(F.col("term") == "the").collect()
    assert df_the and df_the[0]["df"] == len(o2.postings["the"])
    # re-deleting already-purged ids then purging again is a no-op
    delete_docs(spark, out, DELETED)
    res2 = purge_tombstones(spark, out, doc_shard_size=SHARD, block_size=BLOCK)
    assert res2["n_deleted"] == 0
    assert read_tombstones(spark, out) is None
    got = [r["doc_id"] for r in search_wand(read_index(spark, out), "the", 10).collect()]
    assert got == [r["doc_id"] for r in search_wand(fresh, "the", 10).collect()]


def test_purge_preserves_cs_twin(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tomb_cs") / "idx")
    docs = read_documents(spark, SF0001)
    write_index(spark, docs, out, doc_shard_size=SHARD, block_size=BLOCK,
                case_sensitive=True)
    # a case-sensitive slot must honor deletes pre-purge...
    delete_docs(spark, out, DELETED)
    idx = read_index(spark, out)
    assert idx.postings_cs is not None and idx.tombstones is not None
    rows = packed_slot_search(idx, [{"term": "the", "case": True}], []).collect()
    assert rows and not {r["doc_id"] for r in rows} & set(DELETED)
    pre = sorted(r["doc_id"] for r in rows)
    # ...and purge must rewrite BOTH twins consistently
    purge_tombstones(spark, out, doc_shard_size=SHARD, block_size=BLOCK)
    idx2 = read_index(spark, out)
    assert idx2.postings_cs is not None and idx2.tombstones is None
    post = sorted(
        r["doc_id"] for r in
        packed_slot_search(idx2, [{"term": "the", "case": True}], []).collect()
    )
    assert post == pre


def test_purge_keeps_streamed_index_consistent(spark, tmp_path_factory):
    """Streamed-index interplay: purge must rewrite the logical batch log
    and patch the finalize-state counters, or (a) a later FULL repack
    resurrects deleted docs from the log and (b) the next incremental
    append adds its counters to pre-purge n_docs/sum_dl (wrong avgdl)."""
    from fastmorph_spark.streaming import finalize_from_logical, stream_ingest
    from fastmorph_spark.streaming.incremental import _read_finalize_state
    from tests.test_incremental_finalize import _drain, _mkdocs, _rows

    base = tmp_path_factory.mktemp("tomb_stream")
    src, out, ckpt = str(base / "src"), str(base / "idx"), str(base / "ckpt")
    _drain(spark, src, out, ckpt, _mkdocs(spark, _rows(range(0, 200), 8)))
    finalize_from_logical(spark, out, doc_shard_size=100, block_size=16)

    dead = [10, 55, 110]
    delete_docs(spark, out, dead)
    purge_tombstones(spark, out, doc_shard_size=100, block_size=16)
    st = _read_finalize_state(out)
    assert st["n_docs"] == 197
    log_ids = {r["doc_id"] for r in spark.read.parquet(
        f"{out}/postings_logical_stream").select("doc_id").distinct().collect()}
    assert not log_ids & set(dead)

    # next drain takes the APPEND path with exact post-purge counters...
    _drain(spark, src, out, ckpt, _mkdocs(spark, _rows(range(200, 260), 8)))
    r = finalize_from_logical(spark, out, doc_shard_size=100, block_size=16)
    assert r["mode"] == "append"
    idx = read_index(spark, out)
    assert idx.n_docs == 257 and idx.tombstones is None
    # ...and a forced FULL repack does NOT resurrect deleted docs
    r2 = finalize_from_logical(spark, out, doc_shard_size=100,
                               block_size=16, incremental=False)
    assert r2["mode"] == "repack"
    idx2 = read_index(spark, out)
    assert idx2.n_docs == 257
    alive = {d: t for d, t, _ in _rows(range(0, 200), 8) + _rows(range(200, 260), 8)
             if d not in set(dead)}
    oracle = OracleIndex(alive)
    got = [r["doc_id"] for r in search_wand(idx2, "fast hash join", k=10).collect()]
    assert got == [d for d, _ in oracle.topk("fast hash join", 10)]


def test_tombstone_mask_is_broadcast_once(deleted_index, spark):
    """VERDICT r04 #2: the kernel-side mask ships as ONE sc.broadcast per
    Index (handle in the task closure, array transferred per executor),
    memoized across queries — never re-collected or re-broadcast."""
    import dataclasses

    from pyspark.broadcast import Broadcast

    from fastmorph_spark.index.tombstones import tombstone_broadcast

    _, idx = deleted_index
    idx2 = dataclasses.replace(idx)  # fresh memo fields
    idx2._tomb_ids = idx2._tomb_bc = None
    b1 = tombstone_broadcast(idx2)
    b2 = tombstone_broadcast(idx2)
    assert isinstance(b1, Broadcast) and b1 is b2
    assert list(b1.value) == sorted(DELETED)


def test_million_tombstones_broadcast_and_correct(spark, tmp_path_factory):
    """A 10^6-id live tombstone backlog: query results must equal the
    4-real-delete baseline (the extra ids never existed in the index) and
    the mask must travel as a broadcast, not a per-task closure payload."""
    import dataclasses

    import numpy as np
    from pyspark.broadcast import Broadcast

    from fastmorph_spark.index.tombstones import tombstone_broadcast

    out = str(tmp_path_factory.mktemp("tomb_big") / "idx")
    docs = read_documents(spark, SF0001)
    write_index(spark, docs, out, doc_shard_size=SHARD, block_size=BLOCK)
    # 10^6 ids: the 4 real deletes + ~10^6 ids outside the corpus range
    big = spark.range(10_000_000, 11_000_000).withColumnRenamed("id", "doc_id")
    delete_docs(spark, out, big)
    delete_docs(spark, out, DELETED)
    idx = read_index(spark, out)

    bc = tombstone_broadcast(idx)
    assert isinstance(bc, Broadcast)
    assert bc.value.dtype == np.int64 and bc.value.size == 1_000_000 + len(DELETED)

    got = [r["doc_id"] for r in search_wand(idx, "fast hash join", k=10).collect()]
    baseline_idx = dataclasses.replace(idx)
    baseline_idx.tombstones = spark.createDataFrame(
        [(d,) for d in DELETED], "doc_id long")
    baseline_idx._tomb_ids = baseline_idx._tomb_bc = None
    exp = [r["doc_id"] for r in search_wand(baseline_idx, "fast hash join", k=10).collect()]
    assert got == exp and not set(got) & set(DELETED)


def test_purge_file_scheme_path(spark, tmp_path):
    """VERDICT r04 #4: purge's journaled swap through the Hadoop FS API,
    exercised via an explicit file:// URI — same contract a remote FS
    presents. Deletes become physical, stats exact, tombstones cleared."""
    out = f"file://{tmp_path}/idx"
    docs = read_documents(spark, SF0001)
    write_index(spark, docs, out, doc_shard_size=SHARD, block_size=BLOCK)
    delete_docs(spark, out, DELETED)
    r = purge_tombstones(spark, out, doc_shard_size=SHARD, block_size=BLOCK)
    assert r["n_deleted"] == len(DELETED) and r["blocks_repacked"] > 0
    idx = read_index(spark, out)
    assert idx.tombstones is None
    assert idx.n_docs == 500 - len(DELETED)
    got = {x["doc_id"] for x in search_wand(idx, "fast hash join", k=10).collect()}
    assert got and not got & set(DELETED)
