"""Incremental packed finalize (VERDICT r03 #5): a second drain APPENDS
only the new batches' blocks — the first pass's parquet files are
byte-untouched — and queries stay rank-identical to a full repack, with
WAND exactness preserved via the min_pack_avgdl bound scaling."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fastmorph_spark.index.io import read_index
from fastmorph_spark.search.wand import search_wand
from fastmorph_spark.streaming import finalize_from_logical, stream_ingest
from tests.oracle_bm25 import OracleIndex


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _postings_files(out: str) -> dict[str, float]:
    files = {}
    for root, _, names in os.walk(f"{out}/postings"):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(root, n)
                files[p] = os.path.getmtime(p)
    return files


VOCAB = ["fast", "hash", "join", "scan", "sort", "merge", "the", "a",
         "order", "group", "filter", "window", "union", "select"]


def _rows(ids, words_per_doc):
    rng_words = []
    for d in ids:
        toks = [VOCAB[(d * 7 + j) % len(VOCAB)] for j in range(words_per_doc + d % 3)]
        rng_words.append((d, " ".join(toks), "en"))
    return rng_words


def _drain(spark, src, out, ckpt, docs):
    docs.coalesce(1).write.mode("append").parquet(src)
    q = stream_ingest(spark, src, out, ckpt)
    q.awaitTermination(120)


def test_second_drain_appends_only(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("inc")
    src, out, ckpt = str(base / "src"), str(base / "idx"), str(base / "ckpt")

    batch_a = _rows(range(0, 300), 8)
    batch_b = _rows(range(300, 450), 9)  # similar lengths: small drift

    _drain(spark, src, out, ckpt, _mkdocs(spark, batch_a))
    r1 = finalize_from_logical(spark, out, doc_shard_size=100, block_size=16)
    assert r1["mode"] == "repack"
    before = _postings_files(out)
    assert before

    _drain(spark, src, out, ckpt, _mkdocs(spark, batch_b))
    r2 = finalize_from_logical(spark, out, doc_shard_size=100, block_size=16)
    assert r2["mode"] == "append"

    after = _postings_files(out)
    # every first-pass file survives, unmodified (mtime equal) — the
    # drain touched ONLY new data
    for p, mt in before.items():
        assert p in after and after[p] == mt, p
    assert len(after) > len(before)

    # rank identity: the appended index == a from-scratch full repack,
    # and both == the pure-Python oracle over the combined corpus
    idx = read_index(spark, out)
    queries = ["fast hash join", "sort merge", "the", "group window"]
    got_append = {q: [(r["doc_id"], round(r["score"], 9))
                      for r in search_wand(idx, q, k=10).collect()]
                  for q in queries}
    oracle = OracleIndex({d: t for d, t, _ in batch_a + batch_b})
    for q in queries:
        assert [d for d, _ in got_append[q]] == \
            [d for d, _ in oracle.topk(q, 10)], q

    r3 = finalize_from_logical(spark, out, doc_shard_size=100, block_size=16,
                               incremental=False)
    assert r3["mode"] == "repack"
    idx2 = read_index(spark, out)
    for q in queries:
        assert [(r["doc_id"], round(r["score"], 9))
                for r in search_wand(idx2, q, k=10).collect()] == got_append[q], q


def test_noop_when_no_new_batches(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("inc_noop")
    src, out, ckpt = str(base / "src"), str(base / "idx"), str(base / "ckpt")
    _drain(spark, src, out, ckpt, _mkdocs(spark, _rows(range(0, 100), 6)))
    assert finalize_from_logical(spark, out, doc_shard_size=100,
                                 block_size=16)["mode"] == "repack"
    assert finalize_from_logical(spark, out, doc_shard_size=100,
                                 block_size=16)["mode"] == "noop"


def test_avgdl_drift_forces_repack(spark, tmp_path_factory):
    """When the new batch drags avgdl past the bound, the finalize falls
    back to a full repack (tight impacts beat loose scaled bounds)."""
    base = tmp_path_factory.mktemp("inc_drift")
    src, out, ckpt = str(base / "src"), str(base / "idx"), str(base / "ckpt")
    _drain(spark, src, out, ckpt, _mkdocs(spark, _rows(range(0, 100), 4)))
    finalize_from_logical(spark, out, doc_shard_size=100, block_size=16)
    # 100 docs of ~4 tokens, then 100 of ~40 -> avgdl roughly 5x
    _drain(spark, src, out, ckpt, _mkdocs(spark, _rows(range(100, 200), 40)))
    r = finalize_from_logical(spark, out, doc_shard_size=100, block_size=16)
    assert r["mode"] == "repack"
    idx = read_index(spark, out)
    oracle = OracleIndex({d: t for d, t, _ in _rows(range(0, 100), 4) + _rows(range(100, 200), 40)})
    got = [r["doc_id"] for r in search_wand(idx, "fast hash join", k=10).collect()]
    assert got == [d for d, _ in oracle.topk("fast hash join", 10)]


def test_non_monotone_ids_force_repack(spark, tmp_path_factory):
    """New doc_ids below the packed max would interleave block doc ranges
    (the WAND covering step assumes per-term disjoint blocks) — the
    finalize must detect it and repack."""
    base = tmp_path_factory.mktemp("inc_mono")
    src, out, ckpt = str(base / "src"), str(base / "idx"), str(base / "ckpt")
    _drain(spark, src, out, ckpt, _mkdocs(spark, _rows(range(1000, 1100), 8)))
    finalize_from_logical(spark, out, doc_shard_size=100, block_size=16)
    _drain(spark, src, out, ckpt, _mkdocs(spark, _rows(range(0, 50), 8)))
    r = finalize_from_logical(spark, out, doc_shard_size=100, block_size=16)
    assert r["mode"] == "repack"
    idx = read_index(spark, out)
    oracle = OracleIndex({d: t for d, t, _ in _rows(range(1000, 1100), 8) + _rows(range(0, 50), 8)})
    got = [r["doc_id"] for r in search_wand(idx, "fast hash", k=10).collect()]
    assert got == [d for d, _ in oracle.topk("fast hash", 10)]


def test_wand_slack_bounds_stay_exact_under_growth(spark, tmp_path_factory):
    """Append a batch whose docs are LONGER (avgdl grows, within bound):
    old blocks' stored impacts under-estimate at the new avgdl; the
    min_pack_avgdl slack must keep pruning exact (rank-identity vs the
    brute-force oracle AND vs prune=False)."""
    base = tmp_path_factory.mktemp("inc_slack")
    src, out, ckpt = str(base / "src"), str(base / "idx"), str(base / "ckpt")
    _drain(spark, src, out, ckpt, _mkdocs(spark, _rows(range(0, 200), 8)))
    finalize_from_logical(spark, out, doc_shard_size=100, block_size=16)
    _drain(spark, src, out, ckpt, _mkdocs(spark, _rows(range(200, 300), 9)))
    r = finalize_from_logical(spark, out, doc_shard_size=100, block_size=16)
    assert r["mode"] == "append"
    idx = read_index(spark, out)
    srow = idx.stats_row()
    assert srow["min_pack_avgdl"] is not None
    assert float(srow["avgdl"]) >= float(srow["min_pack_avgdl"])
    for q in ["fast hash join", "sort merge the"]:
        pruned = [(r["doc_id"], r["score"]) for r in search_wand(idx, q, k=10).collect()]
        full = [(r["doc_id"], r["score"])
                for r in search_wand(idx, q, k=10, prune=False).collect()]
        assert pruned == full, q


def test_streamed_cs_twin_serves_case_slots(spark, tmp_path_factory):
    """stream_ingest(case_sensitive=True) + incremental finalize pack the
    case-preserving twin: a {"case": True} slot over the streamed index
    matches the corpus-built engine path, the second drain only APPENDS
    to the cs layout, and read_index rediscovers both twins."""
    from fastmorph_spark.index.build import build_dictionary, build_postings
    from fastmorph_spark.search import engine
    from fastmorph_spark.search.packed import packed_slot_search

    base = tmp_path_factory.mktemp("inc_cs")
    src, out, ckpt = str(base / "src"), str(base / "idx"), str(base / "ckpt")

    def case_rows(ids, wpd):
        # every 3rd doc upper-cased (the slot_case_search convention)
        return [(d, t.upper() if d % 3 == 0 else t, lang)
                for d, t, lang in _rows(ids, wpd)]

    batch_a = case_rows(range(0, 200), 8)
    batch_b = case_rows(range(200, 300), 9)
    slots = [{"term": "FAST", "case": True}, {"pattern": "h*"}]
    dists = [(1, 4)]

    def drain(rows):
        _mkdocs(spark, rows).coalesce(1).write.mode("append").parquet(src)
        q = stream_ingest(spark, src, out, ckpt, case_sensitive=True)
        q.awaitTermination(120)

    drain(batch_a)
    assert finalize_from_logical(spark, out, doc_shard_size=100,
                                 block_size=16)["mode"] == "repack"
    idx1 = read_index(spark, out)
    assert idx1.postings_cs is not None

    def corpus_want(rows):
        docs = _mkdocs(spark, rows)
        p = build_postings(docs)
        d = build_dictionary(p)
        pc = build_postings(docs, fold_case=False)
        dc = build_dictionary(pc)
        return [tuple(r) for r in
                engine.slot_search(p, d, slots, dists,
                                   postings_cs=pc, dictionary_cs=dc).collect()]

    got1 = [tuple(r) for r in packed_slot_search(idx1, slots, dists).collect()]
    want1 = corpus_want(batch_a)
    assert got1 == want1 and len(got1) > 0

    import os as _os
    cs_files_before = {}
    for root, _, names in _os.walk(f"{out}/postings_cs"):
        for n in names:
            if n.endswith(".parquet"):
                p = _os.path.join(root, n)
                cs_files_before[p] = _os.path.getmtime(p)

    drain(batch_b)
    assert finalize_from_logical(spark, out, doc_shard_size=100,
                                 block_size=16)["mode"] == "append"
    for p, mt in cs_files_before.items():
        assert _os.path.getmtime(p) == mt, p  # cs first-pass files untouched

    idx2 = read_index(spark, out)
    got2 = [tuple(r) for r in packed_slot_search(idx2, slots, dists).collect()]
    want2 = corpus_want(batch_a + batch_b)
    assert got2 == want2 and len(got2) > len(got1)


def test_compact_then_keep_draining(spark, tmp_path_factory):
    """The long-lived streamed-index lifecycle: drain, drain (append),
    COMPACT the accumulated small files (both twins), then drain again —
    compaction must shrink file counts without changing any result, and
    the post-compaction drain must still append-only."""
    from fastmorph_spark.index.io import compact_postings
    from fastmorph_spark.search.packed import packed_slot_search

    base = tmp_path_factory.mktemp("inc_compact")
    src, out, ckpt = str(base / "src"), str(base / "idx"), str(base / "ckpt")

    def case_rows(ids, wpd):
        return [(d, t.upper() if d % 3 == 0 else t, lang)
                for d, t, lang in _rows(ids, wpd)]

    def drain(rows):
        _mkdocs(spark, rows).coalesce(1).write.mode("append").parquet(src)
        q = stream_ingest(spark, src, out, ckpt, case_sensitive=True)
        q.awaitTermination(120)

    drain(case_rows(range(0, 200), 8))
    finalize_from_logical(spark, out, doc_shard_size=100, block_size=16)
    drain(case_rows(range(200, 300), 8))
    assert finalize_from_logical(spark, out, doc_shard_size=100,
                                 block_size=16)["mode"] == "append"

    idx = read_index(spark, out)
    slots = [{"term": "FAST", "case": True}, {"pattern": "h*"}]
    want_slot = [tuple(r) for r in packed_slot_search(idx, slots, [(1, 4)]).collect()]
    want_topk = [tuple(r) for r in search_wand(idx, "fast hash join", k=10).collect()]

    st = compact_postings(spark, out)
    assert st["files_after"] < st["files_before"]
    assert "cs" in st and st["cs"]["files_after"] < st["cs"]["files_before"]

    idx2 = read_index(spark, out)
    assert [tuple(r) for r in packed_slot_search(idx2, slots, [(1, 4)]).collect()] == want_slot
    assert [tuple(r) for r in search_wand(idx2, "fast hash join", k=10).collect()] == want_topk

    # draining after compaction still appends (same flat hive layout)
    drain(case_rows(range(300, 360), 8))
    assert finalize_from_logical(spark, out, doc_shard_size=100,
                                 block_size=16)["mode"] == "append"
    idx3 = read_index(spark, out)
    got3 = [tuple(r) for r in packed_slot_search(idx3, slots, [(1, 4)]).collect()]
    assert len(got3) >= len(want_slot)
    assert search_wand(idx3, "fast hash join", k=10).count() == 10


def test_append_crash_recovery_no_double_append(spark, tmp_path_factory):
    """Idempotent append protocol: if the finalize crashes AFTER the
    block append commits but BEFORE the state write (the review-flagged
    window), the re-run must detect the committed pieces via the
    max-doc-id watermark and NOT append them again."""
    import json

    from fastmorph_spark.streaming.incremental import (
        _finalize_state_path,
        _read_finalize_state,
    )

    base = tmp_path_factory.mktemp("inc_crash")
    src, out, ckpt = str(base / "src"), str(base / "idx"), str(base / "ckpt")
    _drain(spark, src, out, ckpt, _mkdocs(spark, _rows(range(0, 200), 8)))
    finalize_from_logical(spark, out, doc_shard_size=100, block_size=16)
    pre_state = _read_finalize_state(out)

    _drain(spark, src, out, ckpt, _mkdocs(spark, _rows(range(200, 300), 8)))
    r = finalize_from_logical(spark, out, doc_shard_size=100, block_size=16)
    assert r["mode"] == "append"
    post_state = _read_finalize_state(out)
    new_batches = [b for b in post_state["packed_batches"]
                   if b not in set(pre_state["packed_batches"])]
    assert new_batches
    rows_after_append = spark.read.parquet(f"{out}/postings").count()
    dl_after = spark.read.parquet(f"{out}/doc_lens").count()

    # simulate the crash: restore the PRE-append state with the new
    # batches journaled as in_progress (exactly what the journal write
    # leaves behind when the process dies mid-sequence)
    torn = {**pre_state, "in_progress": new_batches}
    with open(_finalize_state_path(out), "w") as f:
        json.dump(torn, f)

    r2 = finalize_from_logical(spark, out, doc_shard_size=100, block_size=16)
    assert r2["mode"] == "append"
    assert spark.read.parquet(f"{out}/postings").count() == rows_after_append
    assert spark.read.parquet(f"{out}/doc_lens").count() == dl_after
    clean = _read_finalize_state(out)
    assert not clean.get("in_progress")
    assert set(clean["packed_batches"]) == set(post_state["packed_batches"])
    assert clean["n_docs"] == 300 and clean["max_doc_id"] == 299

    # results still rank-identical to the oracle after recovery
    idx = read_index(spark, out)
    oracle = OracleIndex({d: t for d, t, _ in _rows(range(0, 200), 8) + _rows(range(200, 300), 8)})
    got = [r["doc_id"] for r in search_wand(idx, "fast hash join", k=10).collect()]
    assert got == [d for d, _ in oracle.topk("fast hash join", 10)]
    # and the dictionary's df is not double-counted
    from pyspark.sql import functions as SF
    df_fast = spark.read.parquet(f"{out}/dictionary") \
        .filter(SF.col("term") == "fast").collect()[0]["df"]
    n_fast = oracle.n_docs_with("fast") if hasattr(oracle, "n_docs_with") else len(oracle.postings["fast"])
    assert df_fast == n_fast
