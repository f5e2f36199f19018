"""M4 — resumability: kill/rerun, idempotent no-op rerun, identical output
(SURVEY.md §5.5)."""

from __future__ import annotations

import pytest

from fastmorph_spark.index.io import read_index
from fastmorph_spark.index.manifest import build_index_resumable, read_manifest
from fastmorph_spark.search.wand import search_wand
from fastmorph_spark.sources import read_documents
from tests.conftest import SF0001
from tests.oracle_bm25 import OracleIndex, load_documents

PARAMS = dict(n_batches=5, doc_shard_size=50, block_size=16)


def _packed_fingerprint(spark, path):
    """Order-insensitive content signature of the packed postings."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{path}/postings")
    return sorted(
        (r["term"], r["doc_shard"], r["block_seq"], r["first_doc"], r["max_doc"],
         bytes(r["doc_gaps"]).hex(), bytes(r["tfs"]).hex(), bytes(r["dls"]).hex(),
         bytes(r["positions"]).hex(), round(r["block_max_impact"], 12))
        for r in df.collect()
    )


def test_kill_resume_identical(spark, tmp_path):
    docs = read_documents(spark, SF0001)

    # reference: one-shot build
    full = str(tmp_path / "full")
    r = build_index_resumable(spark, docs, full, input_path="sf0.001", **PARAMS)
    assert r["complete"] and sorted(r["batches_run"]) == [0, 1, 2, 3, 4]

    # killed build: only 2 batches land, then "crash"
    part = str(tmp_path / "part")
    r1 = build_index_resumable(spark, docs, part, input_path="sf0.001",
                               max_batches_this_run=2, **PARAMS)
    assert not r1["complete"] and len(r1["batches_run"]) == 2

    # resume: only the remaining 3 run
    r2 = build_index_resumable(spark, docs, part, input_path="sf0.001", attempt=2, **PARAMS)
    assert r2["complete"]
    assert sorted(r1["batches_run"] + r2["batches_run"]) == [0, 1, 2, 3, 4]
    assert len(r2["batches_run"]) == 3

    # identical index bytes (content-level)
    assert _packed_fingerprint(spark, full) == _packed_fingerprint(spark, part)

    # rerun of a completed build is a no-op
    r3 = build_index_resumable(spark, docs, part, input_path="sf0.001", attempt=3, **PARAMS)
    assert r3["complete"] and r3["batches_run"] == []

    # manifest carries counters + lineage per partition
    m = read_manifest(spark, part)
    rows = m.filter("status = 'done'").collect()
    assert len(rows) == 5
    assert all(r["n_postings"] > 0 and r["bytes_written"] > 0 and r["wall_ms"] >= 0 for r in rows)
    assert all("sf0.001" in r["input_snapshot"] for r in rows)
    # attempts recorded: first two batches attempt=1, resumed three attempt=2
    assert sorted(r["attempt"] for r in rows) == [1, 1, 2, 2, 2]


def test_resumable_build_searches_correctly(spark, tmp_path):
    """The batch-layout index answers queries rank-identically."""
    docs = read_documents(spark, SF0001)
    out = str(tmp_path / "idx")
    r = build_index_resumable(spark, docs, out, input_path="sf0.001", **PARAMS)
    assert r["complete"]
    idx = read_index(spark, out)
    oracle = OracleIndex(load_documents(SF0001))
    for q in ["fast hash join", "dup", "the"]:
        got = [x["doc_id"] for x in search_wand(idx, q, k=10).collect()]
        assert got == [d for d, _ in oracle.topk(q, 10)], q


def test_lineage_mismatch_not_reused(spark, tmp_path):
    """Changing layout params invalidates old checkpoints (different
    snapshot) — nothing is silently reused."""
    docs = read_documents(spark, SF0001)
    out = str(tmp_path / "idx")
    build_index_resumable(spark, docs, out, input_path="sf0.001", **PARAMS)
    r = build_index_resumable(spark, docs, out, input_path="sf0.001",
                              n_batches=5, doc_shard_size=25, block_size=16)
    assert sorted(r["batches_run"]) == [0, 1, 2, 3, 4]  # all re-ran


def test_compaction_preserves_results(spark, tmp_path):
    """compact_postings: multi-batch layout -> one file set per bucket;
    query results (WAND top-k AND decoded postings) byte-identical, file
    count strictly reduced, no incidental batch column."""
    from fastmorph_spark.index.io import compact_postings, read_index
    from fastmorph_spark.index.manifest import build_index_resumable
    from fastmorph_spark.search.packed import decoded_postings
    from fastmorph_spark.search.wand import search_wand
    from fastmorph_spark.sources import read_documents
    from tests.conftest import SF0001

    docs = read_documents(spark, SF0001)
    out = str(tmp_path / "idx")
    r = build_index_resumable(spark, docs, out, input_path="sf0.001",
                              n_batches=4, doc_shard_size=100, block_size=16)
    assert r["complete"]

    idx = read_index(spark, out)
    before_topk = [tuple(x) for x in search_wand(idx, "fast hash join", k=10).collect()]
    before_dec = sorted(
        (x["term"], x["doc_id"], x["tf"]) for x in decoded_postings(idx, ["fast", "join"]).collect()
    )

    stats = compact_postings(spark, out)
    assert stats["files_after"] < stats["files_before"]

    idx2 = read_index(spark, out)
    assert "batch" not in idx2.postings.columns
    assert [tuple(x) for x in search_wand(idx2, "fast hash join", k=10).collect()] == before_topk
    assert sorted(
        (x["term"], x["doc_id"], x["tf"]) for x in decoded_postings(idx2, ["fast", "join"]).collect()
    ) == before_dec
    assert idx2.postings.count() == stats["rows"]

    # compaction is journaled: a later resumable batch run into the
    # flattened layout must refuse (mixed hive layouts — ADVICE r02)
    with pytest.raises(ValueError, match="COMPACTED"):
        build_index_resumable(spark, docs, out, input_path="sf0.001",
                              n_batches=4, doc_shard_size=100, block_size=16)


def test_compaction_crash_recovery(spark, tmp_path):
    """A crash between the two swap renames leaves .postings-old and no
    postings/ — read_index restores it (recover_postings)."""
    import os

    from fastmorph_spark.index.io import read_index, recover_postings
    from fastmorph_spark.search.wand import search_wand

    docs = read_documents(spark, SF0001)
    out = str(tmp_path / "idx")
    build_index_resumable(spark, docs, out, input_path="sf0.001",
                          n_batches=2, doc_shard_size=100, block_size=16)
    want = [tuple(x) for x in search_wand(read_index(spark, out), "fast hash join", k=5).collect()]
    # simulate the crash window: postings renamed out, replacement missing
    os.rename(f"{out}/postings", f"{out}/.postings-old")
    idx = read_index(spark, out)  # triggers recovery
    assert os.path.isdir(f"{out}/postings")
    assert [tuple(x) for x in search_wand(idx, "fast hash join", k=5).collect()] == want
    assert recover_postings(out) is False  # idempotent no-op now


def test_corrupt_manifest_surfaces(spark, tmp_path):
    """A corrupt (visible, non-parquet) manifest file must raise, not be
    silently treated as an empty manifest (ADVICE r02: returning [] would
    discard every checkpoint)."""
    import os

    import pyarrow as pa

    from fastmorph_spark.index.manifest import _manifest_rows

    out = str(tmp_path / "idx")
    os.makedirs(f"{out}/manifest")
    assert _manifest_rows(spark, out) == []  # empty dir: fine
    with open(f"{out}/manifest/part-bad.parquet", "wb") as f:
        f.write(b"not a parquet file")
    with pytest.raises(pa.ArrowInvalid):
        _manifest_rows(spark, out)


def test_compaction_file_scheme_path(spark, tmp_path):
    """VERDICT r04 #4: the swap protocol runs through the Hadoop
    FileSystem API — exercised here via an explicit file:// scheme URI
    (the Hadoop local FS honors the same rename/delete contract a remote
    FS would), with results identical and the journal guard intact."""
    from fastmorph_spark.index.io import compact_postings, read_index
    from fastmorph_spark.index.manifest import build_index_resumable
    from fastmorph_spark.search.wand import search_wand
    from fastmorph_spark.sources import read_documents
    from tests.conftest import SF0001

    docs = read_documents(spark, SF0001)
    out = f"file://{tmp_path}/idx"
    build_index_resumable(spark, docs, out, input_path="sf0.001",
                          n_batches=3, doc_shard_size=100, block_size=16)
    before = [tuple(x) for x in
              search_wand(read_index(spark, out), "fast hash join", k=10).collect()]
    stats = compact_postings(spark, out)
    assert stats["files_after"] < stats["files_before"]
    idx2 = read_index(spark, out)
    assert [tuple(x) for x in search_wand(idx2, "fast hash join", k=10).collect()] == before
    with pytest.raises(ValueError, match="COMPACTED"):
        build_index_resumable(spark, docs, out, input_path="sf0.001",
                              n_batches=3, doc_shard_size=100, block_size=16)
