"""At-rest segment merge (index/merge.merge_index_dirs): N persisted
indexes folded into one directory with file-for-file moves — only the
dictionary/stats rewritten.

Pinned here:
- reading the merged directory is EXACTLY the frame-level merge: WAND
  top-k and positional (phrase) results identical to a single full
  build, at full float precision;
- zero payload rewrite: the merged postings tree holds exactly the
  union of the sides' block files (file-count conservation);
- the merged dictionary equals the full build's row-for-row (df, cf);
- heterogeneous geometry across sides (different doc_shard_size AND
  block_size);
- the cs twin moves with its sides and cs slot search still matches;
- tombstones move with their side and still mask in the merged fan-out;
- crash mid-move: the journal rolls FORWARD via read_index, results
  unchanged;
- compact_postings normalizes the layout (side= gone, shard_bases gone,
  registry tables flattened) with results unchanged, and the normalized
  index is re-mergeable;
- refusals: un-compacted merged source, partial cs twin, occupied out.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastmorph_spark import registry
from fastmorph_spark.index import merge as merge_mod
from fastmorph_spark.index.fs import fs_count_files, fs_is_dir
from fastmorph_spark.index.io import compact_postings, read_index, write_index
from fastmorph_spark.index.merge import merge_index_dirs
from fastmorph_spark.search.packed import packed_phrase_search, packed_slot_search
from fastmorph_spark.search.wand import search_wand
from fastmorph_spark.sources import read_documents
from tests.conftest import SF0001

Q = "fast hash join"
PHRASE = registry.PHRASE_QUERY


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def fixture_docs(spark):
    return read_documents(spark, SF0001).persist()


@pytest.fixture(scope="module")
def full_dir(spark, fixture_docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("full")) + "/idx"
    write_index(spark, fixture_docs, out, doc_shard_size=100, block_size=16)
    return out


def _write_halves(spark, docs, base: str, cs: bool = False) -> tuple[str, str]:
    """Two doc_id-disjoint sides with DIFFERENT geometry (the shape that
    forces shard-id collisions pre-namespacing)."""
    a, b = f"{base}/a", f"{base}/b"
    write_index(spark, docs.filter(F.col("doc_id") % 2 == 0), a,
                doc_shard_size=100, block_size=16, case_sensitive=cs)
    write_index(spark, docs.filter(F.col("doc_id") % 2 == 1), b,
                doc_shard_size=70, block_size=8, case_sensitive=cs)
    return a, b


@pytest.fixture(scope="module")
def merged(spark, fixture_docs, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("atrest"))
    a, b = _write_halves(spark, fixture_docs, base)
    files_before = fs_count_files(spark, f"{a}/postings") + \
        fs_count_files(spark, f"{b}/postings")
    out = f"{base}/merged"
    counters = merge_index_dirs(spark, [a, b], out)
    return out, counters, files_before


def test_wand_identical_to_full_build(spark, merged, full_dir):
    out, counters, _ = merged
    got = _rows(search_wand(read_index(spark, out), Q, k=10))
    want = _rows(search_wand(read_index(spark, full_dir), Q, k=10))
    assert got == want  # full float precision — stats recombination exact
    assert counters["n_sides"] == 2 and counters["n_docs"] > 0


def test_zero_payload_rewrite(spark, merged):
    out, _, files_before = merged
    # the merged tree holds exactly the union of the sides' block files
    assert fs_count_files(spark, f"{out}/postings") == files_before


def test_dictionary_rowforrow(spark, merged, full_dir):
    out = merged[0]
    got = _rows(read_index(spark, out).dictionary.select("term", "df", "cf"))
    want = _rows(read_index(spark, full_dir).dictionary.select("term", "df", "cf"))
    assert got == want


def test_phrase_over_merged(spark, merged, full_dir):
    out = merged[0]
    got = _rows(packed_phrase_search(read_index(spark, out), PHRASE))
    want = _rows(packed_phrase_search(read_index(spark, full_dir), PHRASE))
    assert got == want and got  # non-vacuous


def test_compact_normalizes_and_remerges(spark, fixture_docs, full_dir,
                                         tmp_path_factory):
    base = str(tmp_path_factory.mktemp("normalize"))
    a, b = _write_halves(spark, fixture_docs, base)
    out = f"{base}/merged"
    merge_index_dirs(spark, [a, b], out)
    want = _rows(search_wand(read_index(spark, out), Q, k=10))
    compact_postings(spark, out)
    idx = read_index(spark, out)
    assert "side" not in idx.postings.columns
    assert "side" not in idx.docs.columns
    assert not fs_is_dir(spark, f"{out}/{merge_mod.SHARD_BASES}")
    assert _rows(search_wand(idx, Q, k=10)) == want
    # normalized -> re-mergeable: fold in a third (empty-ish) segment
    c = f"{base}/c"
    write_index(spark, fixture_docs.filter(F.col("doc_id") % 7 == 0)
                .withColumn("doc_id", F.col("doc_id") + 100000),
                c, doc_shard_size=50, block_size=4)
    out2 = f"{base}/merged2"
    merge_index_dirs(spark, [out, c], out2)
    assert read_index(spark, out2).n_docs > 0


def test_crash_mid_move_rolls_forward(spark, fixture_docs, full_dir,
                                      tmp_path_factory, monkeypatch):
    base = str(tmp_path_factory.mktemp("crash"))
    a, b = _write_halves(spark, fixture_docs, base)
    out = f"{base}/merged"

    real_rename = merge_mod.__dict__.get("fs_rename")  # imported lazily
    from fastmorph_spark.index import fs as fs_mod
    calls = {"n": 0}
    orig = fs_mod.fs_rename

    def failing(spark_, src, dst):
        calls["n"] += 1
        if calls["n"] == 2:  # die after the first move completed
            raise OSError("injected crash")
        return orig(spark_, src, dst)

    monkeypatch.setattr(fs_mod, "fs_rename", failing)
    with pytest.raises(OSError, match="injected"):
        merge_index_dirs(spark, [a, b], out)
    monkeypatch.setattr(fs_mod, "fs_rename", orig)
    assert fs_is_dir(spark, f"{out}/{merge_mod.MERGE_JOURNAL}")
    # read_index rolls the journaled moves FORWARD and serves the index
    idx = read_index(spark, out)
    assert not fs_is_dir(spark, f"{out}/{merge_mod.MERGE_JOURNAL}")
    want = _rows(search_wand(read_index(spark, full_dir), Q, k=10))
    assert _rows(search_wand(idx, Q, k=10)) == want
    assert real_rename is None  # fs_rename is function-local in merge_mod


def test_cs_twin_moves(spark, fixture_docs, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("cs"))
    full = f"{base}/full"
    write_index(spark, fixture_docs, full, doc_shard_size=100, block_size=16,
                case_sensitive=True)
    a, b = _write_halves(spark, fixture_docs, base, cs=True)
    out = f"{base}/merged"
    merge_index_dirs(spark, [a, b], out)
    slots = [{"term": "the", "case": True}, {"pattern": "h*"}]
    dists = [(1, 5)]
    got = _rows(packed_slot_search(read_index(spark, out), slots, dists))
    want = _rows(packed_slot_search(read_index(spark, full), slots, dists))
    assert got == want and got  # non-vacuous (matches exist at sf0.001)


def test_tombstones_move_and_mask(spark, fixture_docs, tmp_path_factory,
                                  full_dir):
    from fastmorph_spark.index.tombstones import delete_docs

    base = str(tmp_path_factory.mktemp("tomb"))
    a, b = _write_halves(spark, fixture_docs, base)
    # tombstone the full build's top doc on whichever side holds it
    top = search_wand(read_index(spark, full_dir), Q, k=1).collect()[0]["doc_id"]
    side = a if top % 2 == 0 else b
    delete_docs(spark, side, [int(top)])
    out = f"{base}/merged"
    merge_index_dirs(spark, [a, b], out)
    got = [r["doc_id"] for r in search_wand(read_index(spark, out), Q, k=10).collect()]
    assert got and top not in got


def test_refusals(spark, fixture_docs, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("refuse"))
    a, b = _write_halves(spark, fixture_docs, base)
    out = f"{base}/merged"
    merge_index_dirs(spark, [a, b], out)
    # un-compacted merged source
    c = f"{base}/c"
    write_index(spark, fixture_docs.filter(F.col("doc_id") % 5 == 0)
                .withColumn("doc_id", F.col("doc_id") + 200000),
                c, doc_shard_size=50, block_size=4)
    with pytest.raises(ValueError, match="at-rest merge"):
        merge_index_dirs(spark, [out, c], f"{base}/m2")
    # duplicate sources refused BEFORE any journal/move (ADVICE r05 #3:
    # a duplicate used to pass every check, then wedge mid-move)
    with pytest.raises(ValueError, match="duplicate"):
        merge_index_dirs(spark, [c, c], f"{base}/m4")
    # overlapping/nested paths refused up front too
    with pytest.raises(ValueError, match="overlapping"):
        merge_index_dirs(spark, [c, f"{base}/e"], f"{c}/nested")
    # partial cs twin
    d = f"{base}/d"
    write_index(spark, fixture_docs.filter(F.col("doc_id") % 5 == 1)
                .withColumn("doc_id", F.col("doc_id") + 300000),
                d, doc_shard_size=50, block_size=4, case_sensitive=True)
    # occupied out (checked with two DISTINCT sources so the duplicate
    # guard doesn't shadow it)
    with pytest.raises(ValueError, match="already holds"):
        merge_index_dirs(spark, [c, d], out)
    with pytest.raises(ValueError, match="twin"):
        merge_index_dirs(spark, [c, d], f"{base}/m3")


def test_merge_journal_commit_is_atomic(spark, fixture_docs, tmp_path_factory):
    """ADVICE r05 #2: the journal is written to a temp name and renamed
    into place — a stale half-written .tmp from a crashed prior attempt
    must be swept, the merge must succeed, and no journal artifacts may
    remain afterwards."""
    import os

    base = str(tmp_path_factory.mktemp("atomicj"))
    a, b = _write_halves(spark, fixture_docs, base)
    out = f"{base}/merged"
    stale = f"{out}/{merge_mod.MERGE_JOURNAL}.tmp"
    os.makedirs(stale)
    with open(f"{stale}/part-00000.parquet", "wb") as f:
        f.write(b"not a parquet file")  # torn mid-write artifact
    merge_index_dirs(spark, [a, b], out)
    assert not fs_is_dir(spark, f"{out}/{merge_mod.MERGE_JOURNAL}")
    assert not fs_is_dir(spark, stale)
    assert _rows(search_wand(read_index(spark, out), Q, k=10))


def test_half_compacted_cs_reads_correctly(spark, fixture_docs,
                                           tmp_path_factory, monkeypatch):
    """ADVICE r05 #1: compact_postings crashing BETWEEN the folded and
    the cs compaction passes leaves postings compacted (bases baked in,
    no side column) while postings_cs still carries the side layer —
    read_index must shift the cs twin from its OWN columns, not the
    folded twin's, or case-sensitive queries silently collide shards."""
    import fastmorph_spark.index.fs as fs_mod

    base = str(tmp_path_factory.mktemp("halfcs"))
    a, b = _write_halves(spark, fixture_docs, base, cs=True)
    out = f"{base}/merged"
    merge_index_dirs(spark, [a, b], out)
    slots = [{"term": "the", "case": True}, {"pattern": "h*"}]
    dists = [(1, 5)]
    want = _rows(packed_slot_search(read_index(spark, out), slots, dists))
    assert want  # non-vacuous

    real_is_dir = fs_mod.fs_is_dir

    def crash_before_cs_pass(spark_, path):
        if path.endswith("/postings_cs"):
            raise RuntimeError("simulated crash between compaction passes")
        return real_is_dir(spark_, path)

    monkeypatch.setattr(fs_mod, "fs_is_dir", crash_before_cs_pass)
    with pytest.raises(RuntimeError, match="simulated crash"):
        compact_postings(spark, out)
    monkeypatch.undo()

    idx = read_index(spark, out)
    assert "side" not in idx.postings.columns      # folded side: compacted
    assert "side" not in idx.postings_cs.columns   # cs side: shifted at read
    assert _rows(packed_slot_search(idx, slots, dists)) == want
