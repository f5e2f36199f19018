"""Segment merge: one Index over A ∪ B with NO corpus re-scan and NO
block repack — the Lucene-merge analog, and the write-side complement of
NRT composed search (search/nrt.py reads base ∪ unindexed tail; this
folds two ALREADY-PACKED indexes into one).

Why this is cheap (and why it is exact):

- **Postings**: packed blocks are self-contained (term, doc_shard,
  envelope, varbyte payloads) — the merged postings frame is the UNION
  of both sides' block rows, zero payload bytes rewritten. The one
  invariant the union must preserve: the WAND kernel's segment sweep
  assigns ONE covering block per (term, segment) within a doc_shard
  group, i.e. block doc-ranges must stay disjoint per (doc_shard,
  term). Each side's pack guarantees that for itself, so side B's
  shard ids are namespaced above side A's (a metadata-only max + a
  column add) — groups never mix sides and the invariant is inherited,
  with no constraint on the sides' shard/block geometry.
- **Stats**: Σdl per side is recovered as round(avgdl·n) — exact int64
  while Σdl < 2^52 (the nrt.py argument; holds at 10^12 docs) — so the
  merged avgdl is the same once-rounded float64 a from-scratch build's
  F.avg would produce: BM25 scores over the merged index are
  bit-identical to a full rebuild, not merely close.
- **Impact bounds**: each side's block_max_impact was computed with ITS
  pack-time avgdl. The merged stats carry min_pack_avgdl =
  min(both sides') and the kernel scales bounds by
  avgdl_query/min_pack_avgdl (monotone impacts — search/wand.py), so
  pruning stays EXACT under the merged (drifted) avgdl. This is the
  same mechanism incremental finalize relies on; a merge adds no new
  assumption.
- **Dictionary**: rebuilt from block metadata alone
  (pack.dictionary_from_packed — blocks partition each term's postings,
  so df = Σ n_docs and cf = Σ block_cf are exact); max_score re-derives
  from the merged idf. One groupBy over |blocks| rows, no tokenization.
- **Twins & deletes**: case-preserving twins merge the same way when
  both sides carry them; live tombstone sets union (doc_ids are global).

Caller contract: the two sides are doc_id-DISJOINT and built with the
SAME tokenizer (terms must mean the same thing; the logical position
space is per-doc, so doc_shard_size / block_size MAY differ — shard ids
are only parallelism keys, and the kernel/decode paths are correct under
shard-id collisions between sides).

At-rest form (``merge_index_dirs``): each side's block parquet trees are
moved FILE-FOR-FILE under one index directory as a ``side=i`` hive layer
(they are already partitioned by term_bucket, so bucket pruning survives
the move), and only the dictionary + stats are rewritten — O(vocab)
bytes, derived from block METADATA alone with the payload columns never
read (parquet column pruning). The shard namespacing that the frame
merge applies eagerly is recorded instead as a tiny ``shard_bases``
table (side -> base) and applied LAZILY by read_index as a column add,
so the at-rest read produces exactly the frame-level merge — which stays
the semantics of record and what the tests pin. Crash safety mirrors the
compaction swap discipline: every rename is journaled as intent BEFORE
it runs (``.merge-journal``), and recovery rolls FORWARD (the journal is
only written after all rewritten small frames are durably in place, so
completing the declared moves always yields a complete index).
``compact_postings`` normalizes a merged layout back to a plain one
(materializes the shifted shards, drops the side layer and the bases
table) — the small-files answer and the re-merge enabler in one pass.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fastmorph_spark.index.io import Index
from fastmorph_spark.index.pack import dictionary_from_packed


def merge_indexes(a: Index, b: Index) -> Index:
    """One Index over a ∪ b (frame-level, lazy). See module docstring
    for the exactness argument and the caller contract."""
    spark = a.postings.sparkSession
    sa, sb = a.stats_row(), b.stats_row()
    n_a, n_b = int(sa["n_docs"]), int(sb["n_docs"])
    n = n_a + n_b
    sum_dl = (int(round(float(sa["avgdl"] or 0.0) * n_a))
              + int(round(float(sb["avgdl"] or 0.0) * n_b)))
    avgdl = (sum_dl / n) if n else 0.0
    min_pack = min(
        float(sa.get("min_pack_avgdl") or sa["avgdl"] or avgdl or 1.0),
        float(sb.get("min_pack_avgdl") or sb["avgdl"] or avgdl or 1.0),
    )
    stats = spark.createDataFrame(
        [(n, float(avgdl), float(min_pack))],
        "n_docs long, avgdl double, min_pack_avgdl double",
    )

    # doc_shard is a grouping key with one hard invariant the WAND
    # kernel's segment sweep depends on: within a (doc_shard, term)
    # group, block doc-ranges are DISJOINT and sorted (one covering
    # block per segment). Each side's pack guarantees it for ITSELF; a
    # plain union would break it wherever the sides' shard ids collide
    # (same-term blocks from both sides would shadow each other). So
    # namespace side B's shards above side A's — one metadata-only agg
    # over A's block rows (|blocks| ~ |postings|/block_size), no
    # payload touched. The cs twin gets the SAME offset: twins share
    # one doc_shard space (cross-twin pruning contract, search/packed).
    off = int(a.postings.agg(F.max("doc_shard")).collect()[0][0] or 0) + 1
    shard_t = dict(a.postings.dtypes)["doc_shard"]

    def _shift(frame):
        return frame.withColumn(
            "doc_shard", (F.col("doc_shard") + F.lit(off)).cast(shard_t))

    postings = a.postings.unionByName(_shift(b.postings),
                                      allowMissingColumns=True)
    dictionary = dictionary_from_packed(postings, stats)
    docs = a.docs.unionByName(b.docs, allowMissingColumns=True)
    doc_lens = a.doc_lens.unionByName(b.doc_lens)

    postings_cs = dict_cs = None
    if a.postings_cs is not None and b.postings_cs is not None:
        postings_cs = a.postings_cs.unionByName(_shift(b.postings_cs),
                                                allowMissingColumns=True)
        dict_cs = dictionary_from_packed(postings_cs, stats)

    tomb = None
    if a.tombstones is not None and b.tombstones is not None:
        tomb = a.tombstones.unionByName(b.tombstones).distinct()
    elif a.tombstones is not None:
        tomb = a.tombstones
    elif b.tombstones is not None:
        tomb = b.tombstones

    return Index(docs=docs, doc_lens=doc_lens, dictionary=dictionary,
                 stats=stats, postings=postings,
                 postings_cs=postings_cs, dictionary_cs=dict_cs,
                 tombstones=tomb)


# --------------------------------------------------------------- at rest

# side -> doc_shard base, written by merge_index_dirs and applied lazily
# by read_index; deleted by compact_postings when it materializes shards
SHARD_BASES = "shard_bases"
# rename intent journal (parquet: src, dst) — present iff a merge's move
# phase is incomplete; recovery rolls FORWARD (see merge_index_dirs)
MERGE_JOURNAL = ".merge-journal"

# directories moved file-for-file per side (postings_cs/tombstones when
# present); dictionary + stats are the only rewrites
_MOVE_DIRS = ("postings", "docs", "doc_lens")


def load_shard_bases(spark, index_path: str) -> dict[int, int] | None:
    """side -> doc_shard base for an at-rest merged index, else None."""
    from fastmorph_spark.index.fs import fs_is_dir

    path = f"{index_path}/{SHARD_BASES}"
    if not fs_is_dir(spark, path):
        return None
    return {int(r["side"]): int(r["base"])
            for r in spark.read.parquet(path).collect()}


def apply_shard_bases(frame, bases: dict[int, int]):
    """Materialize the merge's shard namespacing on a side-layered block
    frame: doc_shard += base[side], drop side. A pure column add (JVM
    map lookup) — this is the lazy form of the metadata-only shift the
    frame-level merge applies eagerly, so a read through it IS the
    frame-level merge."""
    shard_t = dict(frame.dtypes)["doc_shard"]
    m = F.create_map(*[F.lit(x) for kv in sorted(bases.items()) for x in kv])
    return frame.withColumn(
        "doc_shard",
        (F.col("doc_shard").cast("long")
         + m[F.col("side").cast("int")].cast("long")).cast(shard_t),
    ).drop("side")


def strip_side(frame):
    """Drop the incidental ``side=`` hive column from moved registry
    tables (docs/doc_lens/tombstones) — doc_ids are global, so unlike
    postings these need no renumbering, only the layout layer removed."""
    return frame.drop("side") if "side" in frame.columns else frame


def recover_merge(spark, out_path: str) -> bool:
    """Roll a crashed merge FORWARD: re-issue every journaled rename whose
    source still exists, then clear the journal. Sound because
    merge_index_dirs writes the journal only AFTER the rewritten
    dictionary/stats/shard_bases are durably in place — once intent is
    declared, completing the moves always yields a complete index (the
    inverse of recover_postings' roll-back, which guards a swap of
    EXISTING data; here the destination tree is new). Idempotent; returns
    True when any recovery ran. Raises if neither side of a journaled
    move exists (the index is genuinely damaged — never guess)."""
    from fastmorph_spark.index.fs import (
        fs_delete,
        fs_exists,
        fs_is_dir,
        fs_mkdirs,
        fs_rename,
    )

    journal = f"{out_path}/{MERGE_JOURNAL}"
    if not fs_is_dir(spark, journal):
        return False
    for r in spark.read.parquet(journal).collect():
        src, dst = r["src"], r["dst"]
        if fs_exists(spark, dst):
            if fs_exists(spark, src):
                raise OSError(
                    f"merge recovery: BOTH {src} and {dst} exist — the "
                    "source was recreated after the merge started; "
                    "refusing to guess which tree is live"
                )
            continue  # this move completed before the crash
        if not fs_exists(spark, src):
            raise OSError(
                f"merge recovery: neither {src} nor {dst} exists — "
                "journaled move cannot be completed"
            )
        fs_mkdirs(spark, dst.rsplit("/", 1)[0])
        fs_rename(spark, src, dst)
    fs_delete(spark, journal)
    return True


def merge_index_dirs(spark, src_paths, out_path: str) -> dict:
    """Fold N persisted indexes into one AT REST — the file-level form of
    merge_indexes and the Lucene segment-merge analog for this layout.

    Cost model (the whole point): postings/docs/doc_lens move
    FILE-FOR-FILE (one directory rename per side per tree — O(1) namenode
    ops, zero payload bytes read or written); the only rewrites are the
    dictionary (one groupBy over block METADATA rows, payload columns
    pruned at the parquet scan) and the 1-row stats. At 100 TB a merge is
    therefore metadata-bound, not data-bound — exactly why Lucene merges
    segments instead of re-indexing.

    Layout: side i's trees land under ``<tree>/side=i/`` (hive layer
    above the existing term_bucket partitioning, so bucket pruning is
    unchanged); the shard namespacing is recorded in ``shard_bases`` and
    applied lazily by read_index, making the read exactly the
    frame-level merge (same Σdl stats recovery, same min_pack_avgdl
    impact slack, same metadata dictionary — the exactness argument in
    the module docstring carries over unchanged).

    Crash protocol: (1) write all rewritten small frames + shard_bases
    into ``out_path``; (2) journal every rename as intent
    (``.merge-journal``) and a 'merging' manifest row; (3) execute the
    renames; (4) clear the journal, journal 'merged' with counters.
    A crash before (2) leaves the sources untouched (re-run overwrites
    the smalls); a crash during (3) is rolled FORWARD by recover_merge
    (read_index runs it). The SOURCES are consumed — their moved trees
    live in ``out_path`` afterwards (their leftover dictionary/stats
    stubs are deleted last).

    Caller contract (inherited from merge_indexes): sides are
    doc_id-disjoint and share one tokenizer; geometry (doc_shard_size /
    block_size) may differ per side. Sources that are THEMSELVES at-rest
    merges must be compact_postings-normalized first (a nested side=
    layer would collide in partition discovery) — refused loudly.
    Returns {n_sides, n_docs, n_terms, n_blocks, n_postings}."""
    import json

    from fastmorph_spark.index.fs import (
        fs_delete,
        fs_is_dir,
        fs_mkdirs,
        fs_rename,
    )
    from fastmorph_spark.index.io import read_index, recover_postings
    from fastmorph_spark.index.manifest import _append_manifest, _now

    src_paths = list(src_paths)
    if len(src_paths) < 2:
        raise ValueError("merge_index_dirs needs >= 2 source indexes")
    # reject duplicate / overlapping paths BEFORE any journal or move
    # (ADVICE r05 #3): a duplicated source passes every per-path check,
    # then the second side's renames fail mid-move (source already
    # moved), leaving a journaled half-state recover_merge cannot repair
    # ('neither src nor dst exists'); a src nested in out (or vice
    # versa) would be moved into itself.
    norm = [p.rstrip("/") for p in src_paths]
    if len(set(norm)) != len(norm):
        raise ValueError(f"duplicate src_paths: {sorted(src_paths)}")
    all_paths = norm + [out_path.rstrip("/")]
    for i, a in enumerate(all_paths):
        for j, b in enumerate(all_paths):
            if i != j and (a == b or b.startswith(a + "/")):
                raise ValueError(
                    f"overlapping merge paths: {a!r} and {b!r} (sources "
                    "and out_path must be distinct, non-nested trees)"
                )
    journal = f"{out_path}/{MERGE_JOURNAL}"
    if fs_is_dir(spark, journal):
        # a prior attempt crashed mid-move: finish it instead of merging
        recover_merge(spark, out_path)
        return {"recovered": True}
    if fs_is_dir(spark, f"{out_path}/postings"):
        raise ValueError(f"{out_path} already holds an index")
    for p in src_paths:
        recover_postings(p, spark)
        if not fs_is_dir(spark, f"{p}/postings"):
            raise ValueError(f"{p} has no postings tree")
        if fs_is_dir(spark, f"{p}/{SHARD_BASES}"):
            raise ValueError(
                f"{p} is itself an at-rest merge — run compact_postings "
                "on it first (nested side= layers collide in parquet "
                "partition discovery)"
            )
    cs_flags = [fs_is_dir(spark, f"{p}/postings_cs") for p in src_paths]
    if any(cs_flags) and not all(cs_flags):
        raise ValueError(
            "case-preserving twin must be present on ALL sides or none — "
            "a partial cs twin would silently answer case-sensitive "
            "queries from a subset of the corpus"
        )
    has_cs = all(cs_flags)

    idxs = [read_index(spark, p) for p in src_paths]

    # shard bases: one metadata-only agg per side (|blocks| rows, only
    # the doc_shard column read)
    bases: list[int] = []
    nxt = 0
    for ix in idxs:
        bases.append(nxt)
        mx = ix.postings.agg(F.max("doc_shard")).collect()[0][0]
        nxt += int(mx or 0) + 1

    # stats: Σdl recovered per side as round(avgdl*n) — exact while
    # Σdl < 2^52 (merge_indexes' argument, unchanged)
    rows = [ix.stats_row() for ix in idxs]
    n = sum(int(r["n_docs"]) for r in rows)
    sum_dl = sum(int(round(float(r["avgdl"] or 0.0) * int(r["n_docs"])))
                 for r in rows)
    avgdl = (sum_dl / n) if n else 0.0
    min_pack = min(
        float(r.get("min_pack_avgdl") or r["avgdl"] or avgdl or 1.0)
        for r in rows
    )
    stats = spark.createDataFrame(
        [(n, float(avgdl), float(min_pack))],
        "n_docs long, avgdl double, min_pack_avgdl double",
    )

    def _shifted_union(frames):
        out = None
        for i, f in enumerate(frames):
            shard_t = dict(f.dtypes)["doc_shard"]
            g = f.withColumn(
                "doc_shard",
                (F.col("doc_shard").cast("long") + F.lit(bases[i])).cast(shard_t))
            out = g if out is None else out.unionByName(g, allowMissingColumns=True)
        return out

    merged_meta = _shifted_union([ix.postings for ix in idxs])
    dictionary = dictionary_from_packed(merged_meta, stats)
    # phase 1: rewrites land first — sources untouched, out incomplete
    dictionary.write.mode("overwrite").parquet(f"{out_path}/dictionary")
    stats.write.mode("overwrite").parquet(f"{out_path}/stats")
    if has_cs:
        dict_cs = dictionary_from_packed(
            _shifted_union([ix.postings_cs for ix in idxs]), stats)
        dict_cs.write.mode("overwrite").parquet(f"{out_path}/dictionary_cs")
    spark.createDataFrame(
        [(i, b) for i, b in enumerate(bases)], "side int, base long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out_path}/{SHARD_BASES}")

    # counters from block metadata alone (payload columns never read)
    crow = merged_meta.agg(
        F.count("*").alias("n_blocks"),
        F.sum("n_docs").cast("long").alias("n_postings"),
        F.countDistinct("term").alias("n_terms"),
    ).collect()[0]

    # phase 2: journal intent, then move. The journal is the LAST thing
    # written before any source is touched.
    moves: list[tuple[str, str]] = []
    for i, p in enumerate(src_paths):
        dirs = _MOVE_DIRS + (("postings_cs",) if has_cs else ())
        dirs += (("tombstones",) if fs_is_dir(spark, f"{p}/tombstones") else ())
        for d in dirs:
            moves.append((f"{p}/{d}", f"{out_path}/{d}/side={i}"))
    snapshot = json.dumps({"merge_sources": src_paths}, sort_keys=True)
    _append_manifest(spark, out_path, (
        -4, "merging", int(crow["n_terms"]), int(crow["n_postings"]),
        int(crow["n_blocks"]), 0, snapshot, 1, 0, _now(),
    ))
    # journal commit is ATOMIC (ADVICE r05 #2): write to a temp name and
    # fs_rename into place — a crash mid-write leaves only a stale .tmp
    # (overwritten by the next attempt), never a half-written journal
    # directory that recover_merge (invoked by read_index and merge
    # re-runs) would fail to parse, wedging out_path.
    journal_tmp = f"{journal}.tmp"
    fs_delete(spark, journal_tmp)
    spark.createDataFrame(moves, "src string, dst string") \
        .coalesce(1).write.mode("overwrite").parquet(journal_tmp)
    fs_rename(spark, journal_tmp, journal)
    for src, dst in moves:
        fs_mkdirs(spark, dst.rsplit("/", 1)[0])
        fs_rename(spark, src, dst)
    fs_delete(spark, journal)
    _append_manifest(spark, out_path, (
        -4, "merged", int(crow["n_terms"]), int(crow["n_postings"]),
        int(crow["n_blocks"]), 0, snapshot, 1, 0, _now(),
    ))
    # consumed sources: drop their leftover small frames so a stale
    # dictionary can never be read against a moved-away postings tree
    for p in src_paths:
        fs_delete(spark, p)
    return {"n_sides": len(src_paths), "n_docs": n,
            "n_terms": int(crow["n_terms"]), "n_blocks": int(crow["n_blocks"]),
            "n_postings": int(crow["n_postings"])}
