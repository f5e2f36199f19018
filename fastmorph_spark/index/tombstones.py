"""Document deletes for the packed index — tombstones + physical purge.

The batch/streaming builders are append-only (incremental finalize
enforces monotone doc_ids); a corpus at rest still needs takedowns and
re-crawls removed WITHOUT repacking 100 TB. The shape here is Lucene's
delete model, re-expressed over the parquet block layout:

- ``delete_docs`` appends doc_ids to ``{index}/tombstones/`` (parquet,
  job-commit atomic, duplicates harmless — dedup at read).
- Query paths exclude tombstoned docs IMMEDIATELY: the WAND kernel masks
  them at block-decode time (search/wand.py) and the packed slot/phrase
  decode anti-joins them (search/packed.py). BM25 collection stats
  (n_docs/avgdl/df) stay at their pre-delete values until purge — the
  standard serving trade (deletes must be invisible NOW; stats drift is
  bounded by purge cadence).
- ``purge_tombstones`` makes deletes physical and stats exact again.
  Only blocks in AFFECTED doc shards (shard = doc_id // doc_shard_size,
  the pack salt) are decoded and repacked; every other block row passes
  through byte-identical. Run it at compaction cadence — like a Lucene
  merge, the rewrite I/O is the cost of reclaiming space and exactness.

Safety of mixed-avgdl blocks after purge: repacked blocks carry impacts
at the NEW avgdl; untouched blocks keep impacts from their pack-time
avgdl. stats records min_pack_avgdl = min(previous, new) and search_wand
scales every bound by avgdl_now/min_pack_avgdl — impact is monotone
increasing in avgdl, so bounds packed at a LARGER avgdl already
over-estimate and bounds packed at a smaller one are covered by the
slack (same argument as streaming/incremental.py). Pruning stays EXACT.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastmorph_spark.constants import BLOCK_SIZE, DOC_SHARD_SIZE, N_TERM_BUCKETS


def _tomb_path(index_path: str) -> str:
    return f"{index_path}/tombstones"


def delete_docs(spark: SparkSession, index_path: str,
                doc_ids: list[int] | DataFrame) -> dict:
    """Append tombstones for ``doc_ids`` (list of ids or a DataFrame with
    a doc_id column). Idempotent: re-deleting an already-tombstoned or
    never-indexed id is harmless (read-side dedup; purge intersects with
    what the index actually holds). Returns {"n_requested": ...}."""
    if isinstance(doc_ids, DataFrame):
        df = doc_ids.select(F.col("doc_id").cast("long")).distinct()
        n = df.count()
    else:
        ids = sorted({int(d) for d in doc_ids})
        n = len(ids)
        if not ids:
            return {"n_requested": 0}
        df = spark.createDataFrame([(d,) for d in ids], "doc_id long")
    df.coalesce(1).write.mode("append").parquet(_tomb_path(index_path))
    return {"n_requested": n}


def read_tombstones(spark: SparkSession, index_path: str) -> DataFrame | None:
    """The live (deduplicated) tombstone set, or None when none exist —
    discovered through the Hadoop FS API (scheme-agnostic)."""
    from fastmorph_spark.index.fs import fs_is_dir

    path = _tomb_path(index_path)
    if not fs_is_dir(spark, path):
        return None
    return spark.read.parquet(path).select("doc_id").distinct()


def tombstone_ids(index) -> np.ndarray | None:
    """The live tombstone set as a sorted int64 array for kernel-side
    masking, or None. The collect is bounded by purge cadence (the live
    set is what accumulated SINCE the last purge — operationally small,
    like Lucene's liveDocs bitset held per segment reader); memoized per
    Index so a query burst pays it once."""
    t = getattr(index, "tombstones", None)
    if t is None:
        return None
    if index._tomb_ids is None:
        index._tomb_ids = np.array(
            sorted(r["doc_id"] for r in t.select("doc_id").distinct().collect()),
            dtype=np.int64,
        )
    return index._tomb_ids if index._tomb_ids.size else None


def tombstone_broadcast(index):
    """The live tombstone set as an ``sc.broadcast`` of the sorted int64
    array, or None (VERDICT r04 #2). Kernels capture the BROADCAST HANDLE
    in their closures (bytes-sized) and resolve ``.value`` executor-side —
    one torrent transfer per executor instead of re-serializing the whole
    array into EVERY task (a 10^7-id backlog is ~80 MB; per-task shipping
    multiplied that by the task count). Memoized per Index so a query
    burst creates exactly one broadcast.

    WAND keeps kernel-side masking (a post-top-k anti-join would be
    UNSOUND: a shard's k-th..(k+m)-th live docs are already discarded
    when m tombstoned docs occupy top-k slots); the packed DECODE paths
    anti-join pre-aggregation instead (search/packed.py:_live), which is
    the correct above-threshold shape there."""
    if tombstone_ids(index) is None:
        return None
    if getattr(index, "_tomb_bc", None) is None:
        from pyspark.sql import SparkSession

        sc = SparkSession.getActiveSession().sparkContext
        index._tomb_bc = sc.broadcast(index._tomb_ids)
    return index._tomb_bc


def resolve_exclude(exclude) -> np.ndarray | None:
    """Executor-side: Broadcast handle -> array (identity on raw arrays,
    kept for tests and the purge path's local use)."""
    if exclude is None:
        return None
    return exclude.value if hasattr(exclude, "value") else exclude


# decoded schema for the purge repack input: logical postings with dl
# carried (pack_postings joins nothing when dl is present)
_PURGE_DECODED = ("term string, doc_id long, dl long, tf int, "
                  "positions array<int>")


def _decode_affected(blocks: DataFrame, tomb: DataFrame) -> DataFrame:
    """Affected blocks -> logical (term, doc_id, dl, tf, positions) rows
    with tombstoned docs dropped. Arrow-batched; per-block numpy decode
    (a real codec's floor), no per-posting Python."""
    from fastmorph_spark.index.varbyte import (
        decode_doc_gaps,
        decode_positions,
        vb_decode,
    )

    tomb_rows = [r["doc_id"] for r in tomb.collect()]
    # broadcast handle in the closure, not the array itself (one transfer
    # per executor, not per task — VERDICT r04 #2)
    exclude_bc = blocks.sparkSession.sparkContext.broadcast(
        np.array(sorted(tomb_rows), dtype=np.int64))

    def _gen(it):
        exclude = exclude_bc.value
        for pdf in it:
            out: dict[str, list] = {"term": [], "doc_id": [], "dl": [],
                                    "tf": [], "positions": []}
            for term, g, t, d, p in zip(pdf["term"], pdf["doc_gaps"],
                                        pdf["tfs"], pdf["dls"], pdf["positions"]):
                doc_ids = decode_doc_gaps(g).astype(np.int64)
                tfs = vb_decode(t).astype(np.int64)
                dls = vb_decode(d).astype(np.int64)
                plists = decode_positions(p, tfs)
                keep = ~np.isin(doc_ids, exclude)
                if not keep.any():
                    continue
                kept_idx = np.flatnonzero(keep)
                out["term"].extend([term] * kept_idx.size)
                out["doc_id"].append(doc_ids[keep])
                out["dl"].append(dls[keep])
                out["tf"].append(tfs[keep].astype(np.int32))
                out["positions"].extend(plists[i].astype(np.int32) for i in kept_idx)
            if not out["term"]:
                continue
            yield pd.DataFrame({
                "term": out["term"],
                "doc_id": np.concatenate(out["doc_id"]),
                "dl": np.concatenate(out["dl"]),
                "tf": np.concatenate(out["tf"]),
                "positions": out["positions"],
            })

    return blocks.select("term", "doc_gaps", "tfs", "dls", "positions") \
        .mapInPandas(_gen, _PURGE_DECODED)


def purge_tombstones(
    spark: SparkSession,
    index_path: str,
    doc_shard_size: int = DOC_SHARD_SIZE,
    block_size: int = BLOCK_SIZE,
) -> dict:
    """Physically remove tombstoned docs and restore exact stats.

    Pass the SAME doc_shard_size/block_size the index was built with
    (like finalize_from_logical). Decode work touches only blocks whose
    doc_shard contains a tombstoned doc; all other block rows pass
    through unchanged. On a STREAMED index the logical batch log and the
    finalize-state counters are rewritten consistently too (the log
    rewrite is full-scan I/O — like any purge/merge, schedule it at
    compaction cadence). The rewrite uses compact_postings' swap protocol
    (tmp write -> validate -> journaled rename swap) through the Hadoop
    FS API — scheme-agnostic (VERDICT r04 #4; index/fs.py notes the
    object-store rename caveat); clearing tombstones/ is the
    LAST step, making a crashed purge re-runnable end-to-end (re-purging
    already-purged shards is a no-op on their content).

    Returns {"n_deleted", "n_docs", "blocks_repacked", "blocks_kept"}."""
    from fastmorph_spark.index.build import global_stats
    from fastmorph_spark.index.fs import fs_delete, fs_is_dir, fs_rename
    from fastmorph_spark.index.io import recover_postings
    from fastmorph_spark.index.manifest import _append_manifest, _now
    from fastmorph_spark.index.pack import dictionary_from_packed, pack_postings

    recover_postings(index_path, spark)
    tomb = read_tombstones(spark, index_path)
    if tomb is None:
        return {"n_deleted": 0, "n_docs": -1, "blocks_repacked": 0, "blocks_kept": 0}
    # only ids the index actually holds count (delete_docs accepts any id)
    tomb = tomb.join(spark.read.parquet(f"{index_path}/doc_lens"),
                     "doc_id", "left_semi").persist()
    n_deleted = tomb.count()
    shards = sorted({int(r["doc_id"]) // doc_shard_size
                     for r in tomb.select("doc_id").collect()})

    # exact post-delete registry + stats FIRST (pack impacts need avgdl).
    # stats_out is a LITERAL 1-row frame, not a plan over doc_lens — the
    # doc_lens directory gets swapped below and a lazy plan would re-read
    # its (deleted) old files at execution time
    doc_lens_new = spark.read.parquet(f"{index_path}/doc_lens") \
        .join(F.broadcast(tomb), "doc_id", "left_anti")
    srow_new = global_stats(doc_lens_new).collect()[0]
    srow_old = spark.read.parquet(f"{index_path}/stats").collect()[0].asDict()
    avgdl_new = float(srow_new["avgdl"] or 0.0)
    min_pack = min(float(srow_old.get("min_pack_avgdl") or srow_old["avgdl"] or avgdl_new),
                   avgdl_new) if avgdl_new > 0 else avgdl_new
    stats_out = spark.createDataFrame(
        [(int(srow_new["n_docs"]), avgdl_new, min_pack)],
        "n_docs long, avgdl double, min_pack_avgdl double",
    )

    def _rewrite_postings(subdir: str) -> tuple[int, int]:
        src = f"{index_path}/{subdir}"
        blocks = spark.read.parquet(src)
        affected = blocks.filter(F.col("doc_shard").isin(shards))
        kept = blocks.filter(~F.col("doc_shard").isin(shards))
        n_aff = affected.count()
        n_kept = kept.count()
        logical = _decode_affected(affected, tomb)
        repacked = pack_postings(
            logical, None, stats_out, doc_shard_size, block_size,
            n_partitions=max(2 * spark.sparkContext.defaultParallelism, 8),
        )
        out = kept.select(*[f for f in repacked.columns]).unionByName(repacked)
        tmp = f"{index_path}/.{subdir}-purge-tmp"
        fs_delete(spark, tmp)
        out.repartition(N_TERM_BUCKETS, "term_bucket") \
            .write.partitionBy("term_bucket").mode("overwrite").parquet(tmp)
        # journaled swap (same crash-window story as compact_postings:
        # recover_postings closes the between-renames window, the intent
        # row makes a resumable batch build refuse the flattened layout)
        _append_manifest(spark, index_path, (
            -3, "compacting", 0, n_kept + n_aff, 0, 0, f"purge:{subdir}", 1, 0, _now(),
        ))
        old = f"{index_path}/.{subdir}-old"
        fs_delete(spark, old)
        fs_rename(spark, src, old)
        fs_rename(spark, tmp, src)
        _append_manifest(spark, index_path, (
            -3, "compacted", 0, n_kept + n_aff, 0, 0, f"purge:{subdir}", 1, 0, _now(),
        ))
        fs_delete(spark, old)
        return n_aff, n_kept

    try:
        n_aff, n_kept = _rewrite_postings("postings")
        has_cs = fs_is_dir(spark, f"{index_path}/postings_cs")
        if has_cs:
            _rewrite_postings("postings_cs")

        # registry tables: overwrite via tmp+rename (small relative to
        # postings; same swap protocol keeps readers crash-consistent)
        def _swap_write(df: DataFrame, subdir: str) -> None:
            tmp = f"{index_path}/.{subdir}-purge-tmp"
            fs_delete(spark, tmp)
            df.write.mode("overwrite").parquet(tmp)
            old = f"{index_path}/.{subdir}-old"
            fs_delete(spark, old)
            fs_rename(spark, f"{index_path}/{subdir}", old)
            fs_rename(spark, tmp, f"{index_path}/{subdir}")
            fs_delete(spark, old)

        _swap_write(doc_lens_new, "doc_lens")
        _swap_write(
            spark.read.parquet(f"{index_path}/docs")
            .join(F.broadcast(tomb), "doc_id", "left_anti"),
            "docs",
        )
        _swap_write(stats_out, "stats")
        _swap_write(
            dictionary_from_packed(
                spark.read.parquet(f"{index_path}/postings"), stats_out),
            "dictionary",
        )
        if has_cs:
            _swap_write(
                dictionary_from_packed(
                    spark.read.parquet(f"{index_path}/postings_cs"), stats_out),
                "dictionary_cs",
            )
        # STREAMED indexes (streaming/incremental.py) keep a logical
        # batch log + running counters that the packed layout is derived
        # from — both must agree with the purge or deleted docs come
        # back: a later drift-triggered FULL repack re-reads the log
        # (resurrection), and the next incremental append would add
        # n_new to a pre-purge n_docs/sum_dl (wrong stats, not just
        # stale ones). Rewrite the log minus tombstones and patch the
        # state counters to the post-purge registry.
        for subdir in ("postings_logical_stream", "postings_logical_stream_cs",
                       "docs_stream"):
            if fs_is_dir(spark, f"{index_path}/{subdir}"):
                _swap_write(
                    spark.read.parquet(f"{index_path}/{subdir}")
                    .join(F.broadcast(tomb), "doc_id", "left_anti"),
                    subdir,
                )
        from fastmorph_spark.streaming.incremental import (
            _read_finalize_state,
            _write_finalize_state,
        )

        state = _read_finalize_state(index_path)
        if state is not None:
            reg = spark.read.parquet(f"{index_path}/doc_lens").agg(
                F.count("*").alias("n"), F.sum("dl").alias("s"),
            ).collect()[0]
            _write_finalize_state(index_path, {
                **state,
                "n_docs": int(reg["n"]),
                "sum_dl": int(reg["s"] or 0),
                "min_pack_avgdl": float(min_pack),
            })
        n_docs = spark.read.parquet(f"{index_path}/stats").collect()[0]["n_docs"]
    finally:
        tomb.unpersist()
    # LAST: clear tombstones — a crash anywhere above leaves them in
    # place and the whole purge simply re-runs
    fs_delete(spark, _tomb_path(index_path))
    return {"n_deleted": int(n_deleted), "n_docs": int(n_docs),
            "blocks_repacked": int(n_aff), "blocks_kept": int(n_kept)}
