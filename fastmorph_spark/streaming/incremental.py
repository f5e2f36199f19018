"""§2.9 — incremental indexing via Structured Streaming.

The reference is not streaming (corpus loads once at startup; updates
need a reload [PK-high, SURVEY.md §2.9]). This module is the documented
Spark-native extension: new corpus files are ingested continuously into
the LOGICAL index (append-only postings shards + manifest lineage), and
the PHYSICAL index (blocks/impacts) is finalized by an idempotent batch
pass.

Correctness split (why two phases):
- Count-semantics queries (AND/phrase/proximity/wildcard/match counts)
  are EXACT over the accumulated logical postings immediately after each
  micro-batch — they need no global stats.
- BM25 depends on corpus-global N/avgdl/df. Packed block-max impacts are
  upper bounds ONLY for the avgdl they were computed with (impact is
  monotone in avgdl), so streaming appends CANNOT safely extend a packed
  index — finalize_from_logical recomputes stats and repacks. Mid-stream
  exact BM25 runs on the expression path over the logical postings.

Mechanics: readStream -> foreachBatch(tokenize+aggregate+append) with
Trigger.AvailableNow (drain-all-then-stop) and checkpointLocation for
exactly-once file progress. Input rows must carry a stable doc_id
(deterministic ids are the ingest contract; with_doc_ids at the source
otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastmorph_spark.constants import BLOCK_SIZE, DOC_SHARD_SIZE
from fastmorph_spark.index.build import build_dictionary, build_docs, build_postings, global_stats
from fastmorph_spark.index.pack import dictionary_with_max_score, pack_postings


def stream_ingest(
    spark: SparkSession,
    source_dir: str,
    out_path: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string, lang string",
    text_col: str = "text",
    available_now: bool = True,
    case_sensitive: bool = False,
    tokenizer: str = "ascii",
):
    """Start the ingest stream; returns the StreamingQuery.

    Each micro-batch appends postings_logical/stream_batch=<id>/ plus doc
    registry rows; the Structured Streaming checkpoint provides
    exactly-once file-source progress (a re-run never re-ingests).
    ``case_sensitive=True`` additionally logs the case-PRESERVING
    tokenization per batch (postings_logical_stream_cs/) so the finalize
    can pack the cs twin — streamed indexes then serve {"case": True}
    slots exactly like batch-built ones (same P5 surface).
    ``tokenizer="uni"`` ingests with the Unicode twin (non-Latin streams
    — the reference's own corpus class); like the cs flag it must stay
    CONSISTENT across the stream's lifetime (the logical log holds plain
    term strings, so mixed tokenizers would silently interleave). The
    finalize/pack/query layers are tokenizer-agnostic."""
    # uni + case_sensitive: supported since the uni cs twin landed
    # (index/io.py — shared \w+ boundaries, no fold); the code tokenizer
    # has no cs twin and is refused downstream by build_index_frames.

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns:
            return
        postings = build_postings(batch_df, text_col=text_col, id_col="doc_id",
                                  tokenizer=tokenizer)
        postings.withColumn("stream_batch", F.lit(int(batch_id))) \
            .write.mode("append").parquet(f"{out_path}/postings_logical_stream")
        if case_sensitive:
            build_postings(batch_df, text_col=text_col, id_col="doc_id",
                           fold_case=False, tokenizer=tokenizer) \
                .withColumn("stream_batch", F.lit(int(batch_id))) \
                .write.mode("append").parquet(f"{out_path}/postings_logical_stream_cs")
        build_docs(batch_df, id_col="doc_id", tokenizer=tokenizer) \
            .withColumn("stream_batch", F.lit(int(batch_id))) \
            .write.mode("append").parquet(f"{out_path}/docs_stream")

    reader = spark.readStream.schema(schema).parquet(source_dir)
    writer = reader.writeStream.foreachBatch(_sink).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_stream_postings(spark: SparkSession, out_path: str) -> DataFrame:
    return spark.read.parquet(f"{out_path}/postings_logical_stream") \
        .drop("stream_batch")


# Incremental finalize (VERDICT r03 #5): repack everything only when the
# corpus avgdl drifted past this factor since the OLDEST live pack pass.
# Below the bound, WAND stays exact with bounds scaled by
# avgdl_now/min_pack_avgdl (monotone impacts — search/wand.py), so a
# drain appends ONLY the new batches' blocks: at 100 TB a drain touches
# new data, not the whole index.
AVGDL_DRIFT_BOUND = 1.25


def _has_cs_log(spark: SparkSession, out_path: str) -> bool:
    """Whether the stream was ingested with case_sensitive=True. The
    flag must be CONSISTENT across the stream's lifetime (every batch
    logs both tokenizations or neither) — enabling it mid-stream would
    leave the cs twin missing earlier batches' postings. Driver-local
    paths check the directory; remote paths probe with a read."""
    import os

    from fastmorph_spark.index.io import _strip_file_scheme
    from fastmorph_spark.index.manifest import _is_driver_local

    path = f"{out_path}/postings_logical_stream_cs"
    if _is_driver_local(spark, path):
        return os.path.isdir(_strip_file_scheme(path))
    from pyspark.errors import AnalysisException

    try:
        spark.read.parquet(path).schema
        return True
    except AnalysisException:
        return False


def _finalize_state_path(out_path: str) -> str:
    from fastmorph_spark.index.io import _strip_file_scheme

    return _strip_file_scheme(f"{out_path}/_finalize_state.json")


_STATE_FIELDS = {"packed_batches", "min_pack_avgdl", "max_doc_id", "n_docs", "sum_dl"}


def _read_finalize_state(out_path: str) -> dict | None:
    import json
    import os

    p = _finalize_state_path(out_path)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        state = json.load(f)
    # a state written by an older layout (missing counters) cannot drive
    # the counter-incremental path — treat as absent (forces full repack,
    # which rewrites a complete state)
    return state if _STATE_FIELDS <= set(state) else None


def _write_finalize_state(out_path: str, state: dict) -> None:
    import json
    import os

    p = _finalize_state_path(out_path)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, p)  # atomic: a crash never leaves a torn state file


def _piece_max_doc(spark: SparkSession, path: str, col: str) -> int | None:
    """max doc id present in one layout piece (None when absent/empty);
    `col` is 'max_doc' for block layouts, 'doc_id' for registries.
    Column-pruned metadata scan — no payload bytes."""
    from pyspark.errors import AnalysisException

    try:
        r = spark.read.parquet(path).agg(F.max(col).alias("m")).collect()[0]["m"]
    except AnalysisException:
        return None
    return None if r is None else int(r)


def finalize_from_logical(
    spark: SparkSession,
    out_path: str,
    doc_shard_size: int = DOC_SHARD_SIZE,
    block_size: int = BLOCK_SIZE,
    incremental: bool = True,
    avgdl_drift_bound: float = AVGDL_DRIFT_BOUND,
) -> dict:
    """Idempotent physical finalize: pack the accumulated logical
    postings into the batch builder's layout (search_wand works
    unchanged). Returns {"mode": "append"|"repack"|"noop", ...}.

    INCREMENTAL path (default; VERDICT r03 #5 — a drain must not re-read
    the whole index): when a previous finalize's state exists, a drain
    touches ONLY the new batches:
      - blocks for the new batches are packed and APPENDED (blocks are
        self-contained per (term, doc_shard); per-term doc ranges stay
        disjoint under the enforced monotone-doc_id contract);
      - doc_lens/docs rows for the new docs are APPENDED (derived from
        the per-batch doc registry — no corpus-wide re-aggregation);
      - stats come from running counters in the state file
        (n_docs/sum_dl), O(new batch) to update;
      - the dictionary rebuilds from ALL packed blocks' METADATA columns
        (dictionary_from_packed — column-pruned, no payload bytes; the
        one corpus-proportional pass left, O(|blocks|) rows);
      - old blocks keep their pack-time-avgdl impacts; stats carry
        min_pack_avgdl and search_wand scales bounds by
        avgdl_now/min_pack_avgdl (exact — impacts are monotone in
        avgdl). Past ``avgdl_drift_bound`` the pass falls back to a FULL
        repack (bounds would get too loose), likewise when doc_ids did
        not grow monotonically.

    CRASH SAFETY: the state journals ``in_progress`` batches BEFORE any
    append; each append is guarded by the piece's max-doc-id watermark
    (parquet job commits are atomic), so a re-run after a crash anywhere
    in the sequence redoes exactly the pieces that did not commit and
    never double-appends — the append path is idempotent per batch set.

    The incremental path needs a DRIVER-LOCAL out_path (the state file
    uses plain file I/O, like compact_postings' swap); on a remote
    filesystem (s3a/hdfs) every finalize is a full repack — a production
    deployment would keep this state in a transactional table format.

    When the stream was ingested with ``case_sensitive=True`` the
    case-preserving twin (postings_cs/ + dictionary_cs/) is packed and
    appended the same way, so read_index serves {"case": True} slots
    from the streamed index exactly like a batch-built one.
    """
    from fastmorph_spark.constants import N_TERM_BUCKETS
    from fastmorph_spark.index.manifest import _is_driver_local
    from fastmorph_spark.index.pack import dictionary_from_packed

    local = _is_driver_local(spark, out_path)
    has_cs = _has_cs_log(spark, out_path)
    log = spark.read.parquet(f"{out_path}/postings_logical_stream")
    batch_ids = sorted(
        r["stream_batch"] for r in log.select("stream_batch").distinct().collect()
    )
    state = _read_finalize_state(out_path) if (incremental and local) else None

    if state is not None:
        pending = sorted(set(state.get("in_progress", [])) | {
            b for b in batch_ids if b not in set(state["packed_batches"])
        })
        if not pending:
            return {"mode": "noop", "n_new_batches": 0}
        # O(new): per-batch doc registry agg drives counters + guards
        new_docs_reg = spark.read.parquet(f"{out_path}/docs_stream") \
            .filter(F.col("stream_batch").isin([int(b) for b in pending])) \
            .dropDuplicates(["doc_id"])
        agg = new_docs_reg.agg(
            F.count("*").alias("n"), F.sum("doc_len").alias("s"),
            F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"),
        ).collect()[0]
        n_new, sum_new = int(agg["n"]), int(agg["s"] or 0)
        pre_max = int(state["max_doc_id"])
        monotone = agg["lo"] is None or int(agg["lo"]) > pre_max
        n_all = int(state["n_docs"]) + n_new
        sum_all = int(state["sum_dl"]) + sum_new
        avgdl_now = (sum_all / n_all) if n_all else 0.0
        min_pack_avgdl = min(float(state["min_pack_avgdl"]), avgdl_now)
        drift = avgdl_now / min_pack_avgdl if min_pack_avgdl > 0 else float("inf")
        if monotone and drift <= avgdl_drift_bound:
            # ---- journal intent, then idempotently append each piece
            _write_finalize_state(out_path, {**state, "in_progress": pending})
            stats = spark.createDataFrame(
                [(n_all, avgdl_now, min_pack_avgdl)],
                "n_docs long, avgdl double, min_pack_avgdl double",
            )
            new_post = log.filter(
                F.col("stream_batch").isin([int(b) for b in pending])
            ).drop("stream_batch")

            def behind(path: str, col: str) -> bool:
                m = _piece_max_doc(spark, path, col)
                return m is None or m <= pre_max

            if behind(f"{out_path}/postings", "max_doc"):
                pack_postings(new_post, None, stats, doc_shard_size, block_size) \
                    .repartition(N_TERM_BUCKETS, "term_bucket") \
                    .write.partitionBy("term_bucket").mode("append") \
                    .parquet(f"{out_path}/postings")
            if has_cs and behind(f"{out_path}/postings_cs", "max_doc"):
                new_cs = spark.read.parquet(f"{out_path}/postings_logical_stream_cs") \
                    .filter(F.col("stream_batch").isin([int(b) for b in pending])) \
                    .drop("stream_batch")
                pack_postings(new_cs, None, stats, doc_shard_size, block_size) \
                    .repartition(N_TERM_BUCKETS, "term_bucket") \
                    .write.partitionBy("term_bucket").mode("append") \
                    .parquet(f"{out_path}/postings_cs")
            if behind(f"{out_path}/doc_lens", "doc_id"):
                new_docs_reg.select("doc_id", F.col("doc_len").cast("long").alias("dl")) \
                    .write.mode("append").parquet(f"{out_path}/doc_lens")
            if behind(f"{out_path}/docs", "doc_id"):
                new_docs_reg.drop("stream_batch") \
                    .write.mode("append").parquet(f"{out_path}/docs")
            # ---- idempotent tail: 1-row stats + metadata-only dictionaries
            stats.write.mode("overwrite").parquet(f"{out_path}/stats")
            dictionary_from_packed(spark.read.parquet(f"{out_path}/postings"), stats) \
                .write.mode("overwrite").parquet(f"{out_path}/dictionary")
            if has_cs:
                dictionary_from_packed(
                    spark.read.parquet(f"{out_path}/postings_cs"), stats
                ).write.mode("overwrite").parquet(f"{out_path}/dictionary_cs")
            _write_finalize_state(out_path, {
                "packed_batches": sorted(set(state["packed_batches"]) | set(pending)),
                "min_pack_avgdl": float(min_pack_avgdl),
                "max_doc_id": max(pre_max, int(agg["hi"]) if agg["hi"] is not None else pre_max),
                "n_docs": n_all,
                "sum_dl": sum_all,
            })
            return {"mode": "append", "n_new_batches": len(pending)}

    # FULL repack (first finalize, drift past bound, non-monotone ids,
    # remote out_path, or incremental=False)
    postings_all = read_stream_postings(spark, out_path)
    docs = spark.read.parquet(f"{out_path}/docs_stream").select("doc_id").distinct()
    dl_agg = postings_all.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    doc_lens = docs.join(dl_agg, "doc_id", "left") \
        .select("doc_id", F.coalesce("dl", F.lit(0)).cast("long").alias("dl"))
    stats = global_stats(doc_lens)
    srow = stats.collect()[0]
    avgdl_now = float(srow["avgdl"] or 0.0)
    dictionary = build_dictionary(postings_all)
    packed = pack_postings(postings_all, doc_lens, stats, doc_shard_size, block_size)
    packed.persist()
    try:
        packed.repartition(N_TERM_BUCKETS, "term_bucket") \
            .write.partitionBy("term_bucket").mode("overwrite").parquet(f"{out_path}/postings")
        dictionary_with_max_score(dictionary, packed, stats) \
            .write.mode("overwrite").parquet(f"{out_path}/dictionary")
        doc_lens.write.mode("overwrite").parquet(f"{out_path}/doc_lens")
        stats.withColumn("min_pack_avgdl", F.lit(avgdl_now)) \
            .write.mode("overwrite").parquet(f"{out_path}/stats")
        spark.read.parquet(f"{out_path}/docs_stream").drop("stream_batch") \
            .dropDuplicates(["doc_id"]) \
            .write.mode("overwrite").parquet(f"{out_path}/docs")
        if has_cs:
            # cs twin (P5 on a streamed index): same shards/blocks over
            # the case-preserving tokenization; dictionary from metadata
            packed_cs = pack_postings(
                spark.read.parquet(f"{out_path}/postings_logical_stream_cs")
                .drop("stream_batch"),
                doc_lens, stats, doc_shard_size, block_size,
            ).persist()
            try:
                packed_cs.repartition(N_TERM_BUCKETS, "term_bucket") \
                    .write.partitionBy("term_bucket").mode("overwrite") \
                    .parquet(f"{out_path}/postings_cs")
                dictionary_from_packed(packed_cs, stats) \
                    .write.mode("overwrite").parquet(f"{out_path}/dictionary_cs")
            finally:
                packed_cs.unpersist()
    finally:
        packed.unpersist()
    if local:
        reg = spark.read.parquet(f"{out_path}/doc_lens").agg(
            F.count("*").alias("n"), F.sum("dl").alias("s"), F.max("doc_id").alias("m"),
        ).collect()[0]
        _write_finalize_state(out_path, {
            "packed_batches": [int(b) for b in batch_ids],
            "min_pack_avgdl": float(avgdl_now),
            "max_doc_id": int(reg["m"]) if reg["m"] is not None else -1,
            "n_docs": int(reg["n"]),
            "sum_dl": int(reg["s"] or 0),
        })
    return {"mode": "repack", "n_new_batches": len(batch_ids)}
