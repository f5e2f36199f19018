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
):
    """Start the ingest stream; returns the StreamingQuery.

    Each micro-batch appends postings_logical/stream_batch=<id>/ plus doc
    registry rows; the Structured Streaming checkpoint provides
    exactly-once file-source progress (a re-run never re-ingests).
    ``case_sensitive=True`` additionally logs the case-PRESERVING
    tokenization per batch (postings_logical_stream_cs/) so the finalize
    can pack the cs twin — streamed indexes then serve {"case": True}
    slots exactly like batch-built ones (same P5 surface)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns:
            return
        postings = build_postings(batch_df, text_col=text_col, id_col="doc_id")
        postings.withColumn("stream_batch", F.lit(int(batch_id))) \
            .write.mode("append").parquet(f"{out_path}/postings_logical_stream")
        if case_sensitive:
            build_postings(batch_df, text_col=text_col, id_col="doc_id",
                           fold_case=False) \
                .withColumn("stream_batch", F.lit(int(batch_id))) \
                .write.mode("append").parquet(f"{out_path}/postings_logical_stream_cs")
        build_docs(batch_df, id_col="doc_id").withColumn("stream_batch", F.lit(int(batch_id))) \
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


def _has_cs_log(out_path: str) -> bool:
    """Whether the stream was ingested with case_sensitive=True. The
    flag must be CONSISTENT across the stream's lifetime (every batch
    logs both tokenizations or neither) — enabling it mid-stream would
    leave the cs twin missing earlier batches' postings."""
    import os

    from fastmorph_spark.index.io import _strip_file_scheme

    return os.path.isdir(_strip_file_scheme(f"{out_path}/postings_logical_stream_cs"))


def _finalize_state_path(out_path: str) -> str:
    from fastmorph_spark.index.io import _strip_file_scheme

    return _strip_file_scheme(f"{out_path}/_finalize_state.json")


def _read_finalize_state(out_path: str) -> dict | None:
    import json
    import os

    p = _finalize_state_path(out_path)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _write_finalize_state(out_path: str, state: dict) -> None:
    import json
    import os

    p = _finalize_state_path(out_path)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, p)  # atomic: a crash never leaves a torn state file


def finalize_from_logical(
    spark: SparkSession,
    out_path: str,
    doc_shard_size: int = DOC_SHARD_SIZE,
    block_size: int = BLOCK_SIZE,
    incremental: bool = True,
    avgdl_drift_bound: float = AVGDL_DRIFT_BOUND,
) -> dict:
    """Idempotent physical finalize: recompute corpus-global stats from
    the accumulated logical postings, then pack blocks + dictionary.
    Run after each drain; output layout matches the batch builder's, so
    search_wand works unchanged. Returns {"mode": "append"|"repack"|
    "noop", ...counters}.

    INCREMENTAL path (default; VERDICT r03 #5 — a drain must not re-read
    the whole index): when a previous finalize's state exists, only the
    NEW stream batches are packed and appended under postings/ (blocks
    are self-contained per (term, doc_shard): decode, doc-range pruning
    and the WAND segment sweep never assume one pack pass). What must
    stay corpus-global is recomputed cheaply:
      - stats/doc_lens: one agg over the logical doc registry;
      - dictionary: derived from ALL packed blocks' METADATA columns
        (dictionary_from_packed — column-pruned scan, no payload bytes);
      - block impact bounds: old blocks keep their pack-time-avgdl
        impacts; stats carry min_pack_avgdl and search_wand scales bounds
        by avgdl_now/min_pack_avgdl (exact — impacts are monotone in
        avgdl). When that drift factor exceeds ``avgdl_drift_bound`` the
        pass falls back to a FULL repack (bounds would get too loose).
    Fallback to full repack also when doc_ids did not grow monotonically
    (new ids below the packed max would interleave doc ranges inside a
    term's block list, which the WAND covering step assumes disjoint).

    When the stream was ingested with ``case_sensitive=True`` the
    case-preserving twin (postings_cs/ + dictionary_cs/) is packed and
    appended the same way, so read_index serves {"case": True} slots
    from the streamed index exactly like a batch-built one.
    """
    from fastmorph_spark.constants import N_TERM_BUCKETS
    from fastmorph_spark.index.pack import dictionary_from_packed

    postings_all = read_stream_postings(spark, out_path)
    docs = spark.read.parquet(f"{out_path}/docs_stream").select("doc_id").distinct()
    dl_agg = postings_all.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    doc_lens = docs.join(dl_agg, "doc_id", "left") \
        .select("doc_id", F.coalesce("dl", F.lit(0)).cast("long").alias("dl"))
    stats = global_stats(doc_lens)
    srow = stats.collect()[0]
    avgdl_now = float(srow["avgdl"] or 0.0)

    batch_ids = sorted(
        r["stream_batch"]
        for r in spark.read.parquet(f"{out_path}/postings_logical_stream")
        .select("stream_batch").distinct().collect()
    )
    state = _read_finalize_state(out_path) if incremental else None
    mode = "repack"
    if state is not None:
        new_batches = [b for b in batch_ids if b not in set(state["packed_batches"])]
        if not new_batches:
            return {"mode": "noop", "n_new_batches": 0}
        min_pack_avgdl = min(float(state["min_pack_avgdl"]), avgdl_now)
        drift = avgdl_now / min_pack_avgdl if min_pack_avgdl > 0 else float("inf")
        new_post = spark.read.parquet(f"{out_path}/postings_logical_stream") \
            .filter(F.col("stream_batch").isin([int(b) for b in new_batches])) \
            .drop("stream_batch")
        new_min = new_post.agg(F.min("doc_id").alias("m")).collect()[0]["m"]
        monotone = new_min is None or new_min > int(state["max_doc_id"])
        if drift <= avgdl_drift_bound and monotone:
            mode = "append"

    if mode == "append":
        # pack ONLY the new batches (impacts at today's avgdl) and append
        stats_inc = stats.withColumn("min_pack_avgdl", F.lit(min_pack_avgdl))
        packed_new = pack_postings(new_post, doc_lens, stats, doc_shard_size, block_size)
        packed_new.repartition(N_TERM_BUCKETS, "term_bucket") \
            .write.partitionBy("term_bucket").mode("append").parquet(f"{out_path}/postings")
        # dictionary: metadata-only pass over the FULL block set (df/cf/
        # max_impact are exact sums/maxes over blocks; idf from new stats)
        all_packed = spark.read.parquet(f"{out_path}/postings")
        dictionary_from_packed(all_packed, stats) \
            .write.mode("overwrite").parquet(f"{out_path}/dictionary")
        if _has_cs_log(out_path):
            new_cs = spark.read.parquet(f"{out_path}/postings_logical_stream_cs") \
                .filter(F.col("stream_batch").isin([int(b) for b in new_batches])) \
                .drop("stream_batch")
            pack_postings(new_cs, doc_lens, stats, doc_shard_size, block_size) \
                .repartition(N_TERM_BUCKETS, "term_bucket") \
                .write.partitionBy("term_bucket").mode("append") \
                .parquet(f"{out_path}/postings_cs")
            dictionary_from_packed(spark.read.parquet(f"{out_path}/postings_cs"), stats) \
                .write.mode("overwrite").parquet(f"{out_path}/dictionary_cs")
        doc_lens.write.mode("overwrite").parquet(f"{out_path}/doc_lens")
        stats_inc.write.mode("overwrite").parquet(f"{out_path}/stats")
        spark.read.parquet(f"{out_path}/docs_stream").drop("stream_batch") \
            .dropDuplicates(["doc_id"]) \
            .write.mode("overwrite").parquet(f"{out_path}/docs")
        max_doc = doc_lens.agg(F.max("doc_id").alias("m")).collect()[0]["m"]
        _write_finalize_state(out_path, {
            "packed_batches": [int(b) for b in batch_ids],
            "min_pack_avgdl": float(min_pack_avgdl),
            "max_doc_id": int(max_doc),
        })
        return {"mode": "append", "n_new_batches": len(new_batches)}

    # FULL repack (first finalize, drift past bound, non-monotone ids, or
    # incremental=False)
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
        if _has_cs_log(out_path):
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
    max_doc = doc_lens.agg(F.max("doc_id").alias("m")).collect()[0]["m"]
    _write_finalize_state(out_path, {
        "packed_batches": [int(b) for b in batch_ids],
        "min_pack_avgdl": float(avgdl_now),
        "max_doc_id": int(max_doc) if max_doc is not None else -1,
    })
    return {"mode": "repack", "n_new_batches": len(batch_ids)}
