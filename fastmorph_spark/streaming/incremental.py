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
):
    """Start the ingest stream; returns the StreamingQuery.

    Each micro-batch appends postings_logical/stream_batch=<id>/ plus doc
    registry rows; the Structured Streaming checkpoint provides
    exactly-once file-source progress (a re-run never re-ingests)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns:
            return
        postings = build_postings(batch_df, text_col=text_col, id_col="doc_id")
        postings.withColumn("stream_batch", F.lit(int(batch_id))) \
            .write.mode("append").parquet(f"{out_path}/postings_logical_stream")
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


def finalize_from_logical(
    spark: SparkSession,
    out_path: str,
    doc_shard_size: int = DOC_SHARD_SIZE,
    block_size: int = BLOCK_SIZE,
) -> None:
    """Idempotent physical finalize: recompute corpus-global stats from
    the accumulated logical postings, then (re)pack blocks + dictionary.
    Run after a drain (or periodically); output layout matches the batch
    builder's, so search_wand works unchanged."""
    postings = read_stream_postings(spark, out_path)
    docs = spark.read.parquet(f"{out_path}/docs_stream").select("doc_id").distinct()
    dl_agg = postings.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    doc_lens = docs.join(dl_agg, "doc_id", "left") \
        .select("doc_id", F.coalesce("dl", F.lit(0)).cast("long").alias("dl"))
    stats = global_stats(doc_lens)
    dictionary = build_dictionary(postings)
    packed = pack_postings(postings, doc_lens, stats, doc_shard_size, block_size)
    packed.persist()
    try:
        from fastmorph_spark.constants import N_TERM_BUCKETS

        packed.repartition(N_TERM_BUCKETS, "term_bucket") \
            .write.partitionBy("term_bucket").mode("overwrite").parquet(f"{out_path}/postings")
        dictionary_with_max_score(dictionary, packed, stats) \
            .write.mode("overwrite").parquet(f"{out_path}/dictionary")
        doc_lens.write.mode("overwrite").parquet(f"{out_path}/doc_lens")
        stats.write.mode("overwrite").parquet(f"{out_path}/stats")
        spark.read.parquet(f"{out_path}/docs_stream").drop("stream_batch") \
            .dropDuplicates(["doc_id"]) \
            .write.mode("overwrite").parquet(f"{out_path}/docs")
    finally:
        packed.unpersist()
