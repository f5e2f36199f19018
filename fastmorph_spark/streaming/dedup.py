"""Streaming training-data hygiene: exact dedup and quality gating on a
document STREAM (the ingest-time filters a 100 TB pipeline runs before
anything lands in the corpus).

Spark-first shapes:

- ``streaming_dedup_exact`` — Structured Streaming's own stateful
  ``dropDuplicates`` on the content hash: state lives in the streaming
  state store (RocksDB/HDFS-backed at scale), is exactly-once under the
  checkpoint, and spans micro-batches — a doc seen in batch 0 is dropped
  when it reappears in batch 7. With ``watermark_col``/``delay`` the
  state is bounded (``dropDuplicatesWithinWatermark``): classic
  unbounded-state vs late-dup tradeoff, caller's policy knob.

- ``streaming_quality_gate`` — stateless per-row filter (pure column
  expressions, codegen): the quality_score features computed on the
  stream, rows below ``min_quality`` dropped before they cost storage.

Both return plain (streaming) DataFrames — compose with stream_ingest's
foreachBatch sink or any writeStream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup_exact(
    stream_df: DataFrame,
    text_col: str = "text",
    watermark_col: str | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """Keep the first occurrence of each distinct content (sha256) across
    the whole stream; later byte-identical docs are dropped statefully."""
    out = stream_df.withColumn("content_sha256", F.sha2(F.col(text_col), 256))
    if watermark_col is not None:
        return out.withWatermark(watermark_col, delay) \
            .dropDuplicatesWithinWatermark(["content_sha256"])
    return out.dropDuplicates(["content_sha256"])


def streaming_quality_gate(
    stream_df: DataFrame,
    min_quality: float = 0.25,
    text_col: str = "text",
) -> DataFrame:
    """Drop low-quality docs at ingest: the same composite quality
    expression as ops.text.quality_score (pinned semantics, shared
    builder), applied as a stateless per-row filter — no join, no state,
    pure codegen."""
    from fastmorph_spark.constants import SCORE_DECIMALS
    from fastmorph_spark.ops.text import quality_expr

    # compare the ROUNDED score — quality_score reports rounded values,
    # so the gate's keep-set equals a batch filter on its output exactly
    return stream_df.filter(
        F.round(quality_expr(text_col), SCORE_DECIMALS) >= min_quality
    )
