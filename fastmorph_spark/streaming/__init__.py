from fastmorph_spark.streaming.dedup import streaming_dedup_exact, streaming_quality_gate
from fastmorph_spark.streaming.incremental import finalize_from_logical, stream_ingest

__all__ = [
    "stream_ingest",
    "finalize_from_logical",
    "streaming_dedup_exact",
    "streaming_quality_gate",
]
