from fastmorph_spark.streaming.incremental import finalize_from_logical, stream_ingest

__all__ = ["stream_ingest", "finalize_from_logical"]
