from fastmorph_spark.index.build import (
    build_dictionary,
    build_doc_lens,
    build_docs,
    build_postings,
    global_stats,
)

__all__ = [
    "build_docs",
    "build_postings",
    "build_dictionary",
    "build_doc_lens",
    "global_stats",
]
