"""fastmorph_spark — a PySpark-native full-text index + BM25 search engine.

A brand-new engine with the query capabilities of ``mansayk/fastmorph``
(a C, in-RAM, multithreaded corpus search server — see SURVEY.md §0 for
the evidence status of the reference), re-expressed Spark-first:

- corpus scan -> vectorized (Arrow/pandas UDF) tokenization
- sorted, delta+varbyte-compressed inverted index
  (term -> docID-gap posting lists with tf + position payloads)
- BM25 top-k with posting-list intersection and Block-Max WAND pruning
- phrase / proximity / wildcard / subcorpus-filter query operators
  (the fastmorph token-slot semantics, SURVEY.md §1.1)
- resumable, skew-aware (salted) distributed index builds

Everything here derives from public knowledge only: the PySpark API,
published IR literature (BM25, Block-Max WAND, varbyte posting
compression), and the capability contract in BASELINE.json.
"""

from fastmorph_spark.constants import BM25_B, BM25_K1, TOKEN_PATTERN


def __getattr__(name):
    """Lazy top-level API (keeps `import fastmorph_spark` free of a
    SparkSession/pyspark.sql import cascade until first use)."""
    lazy = {
        "build_index_frames": ("fastmorph_spark.index.io", "build_index_frames"),
        "write_index": ("fastmorph_spark.index.io", "write_index"),
        "read_index": ("fastmorph_spark.index.io", "read_index"),
        "compact_postings": ("fastmorph_spark.index.io", "compact_postings"),
        "build_index_resumable": ("fastmorph_spark.index.manifest", "build_index_resumable"),
        "search_wand": ("fastmorph_spark.search.wand", "search_wand"),
        "bm25_topk_expression": ("fastmorph_spark.search.bm25", "bm25_topk_expression"),
        "slot_search": ("fastmorph_spark.search.engine", "slot_search"),
        "search_request": ("fastmorph_spark.search.engine", "search_request"),
        "kwic": ("fastmorph_spark.search.engine", "kwic"),
        "benchmark_contamination": ("fastmorph_spark.ops.decontam", "benchmark_contamination"),
        "ngram_freq": ("fastmorph_spark.ops.text", "ngram_freq"),
        "delete_docs": ("fastmorph_spark.index.tombstones", "delete_docs"),
        "purge_tombstones": ("fastmorph_spark.index.tombstones", "purge_tombstones"),
        "handle_request": ("fastmorph_spark.search.protocol", "handle_request"),
        "parse_request": ("fastmorph_spark.search.protocol", "parse_request"),
        "parse_cql": ("fastmorph_spark.search.cql", "parse_cql"),
        "corpus_summary": ("fastmorph_spark.search.keyness", "corpus_summary"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)


__all__ = [
    "BM25_K1", "BM25_B", "TOKEN_PATTERN",
    "build_index_frames", "write_index", "read_index", "compact_postings",
    "build_index_resumable", "search_wand", "bm25_topk_expression",
    "slot_search", "search_request", "kwic", "benchmark_contamination",
    "ngram_freq", "delete_docs", "purge_tombstones",
    "handle_request", "parse_request", "parse_cql", "corpus_summary",
]
__version__ = "0.2.0"
