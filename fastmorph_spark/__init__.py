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

__all__ = ["BM25_K1", "BM25_B", "TOKEN_PATTERN"]
__version__ = "0.1.0"
