from fastmorph_spark.search.bm25 import bm25_score_col, bm25_topk_expression, corpus_stats

__all__ = ["bm25_topk_expression", "bm25_score_col", "corpus_stats"]
