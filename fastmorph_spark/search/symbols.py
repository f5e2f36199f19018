"""Symbol-aware ranking and navigation (round 5 code-search wave).

Code search ranks a file DEFINING the queried identifier above files
merely mentioning it — zoekt scores symbol-atom matches above content
matches, Sourcegraph's symbol tab is the same signal. Pinned semantics
(mirrored verbatim in the DuckDB oracle):

    score(doc) = bm25(folded symbol token, doc)
               + SYMBOL_BOOST * [doc has a definition line whose
                                 extracted symbol == query, case-exact]

with the canonical tie-break (score DESC, doc_id ASC) and ranking over
the UNROUNDED score. The boost dominates any realistic BM25 value, so
defining docs sort first while keeping ONE sort key (no lexicographic
two-pass) and full BM25 order within each stratum.

Containment invariant: a def line textually contains the symbol, and
the ASCII tokenizer's alphabet [a-z0-9_] is a superset of the def
pattern's symbol alphabet after folding — so every boosted doc already
has a BM25 row, and the boost can join onto the scored frame (left)
without inventing docs.

Scale shape: identical to the expression BM25 path (tf filtered to the
one query term before any join, df agg + global stats broadcast,
TakeOrderedAndProject cut) plus ONE extra broadcast: the defining-doc
id set for a single symbol is tiny by construction (it is a top-k
query's candidate elite, not a corpus scan output — the def scan itself
is the same pure-Catalyst split/posexplode as search/grep.code_defs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fastmorph_spark.constants import SCORE_DECIMALS, SYMBOL_BOOST
from fastmorph_spark.search.bm25 import (
    bm25_score_col,
    corpus_stats,
    sum_term_scores,
)
from fastmorph_spark.search.grep import DEF_PATTERN, split_lines
from fastmorph_spark.tokenize import tokenize_py


def defining_docs(corpus: DataFrame, symbol: str, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Distinct doc ids with a definition line for ``symbol`` (exact,
    case-sensitive — a symbol is an identifier, not prose)."""
    lines = split_lines(corpus, text_col=text_col, id_col=id_col)
    return (
        lines.filter(F.regexp_extract(F.col("line"), DEF_PATTERN, 2) == symbol)
        .select(id_col)
        .distinct()
    )


def symbol_boosted_topk(
    corpus: DataFrame,
    symbol: str,
    k: int = 10,
    boost: float = SYMBOL_BOOST,
    text_col: str = "text",
    id_col: str = "doc_id",
    scope=None,
) -> DataFrame:
    """Top-k (rank, doc_id, score) for a symbol query: canonical BM25 on
    the folded token + ``boost`` for docs DEFINING the symbol. The
    symbol must fold to exactly one ASCII token (identifiers do; phrase
    queries belong to bm25/slot search)."""
    folded = tokenize_py(symbol)
    if len(folded) != 1:
        raise ValueError(
            f"symbol must fold to exactly one token, got {folded!r}")
    from fastmorph_spark.cache import pin

    tf, _, global_stats = corpus_stats(corpus, text_col=text_col, id_col=id_col)
    matched = pin(tf.filter(F.col("term") == folded[0]), scope)
    df_t = matched.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        matched.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(global_stats))
        .withColumn(
            "term_score",
            bm25_score_col(F.col("tf"), F.col("df"), F.col("n_docs"),
                           F.col("dl"), F.col("avgdl")),
        )
    )
    scored = sum_term_scores(scored, id_col)
    defs = defining_docs(corpus, symbol, text_col=text_col, id_col=id_col) \
        .withColumn("_is_def", F.lit(1))
    boosted = (
        scored.join(F.broadcast(defs), id_col, "left")
        .withColumn(
            "score",
            F.col("score") + F.when(F.col("_is_def").isNotNull(),
                                    F.lit(float(boost))).otherwise(F.lit(0.0)),
        )
    )
    topk = boosted.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    w_rank = F.row_number().over(Window.orderBy(F.desc("score"), F.asc(id_col)))
    return topk.select(
        w_rank.alias("rank"),
        F.col(id_col).alias("doc_id"),
        F.round("score", SCORE_DECIMALS).alias("score"),
    )
