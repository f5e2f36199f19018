"""M0 — BM25 scoring as pure DataFrame expressions (T6/A1-A3/A5/O1).

This is the index-free path: tokenize -> tf agg -> doc stats -> score ->
top-k, entirely in Catalyst-optimizable operators (the only Python is the
Arrow-vectorized tokenizer). It is both the flagship `entry()` query and
the semantic yardstick every faster path (M1 logical index, M3 WAND) must
match rank-identically.

Pinned semantics (must mirror tests/oracle_bm25.py and the DuckDB SQL):
- query terms are DEDUPLICATED (set semantics);
- the BM25 universe is the (optionally lang-filtered) document set:
  N = count(docs), dl = token count (0 for empty docs), avgdl = mean dl;
- idf = ln(1 + (N - df + 0.5)/(df + 0.5)); k1 = 1.2, b = 0.75; float64;
- tie-break (score DESC, doc_id ASC).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fastmorph_spark.constants import BM25_B, BM25_K1, SCORE_DECIMALS
from fastmorph_spark.tokenize import tokenize_py


def sum_term_scores(scored: DataFrame, id_col: str = "doc_id",
                    score_col: str = "term_score") -> DataFrame:
    """Per-doc score = fold of term scores in SORTED TERM ORDER.

    A plain F.sum over shuffled float64 rows is last-bit nondeterministic
    (addition isn't associative); folding a term-sorted array makes every
    path — expression BM25, index-backed, WAND kernel, Python oracle —
    bit-identical run to run (SURVEY.md §4 determinism rules). Per doc the
    array holds at most |query| elements, so cost is negligible.
    """
    return (
        scored.groupBy(id_col)
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("term", score_col))),
                F.lit(0.0),
                lambda acc, x: acc + x[score_col],
            ).alias("score")
        )
    )


def bm25_score_col(tf: Column, df: Column, n_docs: Column, dl: Column, avgdl: Column) -> Column:
    """The one canonical BM25 formula, as a float64 column expression.

    Pinned parenthesization: score = idf * (tf*(k1+1) / denom) — the
    idf-free factor ("impact") is what the packed index stores as its
    block maxima, so EVERY path (expression, SQL oracle, Python oracle,
    WAND kernel) must multiply idf LAST for bit-identical float64.
    """
    idf = F.log(F.lit(1.0) + (n_docs.cast("double") - df + F.lit(0.5)) / (df + F.lit(0.5)))
    tf_d = tf.cast("double")
    denom = tf_d + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * dl.cast("double") / avgdl)
    return idf * (tf_d * F.lit(BM25_K1 + 1.0) / denom)


def corpus_stats(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id", tokenizer: str = "ascii"):
    """(term_freqs, doc_lens, global_stats) over a document set.

    - term_freqs: (id_col, term, tf, dl)       [A1 — PARTITION-LOCAL
      mapInPandas kernel (index.build.build_postings): a (term, doc) group
      lives inside one document row, so no shuffle, no agg hash map; dl
      rides along so scoring needs no doc_lens join]
    - doc_lens:   (id_col, dl) for ALL docs    [A3; dl=0 for empty docs —
      regexp_count == token count, tokenizer-parity tested; no join]
    - global_stats: 1-row (n_docs, avgdl)      [A3]
    """
    from fastmorph_spark.constants import TOKEN_PATTERN, TOKEN_PATTERN_UNI_JAVA
    from fastmorph_spark.index.build import build_postings

    tf = build_postings(documents, text_col=text_col, id_col=id_col,
                        with_positions=False, tokenizer=tokenizer)
    if id_col != "doc_id":
        tf = tf.withColumnRenamed("doc_id", id_col)
    if tokenizer == "code":
        from fastmorph_spark.constants import TOKEN_PATTERN_CODE
        from fastmorph_spark.tokenize import code_boundaries_expr

        counted = F.lower(code_boundaries_expr(F.col(text_col)))
        count_pattern = TOKEN_PATTERN_CODE
    else:
        counted = F.lower(F.coalesce(F.col(text_col), F.lit("")))
        count_pattern = TOKEN_PATTERN_UNI_JAVA if tokenizer == "uni" else TOKEN_PATTERN
    doc_lens = documents.select(
        id_col,
        F.regexp_count(counted, F.lit(count_pattern)).cast("long").alias("dl"),
    )
    global_stats = doc_lens.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    return tf, doc_lens, global_stats


def bm25_scores(
    documents: DataFrame,
    query_text: str,
    lang: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    scope=None,
    tokenizer: str = "ascii",
) -> DataFrame:
    """Per-doc BM25 scores (id_col, score) for ALL docs matching an OR
    query — the un-truncated scoring core shared by bm25_topk_expression
    (which TakeOrdered-limits it) and repo_rank (which max-aggregates it
    per repo). Plan shape at scale: the tf table is filtered to the
    (tiny) query-term set BEFORE any join, both per-term df aggs and the
    1-row global stats broadcast."""
    import re as _re

    from fastmorph_spark.tokenize import tokenize_py_code, tokenize_py_uni

    tok_py = {"uni": tokenize_py_uni, "code": tokenize_py_code}.get(tokenizer, tokenize_py)
    qterms = sorted(set(tok_py(query_text)))
    docs = documents.filter(F.col("lang") == lang) if lang else documents
    if not qterms:
        return docs.select(F.col(id_col), F.lit(0.0).alias("score")).filter(F.lit(False))

    # Optimization r06 (guide §4.1 "prefer built-ins", §2.3/§2.4): the OR
    # query needs only tf of the |q| query terms per doc — ONE pure-JVM
    # regexp_count per term (term-as-token: the literal bounded by
    # non-token-char lookarounds) replaces the full Arrow tokenize pass,
    # its positions machinery, and the per-doc score shuffle. Plan shape:
    # pinned narrow scan -> 1-row agg (n_docs/avgdl/df per term,
    # broadcast) -> score projection -> filter. ZERO exchanges of
    # per-doc rows, no Python.
    #
    # Bit-identity with the tokenize path (tested): tf/df/dl counts are
    # exact integers (token-count parity pinned by the tokenizer tests);
    # the score fold adds per-term scores in SORTED TERM ORDER exactly as
    # sum_term_scores does, with absent terms contributing literal 0.0
    # (x + 0.0 is bit-exact identity for the non-negative scores here).
    from fastmorph_spark.index.build import doc_len_count
    from fastmorph_spark.tokenize import code_boundaries_expr

    if tokenizer == "code":
        counted = F.lower(code_boundaries_expr(F.col(text_col)))
        cls = "a-z0-9"
    elif tokenizer == "uni":
        counted = F.lower(F.coalesce(F.col(text_col), F.lit("")))
        cls = r"\p{L}\p{N}_"
    else:
        counted = F.lower(F.coalesce(F.col(text_col), F.lit("")))
        cls = "a-z0-9_"

    def term_count(t: str) -> Column:
        # tokens are maximal token-char runs, and query terms consist of
        # token chars only, so occurrences-as-token == occurrences of the
        # literal with non-token-char (or edge) on both sides
        return F.regexp_count(counted, F.lit(f"(?<![{cls}]){_re.escape(t)}(?![{cls}])"))

    tf_cols = [term_count(t).alias(f"_tf{i}") for i, t in enumerate(qterms)]
    base = docs.select(F.col(id_col), doc_len_count(text_col, tokenizer).alias("_dl"),
                       *tf_cols)
    # the narrow (id, dl, tf...) frame feeds BOTH the 1-row stats agg and
    # the scoring pass — pin it so the corpus text is scanned ONCE per
    # query (the old tokenize path scanned it twice: kernel + dl count).
    # Measured: pinned beats two regexp passes at 5k AND 100k docs.
    # Lifetime contract unchanged from the historical matched-table pin:
    # scope= frees on scope close, else the caller owns it (clearCache).
    from fastmorph_spark.cache import pin

    base = pin(base, scope)
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.avg("_dl").alias("avgdl"),
        *[F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
          for i in range(len(qterms))],
    )
    matched_any = None
    score = F.lit(0.0)
    for i in range(len(qterms)):
        tf_i = F.col(f"_tf{i}")
        s_i = bm25_score_col(tf_i, F.col(f"_df{i}"), F.col("n_docs"),
                             F.col("_dl"), F.col("avgdl"))
        score = score + F.when(tf_i > 0, s_i).otherwise(F.lit(0.0))
        matched_any = (tf_i > 0) if matched_any is None else (matched_any | (tf_i > 0))
    return (
        base.crossJoin(F.broadcast(stats))
        .filter(matched_any)
        .select(F.col(id_col), score.alias("score"))
    )


def bm25_topk_expression(
    documents: DataFrame,
    query_text: str,
    k: int = 10,
    lang: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_score: bool = False,
    scope=None,
    tokenizer: str = "ascii",
) -> DataFrame:
    """Top-k docs for an OR (disjunctive) BM25 query, index-free.

    Returns (rank, doc_id, score). Plan shape at scale: see bm25_scores;
    additionally orderBy+limit fuses into TakeOrderedAndProject — no
    global sort materializes. ``tokenizer="uni"`` scores over the
    Unicode tokenization (query terms fold through the same tokenizer,
    so a Cyrillic query works end-to-end)."""
    scored = bm25_scores(documents, query_text, lang=lang, text_col=text_col,
                         id_col=id_col, scope=scope, tokenizer=tokenizer)
    topk = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    # rank over the UNROUNDED score (oracle parity); round only for output
    w_rank = F.row_number().over(Window.orderBy(F.desc("score"), F.asc(id_col)))
    out = topk.select(w_rank.alias("rank"), F.col(id_col).alias("doc_id"), "score")
    if round_score:
        out = out.withColumn("score", F.round("score", SCORE_DECIMALS))
    return out
