"""Grep-style line reporting + definition extraction for source-code
corpora (round 5 closing wave).

A code search engine's result unit is (file, line number, line text) —
the grep/ripgrep/zoekt contract — not a bare doc id. Both operators here
are PURE Catalyst (split + posexplode + regexp; WholeStageCodegen, zero
Python), so at 100 TB they pipeline over the corpus scan with no shuffle
at all: the only wide operation in a grep job is the final ORDER BY the
caller may add, and callers that stream results (the serving layer) can
skip even that.

- ``grep_lines``: lines whose TOKEN set contains the query term
  (token-boundary exact — 'log' does not hit 'dialog'; matching is the
  canonical ASCII tokenizer so it composes with every corpus-path
  operator).
- ``code_defs``: definition lines (def/class/function/func + identifier),
  the zoekt/ctags-style symbol surface. One pinned cross-engine pattern:
  Java regexp_extract and DuckDB/RE2 regexp_extract agree on this
  alternation because 'function' precedes its prefix 'func' (leftmost-
  first in Java == leftmost-longest in RE2 on this input, and no
  backtracking subtlety either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastmorph_spark.tokenize import tokenize_expr, tokenize_py

# pinned definition-line pattern (shared verbatim with the DuckDB oracle):
# group 1 = kind, group 2 = symbol. [ \t] rather than \s — per-line input
# can't contain newlines, and the byte-class is engine-identical.
DEF_PATTERN = r"^[ \t]*(def|class|function|func)[ \t]+([A-Za-z_][A-Za-z0-9_]*)"


def split_lines(corpus: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(id_col, line_no, line): 1-based line numbers via posexplode —
    the position index IS the line number, no window, no shuffle."""
    return corpus.select(
        id_col,
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"))
        .alias("_p", "line"),
    ).select(
        id_col,
        (F.col("_p") + 1).cast("int").alias("line_no"),
        "line",
    )


def grep_lines(corpus: DataFrame, term: str, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """All (doc, line_no, line) whose line contains ``term`` as a whole
    token (canonical ASCII tokenizer). ``term`` must fold to exactly one
    token — multi-token queries belong to phrase/slot search."""
    folded = tokenize_py(term)
    if len(folded) != 1:
        raise ValueError(f"grep term must fold to one token, got {folded!r}")
    lines = split_lines(corpus, text_col=text_col, id_col=id_col)
    return (
        lines.where(F.array_contains(tokenize_expr(F.col("line")), folded[0]))
        .orderBy(id_col, "line_no")
    )


def code_defs(corpus: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Definition/symbol lines: (id_col, line_no, kind, symbol).

    regexp_extract evaluates once per output column on the same pinned
    pattern; rows with no match (kind = '') are filtered, mirroring the
    oracle's regexp_matches gate.
    """
    lines = split_lines(corpus, text_col=text_col, id_col=id_col)
    return (
        lines.select(
            id_col,
            "line_no",
            F.regexp_extract(F.col("line"), DEF_PATTERN, 1).alias("kind"),
            F.regexp_extract(F.col("line"), DEF_PATTERN, 2).alias("symbol"),
        )
        .where(F.col("kind") != "")
        .orderBy(id_col, "line_no")
    )


def path_filter(corpus: DataFrame, like: str,
                path_col: str = "path") -> DataFrame:
    """zoekt's `file:` filter over the CONTRACT corpus shape: (repo,
    path) rows whose path matches the SQL LIKE pattern (%/_ wildcards —
    LIKE is engine-identical between Spark and DuckDB, unlike glob
    dialects). Pure scan+filter: Catalyst prunes to the two columns and
    pushes StringContains/StartsWith derivations of the pattern into
    parquet where possible."""
    return (
        corpus.filter(F.col(path_col).like(like))
        .select("repo", path_col)
        .orderBy("repo", path_col)
    )


def grep_context(corpus: DataFrame, term: str, context: int = 2,
                 text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """grep -C: matching lines PLUS ``context`` lines either side,
    overlapping windows merged (each line appears once), match lines
    flagged. Returns (id_col, line_no, line, is_match with is_match a
    0/1 BIGINT — engine-portable, no bool dtype drift).

    Shape: per-doc match line numbers are one collect_set groupBy
    (bounded by matches-per-doc), joined back on the doc key — matching
    docs only, so the join's build side is the hit set, not the corpus —
    then a HOF ``exists`` keeps lines within ``context`` of any match.
    Two passes over the corpus scan (hit detection, context selection);
    both pipeline with no shuffle beyond the one doc-keyed join."""
    folded = tokenize_py(term)
    if len(folded) != 1:
        raise ValueError(f"grep term must fold to one token, got {folded!r}")
    if context < 0:
        raise ValueError("context must be >= 0")
    lines = split_lines(corpus, text_col=text_col, id_col=id_col)
    hits = (
        lines.where(F.array_contains(tokenize_expr(F.col("line")), folded[0]))
        .groupBy(id_col)
        .agg(F.collect_set("line_no").alias("_mls"))
    )
    return (
        lines.join(hits, id_col)
        .where(F.exists(F.col("_mls"),
                        lambda m: F.abs(F.col("line_no") - m) <= F.lit(context)))
        .select(
            id_col,
            "line_no",
            "line",
            F.array_contains(F.col("_mls"), F.col("line_no"))
            .cast("long").alias("is_match"),
        )
        .orderBy(id_col, "line_no")
    )


def repo_rank(corpus: DataFrame, query_text: str, k: int = 10,
              text_col: str = "content", id_col: str = "doc_id",
              repo_col: str = "repo", tokenizer: str = "code",
              scope=None) -> DataFrame:
    """zoekt's repo result grouping, scored: repos ranked by their
    BEST-matching file's BM25 score for the query, with the matching
    file count as the facet. Returns (rank, repo, score, n_files).

    Shape: bm25_scores (un-truncated scoring core — query-term-filtered
    tf, broadcast df/stats) joined back to the (id, repo) projection on
    the doc key — the standard score-joins-metadata lookup (J5), sized
    by the MATCH set, not the corpus — then one groupBy(repo) whose
    max/count partial-aggregates map-side; orderBy+limit fuses into
    TakeOrderedAndProject. Score is max (not sum) so a repo with many
    weak files cannot outrank one strong definition site."""
    from fastmorph_spark.constants import SCORE_DECIMALS
    from fastmorph_spark.search.bm25 import bm25_scores

    scores = bm25_scores(corpus, query_text, text_col=text_col,
                         id_col=id_col, scope=scope, tokenizer=tokenizer)
    repos = corpus.select(id_col, repo_col)
    per_repo = (
        scores.join(repos, id_col)
        .groupBy(repo_col)
        .agg(F.max("score").alias("score"),
             F.count("*").cast("long").alias("n_files"))
    )
    topk = per_repo.orderBy(F.desc("score"), F.asc(repo_col)).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc(repo_col))
    return topk.select(
        F.row_number().over(w).alias("rank"),
        repo_col,
        F.round("score", SCORE_DECIMALS).alias("score"),
        "n_files",
    )


def repo_match_counts(corpus: DataFrame, term: str,
                      text_col: str = "content",
                      tokenizer: str = "code") -> DataFrame:
    """Per-repo facet for a code-search hit list: repos ranked by how
    many of their files contain ``term`` as a (sub)token — the
    result-grouping header a code-search UI shows. One map-side-partial
    groupBy; no join (the repo key rides the corpus row)."""
    from fastmorph_spark.tokenize import (
        tokenize_expr,
        tokenize_expr_code,
        tokenize_py,
        tokenize_py_code,
    )

    tok_expr, tok_py = {
        "code": (tokenize_expr_code, tokenize_py_code),
    }.get(tokenizer, (tokenize_expr, tokenize_py))
    folded = tok_py(term)
    if len(folded) != 1:
        raise ValueError(f"facet term must fold to one token, got {folded!r}")
    return (
        corpus.filter(F.array_contains(tok_expr(F.col(text_col)), folded[0]))
        .groupBy("repo")
        .agg(F.count("*").cast("long").alias("n_files"))
        .orderBy(F.desc("n_files"), F.asc("repo"))
    )
