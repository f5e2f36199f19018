"""Token-class ("tag") layer — the morph-tag analog, in three
rank-identical forms.

fastmorph's token slots constrain word form / lemma / MORPH TAG [PK-high,
SURVEY.md §1.1]; the reference gets tags from its morphologically
annotated corpus. An unannotated code/query corpus has no morphology, so
the tag analog is a deterministic TOKEN CLASSIFIER: every (case-folded)
token belongs to exactly one class, first-match-wins:

  number    ^[0-9]+$              literal numerals
  keyword   pinned operator list  query-language keywords (join, sort, …)
  stopword  pinned function-word list (a, the, and, …)
  ident     everything else       identifiers / content words

Like the stemmer (fastmorph_spark.stem), the classifier exists in three
pinned, mutually identical forms:

1. ``tag_py``     — plain Python (pure-Python oracle / query parsing)
2. ``tag_expr``   — Catalyst column expression (WholeStageCodegen; used
                    for dictionary-first tag-slot expansion, so the
                    classifier runs over the ~|vocab|-row dictionary,
                    never per posting)
3. ``duckdb_tag`` — the same CASE chain as a DuckDB SQL fragment

Three-form identity is pinned by tests/test_tags.py over the fixture
vocabulary (the tokenizer/stemmer discipline — SURVEY.md §7 "hard
parts"). The lists are part of the engine's pinned constants: changing
them is a semantic change and breaks oracle parity on purpose.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

NUMBER_RE = r"^[0-9]+$"

# Pinned, ORDERED-for-display but set-semantics lists. Keyword list =
# query-operator vocabulary (the corpus is code/query text); stopwords =
# English function words. A token in both would classify as keyword
# (keyword wins — earlier in the match order); the lists are disjoint.
TAG_KEYWORDS: tuple[str, ...] = (
    "agg", "filter", "from", "group", "hash", "join", "limit", "merge",
    "order", "scan", "select", "sort", "union", "where", "window",
)
TAG_STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "at", "in", "is", "of", "on", "or", "the", "to",
)

TAG_CLASSES = ("number", "keyword", "stopword", "ident")

_NUMBER_RE = re.compile(NUMBER_RE)
_KW = frozenset(TAG_KEYWORDS)
_SW = frozenset(TAG_STOPWORDS)


def tag_py(token: str) -> str:
    """Classify one (already case-folded) token."""
    if _NUMBER_RE.match(token):
        return "number"
    if token in _KW:
        return "keyword"
    if token in _SW:
        return "stopword"
    return "ident"


def tag_expr(col: Column | str) -> Column:
    """Catalyst twin of tag_py — rlike + isin when-chain, codegen'd."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c.rlike(NUMBER_RE), F.lit("number"))
        .when(c.isin(list(TAG_KEYWORDS)), F.lit("keyword"))
        .when(c.isin(list(TAG_STOPWORDS)), F.lit("stopword"))
        .otherwise(F.lit("ident"))
    )


def duckdb_tag(col: str) -> str:
    """DuckDB SQL fragment computing tag({col}) — same CASE chain."""
    kw = ", ".join(f"'{w}'" for w in TAG_KEYWORDS)
    sw = ", ".join(f"'{w}'" for w in TAG_STOPWORDS)
    return (
        "(CASE"
        f" WHEN regexp_matches({col}, '{NUMBER_RE}') THEN 'number'"
        f" WHEN {col} IN ({kw}) THEN 'keyword'"
        f" WHEN {col} IN ({sw}) THEN 'stopword'"
        " ELSE 'ident' END)"
    )
