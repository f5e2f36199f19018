"""Lemma layer — deterministic rule stemmer in three rank-identical forms.

fastmorph's token slots match by word form OR by LEMMA [PK-high,
SURVEY.md §1.1]; the reference gets lemmas from its morphologically
annotated corpus. A code corpus has no annotation layer, so the lemma
analog here is a deterministic suffix-stripping stemmer: pinned rules,
first match wins, identical in

1. ``stem_py``     — plain Python (pure-Python oracle / query parsing)
2. ``stem_expr``   — Catalyst column expression (WholeStageCodegen,
                     used for dictionary-first stem-slot expansion)
3. ``DUCKDB_STEM`` — the same CASE chain as a DuckDB SQL fragment

Three-form identity is pinned by tests/test_stem.py over the fixture
vocabulary (the same discipline as the tokenizer — SURVEY.md §7
"hard parts").

The rules are intentionally tiny (this is a deterministic equivalence
class, not linguistics): ies->y, -ing, -ed, -s (not -ss/-us), with
minimum stem lengths so short tokens pass through unchanged.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# (guard regex — full match required, replace regex, replacement)
# Order matters: first matching rule wins.
STEM_RULES: list[tuple[str, str, str]] = [
    (r"^[a-z0-9_]{2,}ies$", r"ies$", "y"),   # queries -> query
    (r"^[a-z0-9_]{3,}ing$", r"ing$", ""),    # hashing -> hash
    (r"^[a-z0-9_]{3,}ed$", r"ed$", ""),      # joined  -> join
    (r"^[a-z0-9_]{2,}[^su]s$", r"s$", ""),   # joins -> join (keeps -ss/-us)
]

_COMPILED = [(re.compile(g), re.compile(p), r) for g, p, r in STEM_RULES]


def stem_py(token: str) -> str:
    """Stem one (already case-folded) token."""
    for guard, pat, rep in _COMPILED:
        if guard.match(token):
            return pat.sub(rep, token)
    return token


def stem_expr(col: Column | str) -> Column:
    """Catalyst twin of stem_py — a when-chain of anchored regexes."""
    c = F.col(col) if isinstance(col, str) else col
    out = None
    for guard, pat, rep in STEM_RULES:
        branch = F.regexp_replace(c, pat, rep)
        out = F.when(c.rlike(guard), branch) if out is None else out.when(c.rlike(guard), branch)
    return out.otherwise(c)


def duckdb_stem(col: str) -> str:
    """DuckDB SQL fragment computing stem({col}) — same CASE chain."""
    whens = "\n    ".join(
        f"WHEN regexp_matches({col}, '{g}') THEN regexp_replace({col}, '{p}', '{r}')"
        for g, p, r in STEM_RULES
    )
    return f"(CASE\n    {whens}\n    ELSE {col} END)"


DUCKDB_STEM = duckdb_stem("{col}")


# Driver-fixture twin (slot_case convention): the synthetic vocabulary is
# uninflected, so the paradigm driver query derives inflected forms
# deterministically in both engines — literal 3-arg `replace` on doc_id
# classes plants 'joins' and 'joined' next to 'join'.
PARADIGM_TEXT_SQL = (
    "CASE WHEN doc_id % 3 = 0 THEN replace(text, ' join ', ' joins ') "
    "WHEN doc_id % 4 = 0 THEN replace(text, ' join ', ' joined ') "
    "ELSE text END"
)


def paradigm_text_col():
    """Spark twin of PARADIGM_TEXT_SQL (same string, Spark SQL parser)."""
    from pyspark.sql import functions as F

    return F.expr(PARADIGM_TEXT_SQL)


def paradigm(dictionary, word: str):
    """Morphological paradigm view — the namesake surface of a morphology
    search engine: every dictionary form sharing `word`'s stem, with its
    df/cf. Dictionary-first (the ~|vocab|-row frame, stem_expr in JVM
    codegen), never a corpus pass. Output: (term, df, cf) ordered
    (cf DESC, term ASC)."""
    from pyspark.sql import functions as F

    target = stem_py(word.lower())
    return (
        dictionary.filter(stem_expr(F.col("term")) == target)
        .select("term", "df", "cf")
        .orderBy(F.desc("cf"), F.asc("term"))
    )
