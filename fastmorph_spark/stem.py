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
