"""T1 — canonical tokenizer, in three mutually rank-identical forms.

1. ``tokenize_udf``      — Arrow-vectorized pandas UDF (the mandated hot
                           path: "vectorized Arrow/pandas UDF tokenization",
                           BASELINE.json north_star; no per-row Python —
                           pandas ``str.findall`` is the vectorized idiom).
2. ``tokenize_expr``     — pure Catalyst column expression twin (whole-stage
                           codegen, zero Python); used where staying JVM-side
                           wins and by plan-parity tests.
3. ``DUCKDB_TOKENIZE``   — the identical DuckDB SQL fragment for oracles.

Tokenizer identity across the three paths is the #1 oracle-mismatch risk
(SURVEY.md §7 "hard parts") — tests/test_tokenize.py pins all three to the
same outputs.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from fastmorph_spark.constants import (
    CODE_BOUNDARY_A,
    CODE_BOUNDARY_B,
    TOKEN_PATTERN,
    TOKEN_PATTERN_CODE,
    TOKEN_PATTERN_CS,
    TOKEN_PATTERN_UNI_PY,
    TOKEN_SPLIT_PATTERN,
    TOKEN_SPLIT_PATTERN_CODE,
    TOKEN_SPLIT_PATTERN_CS,
    TOKEN_SPLIT_PATTERN_UNI,
)

_TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokenize_py(text: str | None) -> list[str]:
    """Single-string tokenizer — shared by the pure-Python oracle."""
    if not text:
        return []
    return _TOKEN_RE.findall(text.lower())


@pandas_udf(ArrayType(StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """Vectorized tokenizer: Series[str] -> Series[list[str]].

    ``str.findall(TOKEN_PATTERN)`` on the lowercased series == split on
    TOKEN_SPLIT_PATTERN with empties dropped, with no empty-string edge
    cases. Runs on Arrow batches inside the Python worker.
    """
    return texts.fillna("").str.lower().str.findall(TOKEN_PATTERN)


def tokenize_expr(col: Column | str) -> Column:
    """Catalyst-only twin of tokenize_udf (WholeStageCodegen, no Python)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(F.coalesce(c, F.lit(""))), TOKEN_SPLIT_PATTERN),
        lambda x: x != F.lit(""),
    )


# DuckDB fragment producing the same list<varchar>; {col} is the text column.
DUCKDB_TOKENIZE = (
    "list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9_]+'), x -> x <> '')"
)

# ---- case-preserving twins (per-slot case-sensitive slots, P5/engine.slot_search)

_TOKEN_RE_CS = re.compile(TOKEN_PATTERN_CS)


def tokenize_py_cs(text: str | None) -> list[str]:
    if not text:
        return []
    return _TOKEN_RE_CS.findall(text)


@pandas_udf(ArrayType(StringType()))
def tokenize_udf_cs(texts: pd.Series) -> pd.Series:
    """Case-preserving vectorized tokenizer. Same boundaries as
    tokenize_udf (ASCII classes fold onto each other), so positions from
    the two tokenizations of one text are interchangeable."""
    return texts.fillna("").str.findall(TOKEN_PATTERN_CS)


def tokenize_expr_cs(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.coalesce(c, F.lit("")), TOKEN_SPLIT_PATTERN_CS),
        lambda x: x != F.lit(""),
    )


DUCKDB_TOKENIZE_CS = (
    "list_filter(regexp_split_to_array({col}, '[^A-Za-z0-9_]+'), x -> x <> '')"
)

# ---- Unicode twin (VERDICT r04 #1): same 3-form rank-identical discipline,
# boundaries = runs of \p{L}\p{N}_ after lower(). Contract + out-of-contract
# characters documented at constants.TOKEN_PATTERN_UNI_PY; cross-engine
# identity pinned by tests/test_unicode.py.

_TOKEN_RE_UNI = re.compile(TOKEN_PATTERN_UNI_PY)


def tokenize_py_uni(text: str | None) -> list[str]:
    if not text:
        return []
    return _TOKEN_RE_UNI.findall(text.lower())


@pandas_udf(ArrayType(StringType()))
def tokenize_udf_uni(texts: pd.Series) -> pd.Series:
    """Unicode-aware vectorized tokenizer (Arrow batches; pandas
    str.findall of '\\w+' on the lowercased series)."""
    return texts.fillna("").str.lower().str.findall(TOKEN_PATTERN_UNI_PY)


def tokenize_expr_uni(col: Column | str) -> Column:
    """Catalyst twin: Java-regex split on non-[\\p{L}\\p{N}_] runs."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(F.coalesce(c, F.lit(""))), TOKEN_SPLIT_PATTERN_UNI),
        lambda x: x != F.lit(""),
    )


# ---- Unicode case-preserving twin (round 5, final): per-slot
# case-SENSITIVE matching over non-Latin corpora — the P5 cs-twin
# discipline extended to the uni tokenizer. Same split pattern, no fold.
# POSITION-SPACE CAVEAT: the cs twin shares positions with the folded
# twin wherever lower() preserves token boundaries — true for the
# contract classes (ASCII, Cyrillic: 1:1 case mappings), NOT for exotic
# mappings that change length (e.g. İ -> i̇). Same boundary argument the
# ASCII cs twin already relies on, stated here because Unicode widens
# the input space.


def tokenize_py_uni_cs(text: str | None) -> list[str]:
    if not text:
        return []
    return _TOKEN_RE_UNI.findall(text)


@pandas_udf(ArrayType(StringType()))
def tokenize_udf_uni_cs(texts: pd.Series) -> pd.Series:
    return texts.fillna("").str.findall(TOKEN_PATTERN_UNI_PY)


def tokenize_expr_uni_cs(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.coalesce(c, F.lit("")), TOKEN_SPLIT_PATTERN_UNI),
        lambda x: x != F.lit(""),
    )


DUCKDB_TOKENIZE_UNI_CS = (
    r"list_filter(regexp_split_to_array({col}, '[^\p{{L}}\p{{N}}_]+'),"
    " x -> x <> '')"
)


DUCKDB_TOKENIZE_UNI = (
    r"list_filter(regexp_split_to_array(lower({col}), '[^\p{{L}}\p{{N}}_]+'),"
    " x -> x <> '')"
)


# ---- code-identifier subtoken twin (round 5 closing wave): camelCase /
# acronym / snake_case splitting for source-code corpora (the contract
# input class). Pinned rule + cross-engine argument at
# constants.CODE_BOUNDARY_A; identity pinned by tests/test_code_tokenizer.

_CODE_A_RE = re.compile(CODE_BOUNDARY_A)
_CODE_B_RE = re.compile(CODE_BOUNDARY_B)
_TOKEN_RE_CODE = re.compile(TOKEN_PATTERN_CODE)


def tokenize_py_code(text: str | None) -> list[str]:
    if not text:
        return []
    t = _CODE_B_RE.sub(r"\1 \2", _CODE_A_RE.sub(r"\1 \2", text))
    return _TOKEN_RE_CODE.findall(t.lower())


@pandas_udf(ArrayType(StringType()))
def tokenize_udf_code(texts: pd.Series) -> pd.Series:
    """Vectorized subtoken tokenizer (Arrow batches; two pandas
    str.replace boundary passes, then lower + findall)."""
    return (
        texts.fillna("")
        .str.replace(CODE_BOUNDARY_A, r"\1 \2", regex=True)
        .str.replace(CODE_BOUNDARY_B, r"\1 \2", regex=True)
        .str.lower()
        .str.findall(TOKEN_PATTERN_CODE)
    )


def code_boundaries_expr(col: Column | str) -> Column:
    """Catalyst boundary-insertion passes (A then B) — shared by the
    tokenizer twin and the regexp_count doc-length fast path (boundary
    insertion never changes the token COUNT rule: tokens of the result
    under [a-z0-9]+ after lower() == the code tokenization)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(F.coalesce(c, F.lit("")), CODE_BOUNDARY_A, r"$1 $2")
    return F.regexp_replace(c, CODE_BOUNDARY_B, r"$1 $2")


def tokenize_expr_code(col: Column | str) -> Column:
    """Catalyst-only twin (WholeStageCodegen, no Python)."""
    return F.filter(
        F.split(F.lower(code_boundaries_expr(col)), TOKEN_SPLIT_PATTERN_CODE),
        lambda x: x != F.lit(""),
    )


DUCKDB_TOKENIZE_CODE = (
    r"list_filter(regexp_split_to_array(lower(regexp_replace(regexp_replace("
    r"{col}, '([a-z0-9])([A-Z])', '\1 \2', 'g'), "
    r"'([A-Z])([A-Z][a-z])', '\1 \2', 'g')), '[^a-z0-9]+'), x -> x <> '')"
)


def tokens_with_positions(df, text_col: str = "text", id_cols: tuple[str, ...] = ("doc_id",), use_udf: bool = True, fold_case: bool = True, tokenizer: str = "ascii"):
    """content -> one row per (doc, pos, term). Position = 0-based token index.

    The posexplode index IS the position payload (SURVEY.md T2) — no
    separate position bookkeeping needed. ``fold_case=False`` uses the
    case-preserving twin tokenizer (same boundaries -> same positions);
    ``tokenizer="uni"`` the Unicode twin (fold_case=False selects its
    case-preserving twin — boundary caveat at tokenize_py_uni_cs).
    """
    if tokenizer == "code":
        assert fold_case, "the code tokenizer has no case-preserving twin"
        tok = tokenize_udf_code(F.col(text_col)) if use_udf else tokenize_expr_code(text_col)
    elif tokenizer == "uni":
        if fold_case:
            tok = tokenize_udf_uni(F.col(text_col)) if use_udf else tokenize_expr_uni(text_col)
        else:
            tok = tokenize_udf_uni_cs(F.col(text_col)) if use_udf else tokenize_expr_uni_cs(text_col)
    elif fold_case:
        tok = tokenize_udf(F.col(text_col)) if use_udf else tokenize_expr(text_col)
    else:
        tok = tokenize_udf_cs(F.col(text_col)) if use_udf else tokenize_expr_cs(text_col)
    return (
        df.select(*id_cols, tok.alias("_tokens"))
        .select(*id_cols, F.posexplode("_tokens").alias("pos", "term"))
    )
