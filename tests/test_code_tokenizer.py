"""Code-identifier subtoken tokenizer twin + grep/defs (round 5 closing
wave): 3-form rank-identity, fixture parity between engines, boundary-rule
pins, and the grep/symbol operators' semantics.

Pinned contract (constants.CODE_BOUNDARY_A notes): boundary pass A between
lower/digit and upper, pass B between acronym and capitalized word (A then
B), then lower() and tokens = [a-z0-9] runs (underscore separates).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fastmorph_spark.search.grep import DEF_PATTERN, code_defs, grep_lines
from fastmorph_spark.tokenize import (
    DUCKDB_TOKENIZE_CODE,
    tokenize_expr_code,
    tokenize_py_code,
    tokenize_udf_code,
)

SAMPLES = [
    "parseJSONResponse",                    # camel + acronym
    "XMLHttpRequest",                       # leading acronym
    "MAX_BUFFER_SIZE",                      # ALL_CAPS snake
    "snake_case_util",
    "camelCaseVar2",                        # trailing digit stays attached
    "BM25Scorer",                           # digits inside an acronym
    "httpURL2Parser",
    "def getUserID(x):\n    return 1",
    "ABCDef", "AAa", "a1B2c",
    "", "___", "(){};",
]

PINNED = {
    "parseJSONResponse": ["parse", "json", "response"],
    "XMLHttpRequest": ["xml", "http", "request"],
    "MAX_BUFFER_SIZE": ["max", "buffer", "size"],
    "camelCaseVar2": ["camel", "case", "var2"],
    "BM25Scorer": ["bm25", "scorer"],
    "ABCDef": ["abc", "def"],
}


def test_pinned_boundary_cases():
    for text, want in PINNED.items():
        assert tokenize_py_code(text) == want, text


def test_three_form_identity(spark, duck):
    py = [tokenize_py_code(s) for s in SAMPLES]

    df = spark.createDataFrame([(s,) for s in SAMPLES], "text string")
    via_udf = [r[0] for r in df.select(tokenize_udf_code("text")).collect()]
    via_expr = [r[0] for r in df.select(tokenize_expr_code("text")).collect()]
    assert via_udf == py
    assert via_expr == py

    frag = DUCKDB_TOKENIZE_CODE.format(col="?")
    via_duck = [duck.execute(f"SELECT {frag}", [s]).fetchone()[0] for s in SAMPLES]
    assert via_duck == py


def test_fixture_text_parity(spark, duck):
    """The synthetic code-corpus text column must be byte-identical
    between the Spark expression and the DuckDB SQL for every doc_id
    (newlines ride through chr(10) splicing)."""
    from fastmorph_spark.registry import CODE_TEXT_SQL, _code_text_col

    ids = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    sp = {r["doc_id"]: r["text"] for r in
          ids.select("doc_id", _code_text_col().alias("text")).collect()}
    du = dict(duck.execute(
        f"SELECT doc_id, {CODE_TEXT_SQL} AS text FROM range(100) t(doc_id)"
    ).fetchall())
    assert sp == du
    assert "\n" in sp[0] and sp[0].startswith("def ")


def test_doc_len_matches_tokenizer(spark):
    """build_docs' regexp_count fast path over the boundary-transformed
    text == len(tokenize_py_code(text)) — the dl that BM25 scores with."""
    from fastmorph_spark.index.build import build_docs

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SAMPLES)], "doc_id long, content string"
    )
    got = {r["doc_id"]: r["doc_len"]
           for r in build_docs(df, tokenizer="code").collect()}
    for i, s in enumerate(SAMPLES):
        assert got[i] == len(tokenize_py_code(s)), s


def test_postings_kernel_parity(spark):
    """The mapInPandas posting kernel under tokenizer='code' must agree
    with the pure-Python tokenization (tf + positions)."""
    from fastmorph_spark.index.build import build_postings

    texts = ["parseJSONResponse parseJSONResponse", "MAX_BUFFER_SIZE json"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = build_postings(df, tokenizer="code").collect()
    got = {(r["term"], r["doc_id"]): (r["tf"], list(r["positions"])) for r in rows}
    # doc 0: parse json response parse json response
    assert got[("parse", 0)] == (2, [0, 3])
    assert got[("json", 0)] == (2, [1, 4])
    # doc 1: max buffer size json
    assert got[("json", 1)] == (1, [3])
    assert got[("buffer", 1)] == (1, [1])


def test_grep_lines_semantics(spark):
    corpus = spark.createDataFrame(
        [
            (0, "import dialog\nlog.info(x)\nreturn log"),
            (1, "no match here"),
            (2, "log"),
        ],
        "doc_id long, text string",
    )
    got = [(r["doc_id"], r["line_no"], r["line"])
           for r in grep_lines(corpus, "log").collect()]
    # token-boundary exact: 'dialog' (line 1 of doc 0) must NOT match
    assert got == [(0, 2, "log.info(x)"), (0, 3, "return log"), (2, 1, "log")]


def test_grep_rejects_multi_token_terms(spark):
    import pytest

    corpus = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        grep_lines(corpus, "two terms")


def test_code_defs_semantics(spark):
    corpus = spark.createDataFrame(
        [
            (0, "def alpha(x):\n    class Beta:\nfunction gamma(y) {\nfunc delta() {\nnot a def line\n  defer x"),
        ],
        "doc_id long, text string",
    )
    got = [(r["line_no"], r["kind"], r["symbol"])
           for r in code_defs(corpus).collect()]
    # 'defer x' must not match ('def' needs trailing whitespace + symbol…
    # 'defer' is not in the alternation and 'def' would need [ \t] after)
    assert got == [
        (1, "def", "alpha"),
        (2, "class", "Beta"),
        (3, "function", "gamma"),
        (4, "func", "delta"),
    ]


def test_def_pattern_cross_engine(duck):
    """Java and RE2 must agree on the pinned DEF_PATTERN, including the
    'function' vs prefix-'func' alternation order."""
    lines = ["function foo(", "func bar()", "  def baz(q):", "class Qux:",
             "defer x", "undef y", "classic z"]
    import re

    for ln in lines:
        m = re.match(DEF_PATTERN, ln)
        want = (m.group(1), m.group(2)) if m else None
        d = duck.execute(
            "SELECT CASE WHEN regexp_matches(?, ?) THEN "
            "[regexp_extract(?, ?, 1), regexp_extract(?, ?, 2)] END",
            [ln, DEF_PATTERN, ln, DEF_PATTERN, ln, DEF_PATTERN],
        ).fetchone()[0]
        got = tuple(d) if d is not None else None
        assert got == want, ln
