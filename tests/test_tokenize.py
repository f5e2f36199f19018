"""Tokenizer identity across all paths (SURVEY.md §7: the #1 oracle risk)."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from fastmorph_spark.tokenize import tokenize_expr, tokenize_py, tokenize_udf
from tests.conftest import SF0001

SAMPLES = [
    "the Fast hash-join; über_fast2 X",
    "",
    "   ",
    "a_b__c 0x1F . . .",
    "CamelCase snake_case kebab-case",
    None,
    "sémantic—dash",  # non-ascii separators
]


def test_python_vs_duckdb():
    con = duckdb.connect()
    for s in SAMPLES:
        got = con.execute(
            "SELECT list_filter(regexp_split_to_array(lower(?), '[^a-z0-9_]+'), x -> x <> '')",
            [s or ""],
        ).fetchone()[0]
        assert list(got) == tokenize_py(s), s


def test_spark_udf_vs_python(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": [s or "" for s in SAMPLES]}))
    got = [r[0] for r in df.select(tokenize_udf("text")).collect()]
    assert got == [tokenize_py(s) for s in SAMPLES]


def test_spark_expr_vs_udf(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": [s or "" for s in SAMPLES]}))
    rows = df.select(
        tokenize_udf("text").alias("u"), tokenize_expr("text").alias("e")
    ).collect()
    for r in rows:
        assert r["u"] == r["e"]


def test_fixture_corpus_three_ways(spark):
    """First 50 fixture docs tokenize identically via UDF/expr/python."""
    df = spark.read.parquet(f"{SF0001}/documents.parquet").orderBy("doc_id").limit(50)
    rows = df.select(
        "text", tokenize_udf("text").alias("u"), tokenize_expr("text").alias("e")
    ).collect()
    assert len(rows) == 50
    for r in rows:
        assert r["u"] == r["e"] == tokenize_py(r["text"])
