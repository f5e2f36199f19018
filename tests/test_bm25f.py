"""BM25F fielded ranking (search/bm25f.py): per-field normalized tfs
merged BEFORE k1 saturation, df over any-field hits, filename boost.

Pinned here:
- DuckDB oracle parity for the registry key (the driver's exact check);
- single-field degeneracy: one field of weight 1 ranks identically to
  classic BM25 (tf/B saturated by k1 ≡ tf saturated by k1·B — algebraic
  identity; scores equal to float tolerance, ranks exactly);
- a path field with no query-term hits changes nothing vs content-only;
- the path boost REORDERS: w_path=3 vs w_path=0 produce different
  top-10 doc orderings on the fielded fixture corpus (non-vacuity);
- monotonicity: a doc with a query term ONLY in its path scores 0 under
  w_path=0 and >0 under w_path>0;
- repartitioned input gives identical results (determinism rule);
- empty query and no-hit query return empty.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from fastmorph_spark import registry
from fastmorph_spark.search.bm25 import bm25_topk_expression
from fastmorph_spark.search.bm25f import bm25f_topk
from tests.conftest import SF0001, assert_frames_match, register_views

Q = registry.CODE_QUERY  # "parse JSON buffer"


def _rows(df):
    return [tuple(r) for r in df.collect()]


@pytest.fixture(scope="module")
def fielded(spark):
    return registry._fielded_corpus(spark, SF0001).persist()


def test_registry_oracle_parity(spark):
    got = registry.queries()["bm25f_topk"](spark, SF0001)
    con = duckdb.connect()
    register_views(con, SF0001)
    want = con.sql(registry.oracle_sqls()["bm25f_topk"])
    assert_frames_match(got, want)


def test_single_field_degenerates_to_bm25(spark, fielded):
    """fields=[(content, 1.0, BM25_B)] must RANK like classic BM25 over
    content (identical doc order; scores equal to float tolerance)."""
    from fastmorph_spark.constants import BM25_B

    docs = fielded.select("doc_id", F.col("content").alias("text"))
    want = _rows(bm25_topk_expression(docs, Q, k=10, tokenizer="code"))
    got = _rows(bm25f_topk(fielded, Q, k=10,
                           fields=(("content", 1.0, BM25_B),),
                           tokenizer="code"))
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want]
    for (_, _, a), (_, _, b) in zip(got, want):
        assert abs(a - b) < 1e-9


def test_irrelevant_path_is_inert(spark, fielded):
    """A constant path whose tokens never match the query cannot change
    ranks or scores vs dropping the path field entirely."""
    inert = fielded.withColumn("path", F.lit("zz/qq.xx"))
    got = _rows(bm25f_topk(inert, Q, k=10, round_score=True, tokenizer="code"))
    content_only = _rows(bm25f_topk(
        inert, Q, k=10, fields=(("content", 1.0, 0.75),),
        round_score=True, tokenizer="code"))
    assert got == content_only


def test_path_boost_reorders(spark, fielded):
    boosted = [d for _, d, _ in _rows(bm25f_topk(fielded, Q, k=10, tokenizer="code"))]
    flat = [d for _, d, _ in _rows(bm25f_topk(
        fielded, Q, k=10,
        fields=(("path", 0.0, 0.5), ("content", 1.0, 0.75)),
        tokenizer="code"))]
    assert boosted != flat


def test_path_only_match(spark):
    """Query term appears ONLY in one doc's path: positive score under
    the boost, zero contribution (score 0.0) at w_path=0."""
    docs = spark.createDataFrame(
        [(1, "src/jsonParser.py", "def alpha(): pass"),
         (2, "src/util.py", "def beta(): pass"),
         (3, "src/other.py", "def gamma(): pass")],
        "doc_id long, path string, content string")
    hit = _rows(bm25f_topk(docs, "json", k=3, tokenizer="code"))
    assert [d for _, d, _ in hit] == [1] and hit[0][2] > 0
    flat = _rows(bm25f_topk(docs, "json", k=3,
                            fields=(("path", 0.0, 0.5), ("content", 1.0, 0.75)),
                            tokenizer="code"))
    assert [(d, s) for _, d, s in flat] == [(1, 0.0)]


def test_repartition_deterministic(spark, fielded):
    a = _rows(bm25f_topk(fielded, Q, k=10, round_score=True, tokenizer="code"))
    b = _rows(bm25f_topk(fielded.repartition(7), Q, k=10, round_score=True,
                         tokenizer="code"))
    assert a == b


def test_empty_and_no_hit(spark, fielded):
    assert bm25f_topk(fielded, "", k=10, tokenizer="code").count() == 0
    assert bm25f_topk(fielded, "zzqq notaword", k=10, tokenizer="code").count() == 0
