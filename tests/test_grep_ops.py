"""grep -C context windows and scored repo ranking (search/grep.py):
context lines merge across overlapping matches with match lines flagged;
repo_rank orders repos by best-file BM25 with matching-file facets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastmorph_spark.search.bm25 import bm25_topk_expression
from fastmorph_spark.search.grep import grep_context, repo_rank


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "a\nb\nhit x\nd\ne\nf\nhit y\nh"),
            (1, "nothing here\nat all"),
            (2, "hit\nz"),
        ],
        "doc_id long, text string",
    )


def test_grep_context_windows_and_flags(docs):
    got = [(r["doc_id"], r["line_no"], r["is_match"])
           for r in grep_context(docs, "hit", context=1).collect()]
    # doc 0: matches on 3 and 7 -> lines 2,3,4 and 6,7,8; doc 2: 1,2
    assert got == [
        (0, 2, 0), (0, 3, 1), (0, 4, 0),
        (0, 6, 0), (0, 7, 1), (0, 8, 0),
        (2, 1, 1), (2, 2, 0),
    ]


def test_grep_context_overlap_merges_once(spark):
    df = spark.createDataFrame(
        [(0, "hit a\nmid\nhit b\nafter\nfar")], "doc_id long, text string"
    )
    rows = grep_context(df, "hit", context=1).collect()
    # windows [1..2] and [2..4] overlap on line 2 -> each line ONCE
    assert [r["line_no"] for r in rows] == [1, 2, 3, 4]
    assert [r["is_match"] for r in rows] == [1, 0, 1, 0]


def test_grep_context_zero_is_match_lines_only(docs):
    rows = grep_context(docs, "hit", context=0).collect()
    assert [(r["doc_id"], r["line_no"]) for r in rows] == [(0, 3), (0, 7), (2, 1)]
    assert all(r["is_match"] == 1 for r in rows)


def test_grep_context_validation(docs):
    with pytest.raises(ValueError, match="one token"):
        grep_context(docs, "two words")
    with pytest.raises(ValueError, match="context"):
        grep_context(docs, "hit", context=-1)


@pytest.fixture(scope="module")
def corpus(spark):
    # repo A holds the strongest single file; repo B holds two weaker
    # ones — max-score ranking must put A first even though B has more
    # matching files
    return spark.createDataFrame(
        [
            (0, "A", "needle needle needle"),
            (1, "B", "needle filler filler filler filler"),
            (2, "B", "needle other words here now"),
            (3, "C", "no match at all"),
        ],
        "doc_id long, repo string, content string",
    )


def test_repo_rank_best_file_wins(corpus):
    rows = repo_rank(corpus, "needle", k=10, tokenizer="ascii").collect()
    assert [r["repo"] for r in rows] == ["A", "B"]          # C never matches
    assert [r["n_files"] for r in rows] == [1, 2]
    assert rows[0]["rank"] == 1 and rows[1]["rank"] == 2


def test_repo_rank_score_is_best_file_bm25(corpus):
    per_doc = bm25_topk_expression(
        corpus, "needle", k=10, text_col="content", round_score=True
    ).collect()
    best = {}
    repo_of = {0: "A", 1: "B", 2: "B"}
    for r in per_doc:
        repo = repo_of[r["doc_id"]]
        best[repo] = max(best.get(repo, 0.0), r["score"])
    got = {r["repo"]: r["score"] for r in
           repo_rank(corpus, "needle", k=10, tokenizer="ascii").collect()}
    assert got == pytest.approx(best)


def test_repo_rank_empty_query(corpus):
    assert repo_rank(corpus, "!!!", k=5, tokenizer="ascii").count() == 0
