"""Repository-history semantics (search/history.py): HEAD resolution
picks the max-commit version per (repo, path) with partial aggregation
(no window), version ledgers count correctly, vendored-content detection
finds cross-repo blobs with a bounded repo list, and find-usages edges
come off the pinned '# see A and B' comment convention."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastmorph_spark.search.history import (
    REF_PATTERN,
    code_refs,
    file_history,
    latest_files,
    ref_counts,
    vendored_content,
)

# (repo, path, commit, lang, content) — r1/a.py has 3 versions (c3 is
# latest), r1/b.py has 1, r2/c.py carries the SAME blob as r1/a.py's
# latest (vendored), r2/d.py and r3/d.py share another blob.
ROWS = [
    ("r1", "a.py", "c1", "py", "old one"),
    ("r1", "a.py", "c2", "py", "mid one"),
    ("r1", "a.py", "c3", "py", "new one"),
    ("r1", "b.py", "c9", "py", "solo"),
    ("r2", "c.py", "d1", "py", "new one"),
    ("r2", "d.py", "d2", "go", "shared blob"),
    ("r3", "d.py", "e1", "go", "shared blob"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        ROWS, "repo string, path string, commit string, lang string, content string"
    )


def test_latest_files_head_resolution(corpus):
    got = {(r["repo"], r["path"]): (r["commit"], r["content"])
           for r in latest_files(corpus).collect()}
    assert got == {
        ("r1", "a.py"): ("c3", "new one"),
        ("r1", "b.py"): ("c9", "solo"),
        ("r2", "c.py"): ("d1", "new one"),
        ("r2", "d.py"): ("d2", "shared blob"),
        ("r3", "d.py"): ("e1", "shared blob"),
    }


def test_latest_files_partial_agg_no_window(corpus):
    plan = latest_files(corpus)._jdf.queryExecution().executedPlan().toString()
    assert "partial_max" in plan          # map-side combine survives
    assert "Window" not in plan           # no per-group reduce-side sort op


def test_file_history_counts(corpus):
    got = {(r["repo"], r["path"]): (r["n_versions"], r["n_contents"], r["latest_commit"])
           for r in file_history(corpus).collect()}
    assert got[("r1", "a.py")] == (3, 3, "c3")
    assert got[("r1", "b.py")] == (1, 1, "c9")
    assert len(got) == 5


def test_vendored_content_cross_repo_only(corpus):
    rows = vendored_content(corpus, min_repos=2).collect()
    # two blobs cross repo boundaries: "new one" (r1, r2), "shared blob"
    # (r2, r3); within-repo versions never qualify
    assert len(rows) == 2
    by_repos = sorted(r["repos"] for r in rows)
    assert by_repos == ["r1,r2", "r2,r3"]
    assert all(r["n_repos"] == 2 for r in rows)


def test_vendored_content_repo_cap_deterministic(spark):
    rows = [("rep%02d" % i, "p", "c%d" % i, "py", "blob") for i in range(30)]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    out = vendored_content(df, min_repos=2, repos_cap=5).collect()
    assert len(out) == 1
    assert out[0]["n_repos"] == 30                     # uncapped count
    assert out[0]["repos"] == "rep00,rep01,rep02,rep03,rep04"  # capped, sorted


def test_code_refs_edges(spark):
    docs = spark.createDataFrame(
        [
            (0, "def f():\n# see alphaFn and beta_util"),
            (1, "# see alphaFn and alphaFn"),
            (2, "see alphaFn and beta"),        # no '#' -> not a ref line
            (3, "# see Not-An-Ident and x"),    # '-' breaks the pattern
        ],
        "doc_id long, text string",
    )
    got = [(r["doc_id"], r["line_no"], r["ref"]) for r in code_refs(docs).collect()]
    assert got == [
        (0, 2, "alphaFn"),
        (0, 2, "beta_util"),
        (1, 1, "alphaFn"),
        (1, 1, "alphaFn"),
    ]
    counts = {r["ref"]: (r["n_docs"], r["n_refs"]) for r in ref_counts(docs).collect()}
    assert counts == {"alphaFn": (2, 3), "beta_util": (1, 1)}


def test_head_resolution_changes_scoring(spark):
    """Composing latest_files with BM25 must actually matter: scoring
    the full versioned corpus (old versions inflate df/n_docs) gives a
    different result set than scoring HEAD only."""
    from fastmorph_spark.search.bm25 import bm25_topk_expression

    rows = [
        ("r1", "f1", "c1", "py", "needle old text"),
        ("r1", "f1", "c2", "py", "nothing relevant"),   # HEAD of f1
        ("r1", "f2", "c1", "py", "needle here too"),
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    head = latest_files(corpus).withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    got = bm25_topk_expression(head, "needle", k=5, text_col="content").collect()
    # only f2's HEAD matches; f1's old version must not resurface
    assert len(got) == 1
    full = corpus.withColumn("doc_id", F.monotonically_increasing_id())
    assert bm25_topk_expression(full, "needle", k=5, text_col="content").count() == 2


def test_ref_pattern_engine_identity():
    """The pinned pattern must behave identically in Java regex and RE2
    on ref lines: byte classes only, anchored, two groups."""
    import re

    m = re.match(REF_PATTERN, "# see parseJSONResponse and BM25Scorer")
    assert m and m.group(1) == "parseJSONResponse" and m.group(2) == "BM25Scorer"
    assert re.match(REF_PATTERN, "## see a and b") is None
