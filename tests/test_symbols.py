"""Symbol-boosted ranking + contract-corpus navigation (code-search
wave): definers outrank mentioners with BM25 order inside each stratum;
path_filter is LIKE-exact with a column-pruned scan; repo facets count
files per repo on the subtoken match."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastmorph_spark.constants import SYMBOL_BOOST
from fastmorph_spark.search.grep import path_filter, repo_match_counts
from fastmorph_spark.search.symbols import defining_docs, symbol_boosted_topk

# doc 0 DEFINES alphaFn (late mention -> weaker plain BM25 than doc 2's
# double mention); docs 1-3 only mention it; doc 4 defines something else
ROWS = [
    (0, "x = 1\ndef alphaFn(a):\n    return a"),
    (1, "alphaFn(3)"),
    (2, "alphaFn(1) + alphaFn(2)"),
    (3, "y = alphaFn"),
    (4, "def betaFn(b):\n    return alphaFn(b)"),
    (5, "unrelated tokens only"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_defining_docs_exact_and_case_sensitive(docs):
    assert [r["doc_id"] for r in defining_docs(docs, "alphaFn").collect()] == [0]
    assert defining_docs(docs, "alphafn").count() == 0  # case-exact
    assert defining_docs(docs, "alpha").count() == 0    # no prefix match
    assert [r["doc_id"] for r in defining_docs(docs, "betaFn").collect()] == [4]


def test_definer_outranks_stronger_mentioners(docs):
    got = symbol_boosted_topk(docs, "alphaFn", k=6).collect()
    ranked = [r["doc_id"] for r in got]
    # doc 0 first (the definition stratum), despite doc 2's higher tf
    assert ranked[0] == 0
    assert got[0]["score"] > SYMBOL_BOOST
    # below the stratum: plain BM25 order among mentioners (tf 2 first),
    # and every un-boosted score is < the boost
    assert ranked[1] == 2
    assert set(ranked) == {0, 1, 2, 3, 4}   # doc 5 never matches
    assert all(r["score"] < SYMBOL_BOOST for r in got[1:])


def test_symbol_must_fold_to_one_token(docs):
    with pytest.raises(ValueError, match="one token"):
        symbol_boosted_topk(docs, "two words")


CONTRACT = [
    ("repoA", "src/m7/f1.py", "c1", "py", "parseJSONResponse(x)"),
    ("repoA", "src/m7/f2.py", "c2", "py", "nothing here"),
    ("repoA", "src/m8/f3.py", "c3", "go", "parseJSONResponse(y)"),
    ("repoB", "src/m7/f4.py", "c4", "rs", "parseJSONResponse(z)"),
    ("repoB", "docs/readme.md", "c5", "md", "parse the JSON"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        CONTRACT, "repo string, path string, commit string, lang string, content string")


def test_path_filter_like(corpus):
    got = [(r["repo"], r["path"]) for r in
           path_filter(corpus, "src/m7/%").collect()]
    assert got == [("repoA", "src/m7/f1.py"), ("repoA", "src/m7/f2.py"),
                   ("repoB", "src/m7/f4.py")]
    assert path_filter(corpus, "src/m9/%").count() == 0


def test_path_filter_prunes_columns(spark, corpus, tmp_path):
    """On a FILE source the scan must read only (repo, path) — the heavy
    content column never leaves parquet (ReadSchema pruning)."""
    corpus.write.parquet(str(tmp_path / "c"))
    on_disk = spark.read.parquet(str(tmp_path / "c"))
    plan = path_filter(on_disk, "src/m7/%")._jdf.queryExecution() \
        .executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and "content" not in scan[0]
    assert "repo" in scan[0] and "path" in scan[0]


def test_repo_match_counts_subtoken(corpus):
    got = [(r["repo"], r["n_files"]) for r in
           repo_match_counts(corpus, "parse").collect()]
    # 'parse' is a SUBTOKEN of parseJSONResponse (boundary split) and a
    # whole word in the md file
    assert got == [("repoA", 2), ("repoB", 2)]


def test_repo_match_counts_one_token(corpus):
    with pytest.raises(ValueError, match="one token"):
        repo_match_counts(corpus, "two words")
