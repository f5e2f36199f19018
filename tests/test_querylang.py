"""Unified query-string language (search/querylang.py): grammar, filter
translation, AND/phrase/negation constraint composition, the pinned
rounded-score tie discipline, and the registry keys' oracle parity +
atom non-vacuity at sf0.001."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastmorph_spark.search.querylang import parse_query, query_search
from tests.conftest import SF0001, register_views


# ------------------------------------------------------------- parser

def test_parse_fields_phrases_negation():
    spec = parse_query(
        'repo:r1 path:src/* lang:py "fast join" merge -"slow scan" -log')
    assert spec["repo"] == "r1" and spec["path"] == "src/*"
    assert spec["lang"] == "py"
    assert spec["phrases"] == [["fast", "join"]]
    assert spec["terms"] == ["merge"]
    assert spec["excludes"] == [["slow", "scan"], ["log"]]


def test_parse_code_tokenizer_subtokens():
    spec = parse_query("parseJSON -MAX_BUFFER_SIZE", tokenizer="code")
    assert spec["terms"] == ["parse", "json"]
    assert spec["excludes"] == [["max", "buffer", "size"]]


@pytest.mark.parametrize("bad,msg", [
    ("", "non-empty"),
    ("   ", "non-empty"),
    ("repo:a repo:b x", "duplicate repo"),
    ("-lang:py x", "negation applies"),
    ("lang: x", "needs a value"),
    ("branch:dev x", "unknown filter"),
    ('"unclosed x', "unterminated quote"),
    ('"---" x', "no tokens"),
    ("repo:r1", "at least one positive"),
    ("-noise", "at least one positive"),
])
def test_parse_errors(bad, msg):
    with pytest.raises(ValueError, match=msg):
        parse_query(bad)


# ------------------------------------------------- engine composition

@pytest.fixture(scope="module")
def corpus(spark):
    # hand-built so every constraint family has a binding witness
    rows = [
        # doc, repo, path, lang, text
        (0, "alpha", "src/a.py", "py", "fast join merge fast"),
        (1, "alpha", "src/b.py", "py", "fast merge slow scan"),
        (2, "alpha", "lib/c.py", "py", "join fast merge"),
        (3, "beta", "src/d.py", "go", "fast join merge"),
        (4, "beta", "src/e.py", "py", "merge only here"),
        (5, "alpha", "src/f.py", "py", "fast join log merge"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, repo string, path string, lang string, text string")


def _ids(df):
    return [r["doc_id"] for r in df.collect()]


def test_and_semantics(corpus):
    # both bare terms required: doc 4 (merge only) drops
    got = _ids(query_search(corpus, "fast merge"))
    assert 4 not in got and set(got) == {0, 1, 2, 3, 5}


def test_phrase_binds(corpus):
    # adjacency: doc 2 has join..fast (wrong order), doc 1 no "fast join"
    got = _ids(query_search(corpus, '"fast join" merge'))
    assert set(got) == {0, 3, 5}


def test_negation_term_and_phrase(corpus):
    assert set(_ids(query_search(corpus, '"fast join" merge -log'))) == {0, 3}
    got = _ids(query_search(corpus, 'fast merge -"slow scan"'))
    assert set(got) == {0, 2, 3, 5}


def test_filters_and_wildcards(corpus):
    assert set(_ids(query_search(corpus, "repo:alpha fast merge"))) == {0, 1, 2, 5}
    assert set(_ids(query_search(corpus, "path:src/* fast merge"))) == {0, 1, 3, 5}
    assert set(_ids(query_search(corpus, "lang:py fast merge"))) == {0, 1, 2, 5}
    assert set(_ids(query_search(corpus, "repo:alph? path:src/?.py lang:py fast merge"))) \
        == {0, 1, 5}


def test_output_shape_and_tie_discipline(corpus):
    out = query_search(corpus, "merge")
    assert out.columns == ["rank", "doc_id", "repo", "path", "score"]
    rows = out.collect()
    # every doc has tf(merge)=1; rounded scores differ only through dl,
    # equal-dl docs must tie-break by doc_id ascending
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    by_score: dict = {}
    for r in rows:
        by_score.setdefault(r["score"], []).append(r["doc_id"])
    for ids in by_score.values():
        assert ids == sorted(ids)


def test_no_metadata_corpus(corpus):
    bare = corpus.select("doc_id", "text")
    out = query_search(bare, "fast merge")
    assert out.columns == ["rank", "doc_id", "score"]
    with pytest.raises(ValueError, match="no repo column"):
        query_search(bare, "repo:alpha fast")


def test_k_cut_after_constraints(corpus):
    # k=1 must yield the best SURVIVOR, not the best pre-constraint doc
    got = query_search(corpus, 'fast merge -"fast join"', k=1).collect()
    assert len(got) == 1 and got[0]["doc_id"] in {1, 2}


def test_uni_constraint_refusal(spark):
    docs = spark.createDataFrame(
        [(0, "Татар теле"), (1, "Казан йорт")], "doc_id long, text string")
    # pure scoring (no constraints) is fine through the uni twin
    assert _ids(query_search(docs, "Татар", tokenizer="uni")) == [0]
    with pytest.raises(ValueError, match="not expressible"):
        query_search(docs, '"Татар теле"', tokenizer="uni")


# ------------------------------------------- registry keys vs DuckDB

def test_registry_keys_match_oracle(spark, duck):
    from fastmorph_spark.registry import oracle_sqls, queries
    from tests.conftest import assert_frames_match

    register_views(duck, SF0001)
    qs, os_ = queries(), oracle_sqls()
    for key in ("qlang_search", "qlang_repo_search"):
        assert_frames_match(qs[key](spark, SF0001), duck.sql(os_[key]))


def test_flagship_atoms_bind(spark):
    """Every atom of QL_QUERY changes the result (rows or values) on the
    HEAD-resolved corpus — the non-vacuity contract behind the pinned
    driver query."""
    from fastmorph_spark.registry import QL_QUERY, _head_meta_docs

    docs = _head_meta_docs(spark, SF0001).cache()
    full = query_search(docs, QL_QUERY, k=100, tokenizer="code").collect()
    base = {(r["doc_id"], r["score"]) for r in full}
    drops = ['"xml http" user -"write log"',          # no lang filter
             'lang:py user -"write log"',             # no phrase
             'lang:py "xml http" -"write log"',       # no scored term
             'lang:py "xml http" user']               # no negation
    for q in drops:
        got = {(r["doc_id"], r["score"])
               for r in query_search(docs, q, k=100, tokenizer="code").collect()}
        assert got != base, q
    docs.unpersist()


# ----------------------------------------------------- serving form

def test_protocol_q_form(spark, corpus):
    from fastmorph_spark.search.protocol import handle_request

    resp = handle_request(corpus.select("doc_id", "text", "lang"), None,
                          {"q": "lang:py fast merge", "k": 3})
    assert "error" not in resp
    assert [r["rank"] for r in resp["results"]] == [1, 2, 3]
    assert all(set(r) == {"rank", "doc_id", "score"} for r in resp["results"])

    # metadata echo when the served corpus carries repo/path
    resp = handle_request(corpus, None, {"q": "repo:alpha fast merge", "k": 2})
    assert all(set(r) == {"rank", "doc_id", "repo", "path", "score"}
               for r in resp["results"])
    assert all(r["repo"] == "alpha" for r in resp["results"])

    # grammar errors at the boundary; corpus-shape errors at execution
    assert "unknown filter" in handle_request(
        corpus, None, {"q": "branch:dev x"})["error"]
    assert "at least one positive" in handle_request(
        corpus, None, {"q": "-only -negated"})["error"]
    assert "no repo column" in handle_request(
        corpus.select("doc_id", "text"), None, {"q": "repo:alpha fast"})["error"]
    assert "k must be" in handle_request(
        corpus, None, {"q": "fast", "k": 0})["error"]
    assert "unknown request fields" in handle_request(
        corpus, None, {"q": "fast", "limit": 5})["error"]
