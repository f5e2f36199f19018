"""JSON protocol layer (search/protocol.py) — the reference's serving
boundary [PK-high, SURVEY.md §3.1 entry point 2]: request validation,
engine dispatch, nested sentences/highlights/totals serialization."""

from __future__ import annotations

import json

import pytest

from fastmorph_spark.index.io import build_index_frames
from fastmorph_spark.search.engine import search_request
from fastmorph_spark.search.protocol import (
    RequestError,
    handle_request,
    parse_request,
    to_json,
)
from fastmorph_spark.sources import read_documents
from tests.conftest import SF0001

REQ = {"slots": [{"word": "fast"}, {"pattern": "h*"}],
       "dists": [[1, 4]], "skip": 2, "until": 12}


# ---------------- validation

@pytest.mark.parametrize("bad,msg", [
    ("nope", "JSON object"),
    ({}, "non-empty list"),
    ({"slots": [], "dists": []}, "non-empty list"),
    ({"slots": [{"word": "a"}], "dists": [], "foo": 1}, "unknown request fields"),
    ({"slots": [{"word": "a", "pattern": "b"}], "dists": []}, "exactly one"),
    ({"slots": [{"wurd": "a"}], "dists": []}, "exactly one"),
    ({"slots": [{"word": "a", "flags": 1}], "dists": []}, "unknown fields"),
    ({"slots": [{"word": ""}], "dists": []}, "non-empty string"),
    ({"slots": [{"lemma": "run", "case": True}], "dists": []}, "word slots only"),
    ({"slots": [{"word": "a"}, {"word": "b"}], "dists": []}, "1 [lo, hi]"),
    ({"slots": [{"word": "a"}, {"word": "b"}], "dists": [[0, 3]]}, "1 <= lo <= hi"),
    ({"slots": [{"word": "a"}, {"word": "b"}], "dists": [[4, 2]]}, "1 <= lo <= hi"),
    ({"slots": [{"word": "a"}, {"word": "b"}], "dists": [[True, 2]]}, "1 <= lo <= hi"),
    ({"slots": [{"word": "a"}], "dists": [], "skip": -1}, "non-negative"),
    ({"slots": [{"word": "a"}], "dists": [], "until": 10**7}, "<="),
    ({"slots": [{"word": "a"}], "dists": [], "skip": 20, "until": 20}, "skip must be <"),
    ({"slots": [{"word": "a"}], "dists": [], "lang": ""}, "lang"),
])
def test_parse_rejects(bad, msg):
    with pytest.raises(RequestError, match=None):
        try:
            parse_request(bad)
        except RequestError as e:
            assert msg in str(e)
            raise


def test_parse_normalizes_to_engine_vocabulary():
    p = parse_request({
        "slots": [{"word": "Fast", "case": True}, {"lemma": "running"},
                  {"tag": "number"}, {"pattern": "h?sh"}],
        "dists": [[1, 1], [1, 2], [2, 5]], "lang": "en",
    })
    assert p["slots"] == [{"term": "Fast", "case": True}, {"stem": "running"},
                         {"tag": "number"}, {"pattern": "h?sh"}]
    assert p["dists"] == [(1, 1), (1, 2), (2, 5)]
    assert (p["skip"], p["until"], p["width"], p["lang"]) == (0, 20, 2, "en")


# ---------------- end-to-end over the packed index

@pytest.fixture(scope="module")
def serving(spark):
    docs = read_documents(spark, SF0001)
    idx = build_index_frames(docs, doc_shard_size=100, block_size=16)
    idx.postings = idx.postings.persist()
    idx.dictionary = idx.dictionary.persist()
    yield docs, idx
    idx.postings.unpersist()
    idx.dictionary.unpersist()


def test_response_matches_engine_rows(spark, serving):
    docs, idx = serving
    resp = handle_request(docs, idx, REQ)
    assert "error" not in resp
    # flat engine rows (corpus path — the oracle-shared twin)
    from fastmorph_spark.index.build import build_dictionary, build_postings

    postings = build_postings(docs)
    rows = search_request(docs, postings, build_dictionary(postings),
                          [{"term": "fast"}, {"pattern": "h*"}], [(1, 4)],
                          skip=2, until=12).collect()
    assert resp["total_docs"] == rows[0]["total_docs"]
    assert resp["total_matches"] == rows[0]["total_matches"]
    flat = [(m["pos"], m["hl_offset"], m["snippet"], m["running_total"], r["doc_id"], r["rank"])
            for r in resp["results"] for m in r["matches"]]
    want = [(r["pos"], r["hl_offset"], r["snippet"], r["running_total"], r["doc_id"], r["rank"])
            for r in rows]
    assert flat == want
    # ranks are the page window (skip 2, until 12), docs in corpus order
    ranks = [r["rank"] for r in resp["results"]]
    assert ranks == sorted(ranks) and ranks[0] == 3
    assert all(r["n_matches"] == len(r["matches"]) for r in resp["results"])
    json.loads(to_json(resp))  # serializable


def test_request_as_json_string_and_bad_json(spark, serving):
    docs, idx = serving
    assert handle_request(docs, idx, json.dumps(REQ)) == handle_request(docs, idx, REQ)
    assert "error" in handle_request(docs, idx, "{not json")


def test_no_matches_is_wellformed_and_cs_without_twin_errors(spark, serving):
    docs, idx = serving
    resp = handle_request(docs, idx, {"slots": [{"word": "zzzzzzzz"}], "dists": []})
    assert resp == {"total_docs": 0, "total_matches": 0, "skip": 0,
                    "until": 20, "results": []}
    resp = handle_request(docs, idx,
                          {"slots": [{"word": "Fast", "case": True}], "dists": []})
    assert "case-preserving twin" in resp.get("error", "")


def test_lang_routing(spark, serving):
    docs, _ = serving
    from pyspark.sql import functions as F

    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    lang = sorted(langs)[0]
    sub = docs.filter(F.col("lang") == lang)
    lidx = build_index_frames(sub, doc_shard_size=100, block_size=16)
    req = {"slots": [{"word": "the"}], "dists": [], "lang": lang, "until": 5}
    resp = handle_request(docs, {lang: lidx}, req)
    assert "error" not in resp and resp["results"]
    got_docs = {r["doc_id"] for r in resp["results"]}
    sub_ids = {r["doc_id"] for r in sub.select("doc_id").collect()}
    assert got_docs <= sub_ids
    # unknown lang -> empty result, not an error; missing lang -> error
    assert handle_request(docs, {lang: lidx},
                          {**req, "lang": "xx"})["results"] == []
    assert "error" in handle_request(docs, {lang: lidx},
                                     {"slots": [{"word": "the"}], "dists": []})


# ---------------- ranked (bm25) request form

def test_bm25_request_matches_search_wand(spark, serving):
    from fastmorph_spark.search.wand import search_wand

    docs, idx = serving
    resp = handle_request(docs, idx, {"bm25": "fast hash join", "k": 5})
    assert "error" not in resp and len(resp["results"]) == 5
    want = [(r["rank"], r["doc_id"], r["score"])
            for r in search_wand(idx, "fast hash join", k=5).collect()]
    assert [(r["rank"], r["doc_id"], r["score"]) for r in resp["results"]] == want
    json.loads(to_json(resp))


@pytest.mark.parametrize("bad,msg", [
    ({"bm25": "x", "slots": []}, "exactly one form"),
    ({"bm25": ""}, "non-empty query"),
    ({"bm25": "x", "k": 0}, "k must be"),
    ({"bm25": "x", "k": True}, "k must be"),
    ({"bm25": "x", "until": 5}, "unknown request fields"),
])
def test_bm25_request_validation(bad, msg):
    with pytest.raises(RequestError):
        try:
            parse_request(bad)
        except RequestError as e:
            assert msg in str(e)
            raise


def test_bm25_lang_routing(spark, serving):
    docs, idx = serving
    from pyspark.sql import functions as F

    lang = sorted(r["lang"] for r in docs.select("lang").distinct().collect())[0]
    sub = docs.filter(F.col("lang") == lang)
    lidx = build_index_frames(sub, doc_shard_size=100, block_size=16)
    resp = handle_request(docs, {lang: lidx}, {"bm25": "the", "k": 3, "lang": lang})
    assert "error" not in resp and resp["results"]
    sub_ids = {r["doc_id"] for r in sub.select("doc_id").collect()}
    assert {r["doc_id"] for r in resp["results"]} <= sub_ids
    assert handle_request(docs, {lang: lidx},
                          {"bm25": "the", "lang": "xx"})["results"] == []


# ---------------- collocation (analysis) request form

def test_collocations_request_matches_packed(spark, serving):
    from fastmorph_spark.search.collocation import packed_collocations

    docs, idx = serving
    req = {"collocations": "fast", "window": 3, "min_count": 2, "k": 10}
    resp = handle_request(docs, idx, req)
    assert "error" not in resp
    assert (resp["target"], resp["window"], resp["k"]) == ("fast", 3, 10)
    want = [(int(r["rank"]), r["term"], int(r["cooc"]), int(r["cf"]),
             float(r["pmi"]))
            for r in packed_collocations(idx, "fast", window=3,
                                         min_count=2, k=10).collect()]
    got = [(r["rank"], r["term"], r["cooc"], r["cf"], r["pmi"])
           for r in resp["results"]]
    assert got == want
    json.loads(to_json(resp))
    # absent target: well-formed empty response, not an error
    empty = handle_request(docs, idx, {"collocations": "zqxjkvw"})
    assert "error" not in empty and empty["results"] == []


@pytest.mark.parametrize("bad,msg", [
    ({"collocations": "x", "bm25": "y"}, "exactly one form"),
    ({"collocations": "x", "slots": []}, "exactly one form"),
    ({"collocations": ""}, "non-empty target"),
    ({"collocations": "x", "window": 0}, "window must be"),
    ({"collocations": "x", "window": True}, "window must be"),
    ({"collocations": "x", "min_count": 0}, "min_count"),
    ({"collocations": "x", "k": 0}, "k must be"),
    ({"collocations": "x", "until": 5}, "unknown request fields"),
])
def test_collocations_request_validation(bad, msg):
    with pytest.raises(RequestError):
        try:
            parse_request(bad)
        except RequestError as e:
            assert msg in str(e)
            raise


def test_collocations_lang_routing(spark, serving):
    docs, idx = serving
    from pyspark.sql import functions as F

    from fastmorph_spark.index.io import build_index_frames
    from fastmorph_spark.search.collocation import packed_collocations

    lang = sorted(r["lang"] for r in docs.select("lang").distinct().collect())[0]
    sub = docs.filter(F.col("lang") == lang)
    lidx = build_index_frames(sub, doc_shard_size=100, block_size=16)
    resp = handle_request(docs, {lang: lidx},
                          {"collocations": "the", "k": 5, "lang": lang})
    assert "error" not in resp and resp["results"]
    want = [(int(r["rank"]), r["term"])
            for r in packed_collocations(lidx, "the", k=5).collect()]
    assert [(r["rank"], r["term"]) for r in resp["results"]] == want
    # unknown lang -> empty, missing lang on a lang-routed index -> error
    assert handle_request(docs, {lang: lidx},
                          {"collocations": "the", "lang": "xx"})["results"] == []
    assert "error" in handle_request(docs, {lang: lidx},
                                     {"collocations": "the"})


# ---------------- frequency profile (top_terms) request form

def test_top_terms_request(spark, serving):
    docs, idx = serving
    resp = handle_request(docs, idx, {"top_terms": 10})
    assert "error" not in resp and len(resp["results"]) == 10
    want = [(r["term"], int(r["df"]), int(r["cf"]))
            for r in idx.dictionary.select("term", "df", "cf")
            .orderBy(F_desc_df_term()).limit(10).collect()]
    got = [(r["term"], r["df"], r["cf"]) for r in resp["results"]]
    assert got == want
    assert [r["rank"] for r in resp["results"]] == list(range(1, 11))
    # wildcard-filtered profile: every term matches, subset of unfiltered df order
    pat = handle_request(docs, idx, {"top_terms": 5, "pattern": "s*"})
    assert pat["results"] and all(r["term"].startswith("s")
                                  for r in pat["results"])
    dfs = [r["df"] for r in pat["results"]]
    assert dfs == sorted(dfs, reverse=True)
    json.loads(to_json(resp))


def F_desc_df_term():
    from pyspark.sql import functions as F

    return [F.desc("df"), F.asc("term")]


@pytest.mark.parametrize("bad,msg", [
    ({"top_terms": 10, "bm25": "x"}, "exactly one form"),
    ({"top_terms": 0}, "top_terms must be"),
    ({"top_terms": True}, "top_terms must be"),
    ({"top_terms": 10, "pattern": ""}, "pattern"),
    ({"top_terms": 10, "k": 5}, "unknown request fields"),
])
def test_top_terms_validation(bad, msg):
    with pytest.raises(RequestError):
        try:
            parse_request(bad)
        except RequestError as e:
            assert msg in str(e)
            raise


def test_top_terms_lang_routing(spark, serving):
    docs, idx = serving
    from pyspark.sql import functions as F

    lang = sorted(r["lang"] for r in docs.select("lang").distinct().collect())[0]
    sub = docs.filter(F.col("lang") == lang)
    lidx = build_index_frames(sub, doc_shard_size=100, block_size=16)
    resp = handle_request(docs, {lang: lidx}, {"top_terms": 5, "lang": lang})
    assert "error" not in resp and len(resp["results"]) == 5
    want = [(r["term"], int(r["df"]))
            for r in lidx.dictionary.select("term", "df")
            .orderBy(F.desc("df"), F.asc("term")).limit(5).collect()]
    assert [(r["term"], r["df"]) for r in resp["results"]] == want
    assert handle_request(docs, {lang: lidx},
                          {"top_terms": 5, "lang": "xx"})["results"] == []


def test_kwic_format_request(spark, serving):
    """format=kwic swaps occurrence payloads for aligned concordance
    columns; totals/pagination identical to the snippets form, and the
    keyword column always re-joins to the matched tokens."""
    docs, idx = serving
    snip = handle_request(docs, idx, REQ)
    kw = handle_request(docs, idx, {**REQ, "format": "kwic"})
    assert "error" not in kw
    assert (kw["total_docs"], kw["total_matches"]) == \
           (snip["total_docs"], snip["total_matches"])
    assert [r["doc_id"] for r in kw["results"]] == \
           [r["doc_id"] for r in snip["results"]]
    for r in kw["results"]:
        for m in r["matches"]:
            assert set(m) == {"pos", "left", "keyword", "right"}
            # 2 slots, dist (1,4): keyword spans match_len=2 tokens
            assert len(m["keyword"].split()) == 2
            assert m["keyword"].split()[0] == "fast"
    json.loads(to_json(kw))
    assert "error" in handle_request(docs, idx, {**REQ, "format": "nope"})


def test_kwic_continuation_shares_match_set(spark, serving):
    """A kwic page and a snippets page of the same request shape reuse
    ONE cached match set in a continuation session (format is assembly,
    not shape)."""
    from fastmorph_spark.search.protocol import close_session

    docs, idx = serving
    session = {}
    s1 = handle_request(docs, idx, REQ, session=session)
    k1 = handle_request(docs, idx, {**REQ, "format": "kwic"}, session=session)
    assert len(session) == 1  # same continuation key
    assert (k1["total_docs"], k1["total_matches"]) == \
           (s1["total_docs"], s1["total_matches"])
    close_session(session)


# ---------------- round-5: fuzzy slots + facets on the serving boundary


@pytest.mark.parametrize("bad,msg", [
    ({"slots": [{"fuzzy": "fast", "dist": 0}], "dists": []}, "dist must be"),
    ({"slots": [{"fuzzy": "fast", "dist": 3}], "dists": []}, "dist must be"),
    ({"slots": [{"fuzzy": "fast", "dist": True}], "dists": []}, "dist must be"),
    ({"slots": [{"fuzzy": "fast", "case": True}], "dists": []}, "word slots only"),
    ({"slots": [{"word": "fast", "dist": 1}], "dists": []}, "unknown fields"),
    ({"slots": [{"word": "fast"}], "dists": [], "facets": 1}, "facets must be"),
])
def test_fuzzy_facets_validation(bad, msg):
    with pytest.raises(RequestError, match=None):
        try:
            parse_request(bad)
        except RequestError as e:
            assert msg in str(e)
            raise


def test_fuzzy_slot_request_parses_and_serves(spark, serving):
    docs, idx = serving
    p = parse_request({"slots": [{"fuzzy": "fasst", "dist": 1},
                                 {"pattern": "h*"}],
                       "dists": [[1, 4]]})
    assert p["slots"][0] == {"fuzzy": "fasst", "dist": 1}
    # default dist is 1
    p2 = parse_request({"slots": [{"fuzzy": "fasst"}], "dists": []})
    assert p2["slots"][0] == {"fuzzy": "fasst", "dist": 1}
    # the corpus has no 1-edit neighbors of 'fast' except itself, so the
    # fuzzy request must answer exactly like the exact-word request
    ra = handle_request(docs, idx, {"slots": [{"fuzzy": "fast", "dist": 1},
                                              {"pattern": "h*"}],
                                    "dists": [[1, 4]], "until": 12})
    rb = handle_request(docs, idx, {"slots": [{"word": "fast"},
                                              {"pattern": "h*"}],
                                    "dists": [[1, 4]], "until": 12})
    assert "error" not in ra and ra == rb


def test_facets_response(spark, serving):
    docs, idx = serving
    resp = handle_request(docs, idx, dict(REQ, facets=True))
    assert "error" not in resp and "facets" in resp
    assert set(resp["facets"]) == {"lang", "source"}
    # facet doc counts must sum to the request's total_docs per field
    for field, counts in resp["facets"].items():
        assert sum(counts.values()) == resp["total_docs"], field
    # page content identical to the facet-less request
    base = handle_request(docs, idx, REQ)
    assert resp["results"] == base["results"]
    assert resp["total_matches"] == base["total_matches"]


def test_facets_with_continuation_session(spark, serving):
    from fastmorph_spark.search.protocol import close_session

    docs, idx = serving
    session: dict = {}
    r1 = handle_request(docs, idx, dict(REQ, facets=True), session=session)
    assert len(session) == 1
    r2 = handle_request(docs, idx,
                        dict(REQ, skip=0, until=5, facets=True),
                        session=session)
    assert len(session) == 1  # same shape -> same persisted match set
    assert r1["facets"] == r2["facets"]
    close_session(session)


def test_keyness_request(spark, serving):
    docs, idx = serving
    resp = handle_request(docs, idx, {"keyness": "en", "min_count": 5, "k": 10})
    assert "error" not in resp and resp["focus"] == "en"
    assert resp["results"] and len(resp["results"]) <= 10
    from fastmorph_spark.search.keyness import keyness

    want = keyness(docs, "en", 5, 10).collect()
    assert [(r["rank"], r["term"], r["g2"]) for r in want] == \
           [(r["rank"], r["term"], r["g2"]) for r in resp["results"]]
    # validation
    assert "error" in handle_request(docs, idx, {"keyness": ""})
    assert "error" in handle_request(docs, idx, {"keyness": "en", "k": 0})
    assert "error" in handle_request(docs, idx,
                                     {"keyness": "en", "pattern": "x"})


def test_paradigm_request(spark, serving):
    docs, idx = serving
    resp = handle_request(docs, idx, {"paradigm": "joins"})
    assert "error" not in resp and resp["word"] == "joins"
    # raw corpus holds one form of the 'join' stem
    assert [r["term"] for r in resp["results"]] == ["join"]
    assert resp["results"][0]["df"] > 0 and resp["results"][0]["cf"] > 0
    assert "error" in handle_request(docs, idx, {"paradigm": "  "})
    assert "error" in handle_request(docs, idx,
                                     {"paradigm": "x", "window": 3})
    # one-form-only request mixing two forms is rejected
    assert "error" in handle_request(docs, idx,
                                     {"paradigm": "x", "keyness": "en"})


def test_thesaurus_request(spark, serving):
    docs, idx = serving
    resp = handle_request(docs, idx,
                          {"thesaurus": "fast", "window": 3,
                           "min_shared": 2, "k": 10})
    assert "error" not in resp and resp["target"] == "fast"
    assert resp["results"] and len(resp["results"]) <= 10
    from fastmorph_spark.search.thesaurus import thesaurus

    want = thesaurus(docs, "fast", 3, 2, 10).collect()
    assert [(r["rank"], r["term"], r["sim"]) for r in want] == \
           [(r["rank"], r["term"], r["sim"]) for r in resp["results"]]
    assert "error" in handle_request(docs, idx, {"thesaurus": ""})
    assert "error" in handle_request(docs, idx,
                                     {"thesaurus": "fast", "window": 0})
    assert "error" in handle_request(docs, idx,
                                     {"thesaurus": "fast", "dists": []})


def test_sketch_diff_request_matches_corpus_path(spark, serving):
    docs, idx = serving
    resp = handle_request(docs, idx,
                          {"sketch_diff": ["fast", "slow"], "window": 3,
                           "min_count": 2, "k": 10})
    assert "error" not in resp and resp["targets"] == ["fast", "slow"]
    assert resp["results"], "fixture must produce shared collocates"
    from fastmorph_spark.index import build_dictionary, build_postings
    from fastmorph_spark.search.collocation import sketch_diff

    postings = build_postings(docs)
    dictionary = build_dictionary(postings)
    want = sketch_diff(postings, dictionary, "fast", "slow", 3, 2, 10).collect()
    assert [(r["rank"], r["term"], r["diff"]) for r in want] == \
           [(r["rank"], r["term"], r["diff"]) for r in resp["results"]]
    assert "error" in handle_request(docs, idx, {"sketch_diff": ["a"]})
    assert "error" in handle_request(docs, idx, {"sketch_diff": ["a", ""]})
    assert "error" in handle_request(docs, idx,
                                     {"sketch_diff": ["a", "b"], "skip": 1})


def test_thesaurus_session_reuses_profiles(spark, serving):
    """A serving session scans the corpus for co-occurrence profiles
    ONCE per (lang, window): the second thesaurus request reuses the
    persisted frame (identical answers), and close_session frees it."""
    from fastmorph_spark.search.protocol import close_session

    docs, idx = serving
    session: dict = {}
    r1 = handle_request(docs, idx, {"thesaurus": "fast", "k": 5},
                        session=session)
    keys = [k for k in session if k[0] == "thesaurus_profiles"]
    assert len(keys) == 1
    prof = session[keys[0]]
    assert prof.storageLevel.useMemory or prof.storageLevel.useDisk
    r2 = handle_request(docs, idx, {"thesaurus": "slow", "k": 5},
                        session=session)
    assert [k for k in session if k[0] == "thesaurus_profiles"] == keys
    # same answers as the session-less path (profiles change nothing)
    assert r1 == handle_request(docs, idx, {"thesaurus": "fast", "k": 5})
    assert r2 == handle_request(docs, idx, {"thesaurus": "slow", "k": 5})
    close_session(session)
    assert not session and prof.storageLevel.useMemory is False


def test_suggest_request(spark, serving):
    """Did-you-mean off dictionary metadata: matches fuzzy_terms
    (dist ASC, df DESC, term ASC), dist=0 probe included when present,
    bad fields are client-addressable errors."""
    docs, idx = serving
    resp = handle_request(docs, idx, {"suggest": "fasst", "dist": 1, "k": 5})
    assert "error" not in resp and resp["word"] == "fasst"
    assert resp["results"], "fixture vocabulary holds 'fast' at dist 1"
    from fastmorph_spark.search.fuzzy import fuzzy_terms

    want = fuzzy_terms(idx.dictionary, "fasst", 1, 5).collect()
    assert [(r["term"], r["df"], r["dist"]) for r in want] == \
           [(r["term"], r["df"], r["dist"]) for r in resp["results"]]
    assert resp["results"][0]["term"] == "fast"
    assert "error" in handle_request(docs, idx, {"suggest": "  "})
    assert "error" in handle_request(docs, idx, {"suggest": "x", "dist": 9})
    assert "error" in handle_request(docs, idx, {"suggest": "x", "until": 5})
    assert "error" in handle_request(docs, idx,
                                     {"suggest": "x", "thesaurus": "y"})


def test_bm25_expand_request(spark, serving):
    """'expand' on a bm25 request: expanded_terms equals
    search/expand.expand_terms, results equal the WAND kernel over that
    set, expand=0 path untouched, bad values rejected."""
    docs, idx = serving
    from fastmorph_spark.search.expand import expand_terms
    from fastmorph_spark.search.wand import search_wand_terms

    resp = handle_request(docs, idx, {"bm25": "fast join", "expand": 3,
                                      "k": 5})
    assert "error" not in resp
    want_terms = expand_terms(docs, "fast join", n_expand=3, window=3,
                              min_shared=2)
    assert resp["expanded_terms"] == want_terms
    assert len(want_terms) > 2, "fixture corpus must actually expand"
    want = search_wand_terms(idx, want_terms, k=5).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in want] == \
           [(r["rank"], r["doc_id"], r["score"]) for r in resp["results"]]
    plain = handle_request(docs, idx, {"bm25": "fast join", "k": 5})
    assert "expanded_terms" not in plain and plain["results"]
    assert "error" in handle_request(docs, idx,
                                     {"bm25": "x", "expand": -1})
    assert "error" in handle_request(docs, idx,
                                     {"bm25": "x", "expand": True})
    assert "error" in handle_request(docs, idx,
                                     {"bm25": "x", "expand": 99})


def test_more_like_request(spark, serving):
    """Similar-document retrieval form: equals the packed MLT operator
    (which test_mlt pins to the corpus path + DuckDB oracle); an absent
    source doc is an empty result, not an error; bad fields are
    client-addressable errors."""
    docs, idx = serving
    resp = handle_request(docs, idx, {"more_like": 42, "m": 8, "k": 5})
    assert "error" not in resp and resp["doc_id"] == 42
    assert resp["results"] and all(r["doc_id"] != 42 for r in resp["results"])
    from fastmorph_spark.search.mlt import more_like_this_packed

    want = more_like_this_packed(idx, docs, 42, m=8, k=5).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in want] == \
           [(r["rank"], r["doc_id"], r["score"]) for r in resp["results"]]
    absent = handle_request(docs, idx, {"more_like": 10**9})
    assert "error" not in absent and absent["results"] == []
    assert "error" in handle_request(docs, idx, {"more_like": -1})
    assert "error" in handle_request(docs, idx, {"more_like": True})
    assert "error" in handle_request(docs, idx, {"more_like": 1, "m": 0})
    assert "error" in handle_request(docs, idx, {"more_like": 1, "until": 5})
    assert "error" in handle_request(docs, idx,
                                     {"more_like": 1, "bm25": "x"})


def test_sorted_kwic_request(spark, serving):
    """'sort' on a kwic request: ranks (skip, until] of the SORTED
    concordance, equal to engine.kwic_sorted over the same matches; sort
    shares the continuation match set (assembly, not shape); invalid
    combinations are client errors."""
    docs, idx = serving
    base = {"slots": [{"word": "fast"}, {"pattern": "h*"}],
            "dists": [[1, 4]], "format": "kwic", "width": 3, "until": 7}
    resp = handle_request(docs, idx, {**base, "sort": "right"})
    assert "error" not in resp and resp["n_lines"] == len(resp["results"]) > 0
    from fastmorph_spark.search.engine import kwic_sorted
    from fastmorph_spark.search.packed import packed_request_matches

    m = packed_request_matches(idx, [{"term": "fast"}, {"pattern": "h*"}],
                               [(1, 4)])
    want = kwic_sorted(docs, m, 2, width=3, by="right", n=7).collect()
    assert [(r["rank"], r["doc_id"], r["pos"], r["left_ctx"], r["keyword"],
             r["right_ctx"]) for r in want] == \
           [(r["rank"], r["doc_id"], r["pos"], r["left_ctx"], r["keyword"],
             r["right_ctx"]) for r in resp["results"]]
    # skip slices the SORTED ranks
    r2 = handle_request(docs, idx, {**base, "sort": "right", "skip": 3})
    assert [r["rank"] for r in r2["results"]] == \
           [r["rank"] for r in resp["results"]][3:]
    # left sort is a different order on this fixture (non-vacuous check:
    # at least the first line differs or the orders are both singular)
    rl = handle_request(docs, idx, {**base, "sort": "left"})
    assert "error" not in rl and rl["results"]
    # session: sort shares the unsorted request's match set (same shape)
    from fastmorph_spark.search.protocol import close_session

    session: dict = {}
    handle_request(docs, idx, base, session=session)
    n_keys = len(session)
    r3 = handle_request(docs, idx, {**base, "sort": "right"},
                        session=session)
    assert len(session) == n_keys  # no second match-set entry
    assert r3["results"] == resp["results"]
    close_session(session)
    # validation
    assert "error" in handle_request(docs, idx, {**base, "sort": "up"})
    assert "error" in handle_request(
        docs, idx, {"slots": base["slots"], "dists": base["dists"],
                    "sort": "right"})  # snippets format
    assert "error" in handle_request(
        docs, idx, {**base, "sort": "right", "facets": True})


def test_offsets_request_matches_corpus_path(spark, serving):
    docs, idx = serving
    resp = handle_request(docs, idx,
                          {"offsets": "fast", "window": 3,
                           "min_count": 2, "k": 5})
    assert "error" not in resp and resp["target"] == "fast"
    assert resp["results"]
    from fastmorph_spark.index.build import build_dictionary, build_postings
    from fastmorph_spark.search.collocation import colloc_by_offset

    postings = build_postings(docs)
    dictionary = build_dictionary(postings)
    want = colloc_by_offset(postings, dictionary, "fast", 3, 2, 5).collect()
    assert [(r["offset"], r["rank"], r["term"], r["cooc"]) for r in want] == \
           [(r["offset"], r["rank"], r["term"], r["cooc"])
            for r in resp["results"]]
    # every emitted offset is within the window and never 0
    assert all(1 <= abs(r["offset"]) <= 3 for r in resp["results"])
    # validation
    assert "error" in handle_request(docs, idx, {"offsets": ""})
    assert "error" in handle_request(docs, idx,
                                     {"offsets": "fast", "window": 0})
    assert "error" in handle_request(docs, idx,
                                     {"offsets": "fast", "k": 0})
    assert "error" in handle_request(docs, idx,
                                     {"offsets": "fast", "until": 5})
    # absent target: well-formed empty response, not an error
    r0 = handle_request(docs, idx, {"offsets": "zzzznope"})
    assert "error" not in r0 and r0["results"] == []


def test_mwe_request_matches_corpus_path(spark, serving):
    docs, idx = serving
    resp = handle_request(docs, idx, {"mwe": True, "min_count": 5, "k": 10})
    assert "error" not in resp and resp["results"]
    from fastmorph_spark.search.collocation import mwe_bigrams

    want = mwe_bigrams(docs, 5, 10).collect()
    assert [(r["rank"], r["w1"], r["w2"], r["logdice"]) for r in want] == \
           [(r["rank"], r["w1"], r["w2"], r["logdice"])
            for r in resp["results"]]
    # validation
    assert "error" in handle_request(docs, idx, {"mwe": 1})
    assert "error" in handle_request(docs, idx, {"mwe": True, "lang": "en"})
    assert "error" in handle_request(docs, idx, {"mwe": True, "k": 0})
    assert "error" in handle_request(docs, idx,
                                     {"mwe": True, "offsets": "fast"})


def test_gdex_sorted_kwic_request(spark, serving):
    docs, idx = serving
    base = {"slots": [{"word": "fast"}, {"pattern": "h*"}],
            "dists": [[1, 1]], "format": "kwic", "skip": 0, "until": 10}
    resp = handle_request(docs, idx, {**base, "sort": "gdex"})
    assert "error" not in resp and resp["results"]
    from fastmorph_spark.search.engine import kwic_gdex, slot_search
    from fastmorph_spark.index.build import build_dictionary, build_postings

    postings = build_postings(docs)
    dictionary = build_dictionary(postings)
    m = slot_search(postings, dictionary,
                    [{"term": "fast"}, {"pattern": "h*"}], [(1, 1)])
    want = kwic_gdex(docs, dictionary, m, 2, width=5, n=10).collect()
    assert [(r["rank"], r["doc_id"], r["pos"], r["keyword"])
            for r in want] == \
           [(r["rank"], r["doc_id"], r["pos"], r["keyword"])
            for r in resp["results"]]
    # gdex page carries the example-quality evidence columns
    assert all("score" in r and "min_cf" in r for r in resp["results"])
    # descending score order
    scores = [r["score"] for r in resp["results"]]
    assert scores == sorted(scores, reverse=True)
    # validation still rejects a bad sort and non-kwic format
    assert "error" in handle_request(docs, idx, {**base, "sort": "best"})
    assert "error" in handle_request(
        docs, idx, {"slots": base["slots"], "dists": base["dists"],
                    "sort": "gdex"})


def test_collocations_group_by_request(spark, serving):
    """`{"collocations": t, "group_by": "stem"}` serves the lemma-
    grouped profile: equality with packed_collocations_by_attr, the
    group_by echoed, rows keyed "key", and validation for bad values."""
    from fastmorph_spark.search.collocation import packed_collocations_by_attr

    docs, idx = serving
    req = {"collocations": "fast", "window": 3, "min_count": 2, "k": 10,
           "group_by": "stem"}
    resp = handle_request(docs, idx, req)
    assert "error" not in resp and resp["group_by"] == "stem"
    want = [(int(r["rank"]), r["key"], int(r["cooc"]), int(r["cf"]),
             float(r["pmi"]))
            for r in packed_collocations_by_attr(
                idx, "fast", attr="stem", window=3, min_count=2,
                k=10).collect()]
    got = [(r["rank"], r["key"], r["cooc"], r["cf"], r["pmi"])
           for r in resp["results"]]
    assert got == want and got
    json.loads(to_json(resp))
    with pytest.raises(RequestError):
        parse_request({"collocations": "x", "group_by": "lemma"})
    # ungrouped requests are unchanged: rows keyed "term", no group_by
    plain = handle_request(docs, idx, {"collocations": "fast", "k": 5})
    assert "group_by" not in plain
    assert plain["results"] and "term" in plain["results"][0]


# ---------------- grep / defs forms (code-search wave)

def test_grep_request_matches_corpus_path(spark, serving):
    docs, idx = serving
    resp = handle_request(docs, idx, {"grep": "fast", "limit": 7})
    assert "error" not in resp and resp["term"] == "fast"
    from fastmorph_spark.search.grep import grep_lines

    want = [{"doc_id": int(r["doc_id"]), "line_no": int(r["line_no"]),
             "line": r["line"]}
            for r in grep_lines(docs, "fast").limit(7).collect()]
    assert resp["results"] == want and len(want) == 7


def test_grep_request_validation():
    with pytest.raises(RequestError, match="one token"):
        parse_request({"grep": "two words"})
    with pytest.raises(RequestError, match="non-empty"):
        parse_request({"grep": ""})
    with pytest.raises(RequestError, match="limit"):
        parse_request({"grep": "x", "limit": 0})
    with pytest.raises(RequestError, match="unknown"):
        parse_request({"grep": "x", "bogus": 1})
    # the term folds through the canonical tokenizer (case, punctuation)
    assert parse_request({"grep": "FAST!"})["grep"] == "fast"


def test_defs_request_inline(spark, serving):
    _, idx = serving
    docs = spark.createDataFrame(
        [(0, "def alpha(x):\n    y = 1\nclass Beta:")],
        "doc_id long, text string",
    )
    resp = handle_request(docs, idx, {"defs": True})
    assert resp["results"] == [
        {"doc_id": 0, "line_no": 1, "kind": "def", "symbol": "alpha"},
        {"doc_id": 0, "line_no": 3, "kind": "class", "symbol": "Beta"},
    ]
    with pytest.raises(RequestError, match="defs must be true"):
        parse_request({"defs": 1})


def test_grep_lang_routed(spark, serving):
    """Per-lang index map: grep routes through the lang filter; a lang
    absent from the map answers empty, not an error."""
    docs, idx = serving
    resp = handle_request(docs, {"en": idx}, {"grep": "fast", "lang": "xx"})
    assert resp == {"term": "fast", "limit": 100, "results": []}
    routed = handle_request(docs, {"en": idx}, {"grep": "fast", "lang": "en",
                                                "limit": 5})
    assert "error" not in routed and len(routed["results"]) <= 5
    from pyspark.sql import functions as F
    from fastmorph_spark.search.grep import grep_lines

    want = [{"doc_id": int(r["doc_id"]), "line_no": int(r["line_no"]),
             "line": r["line"]}
            for r in grep_lines(docs.filter(F.col("lang") == "en"),
                                "fast").limit(5).collect()]
    assert routed["results"] == want


# ---------------- substring / regex forms (trigram sidecar)

def test_substring_request_scan_vs_sidecar(spark, serving):
    """The trigram sidecar is an accelerator: with and without it the
    substring form answers identically (exact verify either way)."""
    docs, idx = serving
    from fastmorph_spark.index.trigram import build_trigram_index

    tg = build_trigram_index(docs)
    scan = handle_request(docs, idx, {"substring": "the", "limit": 9})
    fast = handle_request(docs, idx, {"substring": "the", "limit": 9},
                          trigram=tg)
    assert "error" not in scan and scan == fast
    assert scan["results"] and len(scan["results"]) <= 9
    assert all("the" in r["line"] for r in scan["results"])


def test_substring_request_case_insensitive(spark, serving):
    docs, idx = serving
    resp = handle_request(docs, idx, {"substring": "THE", "case": False,
                                      "limit": 5})
    assert "error" not in resp
    assert all("the" in r["line"].lower() for r in resp["results"])


def test_substring_request_validation():
    with pytest.raises(RequestError, match="non-empty"):
        parse_request({"substring": ""})
    with pytest.raises(RequestError, match="case must be"):
        parse_request({"substring": "x", "case": "yes"})
    with pytest.raises(RequestError, match="unknown"):
        parse_request({"substring": "x", "width": 2})
    p = parse_request({"substring": "Response(x"})
    assert p == {"substring": "Response(x", "case": True, "limit": 100,
                 "lang": None}


def test_regex_request_and_subset_rejection(spark, serving):
    docs, idx = serving
    resp = handle_request(docs, idx, {"regex": "the|and", "limit": 7})
    assert "error" not in resp and len(resp["results"]) <= 7
    import re as _re

    assert all(_re.search("the|and", r["line"]) for r in resp["results"])
    # out-of-subset pattern -> client-addressable error, not a crash
    bad = handle_request(docs, idx, {"regex": r"\bthe\b"})
    assert "error" in bad and "subset" in bad["error"]


def test_substring_lang_routing(spark, serving):
    """lang absent from the INDEX map -> empty (no such subcorpus);
    lang absent from the TRIGRAM map -> scan fallback, NOT empty."""
    docs, idx = serving
    resp = handle_request(docs, {"en": idx}, {"substring": "the",
                                              "lang": "xx"})
    assert resp == {"q": "the", "case": True, "limit": 100, "results": []}
    routed = handle_request(docs, {"en": idx},
                            {"substring": "the", "lang": "en", "limit": 4},
                            trigram={})  # no 'en' sidecar -> scan
    assert "error" not in routed and routed["results"]
    from pyspark.sql import functions as F

    en_docs = {r["doc_id"] for r in
               docs.filter(F.col("lang") == "en").select("doc_id").collect()}
    assert all(r["doc_id"] in en_docs for r in routed["results"])


# ---------------- symbol forms

def test_defs_symbol_filter(spark, serving):
    _, idx = serving
    docs = spark.createDataFrame(
        [(0, "def alpha(x):\n    pass\ndef beta(y):\n    pass"),
         (1, "class alpha:\n    pass")],
        "doc_id long, text string",
    )
    resp = handle_request(docs, idx, {"defs": True, "symbol": "alpha"})
    assert [(r["doc_id"], r["kind"]) for r in resp["results"]] == \
        [(0, "def"), (1, "class")]
    assert resp["symbol"] == "alpha"
    with pytest.raises(RequestError, match="symbol must be"):
        parse_request({"defs": True, "symbol": ""})


def test_symbol_request_matches_operator(spark, serving):
    docs, idx = serving
    resp = handle_request(docs, idx, {"symbol": "fast", "k": 5})
    assert "error" not in resp and len(resp["results"]) <= 5
    from fastmorph_spark.search.symbols import symbol_boosted_topk

    want = [{"rank": int(r["rank"]), "doc_id": int(r["doc_id"]),
             "score": float(r["score"])}
            for r in symbol_boosted_topk(docs, "fast", k=5).collect()]
    assert resp["results"] == want and want


def test_symbol_request_validation():
    with pytest.raises(RequestError, match="one token"):
        parse_request({"symbol": "two words"})
    with pytest.raises(RequestError, match="k must be"):
        parse_request({"symbol": "x", "k": 0})
    with pytest.raises(RequestError, match="unknown"):
        parse_request({"symbol": "x", "limit": 5})


def test_grep_context_option(spark, serving):
    _, idx = serving
    docs = spark.createDataFrame(
        [(0, "before\nhit here\nafter\nfar away")],
        "doc_id long, text string",
    )
    resp = handle_request(docs, idx, {"grep": "hit", "context": 1})
    assert resp["context"] == 1
    assert [(r["line_no"], r["is_match"]) for r in resp["results"]] == \
        [(1, False), (2, True), (3, False)]
    # default stays the bare match-lines response (no context key)
    plain = handle_request(docs, idx, {"grep": "hit"})
    assert "context" not in plain and len(plain["results"]) == 1
    with pytest.raises(RequestError, match="context"):
        parse_request({"grep": "x", "context": -1})


def test_refs_request_forms(spark, serving):
    _, idx = serving
    docs = spark.createDataFrame(
        [(0, "def f():\n# see alphaFn and beta_util"),
         (1, "# see alphaFn and alphaFn"),
         (2, "plain line")],
        "doc_id long, text string",
    )
    ranking = handle_request(docs, idx, {"refs": True, "k": 10})
    assert ranking["results"] == [
        {"ref": "alphaFn", "n_docs": 2, "n_refs": 3},
        {"ref": "beta_util", "n_docs": 1, "n_refs": 1},
    ]
    edges = handle_request(docs, idx, {"refs": "alphaFn"})
    assert edges["results"] == [
        {"doc_id": 0, "line_no": 2},
        {"doc_id": 1, "line_no": 1},
        {"doc_id": 1, "line_no": 1},
    ]
    missing = handle_request(docs, idx, {"refs": "nothingCitesThis"})
    assert missing["results"] == []    # empty is an answer, not an error


def test_refs_request_validation():
    with pytest.raises(RequestError, match="identifier"):
        parse_request({"refs": "two words"})
    with pytest.raises(RequestError, match="identifier"):
        parse_request({"refs": 7})
    with pytest.raises(RequestError, match="ranking form"):
        parse_request({"refs": True, "limit": 5})
    with pytest.raises(RequestError, match="refs=true"):
        parse_request({"refs": "x", "k": 5})
    with pytest.raises(RequestError, match="exactly one form"):
        parse_request({"refs": True, "grep": "x"})
