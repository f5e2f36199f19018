"""Protocol-level context filter + frequency breakdown: validation,
engine equality (the serving path must answer exactly what the green
registry path computes), continuation-key isolation, and the
positive/negative/unfiltered consistency at the serving boundary."""

from __future__ import annotations

import pytest

from fastmorph_spark.index import build_dictionary, build_postings
from fastmorph_spark.index.io import build_index_frames
from fastmorph_spark.search import confilter, engine
from fastmorph_spark.search.protocol import (
    RequestError,
    close_session,
    handle_request,
    parse_request,
)
from fastmorph_spark.sources import read_documents
from tests.conftest import SF0001

FREQ = {"slots": [{"pattern": "s*"}], "dists": [], "freq": "node", "k": 10}
FILT = {"slots": [{"word": "fast"}], "dists": [],
        "filter": {"slot": {"word": "join"}, "window": [-5, 5]}}


@pytest.fixture(scope="module")
def serving(spark):
    docs = read_documents(spark, SF0001)
    idx = build_index_frames(docs, doc_shard_size=100, block_size=16)
    idx.postings = idx.postings.persist()
    idx.dictionary = idx.dictionary.persist()
    yield docs, idx


# ---------------- validation

@pytest.mark.parametrize("bad,msg", [
    ({**FILT, "filter": "join"}, "filter must be an object"),
    ({**FILT, "filter": {}}, "needs a slot field"),
    ({**FILT, "filter": {"slot": {"word": "j"}, "win": 1}}, "unknown fields"),
    ({**FILT, "filter": {"slot": {"wurd": "j"}}}, "exactly one"),
    ({**FILT, "filter": {"slot": {"word": "j"}, "window": [5, -5]}}, "lo <= hi"),
    ({**FILT, "filter": {"slot": {"word": "j"}, "window": [0]}}, "lo <= hi"),
    ({**FILT, "filter": {"slot": {"word": "j"}, "mode": "both"}},
     "positive' or 'negative"),
    ({**FREQ, "freq": "nope"}, "node"),
    ({**FREQ, "format": "kwic"}, "cannot combine"),
    ({**FREQ, "facets": True}, "cannot combine"),
    ({**FREQ, "until": 5}, "cannot combine"),
    ({"slots": [{"word": "a"}], "dists": [], "k": 5}, "freq requests only"),
    ({**FREQ, "k": 0}, "k must be"),
])
def test_parse_rejects(bad, msg):
    with pytest.raises(RequestError) as e:
        parse_request(bad)
    assert msg in str(e.value)


def test_parse_defaults():
    p = parse_request(FILT)
    assert p["filter"] == {"slot": {"term": "join"}, "window": [-5, 5],
                           "mode": "positive"}
    p = parse_request(FREQ)
    assert p["freq"] == "node" and p["freq_k"] == 10
    # filter slot specs go through full slot validation (regex subset etc.)
    with pytest.raises(RequestError):
        parse_request({**FILT, "filter": {"slot": {"regex": "a(?=b)"}}})


# ---------------- serving equality vs the engine paths

def test_filtered_page_matches_engine(spark, serving):
    docs, idx = serving
    resp = handle_request(docs, idx, {**FILT, "until": 1000})
    assert "error" not in resp
    postings = build_postings(docs)
    dictionary = build_dictionary(postings)
    m = engine.slot_search(postings, dictionary, [{"term": "fast"}], [])
    want = confilter.filter_context(m, postings, dictionary,
                                    {"term": "join"}, (-5, 5), "positive")
    rows = {(r.doc_id, r.n_matches) for r in want.collect()}
    got = {(d["doc_id"], d["n_matches"]) for d in resp["results"]}
    assert got == rows
    assert resp["total_matches"] == sum(n for _, n in rows)


def test_negative_filter_complements(spark, serving):
    docs, idx = serving
    base = handle_request(docs, idx, {"slots": [{"word": "fast"}],
                                      "dists": [], "until": 1000})
    pos = handle_request(docs, idx, {**FILT, "until": 1000})
    neg = handle_request(
        docs, idx,
        {**FILT, "until": 1000,
         "filter": {**FILT["filter"], "mode": "negative"}})
    assert pos["total_matches"] + neg["total_matches"] == base["total_matches"]
    assert pos["total_matches"] > 0 and neg["total_matches"] > 0


def test_freq_node_matches_engine(spark, serving):
    docs, idx = serving
    resp = handle_request(docs, idx, FREQ)
    assert resp["freq"] == "node" and "error" not in resp
    postings = build_postings(docs)
    dictionary = build_dictionary(postings)
    m = engine.slot_search(postings, dictionary, [{"pattern": "s*"}], [])
    want = [(r.keyword, r.n_occ, r.n_docs)
            for r in confilter.conc_freq_node(m, docs, k=10).collect()]
    got = [(d["keyword"], d["n_occ"], d["n_docs"]) for d in resp["results"]]
    assert got == want and got


def test_freq_attr_and_filtered_freq(spark, serving):
    docs, idx = serving
    resp = handle_request(docs, idx, {"slots": [{"word": "fast"}],
                                      "dists": [], "freq": "lang"})
    assert resp["freq"] == "lang"
    assert sum(d["n_docs"] for d in resp["results"]) > 0
    # freq composes with filter: breakdown OF the filtered concordance
    fresp = handle_request(docs, idx, {**FILT, "freq": "lang"})
    page = handle_request(docs, idx, {**FILT, "until": 1000})
    assert sum(d["n_occ"] for d in fresp["results"]) == page["total_matches"]


def test_continuation_key_isolates_filter(spark, serving):
    """A session must never serve the filtered match set for the
    unfiltered request (or across filter modes)."""
    docs, idx = serving
    session: dict = {}
    base = handle_request(docs, idx, {"slots": [{"word": "fast"}],
                                      "dists": [], "until": 1000},
                          session=session)
    pos = handle_request(docs, idx, {**FILT, "until": 1000}, session=session)
    assert len(session) == 2  # distinct shapes -> distinct pins
    assert pos["total_matches"] < base["total_matches"]
    again = handle_request(docs, idx, {**FILT, "until": 1000},
                           session=session)
    assert len(session) == 2  # same shape -> reused
    assert again == pos
    close_session(session)
    assert not session


def test_filter_with_sorted_kwic(spark, serving):
    """filter composes with the sorted-concordance view."""
    docs, idx = serving
    resp = handle_request(docs, idx, {**FILT, "until": 5, "format": "kwic",
                                      "sort": "right"})
    assert "error" not in resp and resp["n_lines"] > 0
    assert all(r["keyword"] == "fast" for r in resp["results"])
