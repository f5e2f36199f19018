"""CQL-lite textual query language (search/cql.py) — parser contract,
the hand-pinned driver-fixture compilations, and the protocol/serving
integration ({"cql": ...} and {"stats": true} forms)."""

from __future__ import annotations

import pytest

from fastmorph_spark.search.cql import CQLError, parse_cql
from fastmorph_spark.search.protocol import (
    RequestError,
    handle_request,
    parse_request,
)


# ---------------- parser: grammar -> engine slot specs

@pytest.mark.parametrize("q,slots,dists,within", [
    # bare quoted shorthand; wildcard chars switch the slot kind
    ('"fast" "hash"', [{"term": "fast"}, {"term": "hash"}], [(1, 1)], False),
    ('"fast" "h*sh"', [{"term": "fast"}, {"pattern": "h*sh"}], [(1, 1)], False),
    # bracket attributes map onto the engine vocabulary
    ('[word="fast"] [lemma="joins"] [tag="number"]',
     [{"term": "fast"}, {"stem": "joins"}, {"tag": "number"}],
     [(1, 1), (1, 1)], False),
    ('[fuzzy="fasst" dist=2]', [{"fuzzy": "fasst", "dist": 2}], [], False),
    ('[pattern="h?sh"]', [{"pattern": "h?sh"}], [], False),
    ('[word="FAST" case]', [{"term": "FAST", "case": True}], [], False),
    # gap -> distance rewrite: []{lo,hi} => (lo+1, hi+1); [] == []{1};
    # []{n} exact; consecutive gaps merge
    ('"a" []{0,2} "b"', [{"term": "a"}, {"term": "b"}], [(1, 3)], False),
    ('"a" [] "b"', [{"term": "a"}, {"term": "b"}], [(2, 2)], False),
    ('"a" []{3} "b"', [{"term": "a"}, {"term": "b"}], [(4, 4)], False),
    ('"a" [] []{1,2} "b"', [{"term": "a"}, {"term": "b"}], [(3, 4)], False),
    # within s
    ('"a" []{0,1} "b" within s',
     [{"term": "a"}, {"term": "b"}], [(1, 2)], True),
])
def test_parse_cql(q, slots, dists, within):
    assert parse_cql(q) == {"slots": slots, "dists": dists,
                            "within_sentence": within}


@pytest.mark.parametrize("q,msg", [
    ("", "non-empty"),
    ("   ", "non-empty"),
    ('[] "a"', "cannot start"),
    ('"a" []', "cannot end"),
    ('"a" []{2,1} "b"', "lo <= hi"),
    ('"a" []{0,2000} "b"', "lo <= hi"),
    ('[word="x" dist=1]', "fuzzy slots only"),
    ('[lemma="x" case]', "word slots only"),
    ('[fuzzy="x" dist=3]', "dist must be 1 or 2"),
    ('[bogus="x"]', "unknown attribute"),
    ('[word=fast]', "quoted value"),
    ('""', "empty quoted value"),
    ('[word=""]', "empty quoted value"),
    ('"a" within p', "within-unit"),
    ('"a" within s "b"', "must end the query"),
    ('"a" @', "unexpected character"),
    ('[word="a"', "unexpected end"),
    ("within s", "no slots"),
])
def test_parse_cql_rejects(q, msg):
    with pytest.raises(CQLError) as e:
        parse_cql(q)
    assert msg in str(e.value)


def test_driver_fixture_compilations_match_their_oracles_pins():
    """The registry oracles hand-pin these compilations; if the parser
    drifts, this pin fails BEFORE the driver's hash compare does."""
    from fastmorph_spark.registry_corpus import (
        CQL_EXPECTED_DISTS,
        CQL_EXPECTED_SLOTS,
        CQL_QUERY,
        CQL_SENT_DISTS,
        CQL_SENT_QUERY,
        CQL_SENT_SLOTS,
    )

    c = parse_cql(CQL_QUERY)
    assert (c["slots"], c["dists"], c["within_sentence"]) == (
        CQL_EXPECTED_SLOTS, CQL_EXPECTED_DISTS, False)
    s = parse_cql(CQL_SENT_QUERY)
    assert (s["slots"], s["dists"], s["within_sentence"]) == (
        CQL_SENT_SLOTS, CQL_SENT_DISTS, True)


# ---------------- protocol: the cql form compiles to the slots form

def test_cql_request_parses_to_slots_form():
    p = parse_request({"cql": '[word="Fast" case] []{0,3} [lemma="running"]',
                       "until": 5, "lang": "en", "format": "kwic"})
    assert p["slots"] == [{"term": "Fast", "case": True}, {"stem": "running"}]
    assert p["dists"] == [(1, 4)]
    assert (p["skip"], p["until"], p["lang"], p["format"]) == (0, 5, "en", "kwic")
    # kwic width default carries over through the rewrite
    assert p["width"] == 5


def test_cql_request_within_form():
    p = parse_request({"cql": '"fast" []{0,1} "j*" within s', "until": 7})
    assert p == {"within_slots": [{"term": "fast"}, {"pattern": "j*"}],
                 "dists": [(1, 2)], "until": 7, "lang": None}


@pytest.mark.parametrize("bad,msg", [
    ({"cql": ""}, "non-empty"),
    ({"cql": 7}, "non-empty"),
    ({"cql": '"a" ]['}, "CQL"),
    ({"cql": '"a"', "slots": []}, "exactly one form"),
    ({"cql": '"a" within s', "skip": 3}, "within s"),
    ({"cql": '"a" within s', "until": 0}, "until must be"),
    ({"cql": '"a"', "bogus": 1}, "unknown request fields"),
    ({"stats": True, "k": 3}, "unknown request fields"),
    ({"stats": 1}, "stats must be true"),
])
def test_cql_and_stats_validation(bad, msg):
    with pytest.raises(RequestError) as e:
        parse_request(bad)
    assert msg in str(e.value)


# ---------------- serving: cql ≡ slots over the packed index

@pytest.fixture(scope="module")
def serving(spark):
    from fastmorph_spark.index.io import build_index_frames
    from fastmorph_spark.sources import read_documents
    from tests.conftest import SF0001

    docs = read_documents(spark, SF0001)
    idx = build_index_frames(docs, doc_shard_size=100, block_size=16)
    idx.postings = idx.postings.persist()
    idx.dictionary = idx.dictionary.persist()
    yield docs, idx
    idx.postings.unpersist()
    idx.dictionary.unpersist()


def test_cql_serving_equals_slots_serving(spark, serving):
    docs, idx = serving
    via_cql = handle_request(docs, idx,
                             {"cql": '"fast" []{0,3} "h*"', "until": 8})
    via_slots = handle_request(docs, idx,
                               {"slots": [{"word": "fast"}, {"pattern": "h*"}],
                                "dists": [[1, 4]], "until": 8})
    assert "error" not in via_cql
    assert via_cql == via_slots
    assert via_cql["total_matches"] > 0


def test_cql_within_serving(spark, serving):
    docs, idx = serving
    r = handle_request(docs, idx,
                       {"cql": '"fast" []{0,10} "hash" within s', "until": 9})
    assert "error" not in r
    assert r["until"] == 9
    assert r["n_results"] == len(r["results"]) <= 9
    # cross-check one row against the batch operator
    from fastmorph_spark.search.sentence import (
        sentence_bounds,
        slot_within_sentence_packed,
    )

    rows = slot_within_sentence_packed(
        idx, sentence_bounds(docs),
        [{"term": "fast"}, {"term": "hash"}], [(1, 11)],
    ).limit(9).collect()
    assert r["results"] == [
        {"doc_id": int(x["doc_id"]), "sent_id": int(x["sent_id"]),
         "n_matches": int(x["n_matches"]), "positions": x["match_starts"]}
        for x in rows]


def test_stats_serving_matches_index_metadata(spark, serving):
    docs, idx = serving
    r = handle_request(docs, idx, {"stats": True})
    assert "error" not in r
    s = idx.stats_row()
    assert r["n_docs"] == int(s["n_docs"])
    assert r["avgdl"] == pytest.approx(float(s["avgdl"]))
    assert r["vocab"] == idx.dictionary.count()
    # Σcf == total token occurrences == n_docs * avgdl
    assert r["tokens"] == pytest.approx(r["n_docs"] * r["avgdl"], rel=1e-9)
    assert 0 < r["postings"] <= r["tokens"]


def test_corpus_summary_matches_stats(spark, serving):
    """The batch corpus_summary operator and the serving stats form
    agree on the shared quantities."""
    from fastmorph_spark.search.keyness import corpus_summary

    docs, idx = serving
    row = corpus_summary(docs).collect()[0]
    r = handle_request(docs, idx, {"stats": True})
    assert int(row["n_docs"]) == r["n_docs"]
    assert int(row["vocab"]) == r["vocab"]
    assert int(row["n_tokens"]) == r["tokens"]
    assert float(row["avgdl"]) == pytest.approx(r["avgdl"], abs=1e-6)
