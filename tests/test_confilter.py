"""Concordance context filters + frequency breakdown (search/confilter.py):
brute-force Python oracle on a hand corpus, positive/negative partition
identity, packed ≡ corpus equivalence, DuckDB oracle parity, slot-spec
filter patterns, composition with kwic, and mass identities for the
frequency breakdowns."""

from __future__ import annotations

import pytest

from fastmorph_spark import oracles
from fastmorph_spark.index import build_dictionary, build_postings
from fastmorph_spark.search import confilter, engine
from fastmorph_spark.sources import read_documents
from fastmorph_spark.tokenize import tokenize_py
from tests.conftest import SF0001, assert_frames_match, register_views

HAND = [
    (0, "fast join fast scan slow join"),          # fast@0,2; join@1,5
    (1, "fast scan scan scan scan scan scan join"),  # fast@0; join@7
    (2, "fast slow"),                                # fast@0; no join
    (3, "join join join"),                           # no fast
]


def _hand_df(spark):
    return spark.createDataFrame(HAND, "doc_id long, text string")


def _brute(window, mode, node="fast", filt="join"):
    lo, hi = window
    out = {}
    for doc_id, text in HAND:
        toks = tokenize_py(text)
        nps = [i for i, t in enumerate(toks) if t == node]
        fps = [i for i, t in enumerate(toks) if t == filt]
        keep = []
        for p in nps:
            has = any(lo <= q - p <= hi for q in fps)
            if (mode == "positive") == has:
                keep.append(p)
        if keep:
            out[doc_id] = keep
    return out


@pytest.fixture(scope="module")
def hand_tables(spark):
    docs = _hand_df(spark)
    postings = build_postings(docs).persist()
    dictionary = build_dictionary(postings).persist()
    yield docs, postings, dictionary
    postings.unpersist()
    dictionary.unpersist()


def _matches(postings, dictionary, term="fast"):
    return engine.slot_search(postings, dictionary, [{"term": term}], [])


@pytest.mark.parametrize("window,mode", [
    ((-5, 5), "positive"),
    ((-5, 5), "negative"),
    ((1, 2), "positive"),   # asymmetric right window
    ((-1, -1), "negative"),  # single left offset
])
def test_hand_corpus(spark, hand_tables, window, mode):
    docs, postings, dictionary = hand_tables
    m = _matches(postings, dictionary)
    got = {
        r.doc_id: [int(x) for x in r.match_starts.split(",")]
        for r in confilter.filter_context(
            m, postings, dictionary, {"term": "join"}, window, mode
        ).collect()
    }
    assert got == _brute(window, mode)


def test_positive_negative_partition(spark, hand_tables):
    """positive ∪ negative = the unfiltered match starts, disjointly."""
    docs, postings, dictionary = hand_tables
    m = _matches(postings, dictionary)
    base = {r.doc_id: set(r.match_starts.split(",")) for r in m.collect()}
    pos = {r.doc_id: set(r.match_starts.split(",")) for r in confilter.filter_context(
        m, postings, dictionary, {"term": "join"}, (-5, 5), "positive").collect()}
    neg = {r.doc_id: set(r.match_starts.split(",")) for r in confilter.filter_context(
        m, postings, dictionary, {"term": "join"}, (-5, 5), "negative").collect()}
    for d, starts in base.items():
        p, q = pos.get(d, set()), neg.get(d, set())
        assert p | q == starts
        assert not (p & q)


def test_slot_spec_filter(spark, hand_tables):
    """The filter accepts full slot specs — a wildcard filter pattern
    behaves as 'any matching token in the window'."""
    docs, postings, dictionary = hand_tables
    m = _matches(postings, dictionary)
    got = {
        r.doc_id: [int(x) for x in r.match_starts.split(",")]
        for r in confilter.filter_context(
            m, postings, dictionary, {"pattern": "j*"}, (-5, 5), "positive"
        ).collect()
    }
    assert got == _brute((-5, 5), "positive")  # only join matches j* here


def test_bad_args(spark, hand_tables):
    docs, postings, dictionary = hand_tables
    m = _matches(postings, dictionary)
    with pytest.raises(ValueError):
        confilter.filter_context(m, postings, dictionary, {"term": "x"}, (3, 1))
    with pytest.raises(ValueError):
        confilter.filter_context(m, postings, dictionary, {"term": "x"},
                                 (-1, 1), "both")


def test_filter_composes_with_kwic(spark, hand_tables):
    """Filter output keeps the slot_search shape, so kwic consumes it."""
    docs, postings, dictionary = hand_tables
    m = _matches(postings, dictionary)
    f = confilter.filter_context(m, postings, dictionary, {"term": "join"},
                                 (-5, 5), "positive")
    lines = engine.kwic(docs, f, match_len=1, width=2).collect()
    assert all(r.keyword == "fast" for r in lines)
    assert {(r.doc_id, r.pos) for r in lines} == {
        (d, p) for d, ps in _brute((-5, 5), "positive").items() for p in ps
    }


def test_conc_freq_node_hand(spark, hand_tables):
    docs, postings, dictionary = hand_tables
    m = engine.slot_search(postings, dictionary, [{"pattern": "s*"}], [])
    rows = {r.keyword: (r.n_occ, r.n_docs)
            for r in confilter.conc_freq_node(m, docs).collect()}
    # scan: doc0 x1, doc1 x6 -> 7 occ / 2 docs; slow: doc0 x1, doc2 x1
    assert rows == {"scan": (7, 2), "slow": (2, 2)}


def test_conc_freq_node_mass(spark, hand_tables):
    """Σ n_occ over the breakdown = Σ n_matches of the match set (k must
    cover all forms for the identity)."""
    docs, postings, dictionary = hand_tables
    m = engine.slot_search(postings, dictionary, [{"pattern": "*"}], [])
    total = sum(r.n_matches for r in m.collect())
    got = confilter.conc_freq_node(m, docs, k=1000).collect()
    assert sum(r.n_occ for r in got) == total


def test_conc_freq_attr_hand(spark, hand_tables):
    docs = _hand_df(spark).withColumn(
        "lang", (engine.F.col("doc_id") % 2 == 0).cast("string"))
    postings = build_postings(docs)
    dictionary = build_dictionary(postings)
    m = _matches(postings, dictionary)
    rows = {r.lang: (r.n_occ, r.n_docs)
            for r in confilter.conc_freq_attr(m, docs, "lang").collect()}
    # fast: doc0 x2 + doc2 x1 (lang true), doc1 x1 (lang false)
    assert rows == {"true": (3, 2), "false": (1, 1)}


def test_packed_equals_corpus(spark):
    """packed_filter_context ≡ corpus-path filter_context on the fixture
    corpus, both modes (the packed-twin convention)."""
    from fastmorph_spark.index.io import build_index_frames

    docs = read_documents(spark, SF0001)
    postings = build_postings(docs).persist()
    dictionary = build_dictionary(postings)
    idx = build_index_frames(docs, doc_shard_size=200, block_size=64,
                             pack_partitions=8)
    m = _matches(postings, dictionary)
    for mode in ("positive", "negative"):
        corpus = confilter.filter_context(
            m, postings, dictionary, {"term": "join"}, (-5, 5), mode).collect()
        packed = confilter.packed_filter_context(
            idx, [{"term": "fast"}], [], {"term": "join"}, (-5, 5), mode).collect()
        assert sorted(map(tuple, corpus)) == sorted(map(tuple, packed)), mode
    postings.unpersist()


def test_duckdb_oracle_parity(spark, duck):
    """Engine vs the driver-facing DuckDB oracles at sf0.001, all three
    builders (the registry keys run at sf0.01 via check_queries)."""
    register_views(duck, SF0001)
    docs = read_documents(spark, SF0001)
    postings = build_postings(docs).persist()
    dictionary = build_dictionary(postings)
    m = _matches(postings, dictionary)
    slots, dists, filt = [{"term": "fast"}], [], {"term": "join"}
    for mode in ("positive", "negative"):
        assert_frames_match(
            confilter.filter_context(m, postings, dictionary, filt, (-5, 5), mode),
            duck.sql(oracles.filter_context_sql(slots, dists, filt, (-5, 5), mode)),
        )
    mw = engine.slot_search(postings, dictionary, [{"pattern": "s*"}], [])
    assert_frames_match(
        confilter.conc_freq_node(mw, docs, k=50),
        duck.sql(oracles.conc_freq_node_sql([{"pattern": "s*"}], [], match_len=1, k=50)),
    )
    assert_frames_match(
        confilter.conc_freq_attr(m, docs, "lang"),
        duck.sql(oracles.conc_freq_attr_sql(slots, dists, "lang")),
    )
    postings.unpersist()
