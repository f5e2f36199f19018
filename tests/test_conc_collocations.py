"""Concordance collocations (collocation.conc_collocations): brute-force
Python oracle on a hand corpus, span-exclusion semantics, packed ≡ corpus
equivalence (incl. the envelope-bounded decode), DuckDB oracle parity, and
the broadcast fallback identity."""

from __future__ import annotations

import math

import pytest

from fastmorph_spark import oracles
from fastmorph_spark.constants import SCORE_DECIMALS
from fastmorph_spark.index import build_dictionary, build_postings
from fastmorph_spark.search import engine
from fastmorph_spark.search.collocation import (
    conc_collocations,
    conc_collocations_packed,
)
from fastmorph_spark.sources import read_documents
from fastmorph_spark.tokenize import tokenize_py
from tests.conftest import SF0001, assert_frames_match, register_views

HAND = [
    (0, "fast hash join slow scan fast hash"),
    (1, "slow fast hash merge merge merge"),
    (2, "fast scan hash fast hash scan scan"),
    (3, "merge sort merge"),
]
SLOTS = [{"term": "fast"}, {"term": "hash"}]
DISTS = [(1, 1)]
ML, W = 2, 2


def _python_conc_collocations(texts, slots_node=("fast", "hash"),
                              match_len=ML, window=W, min_count=1, k=100):
    """Exhaustive float64 reference, no Spark, no SQL."""
    cf: dict[str, int] = {}
    cooc: dict[str, int] = {}
    total = 0
    node_occ = 0
    for text in texts:
        toks = tokenize_py(text)
        total += len(toks)
        for t in toks:
            cf[t] = cf.get(t, 0) + 1
        starts = [
            i for i in range(len(toks) - match_len + 1)
            if tuple(toks[i:i + match_len]) == tuple(slots_node)
        ]
        node_occ += len(starts)
        for q, t in enumerate(toks):
            n = sum(
                1 for p in starts
                if p - window <= q <= p + match_len - 1 + window
                and not (p <= q <= p + match_len - 1)
            )
            if n:
                cooc[t] = cooc.get(t, 0) + n
    rows = []
    for t, c in cooc.items():
        if c >= min_count:
            pmi = math.log((c * float(total)) / (node_occ * float(cf[t])))
            rows.append((t, c, cf[t], pmi))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return [
        (i + 1, t, c, f, round(p, SCORE_DECIMALS))
        for i, (t, c, f, p) in enumerate(rows[:k])
    ]


@pytest.fixture(scope="module")
def hand_tables(spark):
    docs = spark.createDataFrame(HAND, "doc_id long, text string")
    postings = build_postings(docs).persist()
    dictionary = build_dictionary(postings).persist()
    yield docs, postings, dictionary
    postings.unpersist()
    dictionary.unpersist()


def test_hand_corpus(spark, hand_tables):
    docs, postings, dictionary = hand_tables
    m = engine.slot_search(postings, dictionary, SLOTS, DISTS)
    got = [tuple(r) for r in conc_collocations(
        m, postings, dictionary, ML, W, min_count=1, k=100).collect()]
    want = _python_conc_collocations([t for _, t in HAND])
    assert got == want
    # span exclusion is real on this fixture: the node's own terms
    # ("fast"/"hash") still collocate through occurrences OUTSIDE spans
    terms = {t for _, t, *_ in got}
    assert "hash" in terms or "fast" in terms


def test_broadcast_fallback_identity(spark, hand_tables):
    docs, postings, dictionary = hand_tables
    m = engine.slot_search(postings, dictionary, SLOTS, DISTS)
    a = conc_collocations(m, postings, dictionary, ML, W, 1, 100,
                          broadcast_matches=True).collect()
    b = conc_collocations(m, postings, dictionary, ML, W, 1, 100,
                          broadcast_matches=False).collect()
    assert a == b


def test_anchor_semantics(spark, hand_tables):
    """match_len=1 anchors on the start position: the window is measured
    from the start and only the start position itself is excluded."""
    docs, postings, dictionary = hand_tables
    m = engine.slot_search(postings, dictionary, [{"term": "fast"}], [])
    got = [tuple(r) for r in conc_collocations(
        m, postings, dictionary, 1, W, min_count=1, k=100).collect()]
    want = _python_conc_collocations(
        [t for _, t in HAND], slots_node=("fast",), match_len=1)
    assert got == want


def test_packed_equals_corpus(spark):
    from fastmorph_spark.index.io import build_index_frames

    docs = read_documents(spark, SF0001)
    postings = build_postings(docs).persist()
    dictionary = build_dictionary(postings)
    idx = build_index_frames(docs, doc_shard_size=100, block_size=16,
                             pack_partitions=8)
    m = engine.slot_search(postings, dictionary, SLOTS, DISTS)
    corpus = conc_collocations(m, postings, dictionary, ML, W).collect()
    packed = conc_collocations_packed(idx, SLOTS, DISTS, ML, W).collect()
    assert corpus == packed and corpus
    postings.unpersist()


def test_packed_wildcard_slots(spark):
    """A wildcard node slot goes through the dictionary-expansion +
    envelope path and still matches the corpus result."""
    from fastmorph_spark.index.io import build_index_frames

    docs = read_documents(spark, SF0001)
    postings = build_postings(docs).persist()
    dictionary = build_dictionary(postings)
    idx = build_index_frames(docs, doc_shard_size=100, block_size=16,
                             pack_partitions=8)
    slots = [{"term": "fast"}, {"pattern": "h*"}]
    m = engine.slot_search(postings, dictionary, slots, DISTS)
    corpus = conc_collocations(m, postings, dictionary, ML, W).collect()
    packed = conc_collocations_packed(idx, slots, DISTS, ML, W).collect()
    assert corpus == packed and corpus
    postings.unpersist()


def test_absent_node_is_empty(spark):
    from fastmorph_spark.index.io import build_index_frames

    docs = read_documents(spark, SF0001)
    idx = build_index_frames(docs, doc_shard_size=100, block_size=16,
                             pack_partitions=8)
    got = conc_collocations_packed(
        idx, [{"term": "zzzznope"}, {"term": "fast"}], DISTS, ML, W).collect()
    assert got == []


def test_duckdb_oracle_parity(spark, duck):
    register_views(duck, SF0001)
    docs = read_documents(spark, SF0001)
    postings = build_postings(docs).persist()
    dictionary = build_dictionary(postings)
    m = engine.slot_search(postings, dictionary, SLOTS, DISTS)
    assert_frames_match(
        conc_collocations(m, postings, dictionary, ML, W),
        duck.sql(oracles.conc_collocations_sql(SLOTS, DISTS, ML, W)),
    )
    postings.unpersist()
