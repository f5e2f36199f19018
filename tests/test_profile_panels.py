"""Round-5 profile panels: corpus-wide MWE candidates (mwe_bigrams),
the per-offset collocate breakdown (colloc_by_offset + packed twin),
per-doc TF-IDF keywords (doc_keywords), and the within-doc position
histogram (term_position_dist). Each gets a brute-force Python oracle on
a hand corpus plus a DuckDB parity check on the sf0.001 fixture."""

from __future__ import annotations

import math

import pytest

from fastmorph_spark import oracles_corpus
from fastmorph_spark.constants import SCORE_DECIMALS
from fastmorph_spark.index import build_dictionary, build_postings
from fastmorph_spark.search.collocation import (
    colloc_by_offset,
    colloc_by_offset_packed,
    mwe_bigrams,
)
from fastmorph_spark.search.keyness import doc_keywords, term_position_dist
from fastmorph_spark.sources import read_documents
from fastmorph_spark.tokenize import tokenize_py
from tests.conftest import SF0001, assert_frames_match, register_views

HAND = [
    (0, "fast hash join slow scan fast hash"),
    (1, "slow fast hash merge merge merge"),
    (2, "fast scan hash fast hash scan scan"),
    (3, "merge sort merge sort merge"),
]
TEXTS = [t for _, t in HAND]


@pytest.fixture(scope="module")
def hand_tables(spark):
    docs = spark.createDataFrame(HAND, "doc_id long, text string")
    postings = build_postings(docs).persist()
    dictionary = build_dictionary(postings).persist()
    yield docs, postings, dictionary
    postings.unpersist()
    dictionary.unpersist()


# --- mwe_bigrams ----------------------------------------------------------

def _python_mwe(texts, min_count=1, k=100):
    fxy: dict[tuple, int] = {}
    cf: dict[str, int] = {}
    for text in texts:
        toks = tokenize_py(text)
        for t in toks:
            cf[t] = cf.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            fxy[(a, b)] = fxy.get((a, b), 0) + 1
    rows = []
    for (a, b), n in fxy.items():
        if n >= min_count:
            ld = 14 + math.log((2 * float(n)) / (float(cf[a]) + cf[b])) / math.log(2)
            rows.append((a, b, n, cf[a], cf[b], ld))
    rows.sort(key=lambda r: (-r[5], r[0], r[1]))
    return [
        (i + 1, a, b, n, fa, fb, round(ld, SCORE_DECIMALS))
        for i, (a, b, n, fa, fb, ld) in enumerate(rows[:k])
    ]


def test_mwe_hand_corpus(spark, hand_tables):
    docs, *_ = hand_tables
    got = [tuple(r) for r in mwe_bigrams(docs, min_count=1, k=100).collect()]
    assert got == _python_mwe(TEXTS)
    # logDice favors exclusive pairs: "merge sort" (sides occur almost
    # only together) must beat "hash join" (sides spread across docs)
    pairs = [(w1, w2) for _, w1, w2, *_ in got]
    assert pairs.index(("merge", "sort")) < pairs.index(("hash", "join"))


def test_mwe_min_count_gate(spark, hand_tables):
    docs, *_ = hand_tables
    got = mwe_bigrams(docs, min_count=2, k=100).collect()
    assert got and all(r["f_xy"] >= 2 for r in got)
    want = {r[1:3] for r in _python_mwe(TEXTS, min_count=2)}
    assert {(r["w1"], r["w2"]) for r in got} == want


def test_mwe_single_token_docs_ok(spark):
    docs = spark.createDataFrame(
        [(0, "solo"), (1, ""), (2, "a b a b")], "doc_id long, text string")
    got = [tuple(r) for r in mwe_bigrams(docs, min_count=1, k=10).collect()]
    assert got == _python_mwe(["solo", "", "a b a b"])


# --- colloc_by_offset -----------------------------------------------------

def _python_offsets(texts, target, window=2, min_count=1, k_per=100):
    counts: dict[tuple, int] = {}
    for text in texts:
        toks = tokenize_py(text)
        tpos = [i for i, t in enumerate(toks) if t == target]
        for p, t in enumerate(toks):
            if t == target:
                continue
            for q in tpos:
                if abs(p - q) <= window:
                    counts[(t, p - q)] = counts.get((t, p - q), 0) + 1
    by_off: dict[int, list] = {}
    for (t, o), c in counts.items():
        if c >= min_count:
            by_off.setdefault(o, []).append((t, c))
    rows = []
    for o in sorted(by_off):
        ranked = sorted(by_off[o], key=lambda r: (-r[1], r[0]))[:k_per]
        rows += [(o, i + 1, t, c) for i, (t, c) in enumerate(ranked)]
    return rows


def test_offsets_hand_corpus(spark, hand_tables):
    _, postings, dictionary = hand_tables
    got = [tuple(r) for r in colloc_by_offset(
        postings, dictionary, "fast", 2, min_count=1, k_per_offset=100
    ).collect()]
    assert got == _python_offsets(TEXTS, "fast")
    # signedness: "hash" directly follows "fast" repeatedly -> offset +1
    assert any(o == 1 and t == "hash" for o, _, t, _ in got)


def test_offsets_absent_target_empty(spark, hand_tables):
    _, postings, dictionary = hand_tables
    assert colloc_by_offset(postings, dictionary, "zzzznope").collect() == []


def test_offsets_packed_equals_corpus(spark):
    from fastmorph_spark.index.io import build_index_frames

    docs = read_documents(spark, SF0001)
    postings = build_postings(docs).persist()
    dictionary = build_dictionary(postings)
    idx = build_index_frames(docs, doc_shard_size=100, block_size=16,
                             pack_partitions=8)
    corpus = colloc_by_offset(postings, dictionary, "fast", 3, 2, 5).collect()
    packed = colloc_by_offset_packed(idx, "fast", 3, 2, 5).collect()
    assert corpus == packed and corpus
    assert colloc_by_offset_packed(idx, "zzzznope", 3, 2, 5).collect() == []
    postings.unpersist()


# --- doc_keywords ---------------------------------------------------------

def _python_doc_keywords(texts, m=2):
    n = float(len(texts))
    tf = []
    dfreq: dict[str, int] = {}
    for text in texts:
        counts: dict[str, int] = {}
        for t in tokenize_py(text):
            counts[t] = counts.get(t, 0) + 1
        tf.append(counts)
        for t in counts:
            dfreq[t] = dfreq.get(t, 0) + 1
    rows = []
    for doc_id, counts in enumerate(tf):
        scored = sorted(
            ((t, c, dfreq[t], c * math.log((n + 1.0) / (dfreq[t] + 1.0)))
             for t, c in counts.items()),
            key=lambda r: (-r[3], r[0]))[:m]
        rows += [
            (doc_id, i + 1, t, c, d, round(s, SCORE_DECIMALS))
            for i, (t, c, d, s) in enumerate(scored)
        ]
    return rows


def test_keywords_hand_corpus(spark, hand_tables):
    docs, *_ = hand_tables
    got = [tuple(r) for r in doc_keywords(docs, m=2).collect()]
    assert got == _python_doc_keywords(TEXTS, m=2)
    # doc 3 is the merge-sort doc: its top keyword must be one of those
    top3 = next(t for d, r, t, *_ in got if d == 3 and r == 1)
    assert top3 in ("merge", "sort")


def test_keywords_universal_term_scores_low(spark):
    """A term present in EVERY doc gets idf ln((N+1)/(N+1)) == 0 exactly
    — it can never outrank a term with df < N regardless of tf."""
    docs = spark.createDataFrame(
        [(0, "the the the rare"), (1, "the x"), (2, "the y")],
        "doc_id long, text string")
    got = doc_keywords(docs, m=1).collect()
    assert all(r["term"] != "the" for r in got)


# --- term_position_dist ---------------------------------------------------

def _python_posdist(texts, terms, bins=10):
    counts: dict[tuple, int] = {}
    totals: dict[str, int] = {}
    for text in texts:
        toks = tokenize_py(text)
        dl = len(toks)
        for pos, t in enumerate(toks):
            if t in terms:
                d = int(math.floor((pos * float(bins)) / dl))
                counts[(t, d)] = counts.get((t, d), 0) + 1
                totals[t] = totals.get(t, 0) + 1
    return [
        (t, d, c, round(c / float(totals[t]), SCORE_DECIMALS))
        for (t, d), c in sorted(counts.items())
    ]


def test_posdist_hand_corpus(spark, hand_tables):
    docs, *_ = hand_tables
    got = [tuple(r) for r in
           term_position_dist(docs, ["fast", "merge"], 10).collect()]
    assert got == _python_posdist(TEXTS, {"fast", "merge"})
    # fracs sum to ~1 per term over the emitted (sparse) deciles
    # (each frac is rounded to SCORE_DECIMALS=6, so the sum of <=10
    # deciles can be off by up to 5e-6)
    for term in ("fast", "merge"):
        assert abs(sum(f for t, _, _, f in got if t == term) - 1.0) < 1e-5


def test_posdist_decile_bounds(spark, hand_tables):
    docs, *_ = hand_tables
    got = term_position_dist(docs, ["fast", "merge", "sort"], 10).collect()
    assert got and all(0 <= r["decile"] <= 9 for r in got)


# --- DuckDB oracle parity on the fixture corpus ---------------------------

def test_duckdb_parity(spark, duck):
    register_views(duck, SF0001)
    docs = read_documents(spark, SF0001)
    postings = build_postings(docs).persist()
    dictionary = build_dictionary(postings)
    assert_frames_match(
        mwe_bigrams(docs, 5, 50),
        duck.sql(oracles_corpus.mwe_bigrams_sql(5, 50)))
    assert_frames_match(
        colloc_by_offset(postings, dictionary, "fast", 3, 2, 5),
        duck.sql(oracles_corpus.colloc_by_offset_sql("fast", 3, 2, 5)))
    assert_frames_match(
        doc_keywords(docs, 3),
        duck.sql(oracles_corpus.doc_keywords_sql(3)))
    assert_frames_match(
        term_position_dist(docs, ["fast", "join", "the"], 10),
        duck.sql(oracles_corpus.term_position_dist_sql(
            ["fast", "join", "the"], 10)))
    postings.unpersist()


# --- next_word ------------------------------------------------------------

def _python_next_word(texts, target, min_count=1, k=100):
    counts: dict[str, int] = {}
    for text in texts:
        toks = tokenize_py(text)
        for a, b in zip(toks, toks[1:]):
            if a == target:
                counts[b] = counts.get(b, 0) + 1
    tot = float(sum(counts.values()))
    rows = sorted(((b, c) for b, c in counts.items() if c >= min_count),
                  key=lambda r: (-r[1], r[0]))[:k]
    return [
        (i + 1, b, c, round(c / tot, SCORE_DECIMALS))
        for i, (b, c) in enumerate(rows)
    ]


def test_next_word_hand_corpus(spark, hand_tables):
    from fastmorph_spark.search.collocation import next_word

    docs, *_ = hand_tables
    got = [tuple(r) for r in next_word(docs, "fast", 1, 100).collect()]
    assert got == _python_next_word(TEXTS, "fast")
    # "fast hash" occurs 4x across the docs: hash leads
    assert got[0][1] == "hash" and got[0][2] == 4


def test_next_word_absent_and_final_token(spark, hand_tables):
    from fastmorph_spark.search.collocation import next_word

    docs, *_ = hand_tables
    assert next_word(docs, "zzzznope").collect() == []
    # doc 3 ends in "merge": that occurrence has no continuation and
    # must not contribute
    got = {r["w2"]: r["f_xy"] for r in next_word(docs, "merge").collect()}
    assert got == {b: c for _, b, c, _ in _python_next_word(TEXTS, "merge")}


def test_next_word_duckdb_parity(spark, duck):
    from fastmorph_spark.search.collocation import next_word

    register_views(duck, SF0001)
    docs = read_documents(spark, SF0001)
    assert_frames_match(
        next_word(docs, "fast", 1, 20),
        duck.sql(oracles_corpus.next_word_sql("fast", 1, 20)))


# --- dispersion_dp ----------------------------------------------------------

def _python_dp(texts, terms, parts=4):
    part_tokens: dict[int, int] = {}
    per: dict[tuple, int] = {}
    for doc_id, text in enumerate(texts):
        toks = tokenize_py(text)
        p = doc_id % parts
        part_tokens[p] = part_tokens.get(p, 0) + len(toks)
        for t in toks:
            if t in terms:
                per[(t, p)] = per.get((t, p), 0) + 1
    total = float(sum(part_tokens.values()))
    rows = []
    for term in sorted({t for t, _ in per}):
        cf = float(sum(c for (t, p), c in per.items() if t == term))
        rng = sum(1 for (t, p) in per if t == term)
        contrib = sum(
            abs(c / cf - part_tokens[p] / total) - part_tokens[p] / total
            for (t, p), c in per.items() if t == term)
        rows.append((term, int(cf), rng,
                     round(0.5 * (1.0 + contrib), SCORE_DECIMALS)))
    return rows


def test_dp_hand_corpus(spark, hand_tables):
    from fastmorph_spark.search.keyness import dispersion_dp

    docs, *_ = hand_tables
    got = [tuple(r) for r in
           dispersion_dp(docs, ["fast", "merge", "sort"], parts=4).collect()]
    assert got == _python_dp(TEXTS, {"fast", "merge", "sort"}, parts=4)
    by_term = {t: dp for t, _, _, dp in got}
    # "fast" occurs in parts 0,1,2 (docs 0-2); "sort" only in part 3 —
    # the concentrated term must have strictly higher DP (more bursty)
    assert by_term["sort"] > by_term["fast"]
    # range sanity
    rng = {t: r for t, _, r, _ in got}
    assert rng["sort"] == 1 and rng["fast"] == 3


def test_dp_uniform_is_low(spark):
    """A term spread exactly with part sizes has DP == 0."""
    from fastmorph_spark.search.keyness import dispersion_dp

    docs = spark.createDataFrame(
        [(i, "x filler") for i in range(8)], "doc_id long, text string")
    got = dispersion_dp(docs, ["x"], parts=4).collect()
    assert len(got) == 1 and got[0]["dp"] == 0.0


def test_dp_duckdb_parity(spark, duck):
    from fastmorph_spark.search.keyness import dispersion_dp

    register_views(duck, SF0001)
    docs = read_documents(spark, SF0001)
    assert_frames_match(
        dispersion_dp(docs, ["fast", "join", "the"], 8),
        duck.sql(oracles_corpus.dispersion_dp_sql(["fast", "join", "the"], 8)))


# --- kwic_gdex --------------------------------------------------------------

def _python_gdex(texts, node, match_len=2, width=2, n=100, target=20):
    cf: dict[str, int] = {}
    all_toks = [tokenize_py(t) for t in texts]
    for toks in all_toks:
        for t in toks:
            cf[t] = cf.get(t, 0) + 1
    rows = []
    for doc_id, toks in enumerate(all_toks):
        dl = len(toks)
        for p in range(dl - match_len + 1):
            if tuple(toks[p:p + match_len]) != tuple(node):
                continue
            lo = max(0, p - width)
            ctx = toks[lo:p] + toks[p + match_len:p + match_len + width]
            min_cf = min((cf[t] for t in ctx), default=0)
            score = math.log(1.0 + min_cf) - abs(dl - float(target)) / target
            rows.append((doc_id, p, min_cf, dl, score,
                         " ".join(toks[lo:p]),
                         " ".join(toks[p:p + match_len]),
                         " ".join(toks[p + match_len:p + match_len + width])))
    rows.sort(key=lambda r: (-r[4], r[0], r[1]))
    return [
        (i + 1, d, p, mc, dl, round(s, SCORE_DECIMALS), l, k, r)
        for i, (d, p, mc, dl, s, l, k, r) in enumerate(rows[:n])
    ]


def test_gdex_hand_corpus(spark, hand_tables):
    docs, postings, dictionary = hand_tables
    from fastmorph_spark.search import engine

    m = engine.slot_search(postings, dictionary,
                           [{"term": "fast"}, {"term": "hash"}], [(1, 1)])
    got = [tuple(r) for r in engine.kwic_gdex(
        docs, dictionary, m, 2, width=2, n=100, target_len=20).collect()]
    assert got == _python_gdex(TEXTS, ("fast", "hash"))
    assert got  # non-vacuous


def test_gdex_empty_context_pinned_zero(spark):
    """A document that IS the node has no context: min_cf pins to 0 and
    the line still ranks (it does not vanish in the cf join)."""
    from fastmorph_spark.index import build_dictionary, build_postings
    from fastmorph_spark.search import engine

    docs = spark.createDataFrame(
        [(0, "fast hash"), (1, "a fast hash b")], "doc_id long, text string")
    postings = build_postings(docs)
    dictionary = build_dictionary(postings)
    m = engine.slot_search(postings, dictionary,
                           [{"term": "fast"}, {"term": "hash"}], [(1, 1)])
    got = [tuple(r) for r in engine.kwic_gdex(
        docs, dictionary, m, 2, width=2, n=10, target_len=20).collect()]
    assert got == _python_gdex(["fast hash", "a fast hash b"],
                               ("fast", "hash"))
    by_doc = {r[1]: r for r in got}
    assert by_doc[0][3 - 1] == 0  # min_cf column (idx 2) is 0 for doc 0
    assert len(got) == 2


def test_gdex_duckdb_parity(spark, duck):
    from fastmorph_spark.search import engine

    register_views(duck, SF0001)
    docs = read_documents(spark, SF0001)
    postings = build_postings(docs).persist()
    dictionary = build_dictionary(postings)
    slots = [{"term": "fast"}, {"pattern": "h*"}]
    m = engine.slot_search(postings, dictionary, slots, [(1, 1)])
    assert_frames_match(
        engine.kwic_gdex(docs, dictionary, m, 2, 5, 50),
        duck.sql(oracles_corpus.kwic_gdex_sql(slots, [(1, 1)], 2, 5, 50)))
    postings.unpersist()
