"""Corpus-statistics / fuzzy / facet / sentence operators vs their DuckDB
oracles (search/keyness.py, fuzzy.py, facets.py, sentence.py ↔
oracles_corpus.py), plus independent pure-Python spot checks so the two
mirrored implementations can't both be wrong the same way."""

from __future__ import annotations

import math
import re

import pytest

from fastmorph_spark import oracles_corpus
from fastmorph_spark.index import build_dictionary, build_postings
from fastmorph_spark.search import facets, fuzzy, keyness, sentence
from fastmorph_spark.search.engine import and_search
from fastmorph_spark.search.fuzzy import FUZZY_TEXT_SQL, fuzzy_text_col
from fastmorph_spark.search.sentence import SENT_TEXT_SQL, sent_text_col
from fastmorph_spark.sources import read_documents
from fastmorph_spark.tokenize import tokenize_py
from tests.conftest import SF0001, assert_frames_match, register_views


@pytest.fixture(scope="module")
def duck1(duck):
    register_views(duck, SF0001)
    return duck


@pytest.fixture(scope="module")
def docs(spark):
    return read_documents(spark, SF0001)


@pytest.fixture(scope="module")
def docs_fuzzy(docs):
    """Typo-bearing derived corpus (FUZZY_TEXT_SQL twin)."""
    return docs.select("doc_id", fuzzy_text_col().alias("text"))


@pytest.fixture(scope="module")
def docs_sent(docs):
    """Punctuated derived corpus (SENT_TEXT_SQL twin)."""
    return docs.select("doc_id", sent_text_col().alias("text"))


def _sent_py(text):
    return (text or "").replace(" scan ", " scan. ").replace(" value ", " value! ")


# ---------------------------------------------------------------- keyness


def test_keyness_matches_oracle(spark, docs, duck1):
    got = keyness.keyness(docs, "en", min_count=5, k=50)
    assert_frames_match(got, duck1.sql(oracles_corpus.keyness_sql("en", 5, 50)))


def test_keyness_hand_computed(docs):
    """Independent check: recompute G² for the top term with plain math
    over locally tokenized counts."""
    rows = docs.select("lang", "text").collect()
    f_focus: dict[str, int] = {}
    f_ref: dict[str, int] = {}
    for r in rows:
        side = f_focus if r["lang"] == "en" else f_ref
        for t in tokenize_py(r["text"]):
            side[t] = side.get(t, 0) + 1
    n1 = float(sum(f_focus.values()))
    n2 = float(sum(f_ref.values()))
    top = keyness.keyness(docs, "en", min_count=5, k=1).collect()[0]
    f1 = float(f_focus.get(top["term"], 0))
    f2 = float(f_ref.get(top["term"], 0))
    assert (f1, f2) == (top["f_focus"], top["f_ref"])
    e1 = (f1 + f2) * n1 / (n1 + n2)
    e2 = (f1 + f2) * n2 / (n1 + n2)
    g2 = 2 * ((f1 * math.log(f1 / e1) if f1 > 0 else 0.0)
              + (f2 * math.log(f2 / e2) if f2 > 0 else 0.0))
    assert abs(g2 - top["g2"]) < 1e-5
    lr = math.log(((f1 + 0.5) / n1) / ((f2 + 0.5) / n2)) / math.log(2)
    assert abs(lr - top["log_ratio"]) < 1e-5


def test_keyness_direction(docs):
    """A term used only outside the focus subcorpus must carry a negative
    log_ratio; g2 stays positive (it is evidence strength, not sign)."""
    out = {r["term"]: r for r in keyness.keyness(docs, "en", 5, 200).collect()}
    only_ref = [r for r in out.values() if r["f_focus"] == 0]
    assert all(r["log_ratio"] < 0 and r["g2"] > 0 for r in only_ref)


# ----------------------------------------------------- term profile / ipm

PROFILE_TERMS = ["fast", "join", "the", "zzz_absent"]


def test_term_profile_matches_oracle(spark, docs, duck1):
    got = keyness.term_profile(docs, PROFILE_TERMS)
    assert_frames_match(got, duck1.sql(oracles_corpus.term_profile_sql(PROFILE_TERMS)))


def test_term_profile_ipm_definition(docs):
    rows = keyness.term_profile(docs, ["fast"]).collect()
    assert rows, "'fast' must occur at sf0.001"
    for r in rows:
        assert abs(r["ipm"] - round(r["tf"] * 1e6 / r["lang_tokens"], 6)) < 1e-9


# ------------------------------------------------------------- dispersion


def test_dispersion_matches_oracle(spark, docs, duck1):
    got = keyness.dispersion(docs, PROFILE_TERMS, parts=8)
    assert_frames_match(got, duck1.sql(oracles_corpus.dispersion_sql(PROFILE_TERMS, 8)))


def test_dispersion_bounds_and_hand_value(docs):
    """D ∈ [0,1]; recompute one term with plain python (zero parts count)."""
    out = {r["term"]: r for r in keyness.dispersion(docs, ["fast", "the"], parts=8).collect()}
    assert out and all(0.0 <= r["d"] <= 1.0 for r in out.values())
    rows = docs.select("doc_id", "text").collect()
    counts = [0.0] * 8
    for r in rows:
        c = sum(1 for t in tokenize_py(r["text"]) if t == "fast")
        counts[r["doc_id"] % 8] += c
    mean = sum(counts) / 8
    var = sum(v * v for v in counts) / 8 - mean * mean
    d = 1 - (math.sqrt(max(var, 0.0)) / mean) / math.sqrt(7)
    assert abs(d - out["fast"]["d"]) < 1e-5


# ------------------------------------------------------------------ fuzzy


@pytest.fixture(scope="module")
def dictionary(spark, docs_fuzzy):
    return build_dictionary(build_postings(docs_fuzzy)).cache()


def test_levenshtein_parity(spark, duck1):
    """The Spark and DuckDB levenshtein builtins must agree — the whole
    oracle mirror rests on it."""
    from pyspark.sql import functions as F

    pairs = [("kitten", "sitting"), ("fast", "fest"), ("", "abc"),
             ("join", "join"), ("scan", "cans"), ("a", "ab")]
    sdf = spark.createDataFrame(pairs, "a string, b string") \
        .select("a", "b", F.levenshtein("a", "b").alias("d"))
    got = {(r["a"], r["b"]): r["d"] for r in sdf.collect()}
    for a, b in pairs:
        want = duck1.sql(f"SELECT levenshtein('{a}', '{b}') AS d").fetchone()[0]
        assert got[(a, b)] == want, (a, b)


def test_fuzzy_terms_matches_oracle(spark, dictionary, duck1):
    got = fuzzy.fuzzy_terms(dictionary, "fast", max_dist=1, k=50)
    assert_frames_match(got, duck1.sql(
        oracles_corpus.fuzzy_terms_sql("fast", 1, 50, text_expr=FUZZY_TEXT_SQL)))


def test_fuzzy_terms_semantics(dictionary):
    rows = fuzzy.fuzzy_terms(dictionary, "fast", max_dist=1, k=50).collect()
    terms = {r["term"]: r["dist"] for r in rows}
    # the derived fixture plants both a 1-insert and a 1-delete variant
    assert terms.get("fast") == 0
    assert terms.get("fasst") == 1 and terms.get("fst") == 1
    assert all(d <= 1 for d in terms.values())
    for t in terms:
        assert abs(len(t) - 4) <= 1


def test_fuzzy_docs_matches_oracle(spark, docs_fuzzy, dictionary, duck1):
    postings = build_postings(docs_fuzzy)
    got = fuzzy.fuzzy_docs(postings, dictionary, "fast", max_dist=1)
    assert_frames_match(got, duck1.sql(
        oracles_corpus.fuzzy_docs_sql("fast", 1, text_expr=FUZZY_TEXT_SQL)))


def test_fuzzy_batch_equals_scan(spark, dictionary):
    """The deletion-neighborhood hash-join path must find EXACTLY the
    scan path's matches for every probe (no candidate misses, verify
    removes false positives)."""
    probes = ["fast", "fst", "join"]
    batch = fuzzy.fuzzy_terms_batch(spark, dictionary, probes, max_dist=1)
    got = {(r["probe"], r["term"], r["df"], r["dist"]) for r in batch.collect()}
    want = set()
    for p in probes:
        for r in fuzzy.fuzzy_terms(dictionary, p, max_dist=1, k=10**6).collect():
            want.add((p, r["term"], r["df"], r["dist"]))
    assert got == want and got


def test_fuzzy_probe_folding(dictionary):
    with pytest.raises(ValueError):
        fuzzy.fuzzy_terms(dictionary, "!!!", max_dist=1)
    # mixed case folds like corpus tokens
    a = fuzzy.fuzzy_terms(dictionary, "FAST", 1).collect()
    b = fuzzy.fuzzy_terms(dictionary, "fast", 1).collect()
    assert a == b


# ----------------------------------------------------------------- facets


def test_facet_counts_matches_oracle(spark, docs, duck1):
    from fastmorph_spark.index import build_postings as bp

    matches = and_search(bp(docs), "fast hash join")
    got = facets.facet_counts(docs, matches)
    assert_frames_match(got, duck1.sql(oracles_corpus.facet_counts_sql("fast hash join")))


def test_facet_counts_totals(spark, docs):
    """Each facet field's counts must sum to the distinct match count."""
    from fastmorph_spark.index import build_postings as bp

    matches = and_search(bp(docs), "fast hash join")
    n = matches.select("doc_id").distinct().count()
    rows = facets.facet_counts(docs, matches).collect()
    for f in ("lang", "source"):
        assert sum(r["n_docs"] for r in rows if r["facet"] == f) == n


# --------------------------------------------------------------- sentence


def test_within_sentence_matches_oracle(spark, docs_sent, duck1):
    got = sentence.within_sentence_search(docs_sent, "fast join")
    assert_frames_match(got, duck1.sql(
        oracles_corpus.within_sentence_sql("fast join", text_expr=SENT_TEXT_SQL)))


def test_sentence_stats_matches_oracle(spark, docs_sent, duck1):
    got = sentence.sentence_stats(docs_sent)
    assert_frames_match(got, duck1.sql(
        oracles_corpus.sentence_stats_sql(text_expr=SENT_TEXT_SQL)))


def test_within_sentence_hand_check(docs_sent):
    """Pure-python recompute of the same segmentation contract."""
    rows = docs_sent.select("doc_id", "text").collect()
    want = set()
    for r in rows:
        segs = re.split(r"[.!?]+", r["text"] or "")
        for si, seg in enumerate(segs):
            toks = set(tokenize_py(seg))
            if {"fast", "join"} <= toks:
                want.add((r["doc_id"], si))
    got = {(r["doc_id"], r["sent_id"])
           for r in sentence.within_sentence_search(docs_sent, "fast join").collect()}
    assert got == want and got, "within-sentence must be non-vacuous at sf0.001"
    assert max(si for _, si in got) > 0, "fixture must yield multi-sentence docs"


def test_within_sentence_tighter_than_doc(spark, docs_sent):
    """Sentence scope can only shrink the AND match set — and at sf0.001
    it must GENUINELY shrink it (non-vacuous constraint)."""
    doc_hits = {r["doc_id"] for r in
                and_search(build_postings(docs_sent), "fast join").collect()}
    sent_hits = {r["doc_id"] for r in
                 sentence.within_sentence_search(docs_sent, "fast join").collect()}
    assert sent_hits <= doc_hits
    assert sent_hits < doc_hits


def test_within_sentence_edges(spark, docs_sent):
    assert sentence.within_sentence_search(docs_sent, "").count() == 0
    assert sentence.within_sentence_search(docs_sent, "zzz_absent_term").count() == 0
    assert sentence.within_sentence_search(docs_sent, "...!?").count() == 0


def test_within_sentence_indexed_parity(spark, docs_sent):
    """The index-backed path (postings + sentence-bounds side table) must
    reproduce the text path exactly — including empty-segment ordinals."""
    postings = build_postings(docs_sent)
    bounds = sentence.sentence_bounds(docs_sent)
    for q in ["fast join", "fast hash join", "the", "zzz_absent", ""]:
        a = sentence.within_sentence_search(docs_sent, q).collect()
        b = sentence.within_sentence_indexed(postings, bounds, q).collect()
        assert [(r["doc_id"], r["sent_id"]) for r in a] == \
               [(r["doc_id"], r["sent_id"]) for r in b], q


def test_sentence_bounds_contract(spark, docs_sent):
    """bounds[0] == 0, monotone non-decreasing, prefix sums reproduce the
    per-segment token counts, total == doc_len."""
    rows = sentence.sentence_bounds(docs_sent).collect()
    by_id = {r["doc_id"]: list(r["bounds"]) for r in rows}
    texts = {r["doc_id"]: r["text"] for r in docs_sent.select("doc_id", "text").collect()}
    assert by_id.keys() == texts.keys()
    for did, b in by_id.items():
        segs = re.split(r"[.!?]+", texts[did] or "")
        assert len(b) == len(segs)
        assert b[0] == 0 and all(x <= y for x, y in zip(b, b[1:]))
        want = 0
        for i, seg in enumerate(segs):
            assert b[i] == want, (did, i)
            want += len(tokenize_py(seg))
        assert want == len(tokenize_py(texts[did]))


def test_keyness_repartition_stable(spark, docs, duck1):
    """Determinism rule: the same result regardless of input layout."""
    a = keyness.keyness(docs, "en", 5, 20).collect()
    b = keyness.keyness(docs.repartition(13), "en", 5, 20).collect()
    assert a == b


# ------------------------------------------- sentence-scoped slot search


def test_slot_within_sentence_matches_oracle(spark, docs_sent, duck1):
    from fastmorph_spark.index import build_dictionary as bd

    slots = [{"term": "fast"}, {"pattern": "j*"}]
    dists = [(1, 3)]
    postings = build_postings(docs_sent)
    bounds = sentence.sentence_bounds(docs_sent)
    got = sentence.slot_within_sentence(postings, bounds,
                                        bd(postings), slots, dists)
    sql = oracles_corpus.slot_within_sentence_sql(
        slots, dists, text_expr=SENT_TEXT_SQL)
    assert_frames_match(got, duck1.sql(sql))
    assert got.count() > 0


def test_slot_within_sentence_packed_parity(spark, docs_sent):
    from fastmorph_spark.index import build_dictionary as bd
    from fastmorph_spark.index.io import build_index_frames

    slots = [{"term": "fast"}, {"pattern": "j*"}]
    dists = [(1, 3)]
    postings = build_postings(docs_sent)
    bounds = sentence.sentence_bounds(docs_sent)
    a = sentence.slot_within_sentence(postings, bounds, bd(postings),
                                      slots, dists).collect()
    idx = build_index_frames(docs_sent, doc_shard_size=100, block_size=16)
    b = sentence.slot_within_sentence_packed(idx, bounds,
                                             slots, dists).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) and a


def test_slot_within_sentence_hand_check(docs_sent):
    """Brute-force python: per sentence, slot-0 matches with a j*-token
    1..3 ahead INSIDE the sentence; match_starts are sentence-local."""
    rows = docs_sent.select("doc_id", "text").collect()
    want = {}
    for r in rows:
        segs = re.split(r"[.!?]+", r["text"] or "")
        for si, seg in enumerate(segs):
            toks = tokenize_py(seg)
            starts = [i for i, t in enumerate(toks) if t == "fast"
                      and any(j < len(toks) and toks[j].startswith("j")
                              for j in range(i + 1, i + 4))]
            if starts:
                want[(r["doc_id"], si)] = ",".join(map(str, starts))
    from fastmorph_spark.index import build_dictionary as bd

    postings = build_postings(docs_sent)
    bounds = sentence.sentence_bounds(docs_sent)
    got = {(r["doc_id"], r["sent_id"]): r["match_starts"]
           for r in sentence.slot_within_sentence(
               postings, bounds, bd(postings),
               [{"term": "fast"}, {"pattern": "j*"}], [(1, 3)]).collect()}
    assert got == want and got


def test_slot_within_sentence_scope_shrinks(spark, docs_sent):
    from fastmorph_spark.index import build_dictionary as bd

    slots = [{"term": "fast"}, {"pattern": "j*"}]
    dists = [(1, 3)]
    postings = build_postings(docs_sent)
    bounds = sentence.sentence_bounds(docs_sent)
    scoped = {r["doc_id"] for r in sentence.slot_within_sentence(
        postings, bounds, bd(postings), slots, dists).collect()}
    from fastmorph_spark.search.engine import slot_search

    unscoped = {r["doc_id"] for r in
                slot_search(postings, bd(postings), slots, dists).collect()}
    assert scoped <= unscoped and scoped < unscoped


def test_slot_within_sentence_rejects_case(spark, docs_sent):
    from fastmorph_spark.index.io import build_index_frames

    bounds = sentence.sentence_bounds(docs_sent)
    idx = build_index_frames(docs_sent, doc_shard_size=100, block_size=16)
    with pytest.raises(ValueError):
        sentence.slot_within_sentence_packed(
            idx, bounds, [{"term": "Fast", "case": True}], [])


# ---------------------------- directional collocations + paradigm view


def test_collocations_directional_matches_oracle(spark, docs, duck1):
    from fastmorph_spark.search.collocation import collocations_directional

    postings = build_postings(docs)
    got = collocations_directional(postings, build_dictionary(postings),
                                   "fast", 3, 2, 20)
    assert_frames_match(got, duck1.sql(
        oracles_corpus.collocations_directional_sql("fast", 3, 2, 20)))


def test_collocations_directional_consistency(spark, docs):
    """left_n + right_n == cooc, and the (rank, term, cooc, cf, pmi)
    projection must equal the plain collocations profile exactly."""
    from fastmorph_spark.search.collocation import (
        collocations,
        collocations_directional,
    )

    postings = build_postings(docs)
    d = build_dictionary(postings)
    a = collocations_directional(postings, d, "fast", 3, 2, 20).collect()
    b = collocations(postings, d, "fast", 3, 2, 20).collect()
    assert all(r["left_n"] + r["right_n"] == r["cooc"] for r in a)
    assert [(r["rank"], r["term"], r["cooc"], r["cf"], r["pmi"]) for r in a] \
        == [(r["rank"], r["term"], r["cooc"], r["cf"], r["pmi"]) for r in b]
    assert any(r["left_n"] != r["right_n"] for r in a), \
        "fixture must show real left/right asymmetry"


def test_stem_paradigm_matches_oracle(spark, docs, duck1):
    from fastmorph_spark.stem import PARADIGM_TEXT_SQL, paradigm, paradigm_text_col

    docs_p = docs.select("doc_id", paradigm_text_col().alias("text"))
    d = build_dictionary(build_postings(docs_p))
    got = paradigm(d, "joins")
    assert_frames_match(got, duck1.sql(
        oracles_corpus.paradigm_sql("joins", text_expr=PARADIGM_TEXT_SQL)))
    forms = {r["term"] for r in got.collect()}
    assert forms == {"join", "joins", "joined"}


# ---------------------------------------------------------------- lexdiv


def test_lexdiv_matches_oracle(spark, docs, duck1):
    got = keyness.lexdiv(docs, "lang")
    assert_frames_match(got, duck1.sql(oracles_corpus.lexdiv_sql("lang")))


def test_lexdiv_hand_computed(spark):
    """Tiny corpus where every statistic is countable by eye: one group,
    tokens=6, types=4 (a,b,c,d), hapax=2 (c,d)."""
    sdf = spark.createDataFrame(
        [(0, "en", "a a b c"), (1, "en", "a b d")],
        "doc_id long, lang string, text string")
    rows = {r["lang"]: r for r in keyness.lexdiv(sdf, "lang").collect()}
    r = rows["en"]
    assert (r["tokens"], r["types"], r["hapax"]) == (7, 4, 2)
    assert r["ttr"] == round(4 / 7, 6)
    assert r["hapax_ratio"] == round(2 / 7, 6)


def test_freq_spectrum_mass_identities(spark, docs):
    """Σ n_types == vocab and Σ freq·n_types == total tokens — the
    spectrum is a partition of the vocabulary by frequency; spectrum[1]
    is the corpus-wide hapax count by definition."""
    spec = keyness.freq_spectrum(docs).collect()
    summ = keyness.corpus_summary(docs).collect()[0]
    assert sum(r["n_types"] for r in spec) == summ["vocab"]
    assert sum(r["freq"] * r["n_types"] for r in spec) == summ["n_tokens"]
    texts = [r["text"] for r in docs.select("text").collect()]
    cnt: dict[str, int] = {}
    for t in texts:
        for w in tokenize_py(t):
            cnt[w] = cnt.get(w, 0) + 1
    hapax = sum(1 for v in cnt.values() if v == 1)
    by_freq = {r["freq"]: r["n_types"] for r in spec}
    assert by_freq.get(1, 0) == hapax


def test_vocab_growth_curve_shape(spark, docs):
    """10 rows always (empty buckets included), all three series
    monotone non-decreasing, and the LAST row equals the whole-corpus
    summary card — the curve lands exactly on (N, tokens, vocab)."""
    rows = keyness.vocab_growth(docs, points=10).collect()
    assert [r["bucket"] for r in rows] == list(range(1, 11))
    for col in ("docs", "tokens", "types"):
        vals = [r[col] for r in rows]
        assert vals == sorted(vals)
    summ = keyness.corpus_summary(docs).collect()[0]
    last = rows[-1]
    assert last["docs"] == summ["n_docs"]
    assert last["tokens"] == summ["n_tokens"]
    assert last["types"] == summ["vocab"]
    # growth is concave in expectation under Zipf: the first bucket must
    # contribute more NEW types than the last (non-vacuous on fixture)
    assert rows[0]["types"] > rows[-1]["types"] - rows[-2]["types"]


# ------------------------------------------------- freq_by_attr (round 5)


def test_freq_by_attr_matches_oracle(spark, docs, duck1):
    for attr in ("word", "stem", "tag"):
        got = keyness.freq_by_attr(docs, attr, k=50, min_count=2)
        assert_frames_match(
            got, duck1.sql(oracles_corpus.freq_by_attr_sql(attr, 50, 2)))


def test_freq_by_attr_python_oracle(docs):
    """Brute-force recompute of the stem-grouped list: counts, df, ipm,
    and the (count DESC, key ASC) rank order."""
    from collections import Counter, defaultdict

    from fastmorph_spark.stem import stem_py

    rows = docs.select("doc_id", "text").collect()
    count, dfs, total = Counter(), defaultdict(set), 0
    for r in rows:
        for t in tokenize_py(r["text"]):
            key = stem_py(t)
            count[key] += 1
            dfs[key].add(r["doc_id"])
            total += 1
    expect = sorted(((c, k) for k, c in count.items() if c >= 2),
                    key=lambda x: (-x[0], x[1]))[:10]
    got = keyness.freq_by_attr(docs, "stem", k=10, min_count=2).collect()
    assert [(r["count"], r["key"]) for r in got] == expect
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
    for r in got:
        assert r["df"] == len(dfs[r["key"]])
        assert abs(r["ipm"] - r["count"] * 1e6 / total) < 1e-4


def test_freq_by_attr_word_equals_identity_grouping(docs):
    """attr='word' is plain token frequency; attr='tag' collapses to the
    4 (or fewer) tag classes and their counts sum to the word total."""
    words = keyness.freq_by_attr(docs, "word", k=10 ** 6, min_count=1)
    tags = keyness.freq_by_attr(docs, "tag", k=10, min_count=1).collect()
    total = words.groupBy().sum("count").collect()[0][0]
    assert sum(r["count"] for r in tags) == total
    from fastmorph_spark.tags import TAG_CLASSES

    assert {r["key"] for r in tags} <= set(TAG_CLASSES)


def test_freq_by_attr_rejects_unknown(docs):
    with pytest.raises(ValueError):
        keyness.freq_by_attr(docs, "lemma")


# --------------------------------------------- stratified_sample (round 5)


def test_stratified_sample_membership_and_nesting(spark, docs):
    """Exact md5 membership per group, absent groups dropped, and the
    nesting property: a group's 25% sample is a subset of its 50% one."""
    import hashlib

    from fastmorph_spark.ops.text import stratified_sample

    def keep(doc_id, rate):
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        return b < int(rate * (1 << 32))

    rows = docs.select("doc_id", "lang").collect()
    frac = {"en": 0.5, "de": 0.25}
    got = stratified_sample(docs, frac).collect()
    expect = sorted((r["doc_id"], r["lang"]) for r in rows
                    if r["lang"] in frac and keep(r["doc_id"], frac[r["lang"]]))
    assert [(r["doc_id"], r["group"]) for r in got] == expect
    assert all(r["group"] in frac for r in got)  # es/fr/zh dropped
    halved = {r["doc_id"] for r in
              stratified_sample(docs, {"de": 0.5}).collect()}
    quartered = {r["doc_id"] for r in
                 stratified_sample(docs, {"de": 0.25}).collect()}
    assert quartered <= halved and len(quartered) < len(halved)


def test_stratified_sample_repartition_stable(docs):
    from fastmorph_spark.ops.text import stratified_sample

    frac = {"en": 0.5, "zh": 1.0}
    a = stratified_sample(docs, frac).collect()
    b = stratified_sample(docs.repartition(13), frac).collect()
    assert a == b


def test_round5_final_plan_shapes(spark, docs):
    """Plan pins for the final-wave ops (100x-scale shapes):
    freq_by_attr fuses its top-k to TakeOrderedAndProject and keeps the
    rank window AFTER the <= k limit; stratified_sample is a pure
    scan+filter (no join, no window — the md5 CASE chain is a column
    expression); unigram_ppl has no corpus-sized Window and broadcasts
    its 1-row totals."""
    from fastmorph_spark.ops.quality import unigram_ppl
    from fastmorph_spark.ops.text import stratified_sample

    fp = keyness.freq_by_attr(docs, "stem", 50, 2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in fp
    assert "BroadcastNestedLoopJoin" in fp  # the 1-row total attach

    sp = stratified_sample(docs, {"en": 0.5, "de": 0.25}) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in sp and "Window" not in sp

    up = unigram_ppl(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in up  # per-doc fold, never one reducer
    assert "BroadcastNestedLoopJoin" in up  # (total, V) broadcast
