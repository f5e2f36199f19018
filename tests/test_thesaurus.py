"""Distributional thesaurus + word-sketch diff (search/thesaurus.py,
search/collocation.sketch_diff): pinned semantics vs brute-force Python
oracles, profile ≡ collocation pair-count consistency, DuckDB oracle
parity, and edge cases (absent target, 1-token docs)."""

from __future__ import annotations

import math

import pytest

from fastmorph_spark import oracles_corpus, registry_corpus
from fastmorph_spark.index import build_dictionary, build_postings
from fastmorph_spark.search.collocation import _pair_counts, sketch_diff
from fastmorph_spark.search.thesaurus import cooc_profiles, thesaurus
from fastmorph_spark.sources import read_documents
from fastmorph_spark.tokenize import tokenize_py
from tests.conftest import SF0001, assert_frames_match, register_views

TARGET, WINDOW, MIN_SHARED, K = "fast", 3, 2, 20


def _python_profiles(texts: list[str], window: int) -> dict:
    """Exhaustive symmetric pair counts n[(a, b)] — the module pinning:
    pairs of occurrences within `window`, a != b, both orientations."""
    n: dict[tuple, int] = {}
    for text in texts:
        toks = tokenize_py(text)
        for i, a in enumerate(toks):
            for j in range(i + 1, min(i + window, len(toks) - 1) + 1):
                b = toks[j]
                if a == b:
                    continue
                n[(a, b)] = n.get((a, b), 0) + 1
                n[(b, a)] = n.get((b, a), 0) + 1
    return n


def _python_thesaurus(texts, target, window, min_shared, k):
    prof = _python_profiles(texts, window)
    mass: dict[str, int] = {}
    for (a, _b), c in prof.items():
        mass[a] = mass.get(a, 0) + c
    tgt = {b: c for (a, b), c in prof.items() if a == target}
    if not tgt:
        return []
    shared: dict[str, int] = {}
    for (a, b), c in prof.items():
        if a != target and b in tgt:
            shared[a] = shared.get(a, 0) + min(c, tgt[b])
    scored = [
        (a, s, mass[a], (2.0 * s) / (float(mass[target]) + float(mass[a])))
        for a, s in shared.items() if s >= min_shared
    ]
    scored.sort(key=lambda r: (-r[3], r[0]))
    return [(i + 1, a, s, m, round(sim, 6))
            for i, (a, s, m, sim) in enumerate(scored[:k])]


@pytest.fixture(scope="module")
def tables(spark):
    docs = read_documents(spark, SF0001)
    postings = build_postings(docs).persist()
    dictionary = build_dictionary(postings)
    yield docs, postings, dictionary
    postings.unpersist()


def test_thesaurus_vs_python_oracle(spark, tables):
    docs, *_ = tables
    texts = [r["text"] for r in docs.select("text").orderBy("doc_id").collect()]
    want = _python_thesaurus(texts, TARGET, WINDOW, MIN_SHARED, K)
    got = [
        (int(r["rank"]), r["term"], int(r["shared"]), int(r["mass"]),
         float(r["sim"]))
        for r in thesaurus(docs, TARGET, WINDOW, MIN_SHARED, K).collect()
    ]
    assert [g[:4] for g in got] == [w[:4] for w in want]
    for g, w in zip(got, want):
        assert g[4] == pytest.approx(w[4], abs=1e-6)


def test_profile_equals_collocation_pair_counts(spark, tables):
    """The a == target slice of the symmetric profile table IS the
    `collocations` pair-count frame — one definition, two operators."""
    docs, postings, _ = tables
    from pyspark.sql import functions as F

    prof = {
        (r["b"], int(r["n"]))
        for r in cooc_profiles(docs, WINDOW)
        .filter(F.col("a") == TARGET).collect()
    }
    pairs = {
        (r["term"], int(r["cooc"]))
        for r in _pair_counts(postings, TARGET, WINDOW).collect()
    }
    assert prof == pairs


def test_thesaurus_duckdb_oracle_parity(spark, duck, tables):
    docs, *_ = tables
    register_views(duck, SF0001)
    assert_frames_match(
        thesaurus(docs, TARGET, WINDOW, MIN_SHARED, K),
        duck.sql(oracles_corpus.thesaurus_sql(TARGET, WINDOW, MIN_SHARED, K)),
    )


def test_thesaurus_absent_target_empty(spark, tables):
    docs, *_ = tables
    assert thesaurus(docs, "zzznotaterm", WINDOW, MIN_SHARED, K).count() == 0


def test_single_token_docs_no_pairs(spark):
    """sequence(1, size-1) would DESCEND for 1-token docs; the guard must
    yield zero pairs, not phantom ones."""
    docs = spark.createDataFrame(
        [(0, "solo"), (1, ""), (2, "two tokens")], "doc_id long, text string")
    rows = cooc_profiles(docs, WINDOW).collect()
    assert sorted((r["a"], r["b"], int(r["n"])) for r in rows) == [
        ("tokens", "two", 1), ("two", "tokens", 1)]


def test_precomputed_profiles_path_identical(spark, tables):
    """profiles= (the at-scale serving shape: materialized index-time
    artifact) must give byte-identical results to the corpus scan."""
    docs, *_ = tables
    prof = cooc_profiles(docs, WINDOW).persist()
    try:
        a = thesaurus(docs, TARGET, WINDOW, MIN_SHARED, K).collect()
        b = thesaurus(docs, TARGET, WINDOW, MIN_SHARED, K,
                      profiles=prof).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
    finally:
        prof.unpersist()


def _python_colloc_profile(texts, target, window, min_count):
    """Full PMI profile (no top-k) under the collocations pinning."""
    cf: dict[str, int] = {}
    cooc: dict[str, int] = {}
    total = 0
    for text in texts:
        toks = tokenize_py(text)
        total += len(toks)
        for t in toks:
            cf[t] = cf.get(t, 0) + 1
        tpos = [i for i, t in enumerate(toks) if t == target]
        if not tpos:
            continue
        for i, t in enumerate(toks):
            if t == target:
                continue
            n = sum(1 for p in tpos if abs(i - p) <= window)
            if n:
                cooc[t] = cooc.get(t, 0) + n
    if target not in cf:
        return {}
    tcf = float(cf[target])
    return {
        t: (c, math.log((c * float(total)) / (tcf * float(cf[t]))))
        for t, c in cooc.items() if c >= min_count
    }


def test_sketch_diff_vs_python_oracle(spark, tables):
    docs, postings, dictionary = tables
    texts = [r["text"] for r in docs.select("text").orderBy("doc_id").collect()]
    pa = _python_colloc_profile(texts, "fast", WINDOW, 2)
    pb = _python_colloc_profile(texts, "slow", WINDOW, 2)
    want = sorted(
        ((t, pa[t][0], pb[t][0], pa[t][1], pb[t][1], pa[t][1] - pb[t][1])
         for t in set(pa) & set(pb)),
        key=lambda r: (-r[5], r[0]),
    )[:K]
    got = sketch_diff(postings, dictionary, "fast", "slow",
                      WINDOW, 2, K).collect()
    assert [(r["term"], int(r["cooc_a"]), int(r["cooc_b"])) for r in got] \
        == [w[:3] for w in want]
    for g, w in zip(got, want):
        assert float(g["pmi_a"]) == pytest.approx(w[3], abs=1e-6)
        assert float(g["pmi_b"]) == pytest.approx(w[4], abs=1e-6)
        assert float(g["diff"]) == pytest.approx(w[5], abs=1e-6)
    assert [int(r["rank"]) for r in got] == list(range(1, len(got) + 1))


def test_sketch_diff_duckdb_oracle_parity(spark, duck, tables):
    _, postings, dictionary = tables
    register_views(duck, SF0001)
    assert_frames_match(
        sketch_diff(postings, dictionary, "fast", "slow", WINDOW, 2, K),
        duck.sql(oracles_corpus.sketch_diff_sql("fast", "slow", WINDOW, 2, K)),
    )


def test_registry_keys_present():
    assert "thesaurus" in registry_corpus.QUERIES
    assert "sketch_diff" in registry_corpus.QUERIES
    o = registry_corpus.oracle_sqls()
    assert "thesaurus" in o and "sketch_diff" in o
