"""Collocation statistics (search/collocation.py): pinned semantics vs a
brute-force Python oracle, packed ≡ corpus equivalence, DuckDB oracle
parity, and edge cases (absent target, min_count gate)."""

from __future__ import annotations

import math

import pytest

from fastmorph_spark import oracles, registry
from fastmorph_spark.index import build_dictionary, build_postings
from fastmorph_spark.search.collocation import collocations, packed_collocations
from fastmorph_spark.sources import read_documents
from fastmorph_spark.tokenize import tokenize_py
from tests.conftest import SF0001, assert_frames_match, register_views

TARGET, WINDOW, MIN_COUNT, K = "fast", 3, 2, 20


def _python_collocations(texts: list[str], target: str, window: int,
                         min_count: int, k: int):
    """Exhaustive float64 reference: same pair/PMI definitions as the
    module docstring, no Spark, no SQL."""
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
        return []
    tcf = float(cf[target])
    scored = [
        (t, c, cf[t], math.log((c * float(total)) / (tcf * float(cf[t]))))
        for t, c in cooc.items() if c >= min_count
    ]
    scored.sort(key=lambda r: (-r[3], r[0]))
    return [
        (i + 1, t, c, f, round(pmi, 6))
        for i, (t, c, f, pmi) in enumerate(scored[:k])
    ]


@pytest.fixture(scope="module")
def tables(spark):
    docs = read_documents(spark, SF0001)
    postings = build_postings(docs).persist()
    dictionary = build_dictionary(postings)
    yield docs, postings, dictionary
    postings.unpersist()


def test_collocations_vs_python_oracle(spark, tables):
    docs, postings, dictionary = tables
    texts = [r["text"] for r in docs.select("text").orderBy("doc_id").collect()]
    want = _python_collocations(texts, TARGET, WINDOW, MIN_COUNT, K)
    got = [
        (int(r["rank"]), r["term"], int(r["cooc"]), int(r["cf"]), float(r["pmi"]))
        for r in collocations(postings, dictionary, TARGET, window=WINDOW,
                              min_count=MIN_COUNT, k=K).collect()
    ]
    assert [g[:4] for g in got] == [w[:4] for w in want]
    for g, w in zip(got, want):
        assert g[4] == pytest.approx(w[4], abs=1e-6)


def test_collocations_duckdb_oracle_parity(spark, duck, tables):
    _, postings, dictionary = tables
    register_views(duck, SF0001)
    assert_frames_match(
        collocations(postings, dictionary, TARGET, window=WINDOW,
                     min_count=MIN_COUNT, k=K),
        duck.sql(oracles.collocations_sql(TARGET, WINDOW, MIN_COUNT, K)),
    )


def test_packed_equals_corpus_path(spark, tables):
    _, postings, dictionary = tables
    idx = registry._packed_index(spark, SF0001)
    corpus = collocations(postings, dictionary, TARGET, window=WINDOW,
                          min_count=MIN_COUNT, k=K).collect()
    packed = packed_collocations(idx, TARGET, window=WINDOW,
                                 min_count=MIN_COUNT, k=K).collect()
    assert [tuple(r) for r in packed] == [tuple(r) for r in corpus]


def test_absent_target_is_empty_not_error(spark, tables):
    _, postings, dictionary = tables
    out = collocations(postings, dictionary, "zqxjkvw", window=WINDOW)
    assert out.count() == 0
    assert out.columns == ["rank", "term", "cooc", "cf", "pmi"]
    idx = registry._packed_index(spark, SF0001)
    pout = packed_collocations(idx, "zqxjkvw", window=WINDOW)
    assert pout.count() == 0
    assert pout.columns == ["rank", "term", "cooc", "cf", "pmi"]


def test_min_count_gate(spark, tables):
    """min_count=1 is a superset of min_count=high; every surviving
    neighbor meets the gate."""
    _, postings, dictionary = tables
    hi = collocations(postings, dictionary, TARGET, window=WINDOW,
                      min_count=50, k=1000).collect()
    assert all(int(r["cooc"]) >= 50 for r in hi)
    lo_terms = {
        r["term"] for r in collocations(postings, dictionary, TARGET,
                                        window=WINDOW, min_count=1,
                                        k=100000).collect()
    }
    assert {r["term"] for r in hi} <= lo_terms


def test_tombstoned_docs_excluded_from_pairs(spark, tables):
    """A tombstoned doc contributes no pairs (the decode anti-joins live
    deletes); dictionary stats stay pre-delete until purge (documented
    Lucene-style staleness, same as packed BM25)."""
    import dataclasses

    from pyspark.sql import functions as F

    docs, postings, dictionary = tables
    idx = registry._packed_index(spark, SF0001)
    # tombstone every doc that contains the target: all pairs must vanish
    tgt_docs = postings.filter(F.col("term") == TARGET).select("doc_id")
    tidx = dataclasses.replace(idx, tombstones=tgt_docs)
    out = packed_collocations(tidx, TARGET, window=WINDOW,
                              min_count=1, k=10).collect()
    assert out == []
    # tombstoning an unrelated doc set leaves some pairs; counts can only
    # shrink relative to the live index
    full = {r["term"]: int(r["cooc"])
            for r in packed_collocations(idx, TARGET, window=WINDOW,
                                         min_count=1, k=100000).collect()}
    some = docs.select("doc_id").filter(F.col("doc_id") % 2 == 0)
    half = {r["term"]: int(r["cooc"])
            for r in packed_collocations(
                dataclasses.replace(idx, tombstones=some), TARGET,
                window=WINDOW, min_count=1, k=100000).collect()}
    assert half and all(half[t] <= full[t] for t in half)


def test_broadcast_and_shuffle_join_agree(spark, tables):
    """The auto broadcast gate changes only the join strategy: forced
    broadcast and forced shuffle-join results are identical."""
    _, postings, dictionary = tables
    b = collocations(postings, dictionary, TARGET, window=WINDOW,
                     min_count=MIN_COUNT, k=K, broadcast_target=True).collect()
    s = collocations(postings, dictionary, TARGET, window=WINDOW,
                     min_count=MIN_COUNT, k=K, broadcast_target=False).collect()
    a = collocations(postings, dictionary, TARGET, window=WINDOW,
                     min_count=MIN_COUNT, k=K).collect()  # auto gate
    assert [tuple(r) for r in b] == [tuple(r) for r in s] == [tuple(r) for r in a]


def test_measures_panel_consistent_with_pmi_profile(spark, tables):
    """collocations_measures: same (term, cooc, cf, pmi) facts as
    collocations() for every shared term (the panel adds columns and
    re-ranks by logDice — it must not change the underlying counts),
    plus the formula pins: logdice <= 14 always (2*cooc <= tcf + cf
    because cooc <= min(tcf, cf)), and both new scores recompute
    bit-close from the row's own integers."""
    from fastmorph_spark.search.collocation import collocations_measures

    _, postings, dictionary = tables
    base = {
        r["term"]: r
        for r in collocations(postings, dictionary, TARGET, WINDOW,
                              MIN_COUNT, k=1000).collect()
    }
    panel = collocations_measures(postings, dictionary, TARGET, WINDOW,
                                  MIN_COUNT, k=1000).collect()
    assert panel, "fixture must produce collocates"
    tcf = None
    total = None
    for row in dictionary.collect():
        if row["term"] == TARGET:
            tcf = float(row["cf"])
    total = float(
        dictionary.agg({"cf": "sum"}).collect()[0][0])
    assert set(r["term"] for r in panel) == set(base)
    for r in panel:
        b = base[r["term"]]
        assert (r["cooc"], r["cf"]) == (b["cooc"], b["cf"])
        assert r["pmi"] == b["pmi"]
        assert r["logdice"] <= 14.0 + 1e-9
        ld = 14.0 + math.log((2.0 * r["cooc"]) / (tcf + r["cf"])) / math.log(2.0)
        ts = (r["cooc"] - (tcf * r["cf"]) / total) / math.sqrt(r["cooc"])
        assert abs(r["logdice"] - round(ld, 6)) <= 1e-6
        assert abs(r["tscore"] - round(ts, 6)) <= 1e-6
    # ranking pin: (logdice DESC, term ASC), rank = position
    keys = [(-r["logdice"], r["term"]) for r in panel]
    assert keys == sorted(keys)
    assert [r["rank"] for r in panel] == list(range(1, len(panel) + 1))


def test_measures_plan_is_single_pair_join(spark, tables):
    """collocations_measures adds NO pass over the A8 shape: exactly one
    join against the (broadcast) target postings drives pair counting;
    the three measures are expressions (no extra shuffle beyond the term
    agg + the two 1-row broadcasts)."""
    from fastmorph_spark.search.collocation import collocations_measures

    _, postings, dictionary = tables
    plan = collocations_measures(postings, dictionary, TARGET, WINDOW,
                                 MIN_COUNT, K) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("aggregate(") >= 1  # the HOF pair-count expr
    assert "TakeOrderedAndProject" in plan  # top-k never global-sorts
    assert "BatchEvalPython" not in plan


# ---------------------------------------- collocations_by_attr (round 5)


def _python_collocations_by_stem(texts, target, window, min_count, k):
    """Exhaustive reference for the lemma-grouped profile: pair counts
    pooled by stem class, class mass = Σ cf over the class, node mass =
    the target TERM's cf."""
    from fastmorph_spark.stem import stem_py

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
                key = stem_py(t)
                cooc[key] = cooc.get(key, 0) + n
    if target not in cf:
        return []
    cfk: dict[str, int] = {}
    for t, c in cf.items():
        key = stem_py(t)
        cfk[key] = cfk.get(key, 0) + c
    tcf = float(cf[target])
    scored = [
        (key, c, cfk[key],
         math.log((c * float(total)) / (tcf * float(cfk[key]))))
        for key, c in cooc.items() if c >= min_count
    ]
    scored.sort(key=lambda r: (-r[3], r[0]))
    return [(i + 1, key, c, f, round(pmi, 6))
            for i, (key, c, f, pmi) in enumerate(scored[:k])]


@pytest.fixture(scope="module")
def tables_inflected(spark):
    """The paradigm-derived corpus (stem.paradigm_text_col plants
    'joins'/'joined' next to 'join') — the fixture where lemma grouping
    actually pools something."""
    from fastmorph_spark.stem import paradigm_text_col

    docs = read_documents(spark, SF0001).select(
        "doc_id", paradigm_text_col().alias("text"))
    postings = build_postings(docs).persist()
    dictionary = build_dictionary(postings)
    yield docs, postings, dictionary
    postings.unpersist()


def test_colloc_by_stem_vs_python_oracle(spark, tables_inflected):
    from fastmorph_spark.search.collocation import collocations_by_attr

    docs, postings, dictionary = tables_inflected
    texts = [r["text"] for r in docs.select("text").orderBy("doc_id").collect()]
    want = _python_collocations_by_stem(texts, TARGET, WINDOW, MIN_COUNT, K)
    got = [
        (int(r["rank"]), r["key"], int(r["cooc"]), int(r["cf"]), float(r["pmi"]))
        for r in collocations_by_attr(postings, dictionary, TARGET,
                                      attr="stem", window=WINDOW,
                                      min_count=MIN_COUNT, k=K).collect()
    ]
    assert [g[:4] for g in got] == [w[:4] for w in want]
    for g, w in zip(got, want):
        assert g[4] == pytest.approx(w[4], abs=1e-6)


def test_colloc_by_stem_pools_inflections(spark, tables_inflected):
    """The lemma profile must pool what the surface profile splits: the
    'join' class's cooc equals the sum of the surface cooc of its
    inflections, and its class mass exceeds any single form's cf."""
    from fastmorph_spark.search.collocation import collocations_by_attr
    from fastmorph_spark.stem import stem_py

    _, postings, dictionary = tables_inflected
    surface = {r["term"]: r for r in collocations(
        postings, dictionary, TARGET, window=WINDOW, min_count=1,
        k=10 ** 6).collect()}
    grouped = {r["key"]: r for r in collocations_by_attr(
        postings, dictionary, TARGET, attr="stem", window=WINDOW,
        min_count=1, k=10 ** 6).collect()}
    forms = [t for t in surface if stem_py(t) == "join"]
    assert len(forms) >= 2, "paradigm fixture must plant inflections"
    assert grouped["join"]["cooc"] == sum(surface[t]["cooc"] for t in forms)
    assert grouped["join"]["cf"] >= max(surface[t]["cf"] for t in forms)


def test_colloc_by_stem_duckdb_parity(spark, duck, tables_inflected):
    from fastmorph_spark.search.collocation import collocations_by_attr
    from fastmorph_spark.stem import PARADIGM_TEXT_SQL

    _, postings, dictionary = tables_inflected
    got = collocations_by_attr(postings, dictionary, TARGET, attr="stem",
                               window=WINDOW, min_count=MIN_COUNT, k=K)
    register_views(duck, SF0001)
    sql = oracles.collocations_by_attr_sql(
        TARGET, "stem", WINDOW, MIN_COUNT, K).replace(
        "FROM documents", f"FROM (SELECT doc_id, {PARADIGM_TEXT_SQL} AS text"
                          " FROM documents)")
    assert_frames_match(got, duck.sql(sql))


def test_colloc_by_attr_rejects_unknown(tables):
    from fastmorph_spark.search.collocation import collocations_by_attr

    _, postings, dictionary = tables
    with pytest.raises(ValueError):
        collocations_by_attr(postings, dictionary, TARGET, attr="lemma")


def test_colloc_by_attr_packed_equals_corpus(spark, tables):
    """Packed twin parity on the RAW fixture corpus (same index the
    surface packed test uses), both attrs, plus the absent-target empty
    shape."""
    from fastmorph_spark.search.collocation import (
        collocations_by_attr,
        packed_collocations_by_attr,
    )

    _, postings, dictionary = tables
    idx = registry._packed_index(spark, SF0001)
    for attr in ("stem", "tag"):
        corpus = collocations_by_attr(postings, dictionary, TARGET,
                                      attr=attr, window=WINDOW,
                                      min_count=MIN_COUNT, k=K).collect()
        packed = packed_collocations_by_attr(idx, TARGET, attr=attr,
                                             window=WINDOW,
                                             min_count=MIN_COUNT,
                                             k=K).collect()
        assert [tuple(r) for r in packed] == [tuple(r) for r in corpus]
        assert corpus, "fixture must produce grouped collocates"
    empty = packed_collocations_by_attr(idx, "zqxjkvw", attr="stem")
    assert empty.count() == 0
    assert empty.columns == ["rank", "key", "cooc", "cf", "pmi"]
    with pytest.raises(ValueError):
        packed_collocations_by_attr(idx, TARGET, attr="lemma")
