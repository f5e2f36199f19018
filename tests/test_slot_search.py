"""slot_search (multi-slot token patterns, J4 generalized) vs a pure-Python
brute-force reference, including wildcard slots and per-slot case flags."""

from __future__ import annotations

import fnmatch

import pytest
from pyspark.sql import functions as F

from fastmorph_spark.index.build import build_dictionary, build_postings
from fastmorph_spark.search.engine import slot_search
from fastmorph_spark.tokenize import tokenize_py, tokenize_py_cs

DOCS = [
    (0, "fast hash join beats slow merge join"),
    (1, "fast merge then hash then join"),
    (2, "FAST hash JOIN in CAPS"),
    (3, "join fast hash reversed order"),
    (4, "fast x y z join too far apart maybe"),
    (5, "nothing relevant here"),
    (6, "fast fast hash join join overlapping starts"),
    (7, ""),
]


def brute(slots, dists):
    """Reference: all docs + slot-0 start positions admitting a full chain."""
    out = {}
    for doc_id, text in DOCS:
        toks_ci = tokenize_py(text)
        toks_cs = tokenize_py_cs(text)

        def slot_positions(s):
            cs = bool(s.get("case"))
            toks = toks_cs if cs else toks_ci
            if "term" in s:
                t = s["term"] if cs else s["term"].lower()
                return [i for i, x in enumerate(toks) if x == t]
            pat = s["pattern"] if cs else s["pattern"].lower()
            return [i for i, x in enumerate(toks) if fnmatch.fnmatchcase(x, pat)]

        ps = [slot_positions(s) for s in slots]
        if any(not p for p in ps):
            continue

        def chain(i, prev):
            if i == len(slots):
                return True
            lo, hi = dists[i - 1]
            return any(prev + lo <= q <= prev + hi and chain(i + 1, q) for q in ps[i])

        starts = sorted(p for p in ps[0] if chain(1, p))
        if starts:
            out[doc_id] = starts
    return out


@pytest.fixture(scope="module")
def tables(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    p = build_postings(df)
    d = build_dictionary(p)
    pc = build_postings(df, fold_case=False)
    dc = build_dictionary(pc)
    return p, d, pc, dc


CASES = [
    ([{"term": "fast"}, {"term": "hash"}, {"term": "join"}], [(1, 1), (1, 1)]),
    ([{"term": "fast"}, {"term": "join"}], [(1, 5)]),
    ([{"pattern": "f*"}, {"pattern": "j*n"}], [(1, 4)]),
    ([{"term": "fast"}, {"term": "hash"}, {"term": "join"}], [(1, 3), (1, 3)]),
    ([{"term": "fast"}], []),
    ([{"pattern": "?ash"}, {"term": "join"}], [(2, 2)]),
]


@pytest.mark.parametrize("slots,dists", CASES)
def test_slot_search_matches_bruteforce(tables, slots, dists):
    p, d, pc, dc = tables
    got = {
        r["doc_id"]: [int(x) for x in r["match_starts"].split(",")]
        for r in slot_search(p, d, slots, dists, pc, dc).collect()
    }
    assert got == brute(slots, dists)


CS_CASES = [
    ([{"term": "FAST", "case": True}, {"term": "hash"}], [(1, 1)]),
    ([{"term": "FAST", "case": True}, {"pattern": "J*", "case": True}], [(1, 2)]),
    ([{"pattern": "CAPS", "case": True}], []),
    ([{"term": "fast", "case": True}, {"term": "join"}], [(1, 5)]),  # misses doc 2
]


@pytest.mark.parametrize("slots,dists", CS_CASES)
def test_slot_search_case_flags(tables, slots, dists):
    p, d, pc, dc = tables
    got = {
        r["doc_id"]: [int(x) for x in r["match_starts"].split(",")]
        for r in slot_search(p, d, slots, dists, pc, dc).collect()
    }
    assert got == brute(slots, dists)


def test_n_matches_counts_all_starts(tables):
    p, d, pc, dc = tables
    # doc 6: "fast fast hash join join" -> both fast positions start a match
    rows = slot_search(p, d, [{"term": "fast"}, {"term": "hash"}], [(1, 2)]).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[6]["n_matches"] == 2
    assert by_id[6]["match_starts"] == "0,1"


def test_case_sensitive_slot_requires_cs_index(tables):
    p, d, *_ = tables
    with pytest.raises(ValueError):
        slot_search(p, d, [{"term": "FAST", "case": True}], [])


def test_slot_search_randomized_vs_oracle(spark):
    """Seeded randomized equivalence: engine.slot_search == the
    brute-force oracle matcher on random corpora x random slot specs
    (terms / wildcards / stems, 2-4 slots, random distance ranges incl.
    negative lower bounds). Guards the HOF predicate chain against edge
    cases fixtures don't hit."""
    import random

    from fastmorph_spark.index.build import build_dictionary, build_postings
    from fastmorph_spark.search.engine import slot_search
    from tests.oracle_bm25 import OracleIndex

    rng = random.Random(20260817)
    vocab = ["fast", "fasts", "fasting", "hash", "hashing", "join", "joins",
             "joined", "scan", "scans", "the", "a", "keyed", "keys"]

    for trial in range(12):
        docs_py = {
            d: " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30)))
            for d in range(rng.randint(5, 25))
        }
        n_slots = rng.randint(2, 4)
        slots = []
        for _ in range(n_slots):
            kind = rng.choice(["term", "pattern", "stem"])
            if kind == "term":
                slots.append({"term": rng.choice(vocab)})
            elif kind == "pattern":
                slots.append({"pattern": rng.choice(["fa*", "h*", "jo?n*", "s*", "k*s"])})
            else:
                slots.append({"stem": rng.choice(["joins", "fasts", "scanning", "keyed"])})
        dists = []
        for _ in range(n_slots - 1):
            lo = rng.randint(-2, 3)
            dists.append((lo, lo + rng.randint(0, 4)))

        sdf = spark.createDataFrame(list(docs_py.items()), "doc_id long, text string")
        postings = build_postings(sdf)
        dictionary = build_dictionary(postings)
        got = [(r["doc_id"], r["n_matches"], r["match_starts"])
               for r in slot_search(postings, dictionary, slots, dists).collect()]
        want = OracleIndex(docs_py).slot_docs(slots, dists)
        assert got == want, (trial, slots, dists)


def test_kwic_concordance_lines(spark, tables):
    """engine.kwic: aligned left/keyword/right columns with correct
    truncation at document start and end, folded token stream, one row
    per occurrence in (doc_id, pos) order."""
    from fastmorph_spark.search.engine import kwic

    p, d, pc, dc = tables
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    matches = slot_search(p, d, [{"term": "fast"}, {"term": "hash"}], [(1, 1)])
    rows = [tuple(r) for r in kwic(docs, matches, match_len=2, width=3).collect()]
    expected = [
        (0, 0, "", "fast hash", "join beats slow"),
        (2, 0, "", "fast hash", "join in caps"),
        (3, 1, "join", "fast hash", "reversed order"),       # doc end: short right
        (6, 1, "fast", "fast hash", "join join overlapping"),
    ]
    assert rows == expected


def test_kwic_sorted_right_and_left(spark, tables):
    """engine.kwic_sorted: by='right' groups lines by their continuation
    (1R, 2R, ... read order); by='left' orders by the REVERSED left
    context (1L, 2L, ...); rank is dense 1..n and materializes the
    order; validated against a pure-Python sort of engine.kwic's rows."""
    from fastmorph_spark.search.engine import kwic, kwic_sorted

    p, d, pc, dc = tables
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    matches = slot_search(p, d, [{"term": "fast"}], [])
    base = [tuple(r) for r in kwic(docs, matches, match_len=1, width=3).collect()]

    got_r = [tuple(r) for r in
             kwic_sorted(docs, matches, match_len=1, width=3, by="right",
                         n=100).collect()]
    want_r = sorted(base, key=lambda t: (t[4], t[2], t[0], t[1]))
    assert got_r == [(i + 1, *t) for i, t in enumerate(want_r)]

    got_l = [tuple(r) for r in
             kwic_sorted(docs, matches, match_len=1, width=3, by="left",
                         n=100).collect()]

    def lkey(t):
        return " ".join(reversed(t[2].split(" "))) if t[2] else ""

    want_l = sorted(base, key=lambda t: (lkey(t), t[4], t[0], t[1]))
    assert got_l == [(i + 1, *t) for i, t in enumerate(want_l)]
    assert [r[0] for r in got_r] == list(range(1, len(base) + 1))

    with pytest.raises(ValueError):
        kwic_sorted(docs, matches, match_len=1, by="middle")


def test_kwic_sorted_page_limit(spark, tables):
    """n bounds the page: top-n of the sorted order, ranks 1..n."""
    from fastmorph_spark.search.engine import kwic, kwic_sorted

    p, d, pc, dc = tables
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    matches = slot_search(p, d, [{"term": "fast"}], [])
    full = [tuple(r) for r in
            kwic_sorted(docs, matches, match_len=1, by="right", n=100).collect()]
    page = [tuple(r) for r in
            kwic_sorted(docs, matches, match_len=1, by="right", n=2).collect()]
    assert page == full[:2]
