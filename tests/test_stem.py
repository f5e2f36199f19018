"""Three-form identity of the rule stemmer (fastmorph_spark.stem) and the
lemma-layer operators built on it.

The stemmer is the lemma analog of fastmorph's lemma-constrained slots
[PK-high, SURVEY.md §1.1]; like the tokenizer, it exists in Python /
Catalyst / DuckDB forms that MUST agree on every real token (SURVEY.md §7
"hard parts" discipline)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from fastmorph_spark.stem import duckdb_stem, stem_expr, stem_py
from tests.conftest import SF0001


CASES = {
    "queries": "query",      # ies -> y
    "hashing": "hash",       # -ing
    "joined": "join",        # -ed
    "joins": "join",         # -s
    "joining": "join",
    "join": "join",          # unchanged
    "class": "class",        # -ss protected
    "status": "status",      # -us protected
    "ing": "ing",            # too short for -ing
    "ed": "ed",              # too short
    "is": "is",              # too short for -s
    "as": "as",
    "settings": "setting",   # only ONE rule applies (first match wins)
    "ties": "tie",           # 'ies' guard needs 2+ chars before it; -s rule fires
    "x86_codes": "x86_code", # digits/underscore in the stem body
}


def test_stem_py_pinned_cases():
    for tok, want in CASES.items():
        assert stem_py(tok) == want, tok


def test_stem_three_form_identity_on_fixture_vocab(spark):
    """Python == Catalyst == DuckDB over every distinct token of the
    fixture corpus (the vocabulary the engine actually stems)."""
    from fastmorph_spark.index.build import build_dictionary, build_postings
    from fastmorph_spark.sources import read_documents

    docs = read_documents(spark, SF0001)
    vocab = sorted(
        {
            r["term"]
            for r in build_dictionary(build_postings(docs)).select("term").collect()
        }
        | set(CASES)  # fixture vocab is small; fold in the pinned edge cases
    )
    assert len(vocab) > 30

    expr_out = dict(
        spark.createDataFrame([(t,) for t in vocab], "term string")
        .select("term", stem_expr("term").alias("s")).collect()
    )
    con = duckdb.connect()
    duck_out = dict(
        con.execute(
            f"SELECT term, {duckdb_stem('term')} FROM (SELECT unnest(?) AS term)",
            [vocab],
        ).fetchall()
    )
    for t in vocab:
        py = stem_py(t)
        assert expr_out[t] == py, t
        assert duck_out[t] == py, t


def test_stem_search_matches_bruteforce(spark):
    from fastmorph_spark.index.build import build_dictionary, build_postings
    from fastmorph_spark.search.engine import stem_search
    from fastmorph_spark.sources import read_documents
    from fastmorph_spark.tokenize import tokenize_py

    docs = read_documents(spark, SF0001)
    postings = build_postings(docs)
    dictionary = build_dictionary(postings)
    got = {r["doc_id"]: r["total_tf"] for r in stem_search(postings, dictionary, "joins").collect()}

    target = stem_py("joins")
    want: dict[int, int] = {}
    for r in docs.select("doc_id", "text").collect():
        n = sum(1 for t in tokenize_py(r["text"]) if stem_py(t) == target)
        if n:
            want[r["doc_id"]] = n
    assert got == want


def test_slot_stem_positions(spark):
    """A stem slot composes with distance ranges: brute-force position
    check on a tiny handmade corpus."""
    from fastmorph_spark.index.build import build_dictionary, build_postings
    from fastmorph_spark.search.engine import slot_search

    rows = [
        (0, "fast inner joins win"),          # fast@0, joins@2: gap 2 -> hit
        (1, "fast x y z q joined"),           # gap 5 -> hit (<=5)
        (2, "fast a b c d e joining"),        # gap 6 -> miss
        (3, "joins fast"),                    # wrong order -> miss
        (4, "fast join"),                     # gap 1 -> hit
        (5, "fast jointly"),                  # 'jointly' stems to itself -> miss
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    postings = build_postings(docs)
    dictionary = build_dictionary(postings)
    out = slot_search(postings, dictionary,
                      [{"term": "fast"}, {"stem": "joins"}], [(1, 5)]).collect()
    assert [(r["doc_id"], r["match_starts"]) for r in out] == [(0, "0"), (1, "0"), (4, "0")]


def test_search_request_pagination_and_totals(spark):
    """search_request: page window is (skip, until] in doc_id order;
    totals cover the FULL match set, not the page; over-skip -> empty."""
    from fastmorph_spark.index.build import build_dictionary, build_postings
    from fastmorph_spark.search.engine import search_request

    rows = [(i, "fast hash here") for i in range(6)] + [(6, "no match here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    postings = build_postings(docs)
    dictionary = build_dictionary(postings)
    slots, dists = [{"term": "fast"}, {"term": "hash"}], [(1, 1)]

    out = search_request(docs, postings, dictionary, slots, dists,
                         skip=2, until=4).collect()
    assert [(r["rank"], r["doc_id"]) for r in out] == [(3, 2), (4, 3)]
    assert all(r["total_docs"] == 6 and r["total_matches"] == 6 for r in out)
    assert [r["running_total"] for r in out] == [1, 2]
    assert all(r["snippet"] == "fast hash here" and r["hl_offset"] == 0 for r in out)

    assert search_request(docs, postings, dictionary, slots, dists,
                          skip=10, until=20).count() == 0


def test_snippets_edges(spark):
    """Snippet windows clamp at document boundaries; hl_offset tracks the
    match inside the snippet; running_total is (doc_id, pos)-ordered."""
    from fastmorph_spark.index.build import build_dictionary, build_postings
    from fastmorph_spark.search.engine import slot_search, snippets

    rows = [
        (0, "order fast ship now today"),        # match at doc start
        (1, "we order fast goods"),              # one token of left context
        (2, "a b order fast"),                   # match at doc end
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    postings = build_postings(docs)
    dictionary = build_dictionary(postings)
    m = slot_search(postings, dictionary, [{"term": "order"}, {"term": "fast"}], [(1, 1)])
    out = snippets(docs, m, match_len=2, width=2).collect()
    got = [(r["doc_id"], r["pos"], r["hl_offset"], r["snippet"], r["running_total"]) for r in out]
    assert got == [
        (0, 0, 0, "order fast ship now", 1),
        (1, 1, 1, "we order fast goods", 2),
        (2, 2, 2, "a b order fast", 3),
    ]


def test_snippets_running_total_across_buckets(spark):
    """The two-phase running total (bucketed prefix sum, engine.snippets)
    is globally (doc_id, pos)-ordered even when matched docs span several
    SNIPPET_DOC_BUCKET ranges — and survives input repartitioning."""
    from fastmorph_spark.index.build import build_dictionary, build_postings
    from fastmorph_spark.search.engine import SNIPPET_DOC_BUCKET, slot_search, snippets

    B = SNIPPET_DOC_BUCKET
    ids = [0, 1, B - 1, B, B + 7, 3 * B + 2]  # buckets 0, 0, 0, 1, 1, 3
    rows = [(i, "order fast order fast") for i in ids]  # 2 matches per doc
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(5)
    postings = build_postings(docs)
    dictionary = build_dictionary(postings)
    m = slot_search(postings, dictionary, [{"term": "order"}, {"term": "fast"}], [(1, 1)])
    out = snippets(docs, m, match_len=2, width=1).collect()
    assert [(r["doc_id"], r["pos"]) for r in out] == [
        (i, p) for i in ids for p in (0, 2)
    ]
    assert [r["running_total"] for r in out] == list(range(1, 13))
