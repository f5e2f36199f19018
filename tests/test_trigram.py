"""Trigram substring/regex search (round 5 code-search wave).

Pins: (1) trigram extraction parity (Catalyst HOF vs Python twin),
(2) substring search == brute-force contains on both case modes and on
the flat AND the at-rest varbyte paths, (3) pack/write/read roundtrip
byte-parity, (4) required_factors SOUNDNESS — every string matching a
pinned-subset pattern contains one extracted factor (hypothesis
generates the matches), (5) regex_grep == brute-force rlike lines,
(6) repartition determinism, (7) the unindexable/short/absent edges."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from fastmorph_spark.index.trigram import (
    TrigramIndex,
    build_trigram_index,
    pack_trigrams,
    read_trigram_index,
    trigram_expr,
    trigrams_py,
    write_trigram_index,
)
from fastmorph_spark.search.substring import (
    regex_grep,
    required_factors,
    substring_grep,
    substring_search,
)

ROWS = [
    (0, "def parseJSONResponse(x, y):\n    return MAX_BUFFER_SIZE"),
    (1, "class JSONParser:\n    buf = XMLHttpRequest()"),
    (2, "xy"),
    (3, "parseXMLResponse = 1\n# see parseJSONResponse and writeLogEntry"),
    (4, None),
    (5, ""),
    (6, "RESPONSE response Response\nparse parse parse"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


@pytest.fixture(scope="module")
def idx(docs) -> TrigramIndex:
    ix = build_trigram_index(docs)
    ix.postings.persist()
    ix.dictionary.persist()
    yield ix
    ix.postings.unpersist()
    ix.dictionary.unpersist()


@pytest.fixture(scope="module")
def at_rest(spark, idx, tmp_path_factory) -> TrigramIndex:
    path = str(tmp_path_factory.mktemp("tgidx"))
    write_trigram_index(pack_trigrams(idx, doc_shard_size=2), path)
    return read_trigram_index(spark, path)


def brute_docs(q: str, case: bool = True) -> list[int]:
    out = []
    for did, text in ROWS:
        t = text or ""
        if (q in t) if case else (q.lower() in t.lower()):
            out.append(did)
    return out


# ------------------------------------------------------- extraction

def test_trigram_expr_matches_python_twin(spark):
    texts = ["abcde", "ab", "", "AbC!x\nYz", "aaaa"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = df.select(trigram_expr(F.col("t")).alias("g")).collect()
    for t, row in zip(texts, got):
        assert sorted(row["g"]) == sorted(trigrams_py(t)), t


def test_trigram_expr_null_and_short(spark):
    df = spark.createDataFrame([(None,), ("ab",)], "t string")
    got = df.select(trigram_expr(F.col("t")).alias("g")).collect()
    assert got[0]["g"] == [] and got[1]["g"] == []


def test_dictionary_df_exact(idx):
    # 'par' occurs in docs 0, 1 (JSONParser), 3, 6 — df counts DOCS
    row = idx.dictionary.filter(F.col("trigram") == "par").collect()
    assert row and row[0]["df"] == 4


# ------------------------------------------------- substring search

CASES = [
    ("Response(", True),      # crosses identifier/punct boundary
    ("Response", True),
    ("parseJSONResponse", True),
    ("jsonresponse", False),  # folded
    ("RESPONSE", True),       # case-sensitive discrimination vs doc 6
    ("zzznope", True),        # absent trigram -> dictionary early-exit
    ("xy", True),             # < 3 chars -> full-scan fallback
    ("E(x", True),            # punctuation-heavy
]


@pytest.mark.parametrize("q,case", CASES)
def test_substring_matches_bruteforce(docs, idx, q, case):
    got = [r["doc_id"] for r in substring_search(docs, idx, q, case=case).collect()]
    assert got == brute_docs(q, case)


@pytest.mark.parametrize("q,case", CASES)
def test_substring_at_rest_path(docs, at_rest, q, case):
    got = [r["doc_id"] for r in substring_search(docs, at_rest, q, case=case).collect()]
    assert got == brute_docs(q, case)


def test_substring_empty_query_rejected(docs, idx):
    with pytest.raises(ValueError, match="non-empty"):
        substring_search(docs, idx, "")


def test_substring_grep_lines(docs, idx):
    got = [(r["doc_id"], r["line_no"], r["line"])
           for r in substring_grep(docs, idx, "parseJSONResponse").collect()]
    want = []
    for did, text in ROWS:
        for ln, line in enumerate((text or "").split("\n"), start=1):
            if "parseJSONResponse" in line:
                want.append((did, ln, line))
    assert got == want and len(want) == 2


def test_repartition_determinism(docs, idx):
    scattered = docs.repartition(7)
    a = [r["doc_id"] for r in substring_search(docs, idx, "Response").collect()]
    b = [r["doc_id"] for r in substring_search(scattered, idx, "Response").collect()]
    assert a == b


def test_roundtrip_postings_parity(idx, at_rest):
    flat = sorted((r["trigram"], r["doc_id"])
                  for r in idx.postings.select("trigram", "doc_id").collect())
    packed = sorted((r["trigram"], r["doc_id"])
                    for r in at_rest.postings.select("trigram", "doc_id").collect())
    assert flat == packed


def test_blob_shard_split_bounds_rows(at_rest):
    # doc_shard_size=2 over 7 docs: the hottest trigram's rows are split
    # by shard — no blob row holds more than shard-size ids
    mx = at_rest.blobs.agg(F.max("n_docs")).collect()[0][0]
    assert mx <= 2


# ------------------------------------------------------------ regex

FACTOR_PATTERNS = [
    "parse(JSON|XML)Response",
    "writeLog|JSONParser",
    "MAX_[A-Z]+_SIZE",
    "respons(e|es)",
    "ab+cde",
    "abc{2,4}de",
    "parse.{0,3}Response",
    "(get|set)UserID",
]

UNINDEXABLE = ["a(bc)*d", "x?yz?w", "[a-z]{4}", "ab|cdef", "a.b.c"]


@pytest.mark.parametrize("pat", FACTOR_PATTERNS)
def test_factors_exist_for_indexable(pat):
    fs = required_factors(pat)
    assert fs and all(len(f) >= 3 for f in fs)


@pytest.mark.parametrize("pat", UNINDEXABLE)
def test_unindexable_returns_none(pat):
    assert required_factors(pat) is None


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_factor_soundness_on_generated_matches(data):
    """SOUNDNESS: any string matching the pattern contains >=1 extracted
    factor as a substring — hypothesis generates exact matches, and a
    superstring containing a match keeps its factors."""
    pat = data.draw(st.sampled_from(FACTOR_PATTERNS))
    fs = required_factors(pat)
    s = data.draw(st.from_regex(pat, fullmatch=True))
    assert any(f in s for f in fs), (pat, s, fs)


def brute_regex_lines(pat: str) -> list[tuple[int, int, str]]:
    rx = re.compile(pat)
    out = []
    for did, text in ROWS:
        for ln, line in enumerate((text or "").split("\n"), start=1):
            if rx.search(line):
                out.append((did, ln, line))
    return out


@pytest.mark.parametrize("pat", [
    "parse(JSON|XML)Response",
    "writeLog|JSONParser",
    "MAX_[A-Z]+_SIZE",
    "a(bc)*d",            # unindexable -> full-scan fallback, same rows
    "RESPONSE|BUFFER",
])
def test_regex_grep_matches_bruteforce(docs, idx, pat):
    got = [(r["doc_id"], r["line_no"], r["line"])
           for r in regex_grep(docs, idx, pat).collect()]
    assert got == brute_regex_lines(pat)


def test_regex_grep_at_rest(docs, at_rest):
    pat = "parse(JSON|XML)Response"
    got = [(r["doc_id"], r["line_no"], r["line"])
           for r in regex_grep(docs, at_rest, pat).collect()]
    assert got == brute_regex_lines(pat)


def test_regex_outside_subset_rejected(docs, idx):
    with pytest.raises(ValueError, match="subset"):
        regex_grep(docs, idx, r"parse\w+")


def test_semijoin_fallback_regime(docs, idx, monkeypatch):
    """Candidate sets above MAX_ID_PUSHDOWN take the broadcast semi-join
    instead of the In() pushdown — same results either way."""
    import fastmorph_spark.search.substring as ss

    want = brute_docs("Response")
    assert [r["doc_id"] for r in
            substring_search(docs, idx, "Response").collect()] == want
    monkeypatch.setattr(ss, "MAX_ID_PUSHDOWN", 0)
    assert [r["doc_id"] for r in
            substring_search(docs, idx, "Response").collect()] == want
