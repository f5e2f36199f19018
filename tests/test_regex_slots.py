"""Regex slots (search/regex.py): the pinned cross-engine subset
validator, Spark(rlike)/DuckDB(regexp_matches) parity on the anchored
form, regex-in-slot corpus/packed/oracle agreement, and the CQL and
protocol boundaries."""

from __future__ import annotations

import pytest

from fastmorph_spark import oracles
from fastmorph_spark.index import build_dictionary, build_postings
from fastmorph_spark.search import engine
from fastmorph_spark.search.regex import (
    anchored,
    duckdb_regex_cond,
    regex_terms,
    validate_regex,
)
from fastmorph_spark.sources import read_documents
from tests.conftest import SF0001, assert_frames_match, register_views

REGEX_SLOTS = [{"regex": "fast|slow"}, {"pattern": "h*"}]
REGEX_DISTS = [(1, 4)]

GOOD = [
    "fast", "fa.t", "f.*", "s(can|low)", "jo(in|b)s?", "a{2}", "a{1,3}b",
    "[a-z]+", "[^0-9_]+x", "[a-f0-9]{2,8}", "(a|b)(c|d)*", "x[-az]y",
    "[az-]", "a|b|c", "a+b?c*",
]
BAD = [
    r"fa\st",          # escapes rejected (dialects differ)
    "(?i)fast",        # special group
    "^fast$",          # anchors (whole-token is implicit)
    "*fast",           # dangling quantifier
    "|*",              # quantifier after alternation bar
    "a{3,1}",          # m > n
    "a{x}",            # non-integer repeat
    "a{2",             # unterminated repeat
    "[abc",            # unterminated class
    "[]",              # empty class
    "[z-a]",           # descending range
    "(ab",             # unbalanced paren
    "ab)",             # unbalanced paren
    "a[b.c]",          # metachar inside class
    "",                # empty pattern
]


@pytest.fixture(scope="module")
def duck1(duck):
    register_views(duck, SF0001)
    return duck


@pytest.fixture(scope="module")
def tables(spark):
    docs = read_documents(spark, SF0001)
    postings = build_postings(docs).cache()
    dictionary = build_dictionary(postings).cache()
    return docs, postings, dictionary


def test_validator_accepts_the_pinned_subset():
    for p in GOOD:
        assert validate_regex(p) == p


def test_validator_rejects_out_of_subset():
    for p in BAD:
        with pytest.raises(ValueError):
            validate_regex(p)


def test_spark_duckdb_anchored_parity(spark, tables, duck1):
    """Every GOOD pattern expands to the SAME vocabulary term set under
    Java rlike and RE2 regexp_matches — the subset pin, tested against
    the real fixture dictionary rather than argued."""
    _, _, dictionary = tables
    from fastmorph_spark.oracles import _corpus_ctes

    for p in GOOD:
        got = sorted(r["term"] for r in regex_terms(dictionary, p).collect())
        sql = (f"WITH {_corpus_ctes(None)} SELECT DISTINCT term FROM tf "
               f"WHERE {duckdb_regex_cond('term', p)} ORDER BY term")
        want = sorted(r[0] for r in duck1.sql(sql).fetchall())
        assert got == want, f"pattern {p!r}: {got} != {want}"


def test_regex_slot_matches_oracle(spark, tables, duck1):
    _, postings, dictionary = tables
    got = engine.slot_search(postings, dictionary, REGEX_SLOTS, REGEX_DISTS)
    sql = oracles.slot_search_sql(REGEX_SLOTS, REGEX_DISTS)
    assert_frames_match(got, duck1.sql(sql))
    assert got.count() > 0, "regex slot must be non-vacuous on the fixture"


def test_regex_slot_equals_term_union(spark, tables):
    """`fast|slow` must match exactly the union of the two exact-term
    slot queries — alternation is set union, not approximately."""
    _, postings, dictionary = tables
    got = {r["doc_id"]: set(r["match_starts"].split(","))
           for r in engine.slot_search(postings, dictionary,
                                       REGEX_SLOTS, REGEX_DISTS).collect()}
    union: dict[int, set] = {}
    for t in ("fast", "slow"):
        for r in engine.slot_search(postings, dictionary,
                                    [{"term": t}, {"pattern": "h*"}],
                                    REGEX_DISTS).collect():
            union.setdefault(r["doc_id"], set()).update(
                r["match_starts"].split(","))
    assert got == union


def test_regex_slot_packed_parity(spark, tables, tmp_path):
    from fastmorph_spark.index.io import read_index, write_index
    from fastmorph_spark.search.packed import packed_slot_search

    docs, postings, dictionary = tables
    path = str(tmp_path / "regex_idx")
    write_index(spark, docs, path)
    idx = read_index(spark, path)
    a = engine.slot_search(postings, dictionary,
                           REGEX_SLOTS, REGEX_DISTS).collect()
    b = packed_slot_search(idx, REGEX_SLOTS, REGEX_DISTS).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert a, "packed parity must be tested on a non-empty result"


def test_regex_slot_direct_predicate_mode(spark, tables):
    """dictionary=None (the packed decode regime) must give identical
    results to the dictionary-first expansion."""
    _, postings, dictionary = tables
    a = engine.slot_search(postings, dictionary,
                           REGEX_SLOTS, REGEX_DISTS).collect()
    b = engine.slot_search(postings, None, REGEX_SLOTS, REGEX_DISTS).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_cql_regex_attr():
    from fastmorph_spark.search.cql import CQLError, parse_cql

    c = parse_cql('[regex="fast|slow"] []{0,3} "h*"')
    assert c["slots"] == [{"regex": "fast|slow"}, {"pattern": "h*"}]
    assert c["dists"] == [(1, 4)]
    with pytest.raises(CQLError):
        parse_cql('[regex="(?i)fast"]')
    with pytest.raises(CQLError):
        parse_cql(r'[regex="fa\st"]')


def test_protocol_regex_slot_validation():
    from fastmorph_spark.search.protocol import RequestError, parse_request

    p = parse_request({"slots": [{"regex": "fast|slow"}, {"word": "h"}],
                       "dists": [[1, 4]]})
    assert p["slots"][0] == {"regex": "fast|slow"}
    with pytest.raises(RequestError):
        parse_request({"slots": [{"regex": "^fast$"}], "dists": []})
    with pytest.raises(RequestError):
        parse_request({"slots": [{"regex": "fast", "case": True}],
                       "dists": []})


def test_anchoring_is_whole_token(spark, tables):
    """`fas` must NOT match 'fast' — matching is anchored, not substring
    (the CWB convention and the non-negotiable difference from rlike's
    default find semantics)."""
    _, _, dictionary = tables
    assert anchored("fas") == "^(?:fas)$"
    assert regex_terms(dictionary, "fas").count() == 0
    assert regex_terms(dictionary, "fast").count() == 1


def test_regex_slot_plan_shape(spark, tables):
    """The 100x-scale pins: a regex slot's dictionary expansion resolves
    to a LeftSemi BROADCAST join into postings (the wildcard-slot shape
    — vocabulary-sized RLike, never per-posting), and the plan carries
    the RLike predicate on the dictionary side, not a Python UDF."""
    _, postings, dictionary = tables
    df = engine.slot_search(postings, dictionary,
                            [{"regex": "fast|slow"}], [])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan
    assert "RLIKE" in plan or "rlike" in plan.lower()
    assert "BatchEvalPython" not in plan  # no per-row Python anywhere


def test_cyrillic_regex_parity(spark, duck1):
    """The uni-corpus regime (VERDICT r04 #1 + regex slots): Cyrillic
    patterns with alternation/quantifiers expand to the SAME uni-folded
    vocabulary under Java rlike, RE2 regexp_matches, and Python re —
    literal non-ASCII codepoints are in the pinned subset."""
    import re as _re

    from fastmorph_spark.index import build_dictionary, build_postings
    from fastmorph_spark.registry import _uni_docs
    from fastmorph_spark.search.regex import anchored
    from fastmorph_spark.tokenize import tokenize_py_uni

    docs = _uni_docs(spark, SF0001)
    dictionary = build_dictionary(
        build_postings(docs, tokenizer="uni")).cache()
    vocab = sorted(r["term"] for r in dictionary.select("term").collect())
    assert any(not t.isascii() for t in vocab), "uni fixture is Cyrillic"
    pats = ["йорт(лар)?", "к.*н", "(су|өй)", "[а-я]{2,4}", "мәктәп|идел"]
    for p in pats:
        got = sorted(r["term"] for r in regex_terms(dictionary, p).collect())
        want_re = sorted(t for t in vocab
                         if _re.match(anchored(p.lower()) , t))
        want_duck = sorted(
            r[0] for r in duck1.execute(
                "SELECT t FROM (SELECT unnest(?) AS t) "
                "WHERE regexp_matches(t, ?)", [vocab, anchored(p.lower())]
            ).fetchall())
        assert got == want_re == want_duck, p
    # non-vacuous: the paradigm pattern really matches a Cyrillic term
    assert sorted(r["term"] for r in
                  regex_terms(dictionary, "йорт(лар)?").collect()) == ["йорт"]
    dictionary.unpersist()
