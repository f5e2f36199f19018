"""Three-form identity of the token classifier (fastmorph_spark.tags) and
the tag-slot operators built on it.

The classifier is the morph-tag analog of fastmorph's tag-constrained
slots [PK-high, SURVEY.md §1.1]; like the tokenizer and the stemmer, it
exists in Python / Catalyst / DuckDB forms that MUST agree on every real
token (SURVEY.md §7 "hard parts" discipline)."""

from __future__ import annotations

import duckdb

from fastmorph_spark.tags import TAG_CLASSES, duckdb_tag, tag_expr, tag_py
from tests.conftest import SF0001

CASES = {
    "join": "keyword",
    "sort": "keyword",
    "window": "keyword",
    "the": "stopword",
    "a": "stopword",
    "is": "stopword",
    "42": "number",
    "007": "number",
    "fast": "ident",
    "customer": "ident",
    "x86_codes": "ident",   # digits inside an identifier stay ident
    "_": "ident",
}


def test_tag_py_pinned_cases():
    for tok, want in CASES.items():
        assert tag_py(tok) == want, tok
        assert want in TAG_CLASSES


def test_tag_three_form_identity_on_fixture_vocab(spark):
    """Python == Catalyst == DuckDB over every distinct token of the
    fixture corpus plus the pinned edge cases."""
    from fastmorph_spark.index.build import build_dictionary, build_postings
    from fastmorph_spark.sources import read_documents

    docs = read_documents(spark, SF0001)
    vocab = sorted(
        {r["term"] for r in
         build_dictionary(build_postings(docs)).select("term").collect()}
        | set(CASES)
    )
    assert len(vocab) > 30

    expr_out = dict(
        spark.createDataFrame([(t,) for t in vocab], "term string")
        .select("term", tag_expr("term").alias("g")).collect()
    )
    con = duckdb.connect()
    duck_out = dict(
        con.execute(
            f"SELECT term, {duckdb_tag('term')} FROM (SELECT unnest(?) AS term)",
            [vocab],
        ).fetchall()
    )
    from tests.oracle_bm25 import oracle_tag

    for t in vocab:
        want = tag_py(t)
        assert expr_out[t] == want, t
        assert duck_out[t] == want, t
        assert oracle_tag(t) == want, t  # independent oracle twin


def test_tag_slot_engine_matches_oracle(spark):
    """engine.slot_search with a {"tag": ...} slot == the brute-force
    pure-Python oracle on the fixture corpus."""
    from fastmorph_spark.index.build import build_dictionary, build_postings
    from fastmorph_spark.sources import read_documents
    from fastmorph_spark.search import engine
    from tests.oracle_bm25 import OracleIndex, load_documents

    slots = [{"term": "fast"}, {"tag": "keyword"}]
    dists = [(1, 2)]
    docs = read_documents(spark, SF0001)
    postings = build_postings(docs)
    dictionary = build_dictionary(postings)
    got = [(r["doc_id"], r["n_matches"], r["match_starts"])
           for r in engine.slot_search(postings, dictionary, slots, dists).collect()]
    oracle = OracleIndex(load_documents(SF0001))
    want = oracle.slot_docs(slots, dists)
    assert got == want
    assert len(got) > 0  # the keyword class must actually match


def test_tag_slot_packed_matches_engine(spark):
    """packed_slot_search with a tag slot (dictionary-first expansion over
    the packed dictionary + block-skip pruning) == the corpus path."""
    from fastmorph_spark.index.io import build_index_frames
    from fastmorph_spark.index.build import build_dictionary, build_postings
    from fastmorph_spark.search import engine
    from fastmorph_spark.search.packed import packed_slot_search
    from fastmorph_spark.sources import read_documents

    slots = [{"term": "fast"}, {"tag": "keyword"}]
    dists = [(1, 2)]
    docs = read_documents(spark, SF0001)
    idx = build_index_frames(docs, doc_shard_size=100, block_size=16,
                            pack_partitions=8)
    got = packed_slot_search(idx, slots, dists).collect()
    postings = build_postings(docs)
    dictionary = build_dictionary(postings)
    want = engine.slot_search(postings, dictionary, slots, dists).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # predicate-direct regime (max_expansion=0) must agree too
    direct = packed_slot_search(idx, slots, dists, max_expansion=0).collect()
    assert [tuple(r) for r in direct] == [tuple(r) for r in want]
