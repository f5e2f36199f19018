"""Parallel (aligned) corpus search (search/parallel.py): slot matches on
the SOURCE side of an aligned pair table, each occurrence returned with
its source KWIC line and the aligned target segment — the bilingual
concordance unit of a national-corpus portal's parallel subcorpus.

Pinned here:
- result parity with an independent pure-Python oracle (tokenize_py +
  brute-force phrase scan + hand slicing) on the sf0.001 fixture;
- DuckDB oracle parity (the registry key's exact shape);
- alignment integrity of the fixture (bijective src->tgt, reversed
  tr_-prefixed token stream);
- the source restriction is non-vacuous: a target-vocabulary term
  (tr_-prefixed) matches nothing even though target segments contain it;
- absent-term and empty-frame edges keep the schema;
- every source occurrence of the node appears exactly once (occurrence
  count identity vs slot_search's n_matches).
"""

from __future__ import annotations

import duckdb
import pytest

from fastmorph_spark import registry_corpus
from fastmorph_spark.registry_corpus import (
    PAR_DISTS,
    PAR_MOD,
    PAR_OFFSET,
    PAR_SLOTS,
    PAR_WIDTH,
    _parallel_tables,
)
from fastmorph_spark.search.parallel import parallel_search
from fastmorph_spark.tokenize import tokenize_py
from fastmorph_spark.sources import read_documents
from tests.conftest import SF0001, assert_frames_match, register_views


@pytest.fixture(scope="module")
def tables(spark):
    return _parallel_tables(spark, SF0001)


def _py_expected(spark):
    """Independent brute-force oracle: phrase scan over the even-doc_id
    slice of the fixture, hand-built KWIC + reversed tr_ target."""
    rows = read_documents(spark, SF0001).select("doc_id", "text").collect()
    terms = [s["term"] for s in PAR_SLOTS]
    out = []
    for r in sorted(rows, key=lambda r: r.doc_id):
        if r.doc_id % PAR_MOD != 0:
            continue
        toks = tokenize_py(r.text)
        tgt_text = " ".join("tr_" + t for t in reversed(toks))
        n = len(terms)
        for p in range(len(toks) - n + 1):
            if toks[p:p + n] == terms:
                out.append({
                    "pair_id": r.doc_id,
                    "doc_id": r.doc_id,
                    "pos": p,
                    "left_ctx": " ".join(toks[max(p - PAR_WIDTH, 0):p]),
                    "keyword": " ".join(toks[p:p + n]),
                    "right_ctx": " ".join(toks[p + n:p + n + PAR_WIDTH]),
                    "tgt_id": r.doc_id + PAR_OFFSET,
                    "tgt_text": tgt_text,
                })
    return out


def test_matches_python_oracle(spark, tables):
    src, tgt, alignment, postings, dictionary = tables
    got = parallel_search(src, tgt, alignment, postings, dictionary,
                          PAR_SLOTS, PAR_DISTS, width=PAR_WIDTH).collect()
    exp = _py_expected(spark)
    assert len(got) > 0, "fixture phrase must be non-vacuous at sf0.001"
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        for k, v in e.items():
            assert g[k] == v, (k, g[k], v)


def test_duckdb_oracle_parity(spark):
    df = registry_corpus.q_parallel_search(spark, SF0001)
    con = duckdb.connect()
    register_views(con, SF0001)
    sql = registry_corpus.oracle_sqls()["parallel_search"]
    assert_frames_match(df, con.sql(sql))


def test_alignment_integrity(tables):
    src, tgt, alignment, *_ = tables
    n_src = src.count()
    assert alignment.count() == n_src
    assert tgt.count() == n_src
    # bijective: every src_id appears once, every tgt_id = src_id + offset
    pairs = alignment.collect()
    assert len({p.src_id for p in pairs}) == n_src
    assert all(p.tgt_id == p.src_id + PAR_OFFSET and p.pair_id == p.src_id
               for p in pairs)


def test_target_tokens_reversed(spark, tables):
    src, tgt, *_ = tables
    s = {r.doc_id: r.text for r in src.limit(20).collect()}
    t = {r.doc_id - PAR_OFFSET: r.text
         for r in tgt.filter(tgt.doc_id - PAR_OFFSET < 100).collect()}
    checked = 0
    for did, text in s.items():
        if did not in t:
            continue
        toks = tokenize_py(text)
        assert t[did] == " ".join("tr_" + x for x in reversed(toks))
        checked += 1
    assert checked > 0


def test_target_vocabulary_unreachable(tables):
    """A tr_-prefixed term exists in every non-empty target segment but in
    NO source posting — the search side is the source by construction."""
    src, tgt, alignment, postings, dictionary = tables
    probe = [{"term": "tr_fast"}]
    got = parallel_search(src, tgt, alignment, postings, dictionary,
                          probe, [], width=PAR_WIDTH)
    assert got.count() == 0
    # the term genuinely occurs on the target side (non-vacuity)
    from pyspark.sql import functions as F

    assert tgt.filter(F.col("text").contains("tr_fast")).count() > 0


def test_absent_term_empty_schema(tables):
    src, tgt, alignment, postings, dictionary = tables
    got = parallel_search(src, tgt, alignment, postings, dictionary,
                          [{"term": "zzz_never_a_token"}], [],
                          width=PAR_WIDTH)
    assert got.columns == ["pair_id", "doc_id", "pos", "left_ctx",
                           "keyword", "right_ctx", "tgt_id", "tgt_text"]
    assert got.count() == 0


def test_packed_twin_identical(spark, tables):
    """The index-backed path (packed_slot_search + shared assembly) must
    be row-identical to the corpus path — the shared-oracle contract."""
    corpus = registry_corpus.q_parallel_search(spark, SF0001).collect()
    packed = registry_corpus.q_parallel_search_packed(spark, SF0001).collect()
    assert packed == corpus and len(packed) > 0


def test_occurrence_count_identity(tables):
    """One output row per occurrence: Σ n_matches of the underlying
    slot_search equals the parallel result's row count."""
    from fastmorph_spark.search import engine

    src, tgt, alignment, postings, dictionary = tables
    matches = engine.slot_search(postings, dictionary, PAR_SLOTS, PAR_DISTS)
    total = sum(r.n_matches for r in matches.collect())
    got = parallel_search(src, tgt, alignment, postings, dictionary,
                          PAR_SLOTS, PAR_DISTS, width=PAR_WIDTH)
    assert got.count() == total
