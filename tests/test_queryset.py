"""The rank-identity harness (BASELINE.md: 100% top-k rank-identical BM25
match rate on the reference query set): golden outputs re-derive
bit-for-bit from the oracle, and the engine matches them on every query."""

from __future__ import annotations

import json
import math

import pytest

from fastmorph_spark.index import build_dictionary, build_postings
from fastmorph_spark.index.io import build_index_frames
from fastmorph_spark.search.queryset import load_query_set, run_query, run_query_oracle
from fastmorph_spark.sources import read_documents
from tests.conftest import SF0001
from tests.oracle_bm25 import load_oracle

QUERIES = load_query_set("fixtures/queries.json")


@pytest.fixture(scope="module")
def golden():
    with open("fixtures/golden_topk.json") as f:
        return json.load(f)["sf0.001"]


@pytest.fixture(scope="module")
def oracle():
    return load_oracle(SF0001)


@pytest.fixture(scope="module")
def ctx(spark):
    docs = read_documents(spark, SF0001)
    idx = build_index_frames(docs, doc_shard_size=100, block_size=16)
    idx.postings = idx.postings.cache()
    idx.dictionary = idx.dictionary.cache()
    postings = build_postings(docs).cache()
    dictionary = build_dictionary(postings).cache()
    return docs, idx, postings, dictionary


def test_golden_rederives_bit_for_bit(golden, oracle):
    """Committed golden file == fresh oracle run (float repr equality)."""
    for spec in QUERIES:
        got = run_query_oracle(spec, oracle)
        exp = golden[spec["qid"]]
        if spec["mode"] == "bm25":
            assert [(g["rank"], g["doc_id"], g["score"]) for g in exp] == \
                   [(i + 1, d, repr(s)) for i, (d, s) in enumerate(got)], spec["qid"]
        else:
            got_norm = [list(g) if isinstance(g, tuple) else g for g in got]
            assert exp == got_norm, spec["qid"]


@pytest.mark.parametrize("spec", QUERIES, ids=[s["qid"] for s in QUERIES])
def test_engine_matches_golden(spark, ctx, golden, spec):
    """100% rank-identical match rate — every query, the driver metric."""
    docs, idx, postings, dictionary = ctx
    df = run_query(spec, docs, index=idx, postings=postings, dictionary=dictionary)
    rows = df.collect()
    exp = golden[spec["qid"]]
    if spec["mode"] == "bm25":
        assert [r["doc_id"] for r in rows] == [g["doc_id"] for g in exp], spec["qid"]
        for r, g in zip(rows, exp):
            assert math.isclose(r["score"], float(g["score"]), rel_tol=1e-9), spec["qid"]
    elif spec["mode"] == "wildcard":
        assert sorted(r["term"] for r in rows) == sorted(exp), spec["qid"]
    elif spec["mode"] == "or":
        assert [[r["doc_id"], r["n_terms"], r["total_tf"]] for r in rows] == exp, spec["qid"]
    elif spec["mode"] == "stem":
        assert [[r["doc_id"], r["total_tf"]] for r in rows] == exp, spec["qid"]
    elif spec["mode"] in ("slot", "slot_packed", "slot_packed_direct", "cql"):
        assert [[r["doc_id"], r["n_matches"], r["match_starts"]] for r in rows] == exp, spec["qid"]
    elif spec["mode"] == "kwic_packed":
        # fully pinned including the concordance text — the oracle holds
        # the token streams
        assert [[r["rank"], r["doc_id"], r["pos"], r["left_ctx"], r["keyword"],
                 r["right_ctx"], r["n_matches"], r["total_docs"],
                 r["total_matches"]] for r in rows] == exp, spec["qid"]
    elif spec["mode"] == "request_packed":
        # snippet/hl text is pinned by the driver oracle; the query-set
        # golden pins the structural columns per occurrence
        assert [[r["rank"], r["doc_id"], r["pos"], r["running_total"],
                 r["n_matches"], r["total_docs"], r["total_matches"]]
                for r in rows] == exp, spec["qid"]
    elif spec["mode"] == "collocations_packed":
        assert [[r["rank"], r["term"], r["cooc"], r["cf"]] for r in rows] == \
               [g[:4] for g in exp], spec["qid"]
        for r, g in zip(rows, exp):
            assert math.isclose(r["pmi"], float(g[4]), abs_tol=1e-6), spec["qid"]
    elif spec["mode"] == "offsets_packed":
        assert [[r["offset"], r["rank"], r["term"], r["cooc"]]
                for r in rows] == exp, spec["qid"]
    elif spec["mode"] == "mwe":
        assert [[r["rank"], r["w1"], r["w2"], r["f_xy"], r["f_x"], r["f_y"]]
                for r in rows] == [g[:6] for g in exp], spec["qid"]
        for r, g in zip(rows, exp):
            assert math.isclose(r["logdice"], float(g[6]), abs_tol=1e-6), spec["qid"]
    elif spec["mode"] == "keyness":
        assert [[r["rank"], r["term"], r["f_focus"], r["f_ref"]] for r in rows] \
               == [g[:4] for g in exp], spec["qid"]
        for r, g in zip(rows, exp):
            assert math.isclose(r["g2"], float(g[4]), abs_tol=1e-6), spec["qid"]
            assert math.isclose(r["log_ratio"], float(g[5]), abs_tol=1e-6), spec["qid"]
    elif spec["mode"] == "mlt_packed":
        assert [[r["rank"], r["doc_id"]] for r in rows] == \
               [g[:2] for g in exp], spec["qid"]
        for r, g in zip(rows, exp):
            assert math.isclose(r["score"], float(g[2]), abs_tol=1e-6), spec["qid"]
    elif spec["mode"] == "qlang":
        # rounded-score ranking (querylang pins ties on the ROUNDED
        # score), so exact equality on all three columns is safe
        assert [[r["rank"], r["doc_id"]] for r in rows] == \
               [g[:2] for g in exp], spec["qid"]
        for r, g in zip(rows, exp):
            assert math.isclose(r["score"], float(g[2]), abs_tol=1e-9), spec["qid"]
    elif spec["mode"] == "within_sentence_indexed":
        assert [[r["doc_id"], r["sent_id"]] for r in rows] == exp, spec["qid"]
    elif spec["mode"] == "facets":
        assert [[r["facet"], r["value"], r["n_docs"]] for r in rows] == exp, spec["qid"]
    else:
        assert sorted(r["doc_id"] for r in rows) == exp, spec["qid"]


@pytest.fixture(scope="module")
def lang_ctx(spark):
    from fastmorph_spark.index.io import build_lang_indexes

    docs = read_documents(spark, SF0001)
    return docs, build_lang_indexes(docs, doc_shard_size=100, block_size=16)


LANG_SPECS = [s for s in QUERIES if s["mode"] == "bm25" and s.get("filter_lang")]


@pytest.mark.parametrize("spec", LANG_SPECS, ids=[s["qid"] for s in LANG_SPECS])
def test_lang_index_wand_matches_golden(spark, lang_ctx, golden, spec):
    """Lang-filtered BM25 through the PER-LANG packed index (WAND) is
    rank-identical to the filtered oracle — the indexed fast path for the
    round-1 latency tail, not just the expression fallback."""
    docs, lang_idx = lang_ctx
    df = run_query(spec, docs, lang_indexes=lang_idx)
    rows = df.collect()
    exp = golden[spec["qid"]]
    assert [r["doc_id"] for r in rows] == [g["doc_id"] for g in exp], spec["qid"]
    for r, g in zip(rows, exp):
        assert math.isclose(r["score"], float(g["score"]), rel_tol=1e-9), spec["qid"]


def test_lang_indexes_roundtrip_disk(spark, lang_ctx, golden, tmp_path_factory):
    """write_lang_indexes -> read_lang_indexes: the at-rest per-lang
    layout answers the lang-filtered golden queries rank-identically to
    the in-memory per-lang indexes."""
    from fastmorph_spark.index.io import read_lang_indexes, write_lang_indexes

    docs, _ = lang_ctx
    out = str(tmp_path_factory.mktemp("li") / "idx")
    counters = write_lang_indexes(spark, docs, out, doc_shard_size=100, block_size=16)
    assert set(counters) == {r[0] for r in docs.select("lang").distinct().collect()}
    disk = read_lang_indexes(spark, out)
    assert set(disk) == set(counters)
    for spec in LANG_SPECS:
        rows = run_query(spec, docs, lang_indexes=disk).collect()
        exp = golden[spec["qid"]]
        assert [r["doc_id"] for r in rows] == [g["doc_id"] for g in exp], spec["qid"]
        for r, g in zip(rows, exp):
            assert math.isclose(r["score"], float(g["score"]), rel_tol=1e-9), spec["qid"]
