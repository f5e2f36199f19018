"""Parity of the packed-index query paths (search/packed.py) with the
corpus-built logical-postings paths — decode roundtrip + operator-level
result identity. The packed path exists so phrase/slot/boolean queries
never re-tokenize the corpus at query time (100 TB shape)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastmorph_spark.index.build import build_dictionary, build_postings
from fastmorph_spark.index.io import build_index_frames
from fastmorph_spark.search import engine
from fastmorph_spark.search.packed import (
    decoded_postings,
    packed_and_search,
    packed_or_search,
    packed_phrase_search,
    packed_proximity_search,
    packed_slot_search,
)
from fastmorph_spark.sources import read_documents
from tests.conftest import SF0001


@pytest.fixture(scope="module")
def ctx(spark):
    docs = read_documents(spark, SF0001)
    idx = build_index_frames(docs, doc_shard_size=100, block_size=16,
                             pack_partitions=8)
    idx.postings = idx.postings.persist()
    idx.postings.count()
    postings = build_postings(docs).persist()
    dictionary = build_dictionary(postings)
    yield docs, idx, postings, dictionary
    idx.postings.unpersist()
    postings.unpersist()


def test_decoded_postings_roundtrip(ctx):
    """decode(pack(postings)) == postings for a term subset, positions
    included — the end-to-end inverse property of the physical layout."""
    _, idx, postings, _ = ctx
    terms = ["fast", "join", "scan", "the"]
    want = {
        (r["term"], r["doc_id"]): (r["tf"], list(r["positions"]))
        for r in postings.filter(F.col("term").isin(terms)).collect()
    }
    got = {
        (r["term"], r["doc_id"]): (r["tf"], list(r["positions"]))
        for r in decoded_postings(idx, terms).collect()
    }
    assert got == want and len(got) > 50


def test_decoded_postings_absent_and_empty(ctx, spark):
    _, idx, *_ = ctx
    assert decoded_postings(idx, []).count() == 0
    assert decoded_postings(idx, ["zzz_not_a_term_zzz"]).count() == 0


def test_packed_phrase_parity(ctx):
    _, idx, postings, _ = ctx
    want = [r["doc_id"] for r in engine.phrase_search(postings, "order fast").collect()]
    got = [r["doc_id"] for r in packed_phrase_search(idx, "order fast").collect()]
    assert got == want and len(got) > 0


def test_packed_proximity_parity(ctx):
    _, idx, postings, _ = ctx
    want = [r["doc_id"] for r in engine.proximity_search(postings, "fast", "join", 1, 5).collect()]
    got = [r["doc_id"] for r in packed_proximity_search(idx, "fast", "join", 1, 5).collect()]
    assert got == want and len(got) > 0


def test_packed_slot_parity_wildcard_and_stem(ctx):
    _, idx, postings, dictionary = ctx
    slots = [{"term": "fast"}, {"pattern": "h*"}, {"stem": "joins"}]
    dists = [(1, 3), (1, 5)]
    want = [(r["doc_id"], r["n_matches"], r["match_starts"])
            for r in engine.slot_search(postings, dictionary, slots, dists).collect()]
    got = [(r["doc_id"], r["n_matches"], r["match_starts"])
           for r in packed_slot_search(idx, slots, dists).collect()]
    assert got == want


def test_packed_boolean_parity(ctx):
    _, idx, postings, _ = ctx
    q = "fast hash join"
    want_and = [r["doc_id"] for r in engine.and_search(postings, q).collect()]
    got_and = [r["doc_id"] for r in packed_and_search(idx, q).collect()]
    assert sorted(got_and) == sorted(want_and) and len(got_and) > 0
    want_or = [(r["doc_id"], r["n_terms"], r["total_tf"])
               for r in engine.or_search(postings, q).collect()]
    got_or = [(r["doc_id"], r["n_terms"], r["total_tf"])
              for r in packed_or_search(idx, q).collect()]
    assert got_or == want_or


def test_packed_slot_predicate_path_parity(ctx):
    """Huge-expansion guard: with max_expansion forced to 0 every
    wildcard/stem slot overflows the driver-side enumeration and the
    whole query runs predicate-direct (no collect of expanded terms, no
    broadcast term list; engine gets dictionary=None) — results must be
    identical to the enumerate path and the corpus path."""
    from fastmorph_spark.search.packed import _expand_slot_term_groups

    _, idx, postings, dictionary = ctx
    slots = [{"term": "fast"}, {"pattern": "h*"}, {"stem": "joins"}]
    dists = [(1, 3), (1, 5)]
    assert _expand_slot_term_groups(idx, slots, max_expansion=0) is None
    want = [(r["doc_id"], r["n_matches"], r["match_starts"])
            for r in engine.slot_search(postings, dictionary, slots, dists).collect()]
    got = [(r["doc_id"], r["n_matches"], r["match_starts"])
           for r in packed_slot_search(idx, slots, dists, max_expansion=0).collect()]
    assert got == want and len(got) > 0


def test_packed_request_predicate_path_parity(ctx):
    """O7 lifecycle on the predicate-direct path == the enumerate path."""
    from fastmorph_spark.search.packed import packed_search_request

    docs, idx, *_ = ctx
    slots, dists = [{"term": "fast"}, {"pattern": "h*"}], [(1, 4)]
    cols = ["rank", "doc_id", "pos", "hl_offset", "snippet",
            "running_total", "n_matches", "total_docs", "total_matches"]
    want = [tuple(r[c] for c in cols)
            for r in packed_search_request(docs, idx, slots, dists,
                                           skip=2, until=12, width=2).collect()]
    got = [tuple(r[c] for c in cols)
           for r in packed_search_request(docs, idx, slots, dists, skip=2,
                                          until=12, width=2, max_expansion=0).collect()]
    assert got == want and len(got) > 0


def test_predicate_path_block_skip(disjoint_idx):
    """Doc-range pruning still engages on the predicate-direct path: the
    single-pass metadata group-membership (array_compact + explode) skips
    every block for slots with disjoint doc ranges."""
    from fastmorph_spark.search.packed import _slot_pred, decoded_postings_pred

    _, idx = disjoint_idx
    slots = [{"term": "aaa"}, {"pattern": "b*"}]
    dec = decoded_postings_pred(idx, [_slot_pred(s) for s in slots])
    assert dec.count() == 0
    assert packed_slot_search(idx, slots, [(1, 10)], max_expansion=0).count() == 0
    # rare AND common via predicates: 'ccc' decoded only where 'aaa' lives
    slots2 = [{"term": "aaa"}, {"pattern": "c*"}]
    dec2 = decoded_postings_pred(idx, [_slot_pred(s) for s in slots2])
    assert sorted(set(r["doc_id"] for r in dec2.collect())) == list(range(80))
    got = [r["doc_id"]
           for r in packed_slot_search(idx, slots2, [(1, 2)], max_expansion=0).collect()]
    assert got == list(range(80))


def test_packed_case_slot_rejected(ctx):
    _, idx, *_ = ctx
    with pytest.raises(ValueError):
        packed_slot_search(idx, [{"term": "FAST", "case": True}], [])


def test_packed_search_request_parity(ctx):
    """O7 over the packed index == O7 over corpus-built postings (the
    full request lifecycle never re-tokenizes the corpus except for the
    <= until-doc snippet join)."""
    from fastmorph_spark.search.packed import packed_search_request

    docs, idx, postings, dictionary = ctx
    slots, dists = [{"term": "fast"}, {"pattern": "h*"}], [(1, 4)]
    cols = ["rank", "doc_id", "pos", "hl_offset", "snippet",
            "running_total", "n_matches", "total_docs", "total_matches"]
    want = [tuple(r[c] for c in cols)
            for r in engine.search_request(docs, postings, dictionary, slots, dists,
                                           skip=2, until=12, width=2).collect()]
    got = [tuple(r[c] for c in cols)
           for r in packed_search_request(docs, idx, slots, dists,
                                          skip=2, until=12, width=2).collect()]
    assert got == want and len(got) > 0


@pytest.fixture(scope="module")
def disjoint_idx(spark):
    """Constructed corpus where 'aaa' lives only in docs 0..79 and 'bbb'
    only in docs 200..279 (disjoint doc ranges, several shards apart);
    'ccc' is everywhere. shard=20 docs, block=8."""
    rows = []
    for i in range(80):
        rows.append((i, "aaa ccc filler"))
    for i in range(200, 280):
        rows.append((i, "bbb ccc filler"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index_frames(docs, doc_shard_size=20, block_size=8,
                             pack_partitions=4)
    idx.postings = idx.postings.persist()
    idx.postings.count()
    yield docs, idx
    idx.postings.unpersist()


def test_block_skip_disjoint_ranges(disjoint_idx):
    """Doc-range block-skip pruning: when the query's terms occupy
    disjoint doc ranges, the metadata intersection skips EVERY block —
    zero payload decode (VERDICT r02 next-round item #3's done bar)."""
    from fastmorph_spark.search.packed import pruned_blocks

    _, idx = disjoint_idx
    total = pruned_blocks(idx, ["aaa", "bbb"]).count()
    assert total > 0
    # below the Σdf gate the pruning stays off (fixed cost > payoff)...
    assert pruned_blocks(idx, ["aaa", "bbb"], [["aaa"], ["bbb"]]).count() == total
    # ...forced on (prune_min_postings=0 — the at-scale regime), the
    # metadata intersection skips EVERY block
    pruned = pruned_blocks(idx, ["aaa", "bbb"], [["aaa"], ["bbb"]],
                           prune_min_postings=0).count()
    assert pruned == 0
    # AND semantics stay correct through the pruned (empty) decode
    from fastmorph_spark.search import engine
    from fastmorph_spark.search.packed import decoded_postings

    dec = decoded_postings(idx, ["aaa", "bbb"], [["aaa"], ["bbb"]],
                           prune_min_postings=0)
    assert engine.and_search(dec, "aaa bbb").count() == 0
    assert packed_and_search(idx, "aaa bbb").count() == 0


def test_block_skip_common_term_restricted(disjoint_idx):
    """'rare AND common': the common term's blocks are decoded only in
    the rare term's shards — the big win at scale."""
    from fastmorph_spark.search.packed import pruned_blocks

    from fastmorph_spark.search import engine
    from fastmorph_spark.search.packed import decoded_postings

    _, idx = disjoint_idx
    all_ccc = pruned_blocks(idx, ["aaa", "ccc"]).filter(F.col("term") == "ccc").count()
    kept_ccc = pruned_blocks(idx, ["aaa", "ccc"], [["aaa"], ["ccc"]],
                             prune_min_postings=0) \
        .filter(F.col("term") == "ccc").count()
    assert 0 < kept_ccc < all_ccc
    # and results are unchanged through the forced-pruned decode:
    # every 'aaa' doc also holds 'ccc'
    dec = decoded_postings(idx, ["aaa", "ccc"], [["aaa"], ["ccc"]],
                           prune_min_postings=0)
    got = sorted(r["doc_id"] for r in engine.and_search(dec, "aaa ccc").collect())
    assert got == list(range(80))
    assert sorted(r["doc_id"] for r in packed_and_search(idx, "aaa ccc").collect()) == got


@pytest.fixture(scope="module")
def case_ctx(spark):
    """Deterministically case-varied corpus (every 3rd doc upper-cased —
    the slot_case_search convention) + its case_sensitive=True packed
    index and the corpus-built twin tables."""
    docs = read_documents(spark, SF0001).withColumn(
        "text",
        F.when(F.col("doc_id") % 3 == 0, F.upper("text")).otherwise(F.col("text")),
    )
    idx = build_index_frames(docs, doc_shard_size=100, block_size=16,
                             pack_partitions=8, case_sensitive=True)
    idx.postings = idx.postings.persist()
    idx.postings_cs = idx.postings_cs.persist()
    postings = build_postings(docs).persist()
    dictionary = build_dictionary(postings)
    postings_cs = build_postings(docs, fold_case=False).persist()
    dictionary_cs = build_dictionary(postings_cs)
    yield docs, idx, postings, dictionary, postings_cs, dictionary_cs
    for df in (idx.postings, idx.postings_cs, postings, postings_cs):
        df.unpersist()


def test_packed_case_slot_parity(case_ctx):
    """{"case": True} slots over the PACKED cs twin == the corpus path
    (VERDICT r03 #1): cs exact term + folded wildcard, enumerate path."""
    _, idx, postings, dictionary, postings_cs, dictionary_cs = case_ctx
    slots = [{"term": "FAST", "case": True}, {"pattern": "h*"}]
    dists = [(1, 4)]
    want = [tuple(r) for r in engine.slot_search(
        postings, dictionary, slots, dists,
        postings_cs=postings_cs, dictionary_cs=dictionary_cs).collect()]
    got = [tuple(r) for r in packed_slot_search(idx, slots, dists).collect()]
    assert got == want and len(got) > 0
    # predicate-direct regime (max_expansion=0): no driver enumeration,
    # cs + folded predicates run straight on each twin's block scan
    direct = [tuple(r) for r in
              packed_slot_search(idx, slots, dists, max_expansion=0).collect()]
    assert direct == want


def test_packed_case_wildcard_slot_parity(case_ctx):
    """A case-SENSITIVE WILDCARD slot (cs dictionary expansion): `FA*`
    matches only the upper-cased docs' tokens."""
    _, idx, postings, dictionary, postings_cs, dictionary_cs = case_ctx
    slots = [{"pattern": "FA*", "case": True}, {"term": "join"}]
    dists = [(1, 5)]
    want = [tuple(r) for r in engine.slot_search(
        postings, dictionary, slots, dists,
        postings_cs=postings_cs, dictionary_cs=dictionary_cs).collect()]
    got = [tuple(r) for r in packed_slot_search(idx, slots, dists).collect()]
    assert got == want and len(got) > 0
    direct = [tuple(r) for r in
              packed_slot_search(idx, slots, dists, max_expansion=0).collect()]
    assert direct == want


def test_packed_case_requires_cs_twin(spark):
    """Without the cs twin the packed path must refuse loudly (never
    silently fold)."""
    docs = read_documents(spark, SF0001)
    idx = build_index_frames(docs, doc_shard_size=100, block_size=16,
                             pack_partitions=8)
    with pytest.raises(ValueError, match="case-preserving twin"):
        packed_slot_search(idx, [{"term": "FAST", "case": True}], [])


def test_packed_case_request_parity(case_ctx):
    """packed_search_request with a cs slot == engine.search_request —
    the full lifecycle routes through the twin decode."""
    docs, idx, postings, dictionary, postings_cs, dictionary_cs = case_ctx
    slots = [{"term": "FAST", "case": True}, {"pattern": "h*"}]
    dists = [(1, 4)]
    from fastmorph_spark.search.packed import packed_search_request

    want = [tuple(r) for r in engine.search_request(
        docs, postings, dictionary, slots, dists, skip=0, until=10, width=2,
        postings_cs=postings_cs, dictionary_cs=dictionary_cs).collect()]
    got = [tuple(r) for r in packed_search_request(
        docs, idx, slots, dists, skip=0, until=10, width=2).collect()]
    assert got == want and len(got) > 0


def test_case_twin_disk_roundtrip(spark, tmp_path_factory):
    """write_index(case_sensitive=True) -> read_index rediscovers the cs
    twin and answers case-slot queries identically to the in-memory
    build; an index written WITHOUT the twin reads back with
    postings_cs=None and refuses case slots loudly."""
    from fastmorph_spark.index.io import read_index, write_index

    docs = read_documents(spark, SF0001).withColumn(
        "text",
        F.when(F.col("doc_id") % 3 == 0, F.upper("text")).otherwise(F.col("text")),
    )
    out = str(tmp_path_factory.mktemp("cs_idx") / "idx")
    write_index(spark, docs, out, doc_shard_size=100, block_size=16,
                case_sensitive=True)
    idx = read_index(spark, out)
    assert idx.postings_cs is not None and idx.dictionary_cs is not None
    slots = [{"term": "FAST", "case": True}, {"pattern": "h*"}]
    dists = [(1, 4)]
    mem = build_index_frames(docs, doc_shard_size=100, block_size=16,
                             pack_partitions=8, case_sensitive=True)
    want = [tuple(r) for r in packed_slot_search(mem, slots, dists).collect()]
    got = [tuple(r) for r in packed_slot_search(idx, slots, dists).collect()]
    assert got == want and len(got) > 0

    out2 = str(tmp_path_factory.mktemp("cs_idx") / "plain")
    write_index(spark, docs, out2, doc_shard_size=100, block_size=16)
    idx2 = read_index(spark, out2)
    assert idx2.postings_cs is None
    with pytest.raises(ValueError, match="case-preserving twin"):
        packed_slot_search(idx2, slots, dists)
