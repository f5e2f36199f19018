"""M2/M3 — packed index build + WAND kernel correctness.

The single most bug-prone equivalence (SURVEY.md §5.3): WAND top-k ≡
exhaustive top-k. Tested three ways: against the Python oracle on the
fixture, prune=True ≡ prune=False on the packed index, and a pure-numpy
kernel property test on random corpora (no JVM in the loop).
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
import pytest

from fastmorph_spark.index.io import build_index_frames, read_index, write_index
from fastmorph_spark.search.wand import make_shard_kernel, search_wand
from fastmorph_spark.sources import read_documents
from tests.conftest import SF0001
from tests.oracle_bm25 import OracleIndex, load_documents

# small shards/blocks so the fixture corpus exercises multi-shard,
# multi-block paths
SHARD = 100
BLOCK = 16


@pytest.fixture(scope="module")
def packed_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx") / "sf0001")
    docs = read_documents(spark, SF0001)
    counters = write_index(spark, docs, out, doc_shard_size=SHARD, block_size=BLOCK)
    assert counters["n_postings"] > 0
    return read_index(spark, out), counters


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex(load_documents(SF0001))


QUERIES = ["fast hash join", "dup", "the", "zzz", "merge sort scan key order", "dup table the"]


@pytest.mark.parametrize("q", QUERIES)
def test_wand_rank_identical_to_oracle(packed_index, oracle, q):
    idx, _ = packed_index
    got = search_wand(idx, q, k=10).collect()
    exp = oracle.topk(q, 10)
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert math.isclose(r["score"], s, rel_tol=1e-9)


@pytest.mark.parametrize("q", QUERIES)
def test_wand_prune_equals_noprune(packed_index, q):
    idx, _ = packed_index
    a = search_wand(idx, q, k=10, prune=True).collect()
    b = search_wand(idx, q, k=10, prune=False).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in a] == \
           [(r["rank"], r["doc_id"], r["score"]) for r in b]


def test_index_invariants(packed_index, spark, oracle):
    """Σ tf per doc == doc_len; Σ df == distinct (term,doc); postings
    sorted and self-contained per block (SURVEY.md §5.4)."""
    idx, counters = packed_index
    from pyspark.sql import functions as F

    # dictionary df/cf vs oracle
    drows = {r["term"]: (r["df"], r["cf"]) for r in idx.dictionary.collect()}
    for t, plist in oracle.postings.items():
        assert drows[t][0] == len(plist)
        assert drows[t][1] == sum(len(v) for v in plist.values())
    # n_postings == total distinct (term, doc) pairs
    exp_postings = sum(len(v) for v in oracle.postings.values())
    assert counters["n_postings"] == exp_postings
    # per-block: decoded docs strictly increasing, within shard range
    from fastmorph_spark.index.varbyte import vb_decode

    for r in idx.postings.collect():
        d = np.cumsum(vb_decode(r["doc_gaps"]).astype(np.int64))
        assert (np.diff(d) > 0).all()
        assert d[0] == r["first_doc"] and d[-1] == r["max_doc"]
        assert d[0] // SHARD == r["doc_shard"] and d[-1] // SHARD == r["doc_shard"]
        assert len(d) == r["n_docs"] <= BLOCK
    # sha256 invariant: every indexed doc's hash matches the source
    src = read_documents(spark, SF0001).select("doc_id", F.sha2("text", 256).alias("h"))
    joined = idx.docs.join(src, "doc_id")
    assert joined.filter(F.col("content_sha256") != F.col("h")).count() == 0
    assert joined.count() == 500


def test_compression_ratio(packed_index):
    """BASELINE.md: varbyte payload must be well below raw int64 postings."""
    _, counters = packed_index
    raw_bytes = counters["n_postings"] * 8 * 2  # doc_id + tf as int64
    assert counters["payload_bytes"] < raw_bytes


def _kernel_vs_bruteforce(n_docs: int, vocab: int, seed: int, k: int = 10):
    """Pure-numpy property check: kernel(all blocks, 1 shard) ≡ brute force."""
    rng = random.Random(seed)
    docs = {
        d: " ".join(f"t{rng.randrange(vocab)}" for _ in range(rng.randrange(1, 30)))
        for d in range(n_docs)
    }
    oracle = OracleIndex(docs)
    qterms = sorted({f"t{rng.randrange(vocab)}" for _ in range(3)})
    q = " ".join(qterms)

    # pack blocks by hand (block size 4 to force many segments)
    from fastmorph_spark.index.pack import _impact_np
    from fastmorph_spark.index.varbyte import vb_encode

    rows = []
    for t in qterms:
        plist = oracle.postings.get(t, {})
        if not plist:
            continue
        ds = np.array(sorted(plist), dtype=np.int64)
        tfs = np.array([len(plist[d]) for d in ds], dtype=np.int64)
        dls = np.array([oracle.dl[d] for d in ds], dtype=np.int64)
        impacts = _impact_np(tfs, dls, oracle.avgdl)
        for lo in range(0, ds.size, 4):
            hi = min(lo + 4, ds.size)
            rows.append({
                "term": t, "first_doc": int(ds[lo]), "max_doc": int(ds[hi - 1]),
                "block_max_impact": float(impacts[lo:hi].max()),
                "doc_gaps": vb_encode(np.concatenate((ds[lo:lo+1], np.diff(ds[lo:hi]))).astype(np.uint64)),
                "tfs": vb_encode(tfs[lo:hi].astype(np.uint64)),
                "dls": vb_encode(dls[lo:hi].astype(np.uint64)),
            })
    term_meta = {t: (oracle.idf(t), 1e9) for t in qterms}
    kernel = make_shard_kernel(term_meta, oracle.n_docs, oracle.avgdl, k, prune=True)
    got = kernel(pd.DataFrame(rows)) if rows else pd.DataFrame({"doc_id": [], "score": []})
    got = got.sort_values(["score", "doc_id"], ascending=[False, True]).reset_index(drop=True)
    exp = oracle.topk(q, k)
    assert got["doc_id"].tolist() == [d for d, _ in exp], f"seed={seed} q={q}"
    for s_got, (_, s_exp) in zip(got["score"].tolist(), exp):
        assert math.isclose(s_got, s_exp, rel_tol=1e-9)


@pytest.mark.parametrize("seed", range(25))
def test_kernel_property_random_corpora(seed):
    _kernel_vs_bruteforce(n_docs=60, vocab=12, seed=seed)


@pytest.mark.parametrize("seed", range(25, 35))
def test_kernel_property_tie_heavy(seed):
    """Tiny vocab -> many equal scores -> exercises doc_id tie-breaking."""
    _kernel_vs_bruteforce(n_docs=80, vocab=3, seed=seed)
