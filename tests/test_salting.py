"""SURVEY.md §5.3: salted pack output ≡ unsalted output on skewed data.

The salt is the doc-shard; packing the same skewed corpus with 1 shard
(unsalted) and many shards (salted) must decode to identical per-term
posting sequences, and WAND answers must be identical.
"""

from __future__ import annotations

import numpy as np
import pytest

from fastmorph_spark.index.io import build_index_frames
from fastmorph_spark.index.varbyte import vb_decode
from fastmorph_spark.search.wand import search_wand
from fastmorph_spark.sources import synth_corpus


@pytest.fixture(scope="module")
def skewed(spark):
    """5k-doc deterministic Zipf corpus: head terms have df ~= N."""
    return synth_corpus(spark, 5000, vocab_size=500, zipf_steps=8).cache()


def _decoded_postings(idx):
    """term -> [(doc_id, tf), ...] merged across shards in shard order."""
    out: dict[str, list[tuple[int, int]]] = {}
    rows = sorted(
        idx.postings.collect(),
        key=lambda r: (r["term"], r["doc_shard"], r["block_seq"]),
    )
    for r in rows:
        d = np.cumsum(vb_decode(r["doc_gaps"]).astype(np.int64))
        t = vb_decode(r["tfs"]).astype(np.int64)
        out.setdefault(r["term"], []).extend(zip(d.tolist(), t.tolist()))
    return out


def test_salted_equals_unsalted(spark, skewed):
    unsalted = build_index_frames(skewed, text_col="content", doc_shard_size=10**9, block_size=64)
    salted = build_index_frames(skewed, text_col="content", doc_shard_size=250, block_size=64)
    pu = _decoded_postings(unsalted)
    ps = _decoded_postings(salted)
    assert pu.keys() == ps.keys()
    for term in pu:
        assert pu[term] == ps[term], term
        docs = [d for d, _ in ps[term]]
        assert docs == sorted(docs)  # concatenation in shard order IS sorted
    # the hot head terms really are hot (the skew is exercised)
    df_by_term = {t: len(v) for t, v in pu.items()}
    assert max(df_by_term.values()) > 0.9 * 5000

    for q in ["t0 t1", "t0 t450", "t499"]:
        a = [(r["rank"], r["doc_id"], r["score"]) for r in search_wand(unsalted, q, k=10).collect()]
        b = [(r["rank"], r["doc_id"], r["score"]) for r in search_wand(salted, q, k=10).collect()]
        assert a == b, q
