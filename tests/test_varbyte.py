"""Property tests: varbyte/delta roundtrips (SURVEY.md §5.3)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fastmorph_spark.index.varbyte import (
    decode_doc_gaps,
    decode_positions,
    delta_decode,
    delta_encode,
    encode_doc_gaps,
    encode_positions,
    vb_decode,
    vb_encode,
)

uint64s = st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300)


@given(uint64s)
@settings(max_examples=300, deadline=None)
def test_vb_roundtrip(xs):
    got = vb_decode(vb_encode(np.array(xs, dtype=np.uint64)))
    assert got.tolist() == xs


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200, unique=True))
@settings(max_examples=300, deadline=None)
def test_gap_roundtrip(xs):
    xs = sorted(xs)
    got = decode_doc_gaps(encode_doc_gaps(np.array(xs, dtype=np.uint64)))
    assert got.tolist() == xs
    assert delta_decode(delta_encode(np.array(xs, dtype=np.uint64))).tolist() == xs


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**31), min_size=1, max_size=20, unique=True),
        max_size=30,
    )
)
@settings(max_examples=200, deadline=None)
def test_positions_roundtrip(plists):
    plists = [sorted(p) for p in plists]
    tfs = np.array([len(p) for p in plists], dtype=np.int64)
    got = decode_positions(encode_positions([np.array(p, dtype=np.uint64) for p in plists]), tfs)
    assert [g.tolist() for g in got] == plists


def test_edge_cases():
    assert vb_encode(np.empty(0, dtype=np.uint64)) == b""
    assert vb_decode(b"").tolist() == []
    assert vb_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert vb_decode(vb_encode(np.array([2**64 - 1], dtype=np.uint64))).tolist() == [2**64 - 1]
    # single-byte boundary
    assert vb_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert vb_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"


def test_compression_ratio_sane():
    """Small gaps must compress far below 8 bytes/posting (BASELINE.md)."""
    docs = np.arange(0, 100000, 3, dtype=np.uint64)
    blob = encode_doc_gaps(docs)
    assert len(blob) < docs.size * 2  # gaps of 3 -> 1 byte each (+first)
