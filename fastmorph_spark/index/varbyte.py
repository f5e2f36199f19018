"""T3-T5 — delta (gap) + varbyte (LEB128) posting compression, numpy-only.

BASELINE.json north_star mandates a "sorted, delta+varbyte-compressed
inverted index: term -> docID-gap posting lists". These kernels run inside
Arrow-batched pandas UDFs; every loop below is over BYTE POSITIONS (<=10)
or bounded widths, never over elements — no per-row Python [LIT: classic
varint/LEB128 posting compression, e.g. Dean WSDM'09].

Encoding: little-endian 7-bit groups, high bit = continuation.
Gap convention: gaps[0] = values[0] (raw), gaps[i] = values[i]-values[i-1];
every block is self-contained (its first doc id is stored raw).
"""

from __future__ import annotations

import numpy as np

_MAX_VB_BYTES = 10  # ceil(64/7)


def vb_encode_with_lengths(values: np.ndarray | list[int]) -> tuple[np.ndarray, np.ndarray]:
    """uint64 array -> (LEB128 uint8 array, per-value byte lengths).

    The lengths array lets callers slice the encoding of any CONTIGUOUS
    value range out of the group-level encoding without re-encoding —
    the packer encodes a whole (pack_bucket, doc_shard) group once and
    byte-slices per block."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    # bytes needed per value: 1 + number of 7-bit shifts still nonzero
    nb = np.ones(v.size, dtype=np.int64)
    for k in range(1, _MAX_VB_BYTES):
        nb += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(nb)[:-1]))
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    for j in range(_MAX_VB_BYTES):
        mask = nb > j
        if not mask.any():
            break
        chunk = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nb[mask] - 1 > j).astype(np.uint8) << 7
        out[offsets[mask] + j] = chunk.astype(np.uint8) | cont
    return out, nb


def vb_encode(values: np.ndarray | list[int]) -> bytes:
    """uint64 array -> LEB128 bytes (vectorized)."""
    out, _ = vb_encode_with_lengths(values)
    return out.tobytes()


def vb_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """LEB128 bytes -> uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray, memoryview)) else np.asarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero((b & 0x80) == 0)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lens = ends - starts + 1
    vals = np.zeros(ends.size, dtype=np.uint64)
    for j in range(int(lens.max())):
        mask = lens > j
        vals[mask] |= (b[starts[mask] + j] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * j)
    return vals


def delta_encode(sorted_values: np.ndarray) -> np.ndarray:
    """strictly-increasing uint64 -> gaps (first value raw)."""
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    if v.size == 0:
        return v
    return np.concatenate((v[:1], np.diff(v)))


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    g = np.ascontiguousarray(gaps, dtype=np.uint64)
    return np.cumsum(g, dtype=np.uint64)


def encode_doc_gaps(doc_ids: np.ndarray) -> bytes:
    return vb_encode(delta_encode(doc_ids))


def decode_doc_gaps(buf: bytes) -> np.ndarray:
    return delta_decode(vb_decode(buf))


def encode_positions(positions_per_doc: list[np.ndarray]) -> bytes:
    """Concatenate per-doc delta-encoded position lists; the tf array is
    the split-point metadata at decode time."""
    if not positions_per_doc:
        return b""
    parts = [delta_encode(np.asarray(p, dtype=np.uint64)) for p in positions_per_doc]
    return vb_encode(np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64))


def decode_positions(buf: bytes, tfs: np.ndarray) -> list[np.ndarray]:
    flat = vb_decode(buf)
    out: list[np.ndarray] = []
    off = 0
    for tf in np.asarray(tfs, dtype=np.int64):
        out.append(delta_decode(flat[off: off + tf]))
        off += tf
    return out
