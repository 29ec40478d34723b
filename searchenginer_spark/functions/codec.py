"""Posting-list codecs: delta + varbyte, numpy-vectorized.

The reference stores postings as plain text `word \\t docid weight ...`
(/root/reference/Make_Page/MakePage.cpp:196-215) and parses them back at
startup (srpc/PageSearch/ReadPage.cpp:185-250). At 10^12-file scale the
index must be compressed: classic delta + varbyte (VByte) over sorted
docIDs — the standard IR layout (Manning/Raghavan/Schütze IIR ch.5; also
what Lucene-era engines use). Implementation is pure numpy so it runs
inside Arrow UDF batches with zero per-row Python.

Encoding convention: little-endian 7-bit groups, high bit = continuation
(1 -> more bytes follow). Values are uint64.
"""

from __future__ import annotations

import numpy as np

_SEVEN = np.uint64(7)
_MASK7 = np.uint64(0x7F)
_CONT = np.uint8(0x80)
_MAX_GROUPS = 10  # ceil(64/7)


def varbyte_encode_raw(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode a uint64 array -> (uint8 byte array, per-value byte lengths).

    Vectorized: the only Python loop is over the <=10 byte positions.
    Exposing lengths lets callers batch-encode MANY posting lists in one
    call and slice per-group by byte offsets (cumsum of lengths).
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    # number of 7-bit groups per value (at least 1)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    for _ in range(_MAX_GROUPS):
        nbits += (tmp != 0).astype(np.int64)
        tmp >>= _SEVEN
    ngroups = np.maximum(nbits, 1)

    total = int(ngroups.sum())
    out = np.empty(total, dtype=np.uint8)
    # output offset of each value's first byte
    starts = np.concatenate(([0], np.cumsum(ngroups)[:-1]))
    for g in range(_MAX_GROUPS):
        sel = ngroups > g
        if not sel.any():
            break
        byte = ((v[sel] >> (_SEVEN * np.uint64(g))) & _MASK7).astype(np.uint8)
        is_last = ngroups[sel] == g + 1
        byte = np.where(is_last, byte, byte | _CONT)
        out[starts[sel] + g] = byte
    return out, ngroups


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array to varbyte bytes."""
    out, _ = varbyte_encode_raw(values)
    return out.tobytes()


def varbyte_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode varbyte bytes back to a uint64 array (fully vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & _CONT) == 0
    # group index per byte: 0-based position within its value
    starts = np.empty(b.shape, dtype=bool)
    starts[0] = True
    starts[1:] = is_last[:-1]
    value_idx = np.cumsum(starts) - 1
    start_pos = np.flatnonzero(starts)
    within = np.arange(b.size) - start_pos[value_idx]
    payload = (b & np.uint8(0x7F)).astype(np.uint64) << (_SEVEN * within.astype(np.uint64))
    # 7-bit groups occupy disjoint bit ranges -> OR-combine per value
    return np.bitwise_or.reduceat(payload, start_pos)


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing int64/uint64 -> first value + successive deltas."""
    a = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    if a.size == 0:
        return a
    out = np.empty_like(a)
    out[0] = a[0]
    np.subtract(a[1:], a[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(deltas.astype(np.uint64), dtype=np.uint64)


def encode_postings(doc_ids: np.ndarray) -> bytes:
    """sorted doc_ids -> varbyte(delta(doc_ids))."""
    return varbyte_encode(delta_encode(doc_ids))


def decode_postings(buf: bytes) -> np.ndarray:
    """varbyte bytes -> sorted doc_ids (int64)."""
    return delta_decode(varbyte_decode(buf)).astype(np.int64)
