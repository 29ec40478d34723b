from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchenginer_spark.functions.codec import (
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
def test_varbyte_roundtrip(vals):
    a = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(a)), a)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62), min_size=1, max_size=500, unique=True
    )
)
def test_postings_roundtrip(ids):
    a = np.array(sorted(ids), dtype=np.uint64)
    out = decode_postings(encode_postings(a))
    assert np.array_equal(out.astype(np.uint64), a)


def test_known_encodings():
    assert varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    # 128 = 0b1000_0000 -> low 7 bits 0 w/ cont bit, then 1
    assert varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varbyte_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    big = np.array([2**64 - 1], dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(big)), big)


def test_delta():
    a = np.array([3, 4, 10, 11, 500], dtype=np.uint64)
    d = delta_encode(a)
    assert d.tolist() == [3, 1, 6, 1, 489]
    assert np.array_equal(delta_decode(d), a)


def test_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0
    assert decode_postings(b"").size == 0


def test_compression_ratio_dense_ids():
    # dense sorted ids compress to ~1 byte per id
    a = np.arange(10_000, dtype=np.uint64) * 3 + 7
    enc = encode_postings(a)
    assert len(enc) < 10_000 * 2
