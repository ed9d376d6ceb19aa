"""Varbyte/delta codec round-trip properties."""

from __future__ import annotations

import numpy as np
from hypothesis import given
from hypothesis import strategies as st

from elasticsearch_spark.functions import codec


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
def test_varbyte_roundtrip(vals):
    enc = codec.varbyte_encode(np.array(vals, dtype=np.uint64))
    dec = codec.varbyte_decode(enc)
    assert dec.tolist() == vals


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200, unique=True))
def test_delta_roundtrip(vals):
    vals = sorted(vals)
    enc = codec.delta_encode(np.array(vals, dtype=np.int64))
    dec = codec.delta_decode(enc)
    assert dec.tolist() == vals


def test_known_encodings():
    assert codec.varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert codec.varbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert codec.varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert codec.varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert codec.varbyte_decode(b"").tolist() == []


def test_compression_is_real():
    # dense deltas should compress far below 8 bytes/posting
    ords = np.arange(0, 100000, 3, dtype=np.int64)
    enc = codec.delta_encode(ords)
    assert len(enc) == len(ords)  # deltas of 3 -> 1 byte each
