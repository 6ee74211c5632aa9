"""Delta+varint codec roundtrip invariants (SURVEY.md §5: compressed-decode
roundtrip), including hypothesis property tests."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_analysis_combo_spark.operators.codec import (
    bm25_impact,
    decode_block,
    decode_positions,
    encode_block,
    varint_decode,
    varint_encode,
)

MIN_DOC = -(1 << 63)


def test_varint_known_values():
    vals = np.array([0, 1, 127, 128, 129, 300, 2**32, 2**63 - 1], dtype=np.uint64)
    enc = varint_encode(vals)
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert (varint_decode(enc) == vals).all()


def test_varint_empty():
    assert varint_encode(np.zeros(0, dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_varint_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (varint_decode(varint_encode(arr)) == arr).all()


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1,
             max_size=200, unique=True),
    st.data(),
)
def test_block_roundtrip_property(doc_ids, data):
    doc_ids = np.array(sorted(doc_ids), dtype=np.int64)
    n = doc_ids.size
    tfs = np.array(data.draw(st.lists(st.integers(1, 40), min_size=n, max_size=n)), dtype=np.int64)
    dls = np.array(data.draw(st.lists(st.integers(1, 3000), min_size=n, max_size=n)), dtype=np.int64)
    positions = [np.arange(1, t + 1, dtype=np.int64) * 2 for t in tfs]
    pos_flat = np.concatenate(positions).astype(np.uint64)
    blob, pos_blob = encode_block(doc_ids, tfs, dls, pos_flat, MIN_DOC)
    d, t, l = decode_block(blob, MIN_DOC, n)
    assert (d == doc_ids).all() and (t == tfs).all() and (l == dls).all()
    back = decode_positions(pos_blob, t)
    assert all((a == b).all() for a, b in zip(back, positions))


def test_bm25_impact_monotone_in_tf():
    tfs = np.arange(1, 100)
    dls = np.full(99, 500)
    imp = bm25_impact(tfs, dls, avgdl=400.0, k1=1.2, b=0.75)
    assert (np.diff(imp) > 0).all()
    assert (imp < 2.2).all()  # bounded by k1+1
