"""Vectorized delta + varint posting-block codec (SURVEY.md §2 B4).

The reference delegates posting compression to its Lucene 4.6 host
(pom.xml:41-42); the standard published format is delta-encoded docID gaps
with variable-byte integers and per-block skip/max metadata (Lucene
postings; see also the block-max WAND literature, Ding & Suel 2011). This
module implements that from scratch in numpy — no per-value Python in either
direction:

* encode: per-value byte lengths via bit_length, single allocation, one
  masked write per varint byte position (<=10 passes, each whole-array).
* decode: terminator scan (`byte < 0x80`), segmented accumulate with one
  masked pass per byte position.

Block layout (one posting block, default 128 docs):
  ``data``     — varint stream of interleaved (doc_gap, tf, dl) triples;
                 first gap is relative to ``prev_last_doc`` handed in by the
                 caller (blocks are independent given their header).
  ``pos_data`` — varint stream of within-doc position deltas (first absolute),
                 doc-concatenated; per-doc counts are the decoded tfs.
  header       — first_doc, last_doc, n, max_impact (BM25 tf-saturation
                 upper bound; idf is a per-term constant applied at query
                 time, so block-max pruning stays exact).
"""

from __future__ import annotations

import numpy as np


def varint_encode(vals: np.ndarray) -> bytes:
    """Encode a uint64 array as a concatenated LEB128-style varint stream."""
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    if vals.size == 0:
        return b""
    # bytes needed per value: ceil(bit_length/7), min 1
    nbits = np.zeros(vals.shape, dtype=np.int64)
    tmp = vals.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(1)
    nbytes = np.maximum((nbits + 6) // 7, 1)
    offsets = np.concatenate([[0], np.cumsum(nbytes)[:-1]])
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    max_len = int(nbytes.max())
    for i in range(max_len):
        mask = nbytes > i
        byte = (vals[mask] >> np.uint64(7 * i)).astype(np.uint64) & np.uint64(0x7F)
        more = nbytes[mask] > (i + 1)
        out[offsets[mask] + i] = byte.astype(np.uint8) | (more.astype(np.uint8) << 7)
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode a varint stream back to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    ends = np.nonzero(b < 0x80)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    vals = np.zeros(ends.size, dtype=np.uint64)
    for i in range(int(lens.max())):
        mask = lens > i
        vals[mask] |= (b[starts[mask] + i] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * i)
    return vals


def encode_block(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    positions: list[np.ndarray] | None,
    prev_last_doc: int,
) -> tuple[bytes, bytes]:
    """Encode one block of postings (sorted by doc_id ascending).

    doc_ids may be negative (xxhash64 docIDs are signed); they are biased to
    unsigned space by the caller-invariant mapping doc_id - INT64_MIN, which
    preserves order. Returns (data, pos_data)."""
    gaps = np.empty(doc_ids.size, dtype=np.uint64)
    u = doc_ids.astype(np.int64).astype(np.uint64) ^ np.uint64(1 << 63)
    prev = np.uint64(np.int64(prev_last_doc)) ^ np.uint64(1 << 63)
    gaps[0] = u[0] - prev
    gaps[1:] = u[1:] - u[:-1]
    triples = np.empty(doc_ids.size * 3, dtype=np.uint64)
    triples[0::3] = gaps
    triples[1::3] = tfs.astype(np.uint64)
    triples[2::3] = dls.astype(np.uint64)
    data = varint_encode(triples)
    pos_data = b""
    if positions is not None:
        deltas = []
        for p in positions:
            p = np.asarray(p, dtype=np.uint64)
            d = np.empty_like(p)
            if p.size:
                d[0] = p[0]
                d[1:] = p[1:] - p[:-1]
            deltas.append(d)
        if deltas:
            pos_data = varint_encode(np.concatenate(deltas))
    return data, pos_data


def decode_block(
    data: bytes, prev_last_doc: int, n: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode (doc_ids, tfs, dls) from one block's data stream."""
    triples = varint_decode(data)
    assert triples.size == 3 * n, f"block decode: {triples.size} != 3*{n}"
    gaps = triples[0::3]
    tfs = triples[1::3].astype(np.int64)
    dls = triples[2::3].astype(np.int64)
    prev = np.uint64(np.int64(prev_last_doc)) ^ np.uint64(1 << 63)
    u = np.cumsum(gaps, dtype=np.uint64) + prev
    doc_ids = (u ^ np.uint64(1 << 63)).astype(np.int64)
    return doc_ids, tfs, dls


def decode_positions(pos_data: bytes, tfs: np.ndarray) -> list[np.ndarray]:
    """Split + de-delta the block's position stream using decoded tfs."""
    flat = varint_decode(pos_data)
    out = []
    off = 0
    for tf in tfs:
        d = flat[off:off + int(tf)]
        out.append(np.cumsum(d).astype(np.int64))
        off += int(tf)
    return out


def bm25_impact(tfs: np.ndarray, dls: np.ndarray, avgdl: float, k1: float, b: float) -> np.ndarray:
    """Per-posting BM25 tf-saturation term (idf excluded):
    tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))."""
    tfs = tfs.astype(np.float64)
    dls = dls.astype(np.float64)
    return tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / avgdl))
