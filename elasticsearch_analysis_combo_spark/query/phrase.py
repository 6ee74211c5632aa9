"""Phrase matching (exact and sloppy) over the positional posting index.

This is what the posting ``positions`` payload exists for (SURVEY.md §1.3:
absolute positions are "what BM25 positions/phrase data need"). A phrase
"w1 w2 ... wn" matches where the terms' absolute positions are consecutive
(pos_{i+1} = pos_i + 1 — same definition Lucene's exact PhraseQuery uses
over its position postings).

Sloppy matching (``slop=N``) uses Lucene's PhraseQuery matchLength
criterion: writing pp_i = pos_i - slot_i ("phrase position"), a slot
assignment matches when max(pp) - min(pp) <= slop — so "b a" matches the
phrase "a b" at slop 2 (one transposition = two position moves) and
"a x b" matches at slop 1, exactly as Lucene scores them. ``n_matches``
counts the distinct first-slot occurrences that participate in at least
one valid assignment; at slop=0 this reduces to the exact-adjacency count.
(Simplification vs Lucene: repeated query terms may align to the same
occurrence; Lucene forces distinct positions for repeated terms.)

Evaluation is fully batch-vectorized — no per-doc Python loop. Each
slot's postings become sorted int64 keys ``common_doc_index * 2^31 +
(pp + 2^30)``; a valid anchor is a slot-0 key for which every other slot
has a key inside the anchor's slop window, checked with two searchsorted
passes per (slot, window-offset) over the whole candidate batch.

Two physical strategies, mirroring WAND (query/wand.py):

* ``phrase_match`` — one task per query; the phrase's terms' compressed
  posting rows gather to that task. Fine for selective phrases.
* ``phrase_match_partitioned`` — one task per (query, doc-range): each
  compressed block ships only to the doc-id ranges its [first_doc,
  last_doc] span overlaps, every range intersects positions for its own
  docs, and the union of ranges is the answer (ranges partition the doc
  space, so no global dedup is needed). This is the scale-safe path for
  stop-word phrases ("of the") whose two posting lists would otherwise
  concentrate in a single Python worker.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from elasticsearch_analysis_combo_spark.analysis.combo import (
    ComboConfig,
    analyze_text,
)
from elasticsearch_analysis_combo_spark.operators.codec import (
    decode_block,
    decode_positions_flat,
)
from elasticsearch_analysis_combo_spark.operators.postings import (
    MIN_DOC,
    decode_segment_blocks_flat,
)

PHRASE_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.IntegerType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_matches", T.LongType()),
    ]
)

# key packing: doc-index band of 2^31, positions biased by 2^30 so pp
# (position minus slot) stays positive. Bounds asserted in _match_phrase.
_POS_BIAS = 1 << 30
_BAND = np.int64(1 << 31)


def analyze_phrases(
    queries: list[tuple[int, str]], config: ComboConfig
) -> list[tuple[int, int, str]]:
    """(query_id, text) -> (query_id, slot, term) rows; slot is the term's
    order in the phrase (repeated terms keep their slots)."""
    out = []
    for qid, text in queries:
        toks = analyze_text(text, config)
        for slot, t in enumerate(toks):
            out.append((qid, slot, t.term))
    return out


def _empty_pdf(qid: int | None = None) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "query_id": pd.Series([], dtype="int32"),
            "doc_id": pd.Series([], dtype="int64"),
            "n_matches": pd.Series([], dtype="int64"),
        }
    )


def _slot_keys(docs, offs, pos_flat, common, slot: int) -> np.ndarray:
    """Sorted unique keys (common_idx * BAND + pos - slot + BIAS) for one
    slot, restricted to the common docs. Vectorized gather (no per-doc
    loop): per-common-doc position slices are flattened via repeat/cumsum
    index arithmetic."""
    idx = np.searchsorted(docs, common)
    starts = offs[idx]
    lens = (offs[idx + 1] - starts).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    out_off = np.cumsum(lens) - lens
    gidx = (
        np.arange(total, dtype=np.int64)
        - np.repeat(out_off, lens)
        + np.repeat(starts, lens)
    )
    cidx = np.repeat(np.arange(common.size, dtype=np.int64), lens)
    pp = pos_flat[gidx].astype(np.int64) - slot + _POS_BIAS
    keys = cidx * _BAND + pp
    # sorted by construction (cidx ascending, positions ascending per doc);
    # dedupe adjacent repeats (same term emitted at one position by several
    # sub-analyzers when deduplication=False)
    if keys.size > 1:
        keep = np.empty(keys.size, dtype=bool)
        keep[0] = True
        np.not_equal(keys[1:], keys[:-1], out=keep[1:])
        keys = keys[keep]
    return keys


def _match_phrase(
    decoded: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],
    slots: list[tuple[int, str]],
    slop: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Batch phrase evaluation. ``decoded``: term -> (docs, offs, pos_flat)
    with docs sorted unique and offs the per-doc prefix offsets into
    pos_flat. Returns (doc_ids, n_matches) for matching docs."""
    empty = (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64))
    terms = [t for _, t in slots]
    for t in terms:
        if t not in decoded or decoded[t][0].size == 0:
            return empty
    common = None
    for t in dict.fromkeys(terms):  # distinct, first-seen order
        d = decoded[t][0]
        common = d if common is None else np.intersect1d(
            common, d, assume_unique=True
        )
        if common.size == 0:
            return empty
    assert common.size < (1 << 32), "phrase candidate set exceeds key space"
    keys_by_slot = []
    for slot, t in sorted(slots):
        docs, offs, pos_flat = decoded[t]
        if pos_flat.size:
            assert int(pos_flat.max()) < _POS_BIAS - slop - 1, (
                "document positions exceed phrase key space"
            )
        keys_by_slot.append(_slot_keys(docs, offs, pos_flat, common, slot))
    anchors = keys_by_slot[0]
    if anchors.size == 0:
        return empty
    valid = np.zeros(anchors.size, dtype=bool)
    for m in range(-slop, 1):
        ok = np.ones(anchors.size, dtype=bool)
        for keys in keys_by_slot[1:]:
            lo = anchors + m
            hi = anchors + m + slop
            left = np.searchsorted(keys, lo, side="left")
            right = np.searchsorted(keys, hi, side="right")
            ok &= left < right
            if not ok.any():
                break
        valid |= ok
        if valid.all():
            break
    if not valid.any():
        return empty
    cidx = (anchors[valid] // _BAND).astype(np.int64)
    counts = np.bincount(cidx, minlength=common.size)
    hit = counts > 0
    return common[hit], counts[hit]


def _decode_rows(rows_by_term: dict[str, dict[int, list]]) -> dict:
    """term -> (docs, offs, pos_flat) from (run_idx -> blocks) maps; runs
    concatenate in run_idx order (stays doc-sorted)."""
    decoded = {}
    for term, runs in rows_by_term.items():
        blocks = [bl for ri in sorted(runs) for bl in runs[ri]]
        d, t, _l, pos_flat = decode_segment_blocks_flat(blocks, True)
        offs = np.concatenate([[0], np.cumsum(t.astype(np.int64))])
        decoded[term] = (d, offs, pos_flat)
    return decoded


def phrase_match(
    spark: SparkSession,
    postings: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    slop: int = 0,
) -> DataFrame:
    """(query_id, doc_id, n_matches) for every doc containing the phrase
    (within ``slop`` position moves — see module docstring). One task per
    query; use :func:`phrase_match_partitioned` for stop-word phrases over
    very large indexes."""
    qrows = analyze_phrases(queries, config)
    if not qrows:
        return spark.createDataFrame([], PHRASE_SCHEMA)
    qterms = spark.createDataFrame(
        sorted({(qid, t) for qid, _, t in qrows}), "query_id int, term string"
    )
    all_terms = sorted({t for _, _, t in qrows})
    plists = postings.filter(F.col("term").isin(all_terms))
    joined = plists.join(F.broadcast(qterms), "term")
    slots_by_q: dict[int, list[tuple[int, str]]] = {}
    for qid, slot, term in qrows:
        slots_by_q.setdefault(qid, []).append((slot, term))

    def run_query(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        rows_by_term: dict[str, dict[int, list]] = {}
        for term, ri, blocks in zip(pdf["term"], pdf["run_idx"], pdf["blocks"]):
            rows_by_term.setdefault(term, {})[int(ri)] = blocks
        decoded = _decode_rows(rows_by_term)
        docs, counts = _match_phrase(decoded, slots_by_q[qid], slop)
        return pd.DataFrame(
            {
                "query_id": pd.Series(
                    np.full(docs.size, qid), dtype="int32"
                ),
                "doc_id": pd.Series(docs, dtype="int64"),
                "n_matches": pd.Series(counts, dtype="int64"),
            }
        )

    return joined.groupBy("query_id").applyInPandas(run_query, PHRASE_SCHEMA)


def phrase_match_partitioned(
    spark: SparkSession,
    postings: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    slop: int = 0,
    range_bits: int = 4,
) -> DataFrame:
    """Range-partitioned phrase matching: one task per (query, doc-range).

    The doc-id space (docIDs are xxhash64 — uniform over int64) splits into
    2^range_bits equal ranges; each compressed block ships only to the
    ranges its [first_doc, last_doc] span overlaps (hot terms' blocks are
    narrow, so their volume splits ~evenly across ranges); each task
    decodes, trims boundary blocks to its own closed range, and runs the
    same vectorized matcher. Docs partition across ranges, so the union of
    per-range results is the exact global answer — identical rows to
    :func:`phrase_match`."""
    n_ranges = 1 << range_bits
    shift = 64 - range_bits
    qrows = analyze_phrases(queries, config)
    if not qrows:
        return spark.createDataFrame([], PHRASE_SCHEMA)
    qterms = spark.createDataFrame(
        sorted({(qid, t) for qid, _, t in qrows}), "query_id int, term string"
    )
    all_terms = sorted({t for _, _, t in qrows})
    plists = postings.filter(F.col("term").isin(all_terms))
    slots_by_q: dict[int, list[tuple[int, str]]] = {}
    for qid, slot, term in qrows:
        slots_by_q.setdefault(qid, []).append((slot, term))

    def rid(col: str):
        # signed doc -> unsigned order via sign-bit flip, top bits = range
        return F.shiftrightunsigned(
            F.col(col).bitwiseXOR(F.lit(MIN_DOC)), shift
        ).cast("int")

    bx = (
        plists.select("term", F.explode("blocks").alias("block"))
        .withColumn("rs", rid("block.first_doc"))
        .withColumn("re", rid("block.last_doc"))
        .select(
            "term", "block",
            F.explode(F.sequence("rs", "re")).alias("range_id"),
        )
    )
    joined = bx.join(F.broadcast(qterms), "term")

    def run_range(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        range_id = int(pdf["range_id"].iloc[0])
        lo = (range_id << shift) - (1 << 63)
        hi_incl = lo + (1 << shift) - 1
        blocks_by_term: dict[str, list] = {}
        for term, block in zip(pdf["term"], pdf["block"]):
            blocks_by_term.setdefault(term, []).append(block)
        decoded = {}
        for term, blocks in blocks_by_term.items():
            # posting runs partition the doc space in order, so sorting
            # blocks by first_doc reconstructs global doc order
            blocks.sort(key=lambda b_: b_["first_doc"])
            ds, ts, ps = [], [], []
            for bl in blocks:
                d, t, _l = decode_block(bytes(bl["data"]), MIN_DOC, int(bl["n"]))
                p = decode_positions_flat(bytes(bl["pos_data"]), t)
                mask = (d >= lo) & (d <= hi_incl)
                if not mask.all():
                    p = p[np.repeat(mask, t)]
                    d, t = d[mask], t[mask]
                if d.size:
                    ds.append(d)
                    ts.append(t)
                    ps.append(p)
            if not ds:
                continue
            d = np.concatenate(ds)
            t = np.concatenate(ts)
            offs = np.concatenate([[0], np.cumsum(t.astype(np.int64))])
            decoded[term] = (d, offs, np.concatenate(ps))
        docs, counts = _match_phrase(decoded, slots_by_q[qid], slop)
        return pd.DataFrame(
            {
                "query_id": pd.Series(np.full(docs.size, qid), dtype="int32"),
                "doc_id": pd.Series(docs, dtype="int64"),
                "n_matches": pd.Series(counts, dtype="int64"),
            }
        )

    return joined.groupBy("query_id", "range_id").applyInPandas(
        run_range, PHRASE_SCHEMA
    )
