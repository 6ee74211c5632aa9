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

from elasticsearch_analysis_combo_spark.tinydf import tiny_df

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

# with_dl=True variant: the matcher already holds every hit doc's length
# (decoded alongside positions), so emitting it costs nothing and saves
# consumers a term_stats re-scan + distinct + join just to recover dl
# (the simple_query_string phrase scorer needs dl for the BM25 length
# normalization).
PHRASE_DL_SCHEMA = T.StructType(
    PHRASE_SCHEMA.fields + [T.StructField("dl", T.LongType())]
)

# with_weights=True variant (requires with_dl): adds the Lucene
# sloppyFreq column — sum over matching anchors of 1/(matchLength+1),
# matchLength the anchor's minimal assignment span (see _match_phrase).
# At slop=0 sloppy_freq == n_matches exactly.
PHRASE_DL_W_SCHEMA = T.StructType(
    PHRASE_DL_SCHEMA.fields + [T.StructField("sloppy_freq", T.DoubleType())]
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


def _group(t) -> tuple:
    """Normalize a slot's term spec (str or iterable of str) to a tuple —
    a multi-term group means 'any of these terms completes this slot'
    (the match_phrase_prefix expansion)."""
    return (t,) if isinstance(t, str) else tuple(t)


def _match_phrase(
    decoded: dict[str, tuple],
    slots: list[tuple[int, object]],
    slop: int = 0,
    want_dl: bool = False,
    want_weights: bool = False,
):
    """Batch phrase evaluation. ``decoded``: term -> (docs, offs, pos_flat,
    dls) with docs sorted unique, offs the per-doc prefix offsets into
    pos_flat, dls the per-doc lengths. A slot's term spec may be a GROUP
    (tuple of terms): any member occurrence fills the slot. Returns
    (doc_ids, n_matches[, dls][, sloppy_freq]) for matching docs.

    With ``want_weights`` each anchor additionally gets its MINIMAL
    matchLength (the smallest max(pp)-min(pp) over valid slot
    assignments anchored at that first-slot occurrence, found by probing
    window spans s=0..slop in ascending order — the first s that covers
    every slot is the minimum, because any assignment of span s fits a
    size-s window containing the anchor) and the per-doc ``sloppy_freq``
    is ``sum over anchors of 1/(matchLength+1)`` — Lucene's sloppyFreq
    weighting (SloppyPhraseMatcher slop factor) applied to this
    evaluator's anchor-based match set. At slop=0 every matchLength is 0
    and sloppy_freq == n_matches."""
    empty = (np.zeros(0, dtype=np.int64),) * (2 + want_dl + want_weights)
    groups = [_group(t) for _, t in sorted(slots)]
    slot_ids = [s for s, _ in sorted(slots)]
    # per-slot doc sets: union over the group's members
    slot_docs = []
    for g in groups:
        ds = [decoded[t][0] for t in g if t in decoded and decoded[t][0].size]
        if not ds:
            return empty
        slot_docs.append(
            ds[0] if len(ds) == 1 else np.unique(np.concatenate(ds))
        )
    common = slot_docs[0]
    for d in slot_docs[1:]:
        common = np.intersect1d(common, d, assume_unique=True)
        if common.size == 0:
            return empty
    assert common.size < (1 << 32), "phrase candidate set exceeds key space"
    keys_by_slot = []
    for slot, g in zip(slot_ids, groups):
        parts = []
        for t in g:
            if t not in decoded or decoded[t][0].size == 0:
                continue
            docs, offs, pos_flat = decoded[t][:3]
            if pos_flat.size:
                assert int(pos_flat.max()) < _POS_BIAS - slop - 1, (
                    "document positions exceed phrase key space"
                )
            # group members may miss some common docs; restrict to present
            if len(g) == 1:
                sub = common
            else:
                idx = np.searchsorted(docs, common)
                idx_c = np.minimum(idx, docs.size - 1)
                sub = common[docs[idx_c] == common]
            if sub.size == 0:
                continue
            k = _slot_keys(docs, offs, pos_flat, sub, slot)
            if len(g) > 1 and sub.size != common.size:
                # remap member-local doc indices to common-wide indices
                remap = np.searchsorted(common, sub)
                k = remap[(k // _BAND).astype(np.int64)] * _BAND + (k % _BAND)
            parts.append(k)
        if not parts:
            return empty
        keys = parts[0] if len(parts) == 1 else np.unique(np.concatenate(parts))
        keys_by_slot.append(keys)
    anchors = keys_by_slot[0]
    if anchors.size == 0:
        return empty
    if want_weights:
        # ascending-span probe: best[i] = minimal matchLength for anchor i
        # (slop+1 = no valid assignment). O(slop^2/2) searchsorted passes
        # over the anchor batch — slop is a small query constant.
        best = np.full(anchors.size, slop + 1, dtype=np.int64)
        for s in range(0, slop + 1):
            pending = best > slop  # unmatched so far (any earlier s < this s)
            if not pending.any():
                break
            for m in range(-s, 1):
                ok = pending.copy()
                for keys in keys_by_slot[1:]:
                    lo = anchors + m
                    hi = anchors + m + s
                    left = np.searchsorted(keys, lo, side="left")
                    right = np.searchsorted(keys, hi, side="right")
                    ok &= left < right
                    if not ok.any():
                        break
                best[ok] = s
                pending &= ~ok
                if not pending.any():
                    break
        valid = best <= slop
    else:
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
    out_docs, out_counts = common[hit], counts[hit]
    freq_out = None
    if want_weights:
        freq = np.bincount(
            cidx, weights=1.0 / (best[valid] + 1.0), minlength=common.size
        )
        freq_out = freq[hit]
    if not want_dl:
        return (
            (out_docs, out_counts, freq_out) if want_weights
            else (out_docs, out_counts)
        )
    # dl per matched doc, from whichever slot-0 member carries it
    dls_out = np.zeros(out_docs.size, dtype=np.int64)
    for t in groups[0]:
        if t not in decoded:
            continue
        docs, dls = decoded[t][0], decoded[t][3]
        idx = np.searchsorted(docs, out_docs)
        idx_c = np.minimum(idx, docs.size - 1)
        present = docs[idx_c] == out_docs
        dls_out[present] = dls[idx_c[present]]
    if want_weights:
        return out_docs, out_counts, dls_out, freq_out
    return out_docs, out_counts, dls_out


def _decode_rows(rows_by_term: dict[str, dict[int, list]]) -> dict:
    """term -> (docs, offs, pos_flat, dls) from (run_idx -> blocks) maps;
    runs concatenate in run_idx order (stays doc-sorted)."""
    decoded = {}
    for term, runs in rows_by_term.items():
        blocks = [bl for ri in sorted(runs) for bl in runs[ri]]
        d, t, l, pos_flat = decode_segment_blocks_flat(blocks, True)
        offs = np.concatenate([[0], np.cumsum(t.astype(np.int64))])
        decoded[term] = (d, offs, pos_flat, l)
    return decoded


def phrase_match(
    spark: SparkSession,
    postings: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    slop: int = 0,
    with_dl: bool = False,
    with_weights: bool = False,
) -> DataFrame:
    """(query_id, doc_id, n_matches[, dl][, sloppy_freq]) for every doc
    containing the phrase (within ``slop`` position moves — see module
    docstring). ``with_weights`` (requires ``with_dl``) adds Lucene's
    sloppyFreq (1/(matchLength+1) per anchor, summed). One task per
    query; use :func:`phrase_match_partitioned` for stop-word phrases
    over very large indexes."""
    if with_weights and not with_dl:
        raise ValueError("with_weights requires with_dl")
    schema = (
        PHRASE_DL_W_SCHEMA if with_weights
        else PHRASE_DL_SCHEMA if with_dl else PHRASE_SCHEMA
    )
    qrows = analyze_phrases(queries, config)
    if not qrows:
        return tiny_df(spark, [], schema)
    qterms = tiny_df(spark,
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
        res = _match_phrase(
            decoded, slots_by_q[qid], slop,
            want_dl=with_dl, want_weights=with_weights,
        )
        docs, counts = res[0], res[1]
        out = {
            "query_id": pd.Series(np.full(docs.size, qid), dtype="int32"),
            "doc_id": pd.Series(docs, dtype="int64"),
            "n_matches": pd.Series(counts, dtype="int64"),
        }
        if with_dl:
            out["dl"] = pd.Series(res[2], dtype="int64")
        if with_weights:
            out["sloppy_freq"] = pd.Series(res[3], dtype="float64")
        return pd.DataFrame(out)

    return joined.groupBy("query_id").applyInPandas(run_query, schema)


def phrase_match_docs(
    spark: SparkSession,
    term_stats: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    allowed: DataFrame,
    slop: int = 0,
) -> DataFrame:
    """Phrase matching restricted to an ``allowed`` (query_id, doc_id)
    candidate set, evaluated straight from the per-doc term stats
    (pre-packed ``pos_data``) — no posting-block fetch at all. Cost is
    O(|allowed| x phrase terms) rows, the right shape when candidates are
    already known and few (a rescore window): a corpus-wide stop-word
    phrase never decodes beyond the candidates."""
    qrows = analyze_phrases(queries, config)
    if not qrows:
        return tiny_df(spark, [], PHRASE_SCHEMA)
    qterms = tiny_df(spark,
        sorted({(qid, t) for qid, _, t in qrows}), "query_id int, term string"
    )
    slots_by_q: dict[int, list[tuple[int, str]]] = {}
    for qid, slot, term in qrows:
        slots_by_q.setdefault(qid, []).append((slot, term))
    all_terms = sorted({t for _, _, t in qrows})
    sel = (
        # literal isin pushes into the stats scan; the broadcast join
        # alone would read every row group
        term_stats.filter(F.col("term").isin(all_terms))
        .join(F.broadcast(qterms), "term")
        .join(
            F.broadcast(allowed.select("query_id", "doc_id").distinct()),
            ["query_id", "doc_id"],
        )
        .select("query_id", "term", "doc_id", "tf", "pos_data")
    )

    def run_query(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        decoded = {}
        for term, grp in pdf.groupby("term", sort=False):
            order = np.argsort(grp["doc_id"].to_numpy(), kind="stable")
            docs = grp["doc_id"].to_numpy()[order]
            tfs = grp["tf"].to_numpy().astype(np.int64)[order]
            pos_parts = [
                decode_positions_flat(
                    bytes(pd_), np.asarray([int(t_)], dtype=np.int64)
                )
                for pd_, t_ in zip(
                    grp["pos_data"].to_numpy()[order], tfs
                )
            ]
            pos_flat = (
                np.concatenate(pos_parts) if pos_parts
                else np.zeros(0, dtype=np.int64)
            )
            offs = np.concatenate([[0], np.cumsum(tfs)])
            decoded[term] = (docs, offs, pos_flat, np.zeros(docs.size, np.int64))
        docs, counts = _match_phrase(decoded, slots_by_q[qid], slop)
        return pd.DataFrame(
            {
                "query_id": pd.Series(np.full(docs.size, qid), dtype="int32"),
                "doc_id": pd.Series(docs, dtype="int64"),
                "n_matches": pd.Series(counts, dtype="int64"),
            }
        )

    return sel.groupBy("query_id").applyInPandas(run_query, PHRASE_SCHEMA)


def range_partitioned_positional_eval(
    spark: SparkSession,
    postings: DataFrame,
    qterm_rows: list[tuple[int, str]],
    match_fn,
    range_bits: int = 4,
    want_dl: bool = False,
    want_weights: bool = False,
) -> DataFrame:
    """Shared doc-range fan-out for positional matchers (phrase, span).

    The doc-id space (docIDs are xxhash64 — uniform over int64) splits into
    2^range_bits equal ranges; each compressed block ships only to the
    ranges its [first_doc, last_doc] span overlaps (hot terms' blocks are
    narrow, so their volume splits ~evenly across ranges); each task
    decodes, trims boundary blocks to its own closed range, and calls
    ``match_fn(qid, decoded) -> (docs, counts)`` with the same decoded
    shape as the single-task path. Docs partition across ranges, so the
    union of per-range results is the exact global answer. With
    ``want_dl`` the matcher must return ``(docs, counts, dls)`` and the
    output gains a ``dl`` column (docs partition across ranges, so per-doc
    lengths are emitted exactly once). ``want_weights`` (requires
    ``want_dl``) expects ``(docs, counts, dls, freq)`` and adds the
    ``sloppy_freq`` column — per-doc sums are exact because each doc's
    anchors all live in its own range."""
    if want_weights and not want_dl:
        raise ValueError("want_weights requires want_dl")
    schema = (
        PHRASE_DL_W_SCHEMA if want_weights
        else PHRASE_DL_SCHEMA if want_dl else PHRASE_SCHEMA
    )
    shift = 64 - range_bits
    if not qterm_rows:
        return tiny_df(spark, [], schema)
    qterms = tiny_df(spark,
        sorted(set(qterm_rows)), "query_id int, term string"
    )
    all_terms = sorted({t for _, t in qterm_rows})
    plists = postings.filter(F.col("term").isin(all_terms))

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
            ds, ts, ps, ls = [], [], [], []
            for bl in blocks:
                d, t, l = decode_block(bytes(bl["data"]), MIN_DOC, int(bl["n"]))
                p = decode_positions_flat(bytes(bl["pos_data"]), t)
                mask = (d >= lo) & (d <= hi_incl)
                if not mask.all():
                    p = p[np.repeat(mask, t)]
                    d, t, l = d[mask], t[mask], l[mask]
                if d.size:
                    ds.append(d)
                    ts.append(t)
                    ps.append(p)
                    ls.append(l)
            if not ds:
                continue
            d = np.concatenate(ds)
            t = np.concatenate(ts)
            offs = np.concatenate([[0], np.cumsum(t.astype(np.int64))])
            decoded[term] = (d, offs, np.concatenate(ps), np.concatenate(ls))
        res = match_fn(qid, decoded)
        docs, counts = res[0], res[1]
        out = {
            "query_id": pd.Series(np.full(docs.size, qid), dtype="int32"),
            "doc_id": pd.Series(docs, dtype="int64"),
            "n_matches": pd.Series(counts, dtype="int64"),
        }
        if want_dl:
            out["dl"] = pd.Series(res[2], dtype="int64")
        if want_weights:
            out["sloppy_freq"] = pd.Series(res[3], dtype="float64")
        return pd.DataFrame(out)

    return joined.groupBy("query_id", "range_id").applyInPandas(
        run_range, schema
    )


def phrase_match_partitioned(
    spark: SparkSession,
    postings: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    slop: int = 0,
    range_bits: int = 4,
    with_dl: bool = False,
    with_weights: bool = False,
) -> DataFrame:
    """Range-partitioned phrase matching: one task per (query, doc-range),
    identical rows to :func:`phrase_match` (see
    :func:`range_partitioned_positional_eval`) — the scale-safe path for
    stop-word phrases whose posting lists would concentrate in one task."""
    qrows = analyze_phrases(queries, config)
    if not qrows:
        return tiny_df(spark,
            [],
            PHRASE_DL_W_SCHEMA if with_weights
            else PHRASE_DL_SCHEMA if with_dl else PHRASE_SCHEMA,
        )
    slots_by_q: dict[int, list[tuple[int, str]]] = {}
    for qid, slot, term in qrows:
        slots_by_q.setdefault(qid, []).append((slot, term))
    return range_partitioned_positional_eval(
        spark, postings,
        [(qid, t) for qid, _, t in qrows],
        lambda qid, decoded: _match_phrase(
            decoded, slots_by_q[qid], slop,
            want_dl=with_dl, want_weights=with_weights,
        ),
        range_bits=range_bits,
        want_dl=with_dl,
        want_weights=with_weights,
    )


def shingle_phrase_slots(
    queries: list[tuple[int, str]],
    config: ComboConfig,
    size: int = 2,
    sep: str = " ",
) -> dict[int, list[tuple[int, str]]]:
    """Analyze each phrase with the BASE ``config`` and rewrite it into
    word-shingle slots: phrase terms t0..tn-1 become the n-size+1 shingle
    terms sep.join(t[i:i+size]) at slots 0..n-size. Consecutive phrase
    start positions map to consecutive shingle positions (the shingle
    sits at its first word's position — analysis.tokenizers.
    make_word_shingle_tokenizer), so the standard positional kernel
    evaluates shingle slots unchanged. Raises ValueError for phrases with
    fewer than ``size`` analyzed terms — those can't use the shingle
    index; callers fall back to :func:`phrase_match`."""
    by_q: dict[int, list[tuple[int, str]]] = {}
    for qid, slot, term in analyze_phrases(queries, config):
        by_q.setdefault(qid, []).append((slot, term))
    slots_by_q: dict[int, list[tuple[int, str]]] = {}
    for qid, st in by_q.items():
        terms = [t for _, t in sorted(st)]
        if len(terms) < size:
            raise ValueError(
                f"phrase {qid} analyzes to {len(terms)} term(s); the "
                f"size-{size} shingle index needs >= {size} — fall back "
                "to phrase_match"
            )
        slots_by_q[qid] = [
            (i, sep.join(terms[i:i + size]))
            for i in range(len(terms) - size + 1)
        ]
    return slots_by_q


def phrase_match_shingles(
    spark: SparkSession,
    shingle_postings: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    size: int = 2,
    sep: str = " ",
    partitioned: bool = False,
    range_bits: int = 4,
) -> DataFrame:
    """Lucene ``index_phrases``-style accelerated EXACT phrase matching:
    rows identical to :func:`phrase_match` at slop=0, evaluated against a
    side index of word ``size``-grams (build the postings from
    ``make_word_shingle_tokenizer(base)`` over the same corpus). The win
    at scale: a stop-word phrase's unigram posting lists cover most of the
    corpus, but its shingles ("to be", "of the") are orders of magnitude
    rarer — the scan, decode, and kernel all shrink by the unigram/shingle
    df ratio, and n_matches is exact because every size-gram of the phrase
    must appear at consecutive positions with the anchor count equal to
    the phrase-start count. Slop is unsupported by construction (shingles
    fix adjacency); ``config`` must be the single gap-free base analyzer
    the shingle index was built over."""
    slots_by_q = shingle_phrase_slots(queries, config, size, sep)
    if not slots_by_q:
        return tiny_df(spark, [], PHRASE_SCHEMA)
    if partitioned:
        return range_partitioned_positional_eval(
            spark, shingle_postings,
            [(qid, t) for qid, st in slots_by_q.items() for _, t in st],
            lambda qid, decoded: _match_phrase(decoded, slots_by_q[qid], 0),
            range_bits=range_bits,
        )
    return _slots_eval(spark, shingle_postings, slots_by_q, 0)


def _slots_eval(
    spark: SparkSession,
    postings: DataFrame,
    slots_by_q: dict[int, list[tuple[int, object]]],
    slop: int,
) -> DataFrame:
    """Shared single-task-per-query evaluator over prepared slot specs
    (plain terms or expansion groups)."""
    qterm_rows = sorted(
        {
            (qid, t)
            for qid, slots in slots_by_q.items()
            for _, spec in slots
            for t in _group(spec)
        }
    )
    if not qterm_rows:
        return tiny_df(spark, [], PHRASE_SCHEMA)
    qterms = tiny_df(spark, qterm_rows, "query_id int, term string")
    all_terms = sorted({t for _, t in qterm_rows})
    plists = postings.filter(F.col("term").isin(all_terms))
    joined = plists.join(F.broadcast(qterms), "term")

    def run_query(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        rows_by_term: dict[str, dict[int, list]] = {}
        for term, ri, blocks in zip(pdf["term"], pdf["run_idx"], pdf["blocks"]):
            rows_by_term.setdefault(term, {})[int(ri)] = blocks
        decoded = _decode_rows(rows_by_term)
        docs, counts = _match_phrase(decoded, slots_by_q[qid], slop)
        return pd.DataFrame(
            {
                "query_id": pd.Series(np.full(docs.size, qid), dtype="int32"),
                "doc_id": pd.Series(docs, dtype="int64"),
                "n_matches": pd.Series(counts, dtype="int64"),
            }
        )

    return joined.groupBy("query_id").applyInPandas(run_query, PHRASE_SCHEMA)


def phrase_prefix_match(
    spark: SparkSession,
    postings: DataFrame,
    term_df: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    slop: int = 0,
    max_expansions: int = 50,
) -> DataFrame:
    """ES ``match_phrase_prefix``: the phrase's LAST term matches as a
    prefix, expanded to at most ``max_expansions`` vocabulary terms (in
    dictionary order, as ES caps its expansion — deterministic here:
    alphabetical). A doc matches when any expansion completes the phrase;
    ``n_matches`` counts distinct first-slot anchors valid for at least one
    expansion. The expansion runs over the term DICTIONARY (vocabulary-,
    not posting-, sized; the startswith filter pushes into the scan) and
    the posting fetch ships only the expanded terms' rows."""
    from pyspark.sql import Window

    qrows = analyze_phrases(queries, config)
    if not qrows:
        return tiny_df(spark, [], PHRASE_SCHEMA)
    terms_by_q: dict[int, list[str]] = {}
    for qid, slot, term in sorted(qrows):
        terms_by_q.setdefault(qid, []).append(term)
    # ALL queries' expansions in ONE dictionary job (per-query collects
    # would serialize a vocabulary scan per prefix); the startswith filter
    # still pushes into the scan per branch
    exp_union = None
    for qid, terms in terms_by_q.items():
        part = (
            term_df.filter(F.col("term").startswith(terms[-1]))
            .select(F.lit(qid).alias("query_id"), "term")
        )
        exp_union = part if exp_union is None else exp_union.unionByName(part)
    w = Window.partitionBy("query_id").orderBy("term")
    exp_rows = (
        exp_union.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_expansions)
        .select("query_id", "term")
        .collect()
    )
    exp_by_q: dict[int, list[str]] = {}
    for r in exp_rows:
        exp_by_q.setdefault(r["query_id"], []).append(r["term"])
    slots_by_q: dict[int, list[tuple[int, object]]] = {}
    for qid, terms in terms_by_q.items():
        exp = sorted(exp_by_q.get(qid, []))
        if not exp:
            continue
        slots = [(i, t) for i, t in enumerate(terms[:-1])]
        slots.append((len(terms) - 1, tuple(exp)))
        slots_by_q[qid] = slots
    if not slots_by_q:
        return tiny_df(spark, [], PHRASE_SCHEMA)
    return _slots_eval(spark, postings, slots_by_q, slop)


def phrase_topk(
    spark: SparkSession,
    postings: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    n_docs: int,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
    k: int | None = 10,
    slop: int = 0,
) -> DataFrame:
    """Ranked phrase query (ES ``match_phrase``): BM25 scoring with the
    PHRASE frequency as tf, Lucene PhraseQuery-style — score =
    [sum over slots of idf(term)] * satu(freq), satu(f) =
    f*(k1+1)/(f + k1*(1-b+b*dl/avgdl)), idf the Lucene BM25 idf. freq is
    this engine's n_matches (distinct matching anchors; = exact phrase
    occurrences at slop 0). Returns (query_id, rank, doc_id, score).

    ``k=None`` skips the rank cut and returns the FULL scored match set
    (query_id, doc_id, score) — the building block multi_match
    type=phrase needs: a per-field top-k cut before the dis-max blend
    would lose losing-field contributions when tie_breaker > 0, and the
    phrase match set (docs containing the phrase) is small by
    construction, so shipping it whole is the cheap exact path."""
    from pyspark.sql import Window

    qrows = analyze_phrases(queries, config)
    schema = T.StructType(
        [
            T.StructField("query_id", T.IntegerType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    if not qrows:
        if k is None:
            return tiny_df(spark,
                [], "query_id int, doc_id long, score double"
            )
        return tiny_df(spark,
            [], "query_id int, rank int, doc_id long, score double"
        )
    qterms = tiny_df(spark,
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
        df_by_term: dict[str, float] = {}
        for term, ri, df_t, blocks in zip(
            pdf["term"], pdf["run_idx"], pdf["df"], pdf["blocks"]
        ):
            rows_by_term.setdefault(term, {})[int(ri)] = blocks
            df_by_term[term] = float(df_t)
        decoded = _decode_rows(rows_by_term)
        docs, counts, dls = _match_phrase(
            decoded, slots_by_q[qid], slop, want_dl=True
        )
        if docs.size == 0:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int32"),
                    "doc_id": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="float64"),
                }
            )
        idf_sum = 0.0
        for _slot, term in slots_by_q[qid]:
            df_t = df_by_term.get(term, 0.0)
            idf_sum += float(np.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5)))
        f = counts.astype(np.float64)
        sat = f * (k1 + 1.0) / (
            f + k1 * (1.0 - b + b * dls.astype(np.float64) / avgdl)
        )
        return pd.DataFrame(
            {
                "query_id": pd.Series(np.full(docs.size, qid), dtype="int32"),
                "doc_id": pd.Series(docs, dtype="int64"),
                "score": pd.Series(idf_sum * sat, dtype="float64"),
            }
        )

    scored = joined.groupBy("query_id").applyInPandas(run_query, schema)
    if k is None:
        return scored
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
