"""Distributed posting-list build (SURVEY.md §2 B2-B5).

The reference feeds its merged token stream to Lucene's IndexWriter
(AnalysisComboPlugin.java:37-42); this module builds the equivalent inverted
index Spark-first:

  corpus --mapInPandas(analysis+per-doc agg)--> (doc_id, term, tf, positions, dl)
         --salted repartition on (term, salt)--> per-shard sorted segments
         (delta+varint blocks + block-max metadata)
         --repartition(term) streamed k-way merge--> compacted posting table

Skew (north_rule: "salted repartition on term hash to defuse stop-token
skew"): code corpora have Zipf stop-tokens (``the``, ``if``, ``return``);
a plain hash-partition on term puts a whole stop-term's postings on one
task. Hot terms — identified from the term_df stage, a tiny broadcast — are
salted with hash(doc_id) % S so no task sees more than ~df/S postings of
any term; cold terms keep salt 0, so vocabulary-sized overhead stays at one
shard per term. The merge stage then combines each term's sorted shard runs
(the log-structured compaction the reference's host performs across Lucene
segments); single-shard terms pass through without re-encoding.

Group processing uses grouped_map_sorted (streamed mapInPandas over sorted
partitions) rather than groupBy().applyInPandas — per-group dispatch cost
does not survive a vocabulary-sized group count (see operators/grouped.py).

All heavy lifting is numpy inside Arrow batches; rows crossing shuffles are
pre-aggregated (one row per (doc, term)), never raw tokens.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from elasticsearch_analysis_combo_spark.operators.codec import (
    bm25_impact,
    decode_block,
    decode_positions_flat,
    encode_block,
    gather_segments,
)
from elasticsearch_analysis_combo_spark.operators.grouped import grouped_map_sorted

BLOCK_STRUCT = T.StructType(
    [
        T.StructField("first_doc", T.LongType()),
        T.StructField("last_doc", T.LongType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("max_impact", T.DoubleType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("pos_data", T.BinaryType()),
    ]
)

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("salt", T.IntegerType()),
        T.StructField("run_idx", T.IntegerType()),
        T.StructField("df", T.LongType()),     # run-local doc count
        T.StructField("cf", T.LongType()),     # run-local sum(tf)
        T.StructField("max_impact", T.DoubleType()),
        T.StructField("blocks", T.ArrayType(BLOCK_STRUCT)),
    ]
)

POSTING_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("run_idx", T.IntegerType()),
        T.StructField("df", T.LongType()),     # TERM totals, repeated per run
        T.StructField("cf", T.LongType()),     # TERM totals, repeated per run
        T.StructField("max_impact", T.DoubleType()),  # run-local max
        T.StructField("blocks", T.ArrayType(BLOCK_STRUCT)),
    ]
)

MIN_DOC = -(1 << 63)

# Rows are bounded: a term's posting list is emitted as ceil(n_blocks /
# max_blocks_per_row) rows keyed (term, run_idx), runs ascending in doc_id.
# At block_size=128 the default caps a row at ~512k docs (a few MB
# compressed) — a df=10^11 stop term becomes ~200k bounded rows instead of
# one multi-GB row that breaks the 2 GB Arrow limit and re-concentrates the
# skew the salting defused. Consumers concatenate a term's runs in run_idx
# order (runs partition the sorted doc space, so the result stays sorted).
DEFAULT_MAX_BLOCKS_PER_ROW = 4096


def term_blocks_from_rows(run_idxs, blocks_col) -> list:
    """Concatenate one term's posting runs (any row order) into the full
    sorted block list. Used by query tasks that receive multi-row terms."""
    order = sorted(range(len(run_idxs)), key=lambda i: run_idxs[i])
    out: list = []
    for i in order:
        out.extend(blocks_col[i])
    return out




def _encode_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    pos_flat: np.ndarray | None,
    avgdl: float,
    k1: float,
    b: float,
    block_size: int,
) -> list[dict]:
    """Chunk sorted postings into independent compressed blocks.
    ``pos_flat``: positions flattened doc-major over the whole run
    (lengths = tfs), sliced per block via cumulative tf offsets."""
    blocks = []
    pos_off = None
    if pos_flat is not None:
        tfs64 = tfs.astype(np.int64, copy=False)
        pos_off = np.concatenate([[0], np.cumsum(tfs64)])
    for off in range(0, doc_ids.size, block_size):
        end = min(off + block_size, doc_ids.size)
        d, t, l = doc_ids[off:end], tfs[off:end], dls[off:end]
        p = None
        if pos_flat is not None:
            p = pos_flat[pos_off[off]:pos_off[end]]
        # independent blocks: first gap relative to MIN_DOC sentinel so any
        # block decodes without its predecessor (WAND skips blocks)
        data, pos_data = encode_block(d, t, l, p, MIN_DOC)
        blocks.append(
            {
                "first_doc": int(d[0]),
                "last_doc": int(d[-1]),
                "n": int(end - off),
                "max_impact": float(bm25_impact(t, l, avgdl, k1, b).max()),
                "data": data,
                "pos_data": pos_data,
            }
        )
    return blocks


def salt_term_stats(
    term_stats: DataFrame,
    hot_terms: DataFrame | None,
    salt_shards: int,
) -> DataFrame:
    """B3: add the salt column. ``hot_terms`` (term) is broadcast — it holds
    only skew-heavy terms (stop tokens), typically a few hundred rows even
    at full scale. None => salt every term (safe default for unknown
    distributions)."""
    if salt_shards <= 1:
        return term_stats.withColumn("salt", F.lit(0).cast("int"))
    # hot shards live in 1..S so salt==0 identifies the cold (single-shard)
    # path unambiguously
    salt = (F.pmod(F.xxhash64("doc_id"), F.lit(salt_shards)) + 1).cast("int")
    if hot_terms is None:
        return term_stats.withColumn("salt", salt)
    hot = hot_terms.select("term").withColumn("_hot", F.lit(True))
    return (
        term_stats.join(F.broadcast(hot), "term", "left")
        .withColumn("salt", F.when(F.col("_hot"), salt).otherwise(F.lit(0)).cast("int"))
        .drop("_hot")
    )


def build_segments(
    term_stats: DataFrame,
    avgdl: float,
    hot_terms: DataFrame | None = None,
    k1: float = 1.2,
    b: float = 0.75,
    block_size: int = 128,
    salt_shards: int = 8,
    with_positions: bool = True,
    num_partitions: int | None = None,
    max_blocks_per_row: int = DEFAULT_MAX_BLOCKS_PER_ROW,
) -> DataFrame:
    """B3+B4: salted repartition + per-shard sorted compressed segments.

    Input: (doc_id, term, tf, positions, dl) from build_term_stats.
    Output: bounded rows per (term, salt, run_idx) with sorted posting
    blocks; df/cf on segment rows are run-local counts.
    """
    salted = salt_term_stats(term_stats, hot_terms, salt_shards)

    def encode_shard(cols: dict, s: int, e: int) -> list[tuple]:
        # rows arrive sorted by doc_id (grouped_map_sorted sort key)
        doc_ids = cols["doc_id"][s:e]
        tfs = cols["tf"][s:e]
        dls = cols["dl"][s:e]
        pos_flat = None
        pos_off = None
        if with_positions:
            pos_flat = np.concatenate(list(cols["positions"][s:e])).astype(np.uint64)
        term, salt = cols["term"][s], int(cols["salt"][s])
        out = []
        # chunk at the doc level so each run encodes independently
        docs_per_row = max_blocks_per_row * block_size
        if with_positions:
            tf_cum = np.concatenate([[0], np.cumsum(tfs.astype(np.int64))])
        for ri, off in enumerate(range(0, doc_ids.size, docs_per_row)):
            end = min(off + docs_per_row, doc_ids.size)
            p = pos_flat[tf_cum[off]:tf_cum[end]] if with_positions else None
            blocks = _encode_blocks(
                doc_ids[off:end], tfs[off:end], dls[off:end], p,
                avgdl, k1, b, block_size,
            )
            out.append((
                term, salt, ri,
                end - off,
                int(tfs[off:end].sum()),
                max(bl["max_impact"] for bl in blocks),
                blocks,
            ))
        return out

    return grouped_map_sorted(
        salted,
        group_keys=["term", "salt"],
        sort_keys=["doc_id"],
        fn=encode_shard,
        schema=SEGMENT_SCHEMA,
        num_partitions=num_partitions,
    )


def build_postings(
    term_stats: DataFrame,
    avgdl: float,
    hot_terms: DataFrame | None = None,
    k1: float = 1.2,
    b: float = 0.75,
    block_size: int = 128,
    salt_shards: int = 8,
    with_positions: bool = True,
    num_partitions: int | None = None,
    max_blocks_per_row: int = DEFAULT_MAX_BLOCKS_PER_ROW,
) -> DataFrame:
    """B3-B5 in the minimal number of shuffles.

    Cold terms (the overwhelming majority of the vocabulary) are encoded
    straight to final posting rows in ONE shuffle; only skew-hot terms take
    the two-phase salted-segment + merge path. At 10^12-doc scale this
    removes a full shuffle + decode/re-encode of nearly the entire posting
    table compared to routing everything through the merge. Long lists emit
    multiple bounded (term, run_idx) rows — see DEFAULT_MAX_BLOCKS_PER_ROW."""
    salted = salt_term_stats(term_stats, hot_terms, salt_shards)
    if hot_terms is None and salt_shards > 1:
        # everything salted: no cold path
        segs = build_segments(
            term_stats, avgdl, hot_terms=None, k1=k1, b=b,
            block_size=block_size, salt_shards=salt_shards,
            with_positions=with_positions, num_partitions=num_partitions,
            max_blocks_per_row=max_blocks_per_row,
        )
        return merge_segments(
            segs, avgdl, k1=k1, b=b, block_size=block_size,
            with_positions=with_positions, num_partitions=num_partitions,
            max_blocks_per_row=max_blocks_per_row,
        )

    cold = salted.filter(F.col("salt") == 0)
    hot = salted.filter(F.col("salt") > 0)

    def encode_term(cols: dict, s: int, e: int) -> list[tuple]:
        doc_ids = cols["doc_id"][s:e]
        tfs = cols["tf"][s:e]
        dls = cols["dl"][s:e]
        pos_flat = None
        if with_positions:
            pos_flat = np.concatenate(list(cols["positions"][s:e])).astype(np.uint64)
            tf_cum = np.concatenate([[0], np.cumsum(tfs.astype(np.int64))])
        term = cols["term"][s]
        df_total, cf_total = e - s, int(tfs.sum())
        out = []
        docs_per_row = max_blocks_per_row * block_size
        for ri, off in enumerate(range(0, doc_ids.size, docs_per_row)):
            end = min(off + docs_per_row, doc_ids.size)
            p = pos_flat[tf_cum[off]:tf_cum[end]] if with_positions else None
            blocks = _encode_blocks(
                doc_ids[off:end], tfs[off:end], dls[off:end], p,
                avgdl, k1, b, block_size,
            )
            out.append((
                term, ri, df_total, cf_total,
                max(bl["max_impact"] for bl in blocks),
                blocks,
            ))
        return out

    cold_postings = grouped_map_sorted(
        cold,
        group_keys=["term"],
        sort_keys=["doc_id"],
        fn=encode_term,
        schema=POSTING_SCHEMA,
        num_partitions=num_partitions,
    )
    hot_segments = build_segments(
        hot.drop("salt"), avgdl, hot_terms=None, k1=k1, b=b,
        block_size=block_size, salt_shards=salt_shards,
        with_positions=with_positions, num_partitions=num_partitions,
        max_blocks_per_row=max_blocks_per_row,
    )
    hot_postings = merge_segments(
        hot_segments, avgdl, k1=k1, b=b, block_size=block_size,
        with_positions=with_positions, num_partitions=num_partitions,
        max_blocks_per_row=max_blocks_per_row,
    )
    return cold_postings.unionByName(hot_postings)


def decode_segment_blocks_flat(blocks, with_positions: bool = False):
    """Decode a row's block list -> (doc_ids, tfs, dls[, pos_flat])."""
    ds, ts, ls, ps = [], [], [], []
    for bl in blocks:
        d, t, l = decode_block(bytes(bl["data"]), MIN_DOC, int(bl["n"]))
        ds.append(d)
        ts.append(t)
        ls.append(l)
        if with_positions:
            ps.append(decode_positions_flat(bytes(bl["pos_data"]), t))
    doc_ids = np.concatenate(ds) if ds else np.zeros(0, dtype=np.int64)
    tfs = np.concatenate(ts) if ts else np.zeros(0, dtype=np.int64)
    dls = np.concatenate(ls) if ls else np.zeros(0, dtype=np.int64)
    if with_positions:
        pos_flat = np.concatenate(ps) if ps else np.zeros(0, dtype=np.int64)
        return doc_ids, tfs, dls, pos_flat
    return doc_ids, tfs, dls


def decode_segment_blocks(blocks, with_positions: bool = False):
    """Per-doc list view of decode_segment_blocks_flat (tests/API)."""
    if not with_positions:
        return decode_segment_blocks_flat(blocks, False)
    doc_ids, tfs, dls, pos_flat = decode_segment_blocks_flat(blocks, True)
    ps = []
    off = 0
    for tf in tfs:
        ps.append(pos_flat[off:off + int(tf)])
        off += int(tf)
    return doc_ids, tfs, dls, ps


def merge_segments(
    segments: DataFrame,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
    block_size: int = 128,
    with_positions: bool = True,
    num_partitions: int | None = None,
    max_blocks_per_row: int = DEFAULT_MAX_BLOCKS_PER_ROW,
) -> DataFrame:
    """B5: log-structured merge — combine each term's sorted shard runs into
    compacted posting rows bounded at ``max_blocks_per_row`` blocks each.
    Single-shard terms (the vocabulary tail) pass their already-sorted
    blocks through untouched; multi-shard (hot) terms decode, k-way merge
    (concatenate + argsort over sorted runs), and re-block. Posting rows
    carry the TERM-total df/cf repeated on every run row."""

    def merge_term(cols: dict, s: int, e: int) -> list[tuple]:
        term = cols["term"][s]
        salts = cols["salt"][s:e]
        if salts[0] == salts[-1]:
            # fast path: one shard == final posting list. Rows arrive sorted
            # by run_idx (runs ascend in doc space within a shard), so the
            # block lists pass through; only df/cf become term totals.
            df_total = int(cols["df"][s:e].sum())
            cf_total = int(cols["cf"][s:e].sum())
            return [
                (
                    term, ri, df_total, cf_total,
                    float(cols["max_impact"][s + ri]),
                    list(cols["blocks"][s + ri]),
                )
                for ri in range(e - s)
            ]
        all_d, all_t, all_l, all_p = [], [], [], []
        for blocks in cols["blocks"][s:e]:
            if with_positions:
                d, t, l, p = decode_segment_blocks_flat(blocks, True)
                all_p.append(p)
            else:
                d, t, l = decode_segment_blocks_flat(blocks, False)
            all_d.append(d)
            all_t.append(t)
            all_l.append(l)
        doc_ids = np.concatenate(all_d)
        tfs = np.concatenate(all_t)
        dls = np.concatenate(all_l)
        order = np.argsort(doc_ids, kind="stable")
        pos_flat = None
        if with_positions:
            pos_flat, _ = gather_segments(
                np.concatenate(all_p), tfs, order
            )
            pos_flat = pos_flat.astype(np.uint64, copy=False)
        doc_ids, tfs, dls = doc_ids[order], tfs[order], dls[order]
        df_total, cf_total = int(doc_ids.size), int(tfs.sum())
        out = []
        docs_per_row = max_blocks_per_row * block_size
        if with_positions:
            tf_cum = np.concatenate([[0], np.cumsum(tfs.astype(np.int64))])
        for ri, off in enumerate(range(0, doc_ids.size, docs_per_row)):
            end = min(off + docs_per_row, doc_ids.size)
            p = pos_flat[tf_cum[off]:tf_cum[end]] if with_positions else None
            blocks = _encode_blocks(
                doc_ids[off:end], tfs[off:end], dls[off:end], p,
                avgdl, k1, b, block_size,
            )
            out.append((
                term, ri, df_total, cf_total,
                max(bl["max_impact"] for bl in blocks),
                blocks,
            ))
        return out

    return grouped_map_sorted(
        segments,
        group_keys=["term"],
        sort_keys=["salt", "run_idx"],
        fn=merge_term,
        schema=POSTING_SCHEMA,
        num_partitions=num_partitions,
    )
