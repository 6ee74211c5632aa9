"""Bounded posting rows (B5 scale shape): a term's posting list is emitted
as multiple (term, run_idx) rows capped at max_blocks_per_row blocks, and
every consumer (WAND, phrase) concatenates runs transparently.

Forces a pathological cap (2 blocks/row, 4 docs/block => 8 docs/row) over a
randomized corpus so nearly every term spans multiple rows, then checks:

* build_postings emits >1 row for long terms, with term-total df/cf repeated
  per run, runs partitioning the doc space in order;
* WAND over the chunked table is rank- and score-identical to the pure
  exhaustive oracle;
* phrase matching over chunked positional postings equals the unchunked
  result.
"""

import random

import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig
from elasticsearch_analysis_combo_spark.analysis.udfs import build_term_stats
from elasticsearch_analysis_combo_spark.operators.postings import (
    build_postings,
    build_segments,
    decode_segment_blocks,
    merge_segments,
)
from elasticsearch_analysis_combo_spark.query.phrase import phrase_match
from elasticsearch_analysis_combo_spark.query.wand import wand_topk_from_postings

from tests.oracle import oracle_topk

CFG = ComboConfig(["whitespace"])
K1, B = 1.2, 0.75

VOCAB = (
    ["the", "if", "return"] * 12
    + ["merge", "index", "token", "cache"] * 4
    + [f"rare{i}" for i in range(20)]
)


def _make_docs(rng: random.Random, n_docs: int):
    docs = []
    for _ in range(n_docs):
        n = rng.randint(1, 40)
        text = " ".join(rng.choice(VOCAB) for _ in range(n))
        docs.append((rng.randint(-(2**62), 2**62), text))
    return docs


def _stats(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, content string")
    return build_term_stats(df, CFG)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_wand_over_chunked_rows_matches_exhaustive(spark, seed):
    rng = random.Random(seed)
    docs = _make_docs(rng, 90)
    stats = _stats(spark, docs).cache()
    row = (
        stats.select("doc_id", "dl").distinct()
        .agg(F.count("*").alias("n"), F.avg("dl").alias("a")).collect()[0]
    )
    n_docs, avgdl = int(row["n"]), float(row["a"])
    postings = build_postings(
        stats, avgdl=avgdl, hot_terms=None, k1=K1, b=B,
        block_size=4, salt_shards=3, with_positions=False,
        max_blocks_per_row=2,
    ).cache()

    # the cap must actually bite: hot stop terms span many rows
    runs = (
        postings.groupBy("term")
        .agg(F.count("*").alias("n_rows"), F.first("df").alias("df"),
             F.countDistinct("df").alias("n_df"))
        .collect()
    )
    assert max(r["n_rows"] for r in runs) > 3
    for r in runs:
        # df is the TERM total repeated per run: rows = ceil(df / 8)
        assert r["n_df"] == 1
        assert r["n_rows"] == -(-r["df"] // 8)

    # runs partition the sorted doc space without overlap
    for trow in postings.filter(F.col("term") == "the").collect():
        d, _, _ = decode_segment_blocks(trow["blocks"], False)
        assert (d[1:] > d[:-1]).all()

    queries = [
        (0, "the if return"),
        (1, "merge rare1"),
        (2, "the merge index token cache"),
        (3, "zzz_missing the"),
    ]
    got = wand_topk_from_postings(
        spark, postings, queries, CFG, n_docs=n_docs, avgdl=avgdl,
        k1=K1, b=B, k=10,
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    docs3 = [(d, t, None) for d, t in docs]
    for qid, qtext in queries:
        exp = oracle_topk(docs3, CFG, qtext, k=10)
        have = sorted(by_q.get(qid, []))
        assert [(r, d) for r, d, _ in have] == [(r, d) for r, d, _ in exp], qtext
        for (_, _, s1), (_, _, s2) in zip(have, exp):
            assert abs(s1 - s2) < 1e-9


@pytest.mark.parametrize("seed,range_bits", [(0, 2), (1, 3), (2, 1)])
def test_partitioned_wand_matches_exhaustive(spark, seed, range_bits):
    """Range-partitioned WAND (one task per (query, doc-range), boundary
    blocks trimmed by the cursor) is rank- and score-identical to the
    exhaustive oracle, including over chunked posting rows."""
    from elasticsearch_analysis_combo_spark.query.wand import wand_topk_partitioned

    rng = random.Random(100 + seed)
    docs = _make_docs(rng, 100)
    stats = _stats(spark, docs).cache()
    row = (
        stats.select("doc_id", "dl").distinct()
        .agg(F.count("*").alias("n"), F.avg("dl").alias("a")).collect()[0]
    )
    n_docs, avgdl = int(row["n"]), float(row["a"])
    postings = build_postings(
        stats, avgdl=avgdl, hot_terms=None, k1=K1, b=B,
        block_size=4, salt_shards=2, with_positions=False,
        max_blocks_per_row=2,
    )
    queries = [
        (0, "the if return"),
        (1, "merge rare1"),
        (2, "the merge index token cache"),
        (3, "zzz_missing the"),
        (4, "rare2 rare3"),
    ]
    got = wand_topk_partitioned(
        spark, postings, queries, CFG, n_docs=n_docs, avgdl=avgdl,
        k1=K1, b=B, k=10, range_bits=range_bits,
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    docs3 = [(d, t, None) for d, t in docs]
    for qid, qtext in queries:
        exp = oracle_topk(docs3, CFG, qtext, k=10)
        have = sorted(by_q.get(qid, []))
        assert [(r, d) for r, d, _ in have] == [(r, d) for r, d, _ in exp], qtext
        for (_, _, s1), (_, _, s2) in zip(have, exp):
            assert abs(s1 - s2) < 1e-9


def test_phrase_over_chunked_rows_matches_unchunked(spark):
    rng = random.Random(7)
    docs = _make_docs(rng, 80)
    stats = _stats(spark, docs).cache()

    def build(cap):
        segs = build_segments(
            stats, avgdl=20.0, salt_shards=3, block_size=4,
            with_positions=True, max_blocks_per_row=cap,
        )
        return merge_segments(
            segs, avgdl=20.0, block_size=4, with_positions=True,
            max_blocks_per_row=cap,
        )

    phrases = [(0, "the if"), (1, "merge index token"), (2, "the the")]
    tiny = phrase_match(spark, build(2), phrases, CFG).collect()
    full = phrase_match(spark, build(100000), phrases, CFG).collect()
    key = lambda r: (r["query_id"], r["doc_id"], r["n_matches"])  # noqa: E731
    assert sorted(map(key, tiny)) == sorted(map(key, full))
    assert len(full) > 0
