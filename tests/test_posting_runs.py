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

import numpy as np
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


@pytest.mark.parametrize("analyzer", ["whitespace", "standard", "identifier", "english"])
def test_vectorized_term_stats_equals_token_path(spark, analyzer):
    """The batch-vectorized single-analyzer term_stats path must equal the
    full token path (forced via a dedup'd double-analyzer config, which is
    semantically identical for analyzers emitting unique positions),
    including null/empty docs."""
    import random as _random

    VOCAB = ["the", "if", "Return", "merge", "getFoo", "a_b", "x9", "schön"]
    rng = _random.Random(3)
    rows = [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(0, 30))))
        for i in range(200)
    ]
    rows += [(998, None), (999, "")]
    df = spark.createDataFrame(rows, "doc_id long, content string")

    from elasticsearch_analysis_combo_spark.operators.codec import (
        decode_positions_flat,
    )

    def canon(out):
        return sorted(
            (
                r["doc_id"], r["term"], r["tf"],
                tuple(decode_positions_flat(
                    bytes(r["pos_data"]), np.array([r["tf"]], dtype=np.int64)
                ).tolist()),
                r["dl"],
            )
            for r in out.collect()
        )

    fast = canon(build_term_stats(df, ComboConfig([analyzer])))
    slow = canon(
        build_term_stats(df, ComboConfig([analyzer, analyzer], deduplication=True))
    )
    assert fast == slow
    assert len(fast) > 0


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("with_positions", [True, False])
def test_batched_encoder_bit_identical_to_per_term(seed, with_positions):
    """The whole-chunk vectorized encoder must produce byte-identical rows
    to the per-term _encode_blocks path (headers, varint streams, df/cf,
    run chunking) on randomized sorted stats."""
    from elasticsearch_analysis_combo_spark.operators.postings import (
        _encode_blocks,
        encode_posting_rows_batched,
    )

    rng = np.random.default_rng(seed)
    n, vocab = 5000, 300
    codes = np.sort(rng.integers(0, vocab, n))
    doc_ids = rng.integers(-(2**62), 2**62, n)
    order = np.lexsort((doc_ids, codes))
    codes, doc_ids = codes[order], doc_ids[order]
    # dedupe (term, doc) collisions: bump doc until strictly increasing
    for i in range(1, n):
        if codes[i] == codes[i - 1] and doc_ids[i] <= doc_ids[i - 1]:
            doc_ids[i] = doc_ids[i - 1] + 1
    tfs = rng.integers(1, 5, n).astype(np.int64)
    dls = rng.integers(5, 400, n).astype(np.int64)
    positions = np.empty(n, dtype=object)
    for i in range(n):
        positions[i] = np.sort(rng.integers(1, 500, int(tfs[i]))).astype(np.int64)
    terms = np.array([f"t{c:04d}" for c in codes], dtype=object)
    from elasticsearch_analysis_combo_spark.operators.codec import (
        encode_positions_rows,
    )

    packed = np.empty(n, dtype=object)
    packed[:] = encode_positions_rows(
        np.concatenate(list(positions)), tfs
    )
    cols = {"term": terms, "doc_id": doc_ids, "tf": tfs, "dl": dls,
            "pos_data": packed}
    starts = np.nonzero(np.concatenate([[True], codes[1:] != codes[:-1]]))[0]
    ends = np.append(starts[1:], n)

    block_size, cap = 7, 3
    avgdl, k1, b = 120.0, 1.2, 0.75
    got = encode_posting_rows_batched(
        cols, starts, ends, avgdl, k1, b, block_size, cap, with_positions
    )

    exp = []
    tf_cum = np.concatenate([[0], np.cumsum(tfs)])
    for s, e in zip(starts, ends):
        d, t, l = doc_ids[s:e], tfs[s:e], dls[s:e]
        p = None
        if with_positions:
            p = np.concatenate(list(positions[s:e])).astype(np.uint64)
        blocks = _encode_blocks(d, t, l, p, avgdl, k1, b, block_size)
        # the pos_flat path and the pre-packed path must stay bit-identical
        df_t, cf_t = e - s, int(t.sum())
        for ri, off in enumerate(range(0, len(blocks), cap)):
            chunk = blocks[off:off + cap]
            exp.append((terms[s], ri, df_t, cf_t,
                        max(bl["max_impact"] for bl in chunk), chunk))

    assert len(got) == len(exp)
    for g, x in zip(got, exp):
        assert g[0] == x[0] and g[1] == x[1] and g[2] == x[2] and g[3] == x[3]
        assert abs(g[4] - x[4]) < 1e-12
        assert len(g[5]) == len(x[5])
        for gb, xb in zip(g[5], x[5]):
            assert gb["first_doc"] == xb["first_doc"]
            assert gb["last_doc"] == xb["last_doc"]
            assert gb["n"] == xb["n"]
            assert abs(gb["max_impact"] - xb["max_impact"]) < 1e-12
            assert gb["data"] == xb["data"]
            assert gb["pos_data"] == xb["pos_data"]


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


def test_range_salted_hot_path_equals_merge(spark):
    """build_postings with hot terms (range-salted, merge-free finalize)
    must contain exactly the same postings content as the all-salted
    segment+merge path: same terms, term totals, and decoded
    (doc, tf, dl, positions) sequences in global doc order."""
    from elasticsearch_analysis_combo_spark.operators.postings import (
        term_blocks_from_rows,
    )

    rng = random.Random(11)
    docs = _make_docs(rng, 120)
    stats = _stats(spark, docs).cache()
    row = (
        stats.select("doc_id", "dl").distinct()
        .agg(F.count("*").alias("n"), F.avg("dl").alias("a")).collect()[0]
    )
    avgdl = float(row["a"])
    # hot = the stop tokens (df threshold low so the hot path is exercised)
    term_df = stats.groupBy("term").agg(F.count("*").alias("df"))
    hot = term_df.filter(F.col("df") >= 30).select("term")
    assert hot.count() >= 3

    fast = build_postings(
        stats, avgdl=avgdl, hot_terms=hot, block_size=8, salt_shards=4,
        with_positions=True, max_blocks_per_row=2,
    ).collect()
    segs = build_segments(stats, avgdl=avgdl, salt_shards=4, block_size=8,
                          with_positions=True, max_blocks_per_row=2)
    merged = merge_segments(segs, avgdl=avgdl, block_size=8,
                            with_positions=True, max_blocks_per_row=2).collect()

    def decode_all(rows):
        by_term: dict[str, list] = {}
        for r in rows:
            by_term.setdefault(r["term"], []).append(r)
        out = {}
        for term, trows in by_term.items():
            blocks = term_blocks_from_rows(
                [r["run_idx"] for r in trows], [r["blocks"] for r in trows]
            )
            d, t, l, p = decode_segment_blocks(blocks, True)
            assert (d[1:] > d[:-1]).all(), term  # global doc order
            out[term] = (
                trows[0]["df"], trows[0]["cf"],
                d.tolist(), t.tolist(), l.tolist(),
                [list(map(int, x)) for x in p],
            )
        return out

    a, bb = decode_all(fast), decode_all(merged)
    assert a.keys() == bb.keys()
    for term in a:
        assert a[term] == bb[term], term

    # adaptive per-term shard counts (df-proportional ranges) must decode
    # to the SAME content in the same global doc order, and shard counts
    # must actually differ across hot terms of different df
    adaptive = build_postings(
        stats, avgdl=avgdl, hot_terms=term_df.filter(F.col("df") >= 30),
        block_size=8, with_positions=True, max_blocks_per_row=2,
        target_postings_per_shard=25,
    ).collect()
    c = decode_all(adaptive)
    assert c.keys() == bb.keys()
    for term in c:
        assert c[term] == bb[term], term
    hot_dfs = {
        r["term"]: r["df"]
        for r in term_df.filter(F.col("df") >= 30).collect()
    }
    runs_per_term: dict[str, set] = {}
    for r in adaptive:
        if r["term"] in hot_dfs:
            runs_per_term.setdefault(r["term"], set()).add(
                r["run_idx"] >> 20  # shard id from the stride
            )
    import math as _m

    for term, shards in runs_per_term.items():
        assert len(shards) <= min(2047, _m.ceil(hot_dfs[term] / 25))


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
