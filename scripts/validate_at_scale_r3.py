"""At-scale validation (round 3), two parts:

1. 1M-doc synthetic code corpus (5x round 2), chunk cap forced low
   (block_size 128 x cap 64 => a df~1M stop term spans ~120 bounded rows):
   index build files/s, WAND and range-partitioned WAND rank-identity vs
   the exhaustive scorer on stop-token-heavy queries.
2. 200k-doc corpus WITH positions: the new batch-vectorized phrase
   evaluators — single-task vs range-partitioned equality on stop-token
   phrases (exact and slop=1) plus wall-clock for each, evidencing that
   the last single-task hot path from the round-2 review is fixed.

Run detached (~15-20 min):
  setsid nohup env PYTHONPATH=/root/repo python scripts/validate_at_scale_r3.py \
      > /tmp/at_scale_r3.log 2>&1 &
Writes BENCH/at_scale_r3.json.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig  # noqa: E402
from elasticsearch_analysis_combo_spark.analysis.udfs import build_term_stats  # noqa: E402
from elasticsearch_analysis_combo_spark.operators.postings import build_postings  # noqa: E402
from elasticsearch_analysis_combo_spark.query.bm25 import bm25_exhaustive_topk  # noqa: E402
from elasticsearch_analysis_combo_spark.query.phrase import (  # noqa: E402
    phrase_match,
    phrase_match_partitioned,
)
from elasticsearch_analysis_combo_spark.query.wand import (  # noqa: E402
    wand_topk_from_postings,
    wand_topk_partitioned,
)
from elasticsearch_analysis_combo_spark.session import get_spark  # noqa: E402
from elasticsearch_analysis_combo_spark.sources.corpus import (  # noqa: E402
    generate_corpus,
    ingest,
)

N_DOCS = 1_000_000
N_DOCS_PHRASE = 200_000
MAX_BLOCKS_PER_ROW = 64
CFG = ComboConfig(["whitespace"])
QUERIES = [
    (0, "the if return"),            # all-stop (worst case)
    (1, "merge index segment"),
    (2, "the merge if index return"),
    (3, "token stream cache"),
    (4, "parse_buffer the"),
]
PHRASES = [
    (0, "the if"),                   # stop-stop: hottest posting pair
    (1, "token stream"),
    (2, "merge index segment"),
    (3, "return the"),
]


def _build(spark, n_docs, with_positions, out):
    gen_dir = tempfile.mkdtemp(prefix="atscale3_corpus_")
    generate_corpus(spark, n_docs).write.mode("overwrite").parquet(gen_dir)
    corpus = ingest(spark.read.parquet(gen_dir))
    t0 = time.time()
    stats_dir = tempfile.mkdtemp(prefix="atscale3_stats_")
    build_term_stats(corpus, CFG, content_col="content").write.mode(
        "overwrite"
    ).parquet(stats_dir)
    stats = spark.read.parquet(stats_dir)
    g = (
        stats.select("doc_id", "dl").distinct()
        .agg(F.count("*").alias("n"), F.avg("dl").alias("a")).collect()[0]
    )
    n_idx, avgdl = int(g["n"]), float(g["a"])
    hot = (
        stats.sample(0.05, seed=42).groupBy("term")
        .agg(F.count("*").alias("df")).filter(F.col("df") >= 25).select("term")
    )
    postings = build_postings(
        stats, avgdl=avgdl, hot_terms=hot, salt_shards=8,
        with_positions=with_positions, max_blocks_per_row=MAX_BLOCKS_PER_ROW,
    )
    pq_dir = tempfile.mkdtemp(prefix="atscale3_postings_")
    postings.write.mode("overwrite").parquet(pq_dir)
    out["index_build_sec"] = round(time.time() - t0, 2)
    out["files_per_sec"] = round(n_docs / out["index_build_sec"], 1)
    return stats, spark.read.parquet(pq_dir), n_idx, avgdl


def _timed(out, label, fn, reps=3):
    times, res = [], None
    for _ in range(reps):
        t = time.time()
        res = fn().collect()
        times.append(time.time() - t)
    out[label + "_p50_sec"] = round(sorted(times)[len(times) // 2], 3)
    return res


def main() -> None:
    spark = get_spark("at_scale_r3", cores=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    result: dict = {}

    # ---- part 1: 1M docs, WAND vs exhaustive -------------------------------
    w: dict = {"n_docs": N_DOCS, "max_blocks_per_row": MAX_BLOCKS_PER_ROW}
    stats, postings, n_idx, avgdl = _build(spark, N_DOCS, False, w)
    runs = (
        postings.groupBy("term").agg(F.count("*").alias("rows"))
        .agg(F.max("rows").alias("max_rows"),
             F.sum(F.when(F.col("rows") > 1, 1).otherwise(0)).alias("multi"))
        .collect()[0]
    )
    w["max_rows_per_term"] = int(runs["max_rows"])
    w["multi_row_terms"] = int(runs["multi"])
    wand = _timed(w, "wand", lambda: wand_topk_from_postings(
        spark, postings, QUERIES, CFG, n_docs=n_idx, avgdl=avgdl, k=10))
    part = _timed(w, "wand_partitioned", lambda: wand_topk_partitioned(
        spark, postings, QUERIES, CFG, n_docs=n_idx, avgdl=avgdl, k=10,
        range_bits=5))
    term_df = stats.groupBy("term").agg(F.count("*").alias("df"))
    t0 = time.time()
    exh = bm25_exhaustive_topk(
        spark, stats, term_df, QUERIES, CFG, n_idx, avgdl, k=10
    ).collect()
    w["exhaustive_sec"] = round(time.time() - t0, 3)

    def keyset(rows):
        return sorted((r["query_id"], r["rank"], r["doc_id"]) for r in rows)

    w["wand_rank_identical"] = keyset(wand) == keyset(exh)
    w["partitioned_rank_identical"] = keyset(part) == keyset(exh)
    w["rows_compared"] = len(exh)
    exp = {(r["query_id"], r["doc_id"]): r["score"] for r in exh}
    w["scores_within_1e9"] = all(
        abs(exp[(r["query_id"], r["doc_id"])] - r["score"]) <= 1e-9
        for r in wand + part
    )
    result["wand_1m"] = w

    # ---- part 2: 200k docs with positions, phrase single vs partitioned ----
    p: dict = {"n_docs": N_DOCS_PHRASE, "max_blocks_per_row": MAX_BLOCKS_PER_ROW}
    _stats2, postings2, _n2, _a2 = _build(spark, N_DOCS_PHRASE, True, p)
    for slop in (0, 1):
        single = _timed(
            p, f"phrase_single_slop{slop}",
            lambda: phrase_match(spark, postings2, PHRASES, CFG, slop=slop),
        )
        parted = _timed(
            p, f"phrase_partitioned_slop{slop}",
            lambda: phrase_match_partitioned(
                spark, postings2, PHRASES, CFG, slop=slop, range_bits=5),
        )
        sset = sorted((r["query_id"], r["doc_id"], r["n_matches"]) for r in single)
        pset = sorted((r["query_id"], r["doc_id"], r["n_matches"]) for r in parted)
        p[f"identical_slop{slop}"] = sset == pset
        p[f"match_rows_slop{slop}"] = len(sset)
    result["phrase_200k"] = p

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/at_scale_r3.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
