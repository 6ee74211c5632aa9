"""At-scale validation (round 2): 200k-doc synthetic code corpus with the
chunk cap forced low enough that hot terms REALLY span many bounded rows,
then rank-identity of WAND and range-partitioned WAND vs the exhaustive
scorer on stop-token-heavy queries, plus wall-clock for each path.

Run detached (~10 min):
  setsid nohup env PYTHONPATH=/root/repo python scripts/validate_at_scale.py \
      > /tmp/at_scale_r2.log 2>&1 &
Writes BENCH/at_scale_r2.json.
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
from elasticsearch_analysis_combo_spark.query.wand import (  # noqa: E402
    wand_topk_from_postings,
    wand_topk_partitioned,
)
from elasticsearch_analysis_combo_spark.session import get_spark  # noqa: E402
from elasticsearch_analysis_combo_spark.sources.corpus import (  # noqa: E402
    generate_corpus,
    ingest,
)

N_DOCS = 200_000
# block_size 128 x cap 64 = rows split every 8192 docs: a df~200k stop term
# becomes ~25 bounded rows — the chunked path is genuinely engaged
MAX_BLOCKS_PER_ROW = 64
CFG = ComboConfig(["whitespace"])
QUERIES = [
    (0, "the if return"),            # all-stop (worst case)
    (1, "merge index segment"),
    (2, "the merge if index return"),
    (3, "token stream cache"),
    (4, "parse_buffer the"),
]


def main() -> None:
    spark = get_spark("at_scale_r2", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_docs": N_DOCS, "max_blocks_per_row": MAX_BLOCKS_PER_ROW}

    gen_dir = tempfile.mkdtemp(prefix="atscale_corpus_")
    generate_corpus(spark, N_DOCS).write.mode("overwrite").parquet(gen_dir)
    corpus = ingest(spark.read.parquet(gen_dir))

    t0 = time.time()
    stats_dir = tempfile.mkdtemp(prefix="atscale_stats_")
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
        with_positions=False, max_blocks_per_row=MAX_BLOCKS_PER_ROW,
    )
    pq_dir = tempfile.mkdtemp(prefix="atscale_postings_")
    postings.write.mode("overwrite").parquet(pq_dir)
    out["index_build_sec"] = round(time.time() - t0, 2)
    out["files_per_sec"] = round(N_DOCS / out["index_build_sec"], 1)
    postings = spark.read.parquet(pq_dir)

    # chunking engaged?
    runs = (
        postings.groupBy("term").agg(F.count("*").alias("rows"))
        .agg(F.max("rows").alias("max_rows"),
             F.sum(F.when(F.col("rows") > 1, 1).otherwise(0)).alias("multi_row_terms"))
        .collect()[0]
    )
    out["max_rows_per_term"] = int(runs["max_rows"])
    out["multi_row_terms"] = int(runs["multi_row_terms"])

    def timed(fn, label):
        times = []
        res = None
        for _ in range(3):
            t = time.time()
            res = fn().collect()
            times.append(time.time() - t)
        out[label + "_p50_sec"] = round(sorted(times)[1], 3)
        return res

    wand = timed(lambda: wand_topk_from_postings(
        spark, postings, QUERIES, CFG, n_docs=n_idx, avgdl=avgdl, k=10
    ), "wand")
    part = timed(lambda: wand_topk_partitioned(
        spark, postings, QUERIES, CFG, n_docs=n_idx, avgdl=avgdl, k=10,
        range_bits=5,
    ), "wand_partitioned")
    term_df = stats.groupBy("term").agg(F.count("*").alias("df"))
    t0 = time.time()
    exh = bm25_exhaustive_topk(
        spark, stats, term_df, QUERIES, CFG, n_idx, avgdl, k=10
    ).collect()
    out["exhaustive_sec"] = round(time.time() - t0, 3)

    def keyset(rows):
        return sorted((r["query_id"], r["rank"], r["doc_id"]) for r in rows)

    out["wand_rank_identical"] = keyset(wand) == keyset(exh)
    out["partitioned_rank_identical"] = keyset(part) == keyset(exh)
    out["rows_compared"] = len(exh)
    scores_ok = True
    exp = {(r["query_id"], r["doc_id"]): r["score"] for r in exh}
    for r in wand + part:
        if abs(exp[(r["query_id"], r["doc_id"])] - r["score"]) > 1e-9:
            scores_ok = False
    out["scores_within_1e9"] = scores_ok

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/at_scale_r2.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
