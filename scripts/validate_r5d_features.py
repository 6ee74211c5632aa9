"""At-scale validation of the round-5d additions (200k docs / 20M rows).

* wildcard/regexp SCORING clauses through dsl_topk at a real 200k-doc
  vocabulary: the expansion is a distributed capped dictionary job
  (never a driver collect); wall time + top-k sanity.
* match_phrase_prefix DSL route at 200k docs: prefix expansion over the
  dictionary + candidate-restricted dl join; wall time + hit sanity.
* more_like_this DSL route at 200k docs; wall time.
* aggcompiler v2 over 20M rows: histogram + cumulative_sum + derivative
  + bucket_script + bucket_selector + sibling avg_bucket + multi_terms
  + date_range + global in ONE body — the pipeline windows see only the
  reduced bucket frame, so wall time is the row reduce; bucket-count
  sanity.

Run detached (~6-10 min), NEVER concurrently with another Spark job:
  setsid nohup env PYTHONPATH=/root/repo python \
      scripts/validate_r5d_features.py > /tmp/r5d_features.log 2>&1 &
Writes BENCH/at_scale_r5d_features.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig  # noqa: E402
from elasticsearch_analysis_combo_spark.analysis.udfs import (  # noqa: E402
    build_term_stats,
)
from elasticsearch_analysis_combo_spark.operators.postings import (  # noqa: E402
    build_segments,
    merge_segments,
)
from elasticsearch_analysis_combo_spark.query.dsl import dsl_topk  # noqa: E402
from elasticsearch_analysis_combo_spark.session import get_spark  # noqa: E402
from elasticsearch_analysis_combo_spark.sources.corpus import (  # noqa: E402
    generate_corpus,
    ingest,
)

N_DOCS = 200_000
N_ROWS = 20_000_000
CFG = ComboConfig(["whitespace"])


def main():
    out = {"n_docs": N_DOCS, "n_rows": N_ROWS}
    spark = get_spark("r5d_val", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    docs = ingest(generate_corpus(spark, N_DOCS)).select(
        "doc_id", F.col("content")
    )
    stats = build_term_stats(docs, CFG).cache()
    n_docs = stats.select("doc_id").distinct().count()
    avgdl = stats.select("doc_id", "dl").distinct().agg(
        F.avg("dl")
    ).collect()[0][0]
    term_df = stats.groupBy("term").agg(F.count("*").alias("df")).cache()
    out["vocab"] = term_df.count()

    # --- wildcard + regexp scoring clauses (one dsl_topk batch) ---
    t0 = time.time()
    wc = dsl_topk(
        spark, stats, term_df, None,
        [(0, {"wildcard": {"content": "qu*y"}}),
         # anchored over the vocab: merge_token / merge_stream /
         # mergeToken... ("ha.h|mer.e" in the first pass matched NO
         # standalone token — every vocab identifier is a compound)
         (1, {"regexp": {"content": {"value": "mer.e_tok.*|mer.eStr.*"}}})],
        CFG, n_docs, avgdl, k=10, max_expansions=50,
    ).collect()
    out["wildcard_regexp_sec"] = round(time.time() - t0, 2)
    out["wildcard_rows"] = len(wc)
    out["wildcard_ok"] = (
        len(wc) == 20 and all(r["score"] > 0 for r in wc)
    )

    # --- match_phrase_prefix + more_like_this DSL routes ---
    segs = build_segments(stats, avgdl=avgdl, salt_shards=4,
                          block_size=128, with_positions=True)
    post = merge_segments(segs, avgdl=avgdl, block_size=128,
                          with_positions=True).cache()
    post.count()
    t0 = time.time()
    mpp = dsl_topk(
        spark, stats, term_df, post,
        [(0, {"match_phrase_prefix": {"content": "the qu"}})],
        CFG, n_docs, avgdl, k=10,
    ).collect()
    out["mpp_sec"] = round(time.time() - t0, 2)
    out["mpp_hits"] = len(mpp)
    t0 = time.time()
    mlt = dsl_topk(
        spark, stats, term_df, None,
        [(0, {"more_like_this": {"like": {"_id": int(mpp[0]["doc_id"])},
                                 "min_doc_freq": 2}})],
        CFG, n_docs, avgdl, k=10,
    ).collect()
    out["mlt_sec"] = round(time.time() - t0, 2)
    out["mlt_hits"] = len(mlt)

    # --- aggcompiler v2 over 20M rows: pipeline windows stay
    # bucket-count-sized, so this times the partial-agg row reduce ---
    from elasticsearch_analysis_combo_spark.query.aggcompiler import (
        dsl_search_aggs,
    )

    rows = spark.range(N_ROWS).selectExpr(
        "id as doc_id",
        "cast(id % 3 as string) as status",
        "cast(id % 5 as string) as prio",
        "cast(pmod(hash(id), 100000) as double) / 100.0 as price",
        "timestamp_seconds(1700000000 + (id % 31536000)) as ts",
    )
    body = {
        "query": {"range": {"price": {"gte": 1.0}}},
        "aggs": {
            "hist": {"histogram": {"field": "price", "interval": 100.0},
                     "aggs": {"s": {"sum": {"field": "price"}},
                              "cum": {"cumulative_sum":
                                      {"buckets_path": "_count"}},
                              "d": {"derivative": {"buckets_path": "s"}},
                              "ps": {"bucket_script": {
                                  "buckets_path": {"s": "s",
                                                   "c": "_count"},
                                  "script": "s / c"}}}},
            "busy": {"terms": {"field": "status", "size": 5},
                     "aggs": {"s": {"sum": {"field": "price"}},
                              "keep": {"bucket_selector": {
                                  "buckets_path": {"c": "_count"},
                                  "script": "c >= 1000"}}}},
            "avg_s": {"avg_bucket": {"buckets_path": "busy>s"}},
            "mt": {"multi_terms": {"terms": [{"field": "status"},
                                             {"field": "prio"}],
                                   "size": 6}},
            "eras": {"date_range": {"field": "ts", "ranges": [
                {"to": "2024-06-01 00:00:00", "key": "a"},
                {"from": "2024-06-01 00:00:00", "key": "b"}]}},
            "all": {"global": {},
                    "aggs": {"n": {"value_count": {"field": "doc_id"}}}},
        },
    }
    t0 = time.time()
    agg_rows = dsl_search_aggs(rows, body).collect()
    out["aggs_v2_20m_sec"] = round(time.time() - t0, 2)
    out["aggs_v2_rows"] = len(agg_rows)
    vals = {(r["agg"], r["key"], r["metric"]): r["value"] for r in agg_rows}
    out["global_count_ok"] = vals.get(("all", "", "doc_count")) == float(
        N_ROWS
    )
    out["sibling_present"] = ("avg_s", "", "avg_s") in vals
    out["pipeline_rows_ok"] = any(k[0] == "hist" and k[2] == "cum"
                                  for k in vals)

    spark.stop()
    with open("BENCH/at_scale_r5d_features.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
