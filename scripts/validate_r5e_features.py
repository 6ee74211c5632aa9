"""At-scale validation of the round-5e additions (200k docs).

* DSL span routes (span_near / span_or / span_first / span_not in one
  dsl_topk batch) at a real 200k-doc positional index: single-task vs
  doc-range-partitioned ROW IDENTITY (rank + 6-rounded score) + wall
  times for both paths.
* function_score / script_score / boosting routes at 200k docs: the
  transform is one metadata join + CASE projection over the unranked
  scored set — wall time and top-k sanity (the gauss winner must
  differ from the plain-BM25 winner when the decay dominates).

Run detached (~8-12 min), NEVER concurrently with another Spark job:
  setsid nohup env PYTHONPATH=/root/repo python \
      scripts/validate_r5e_features.py > /tmp/r5e_features.log 2>&1 &
Writes BENCH/at_scale_r5e_features.json.
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
CFG = ComboConfig(["whitespace"])

ST = lambda t: {"span_term": {"content": t}}  # noqa: E731

SPAN_QUERIES = [
    # stop-grade clauses so the positional evaluation is the real cost
    (0, {"span_near": {"clauses": [ST("the"), ST("if")],
                       "slop": 2, "in_order": True}}),
    (1, {"span_or": {"clauses": [ST("return"), ST("class")]}}),
    (2, {"span_first": {"match": ST("the"), "end": 5}}),
    (3, {"span_not": {"include": ST("the"), "exclude": ST("if"),
                      "post": 1}}),
]


def rows_of(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in df.collect()
    )


def main():
    out = {"n_docs": N_DOCS}
    spark = get_spark("r5e_val", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    docs = ingest(generate_corpus(spark, N_DOCS)).select(
        "doc_id", "content"
    )
    stats = build_term_stats(docs, CFG).cache()
    n_docs = stats.select("doc_id").distinct().count()
    avgdl = stats.select("doc_id", "dl").distinct().agg(
        F.avg("dl")
    ).collect()[0][0]
    term_df = stats.groupBy("term").agg(F.count("*").alias("df")).cache()
    term_df.count()
    segs = build_segments(stats, avgdl=avgdl, salt_shards=4,
                          block_size=128, with_positions=True)
    post = merge_segments(segs, avgdl=avgdl, block_size=128,
                          with_positions=True).cache()
    post.count()

    # --- span routes: single-task vs partitioned identity + timing ---
    t0 = time.time()
    single = rows_of(dsl_topk(
        spark, stats, term_df, post, SPAN_QUERIES, CFG, n_docs, avgdl,
        k=10,
    ))
    out["span_single_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    parts = rows_of(dsl_topk(
        spark, stats, term_df, post, SPAN_QUERIES, CFG, n_docs, avgdl,
        k=10, span_range_bits=4,
    ))
    out["span_partitioned_sec"] = round(time.time() - t0, 2)
    out["span_rows"] = len(single)
    out["span_identity"] = single == parts

    # --- score-transform routes over the same corpus ---
    meta = docs.select(
        "doc_id", F.length("content").alias("n_chars")
    ).cache()
    meta.count()
    t0 = time.time()
    fs = dsl_topk(
        spark, stats, term_df, None,
        [(0, {"function_score": {
            "query": {"match": {"content": "the if"}},
            "gauss": {"n_chars": {"origin": 200.0, "scale": 80.0,
                                  "decay": 0.5}}}}),
         (1, {"script_score": {
             "query": {"match": {"content": "the if"}},
             "script": {"source": "_score / (1.0 + n_chars / 1000.0)"}}}),
         (2, {"boosting": {
             "positive": {"match": {"content": "the if"}},
             "negative": {"range": {"n_chars": {"gte": 500}}},
             "negative_boost": 0.1}})],
        CFG, n_docs, avgdl, doc_meta=meta, k=10,
    ).collect()
    out["fscore_sec"] = round(time.time() - t0, 2)
    out["fscore_rows"] = len(fs)
    base = dsl_topk(
        spark, stats, term_df, None,
        [(0, {"match": {"content": "the if"}})],
        CFG, n_docs, avgdl, doc_meta=meta, k=10,
    ).collect()
    top_fs = min((r for r in fs if r["query_id"] == 0),
                 key=lambda r: r["rank"])["doc_id"]
    top_base = min(base, key=lambda r: r["rank"])["doc_id"]
    out["gauss_reorders_topk"] = bool(top_fs != top_base)

    spark.stop()
    with open("BENCH/at_scale_r5e_features.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
