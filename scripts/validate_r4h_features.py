"""At-scale validation for the round-4h surfaces (200k docs).

* intervals (minimal-interval match / all_of / any_of) on stop-grade
  terms over a 200k-doc positional index: doc-range partitioned ==
  single-task (row identity), both timed.
* es_dsl: a mixed bool (stop-word must + phrase should + must_not +
  metadata filter) through dsl_topk, partitioned phrases vs single-task
  row identity + timing; the filter leg exercises the pre-rank
  semi-join at scale.
* nested_query over 200k rows with ~60-element array<struct> columns,
  timed — map-only array algebra must stay scan-speed.

Run detached (~5-8 min):
  setsid nohup env PYTHONPATH=/root/repo python \
      scripts/validate_r4h_features.py > /tmp/r4h_features.log 2>&1 &
Writes BENCH/at_scale_r4h_features.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig  # noqa: E402
from elasticsearch_analysis_combo_spark.analysis.udfs import build_term_stats  # noqa: E402
from elasticsearch_analysis_combo_spark.operators.postings import (  # noqa: E402
    build_postings,
)
from elasticsearch_analysis_combo_spark.query.dsl import dsl_topk  # noqa: E402
from elasticsearch_analysis_combo_spark.query.intervals import (  # noqa: E402
    intervals_match,
)
from elasticsearch_analysis_combo_spark.query.relations import (  # noqa: E402
    nested_query,
)
from elasticsearch_analysis_combo_spark.session import get_spark  # noqa: E402
from elasticsearch_analysis_combo_spark.sources.corpus import (  # noqa: E402
    generate_corpus,
    ingest,
)

N_DOCS = 200_000
CFG = ComboConfig(["whitespace"])

INTERVAL_RULES = [
    (0, {"match": {"query": "token stream", "ordered": True,
                   "max_gaps": 3}}),
    (1, {"match": {"query": "return cache", "max_gaps": 8}}),
    (2, {"all_of": {"ordered": True, "max_gaps": 6,
                    "intervals": [{"match": {"query": "the"}},
                                  {"match": {"query": "if"}}]}}),
    (3, {"any_of": {"intervals": [
        {"match": {"query": "token stream", "ordered": True,
                   "max_gaps": 0}},
        {"match": {"query": "the return", "max_gaps": 4}}]}}),
]

DSL_REQS = [
    (0, {"bool": {
        "must": [{"match": {"content": "the"}}],
        "should": [{"match_phrase": {"content": "token stream"}}],
        "must_not": [{"match": {"content": "zzz_nope"}}],
        "filter": [{"range": {"n_chars": {"gte": 200}}},
                   {"term": {"bucket": 1}}],
    }}),
    (1, {"bool": {
        "must": [{"match": {"content": {"query": "return cache",
                                        "operator": "and"}}}],
        "filter": [{"range": {"n_chars": {"lt": 5000}}}],
    }}),
]


def _timed(out, label, fn, reps=3):
    times, res = [], None
    for _ in range(reps):
        t = time.time()
        res = fn()
        times.append(time.time() - t)
    out[label + "_p50_sec"] = round(sorted(times)[len(times) // 2], 3)
    return res


def main():
    spark = get_spark("r4h_features", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out = {"n_docs": N_DOCS}

    corpus = ingest(generate_corpus(spark, N_DOCS)).cache()
    corpus.count()
    t0 = time.time()
    stats = build_term_stats(corpus, CFG, content_col="content").cache()
    avgdl = float(stats.select(F.avg("dl")).collect()[0][0])
    n_docs = stats.select("doc_id").distinct().count()
    hot_list = [
        r["term"]
        for r in stats.sample(0.05, seed=42)
        .groupBy("term").agg(F.count("*").alias("df"))
        .filter(F.col("df") >= max(4, int((N_DOCS // 10) * 0.05)))
        .collect()
    ]
    hot = spark.createDataFrame(
        [(t,) for t in hot_list] or [("",)], "term string"
    )
    post = build_postings(
        stats, avgdl=avgdl, hot_terms=hot, salt_shards=8,
        with_positions=True,
    ).cache()
    post.count()
    out["index_build_sec"] = round(time.time() - t0, 2)
    term_df = stats.groupBy("term").agg(F.count("*").alias("df")).cache()
    term_df.count()

    def rows(df):
        return {
            (r["query_id"], r["doc_id"]): r["n_matches"] for r in df.collect()
        }

    single = _timed(
        out, "intervals_single",
        lambda: rows(intervals_match(spark, post, INTERVAL_RULES, CFG)),
    )
    part = _timed(
        out, "intervals_partitioned",
        lambda: rows(intervals_match(spark, post, INTERVAL_RULES, CFG,
                                     range_bits=4)),
    )
    out["intervals_equal"] = single == part
    out["intervals_rows"] = len(single)

    meta = corpus.select(
        "doc_id",
        F.length("content").alias("n_chars"),
        F.pmod(F.col("doc_id"), F.lit(4)).cast("int").alias("bucket"),
    )

    def dsl_rows(partitioned):
        df = dsl_topk(
            spark, stats, term_df, post, DSL_REQS, CFG, n_docs, avgdl,
            doc_meta=meta, k=10, partitioned_phrases=partitioned,
        )
        return {
            (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 6))
            for r in df.collect()
        }

    d_single = _timed(out, "es_dsl_single", lambda: dsl_rows(False))
    d_part = _timed(out, "es_dsl_partitioned", lambda: dsl_rows(True))
    out["es_dsl_equal"] = d_single == d_part
    out["es_dsl_rows"] = len(d_single)

    nested = corpus.select(
        "doc_id",
        F.expr(
            "transform(split(content, ' '), (x, i) -> "
            "struct(x AS tok, i AS pos, length(x) AS len))"
        ).alias("items"),
    )
    _timed(
        out, "nested_query",
        lambda: nested_query(
            nested, "items", "x.len >= 6", score_mode="max",
            score_expr="x.len", min_children=3,
        ).agg(F.count("*"), F.sum("score")).collect(),
    )

    with open("BENCH/at_scale_r4h_features.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
