"""At-scale validation of the round-5f additions.

* aggs-compiler round-5f kinds over a 2M-row synthetic events frame
  (deterministic spark.range derivation — no data files shuffled in):
  random_sampler (sampled doc_count within binomial tolerance of p*N
  AND bit-identical across two different partitionings — the
  engine-replayability invariant), top_hits (compiler rows == a direct
  window replay), median_absolute_deviation (== exact two-step
  computation), geohash_grid / ip_range / auto_date_histogram /
  string_stats / rate / serial_diff / moving_fn / percentiles_bucket
  (mass-conservation + hand-replay spot checks). Wall time per tree.
* nested-bool DSL fold at a 200k-doc positional index: the folded
  query vs its independently hand-flattened equivalent — ROW IDENTITY
  (rank + 6-rounded score), the invariant that must hold at any scale.

Run detached (~6-10 min), NEVER concurrently with another Spark job:
  setsid nohup env PYTHONPATH=/root/repo python \
      scripts/validate_r5f_features.py > /tmp/r5f_features.log 2>&1 &
Writes BENCH/at_scale_r5f_features.json.
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
from elasticsearch_analysis_combo_spark.query.aggcompiler import (  # noqa: E402
    dsl_aggs,
)
from elasticsearch_analysis_combo_spark.query.dsl import dsl_topk  # noqa: E402
from elasticsearch_analysis_combo_spark.session import get_spark  # noqa: E402
from elasticsearch_analysis_combo_spark.sources.corpus import (  # noqa: E402
    generate_corpus,
    ingest,
)

N_ROWS = 2_000_000
N_DOCS = 200_000
CFG = ComboConfig(["whitespace"])

NESTED = {"bool": {"must": [
    {"match": {"content": "the"}},
    {"bool": {
        "must": [{"match": {"content": "if"}}],
        "must_not": [{"match": {"content": "return"}}],
        "filter": [{"range": {"doc_id": {"lt": 150_000}}}],
    }},
]}}
FLAT = {"bool": {
    "must": [{"match": {"content": "the"}}, {"match": {"content": "if"}}],
    "must_not": [{"match": {"content": "return"}}],
    "filter": [{"range": {"doc_id": {"lt": 150_000}}}],
}}


def synth_events(spark, n):
    """Deterministic 'events' frame: hash-derived type/value/ts/ip/geo
    columns over spark.range — pure codegen, no files."""
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("t"), F.pmod(F.col("id") * 131, F.lit(20))
                 .cast("string")).alias("event_type"),
        (F.pmod(F.col("id") * 2654435761, F.lit(100_000)) / 100.0)
        .alias("value"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.pmod(F.col("id") * 7919,
                                          F.lit(90 * 86400))
        ).alias("ts"),
        F.concat(
            F.lit("10."), F.pmod(F.col("id"), F.lit(4)).cast("string"),
            F.lit("."), F.pmod(F.col("id") * 3, F.lit(256)).cast("string"),
            F.lit("."), F.pmod(F.col("id") * 17, F.lit(256)).cast("string"),
        ).alias("ip"),
        (F.pmod(F.col("id") * 37, F.lit(18000)) / 100.0 - 90.0)
        .alias("lat"),
        (F.pmod(F.col("id") * 53, F.lit(36000)) / 100.0 - 180.0)
        .alias("lon"),
        F.concat(F.lit("p"), F.pmod(F.col("id"), F.lit(97))
                 .cast("string")).alias("props"),
    )


def main():
    report = {"n_rows": N_ROWS, "n_docs": N_DOCS}
    spark = get_spark("r5f_features", cores=32, shuffle_partitions=32)

    ev = synth_events(spark, N_ROWS).cache()
    ev.count()

    # ---- random_sampler: tolerance + partitioning invariance
    t0 = time.time()
    p = 0.1
    tree = {"samp": {"random_sampler": {
        "probability": p, "seed": 11, "key_field": "event_id"},
        "aggs": {"sv": {"sum": {"field": "value"}}}}}
    out7 = {(r["metric"]): r["value"]
            for r in dsl_aggs(ev.repartition(7), tree).collect()}
    out64 = {(r["metric"]): r["value"]
             for r in dsl_aggs(ev.repartition(64), tree).collect()}
    n_scaled = out7["doc_count"]
    report["sampler_secs"] = round(time.time() - t0, 2)
    report["sampler_doc_count_scaled"] = n_scaled
    # binomial: sd of count ~ sqrt(N p (1-p)); scaled by 1/p
    sd_scaled = (N_ROWS * p * (1 - p)) ** 0.5 / p
    report["sampler_within_5sd"] = abs(n_scaled - N_ROWS) < 5 * sd_scaled
    report["sampler_partition_invariant"] = (
        out7["doc_count"] == out64["doc_count"]
        and abs(out7["sv"] - out64["sv"]) < 1e-6 * abs(out7["sv"])
    )

    # ---- top_hits: compiler rows == direct window replay
    t0 = time.time()
    th = dsl_aggs(ev, {"types": {
        "terms": {"field": "event_type", "size": 5},
        "aggs": {"best": {"top_hits": {
            "size": 3, "sort": [{"value": "desc"}],
            "_source": ["event_id"]}}},
    }})
    got = sorted(
        (r["key"], r["metric"], r["value"])
        for r in th.collect() if r["metric"].startswith("best.")
    )
    from pyspark.sql import Window
    w_cnt = ev.groupBy("event_type").count() \
        .orderBy(F.desc("count"), F.asc("event_type")).limit(5)
    top_types = [r["event_type"] for r in w_cnt.collect()]
    w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.asc("event_id"))
    ref = ev.filter(F.col("event_type").isin(top_types)) \
        .withColumn("_rk", F.row_number().over(w)) \
        .filter(F.col("_rk") <= 3)
    want = sorted(
        (r["event_type"], f"best.{r['_rk']}.event_id",
         float(r["event_id"]))
        for r in ref.collect()
    )
    report["tophits_secs"] = round(time.time() - t0, 2)
    report["tophits_identity"] = got == want
    report["tophits_rows"] = len(got)

    # ---- MAD: compiler == exact two-step
    t0 = time.time()
    mad = {r["key"]: r["value"] for r in dsl_aggs(ev, {"types": {
        "terms": {"field": "event_type", "size": 3},
        "aggs": {"m": {"median_absolute_deviation": {"field": "value"}}},
    }}).collect() if r["metric"] == "m"}
    meds = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med"))
    exact = {
        r["event_type"]: r["mad"]
        for r in ev.join(meds, "event_type")
        .groupBy("event_type")
        .agg(F.percentile(F.abs(F.col("value") - F.col("med")),
                          F.lit(0.5)).alias("mad"))
        .collect()
    }
    report["mad_secs"] = round(time.time() - t0, 2)
    report["mad_identity"] = all(
        abs(v - exact[k]) < 1e-9 for k, v in mad.items()
    )

    # ---- geo/ip/auto/string_stats/rate/pipelines: one combined tree
    t0 = time.time()
    rows = dsl_aggs(ev, {
        "cells": {"geohash_grid": {"lat_field": "lat",
                                   "lon_field": "lon", "precision": 2}},
        "nets": {"ip_range": {"field": "ip", "ranges": [
            {"to": "10.1.0.0", "key": "a"},
            {"from": "10.1.0.0", "to": "10.3.0.0", "key": "b"},
            {"from": "10.3.0.0", "key": "c"}]}},
        "auto": {"auto_date_histogram": {"field": "ts", "buckets": 40}},
        "plen": {"string_stats": {"field": "props"}},
        "daily": {"date_histogram": {"field": "ts",
                                     "fixed_interval": "7d"},
                  "aggs": {"v": {"sum": {"field": "value"}},
                           "r": {"rate": {"unit": "day"}},
                           "sd": {"serial_diff": {"buckets_path": "v"}},
                           "mv": {"moving_fn": {
                               "buckets_path": "v", "window": 4,
                               "script": "MovingFunctions.sum(values)"}}}},
        "wk_pcts": {"percentiles_bucket": {"buckets_path": "daily>v",
                                           "percents": [50.0]}},
    }).collect()
    report["combined_tree_secs"] = round(time.time() - t0, 2)
    by = {}
    for r in rows:
        by.setdefault((r["agg"], r["metric"]), []).append(r["value"])
    report["geo_mass_ok"] = sum(by[("cells", "doc_count")]) == N_ROWS
    report["ip_mass_ok"] = sum(by[("nets", "doc_count")]) == N_ROWS
    report["auto_mass_ok"] = sum(by[("auto", "doc_count")]) == N_ROWS
    report["auto_n_buckets"] = len(by[("auto", "doc_count")])
    report["string_stats_count_ok"] = (
        by[("plen", "plen.count")][0] == N_ROWS
    )
    # rate = doc_count / 7 per 7d bucket: sum(rates)*7 == N
    report["rate_mass_ok"] = (
        abs(sum(by[("daily", "r")]) * 7 - N_ROWS) < 1e-6
    )
    report["pcts_bucket_rows"] = len(by[("wk_pcts", "wk_pcts.50")])
    ev.unpersist()

    # ---- nested-bool fold at 200k docs: folded == hand-flattened
    corpus = ingest(generate_corpus(spark, N_DOCS, seed=5)).cache()
    stats = build_term_stats(corpus, CFG).cache()
    stats.count()
    n_docs = stats.select("doc_id").distinct().count()
    avgdl = stats.select("doc_id", "dl").distinct().agg(
        F.avg("dl")).collect()[0][0]
    term_df = stats.groupBy("term").agg(F.count("*").alias("df"))
    meta = corpus.select("doc_id", F.length("content").alias("n_chars"))

    def run(node, qid):
        t0 = time.time()
        out = dsl_topk(
            spark, stats, term_df, None, [(qid, node)], CFG,
            n_docs, avgdl, doc_meta=meta, k=20,
        ).collect()
        return [(r["rank"], r["doc_id"], round(r["score"], 6))
                for r in sorted(out, key=lambda r: r["rank"])], \
            round(time.time() - t0, 2)

    folded, t_folded = run(NESTED, 0)
    flat, t_flat = run(FLAT, 1)
    report["nested_fold_identity"] = folded == flat
    report["nested_fold_rows"] = len(folded)
    report["nested_fold_secs"] = t_folded
    report["flat_secs"] = t_flat

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "at_scale_r5f_features.json",
    )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
