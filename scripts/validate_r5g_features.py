"""At-scale validation of the round-5g additions.

* aggs-compiler geo kinds over a 2M-row synthetic events frame:
  geo_distance ring doc_counts conserve mass; geo_centroid/geo_bounds
  equal a direct groupBy replay; diversified_sampler picks the SAME
  sample under two different partitionings (the engine-replayability
  invariant) and respects its per-value cap.
* DSL filter leaves at 2M rows: the compiled geo_distance predicate's
  membership equals query/geo.py::geo_distance row-for-row.
* rank_feature / distance_feature DSL queries at a 200k-doc corpus:
  the lone-query top-k equals a direct formula computation, and the
  feature-should-next-to-text query equals BM25 + formula join (rank
  identity at k=20). query_string route == simple_query_string route.

Run detached (~5-8 min), NEVER concurrently with another Spark job:
  setsid nohup env PYTHONPATH=/root/repo python \
      scripts/validate_r5g_features.py > /tmp/r5g_features.log 2>&1 &
Writes BENCH/at_scale_r5g_features.json.
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
from elasticsearch_analysis_combo_spark.query.dsl import (  # noqa: E402
    compile_filter,
    dsl_topk,
)
from elasticsearch_analysis_combo_spark.query.geo import (  # noqa: E402
    geo_distance,
)
from elasticsearch_analysis_combo_spark.session import get_spark  # noqa: E402
from elasticsearch_analysis_combo_spark.sources.corpus import (  # noqa: E402
    generate_corpus,
    ingest,
)

N_ROWS = 2_000_000
N_DOCS = 200_000
CFG = ComboConfig(["whitespace"])


def synth_events(spark, n):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("t"), F.pmod(F.col("id") * 131, F.lit(20))
                 .cast("string")).alias("event_type"),
        (F.pmod(F.col("id") * 2654435761, F.lit(100_000)) / 100.0)
        .alias("value"),
        (F.pmod(F.col("id") * 37, F.lit(18000)) / 100.0 - 90.0)
        .alias("lat"),
        (F.pmod(F.col("id") * 53, F.lit(36000)) / 100.0 - 180.0)
        .alias("lon"),
    )


def main():
    report = {"n_rows": N_ROWS, "n_docs": N_DOCS}
    spark = get_spark("r5g_features", cores=32, shuffle_partitions=32)

    ev = synth_events(spark, N_ROWS).cache()
    ev.count()

    # ---- geo_distance bucket: mass conservation + centroid identity
    t0 = time.time()
    rows = dsl_aggs(ev, {
        "rings": {"geo_distance": {
            "origin": {"lat": 10.0, "lon": 20.0},
            "ranges": [{"to": 3000.0}, {"from": 3000.0, "to": 9000.0},
                       {"from": 9000.0}]},
            "aggs": {"c": {"geo_centroid": {}},
                     "b": {"geo_bounds": {}}}},
    }).collect()
    by = {}
    for r in rows:
        by[(r["key"], r["metric"])] = r["value"]
    ring_counts = {k: v for (k, m), v in by.items() if m == "doc_count"}
    report["geo_rings_secs"] = round(time.time() - t0, 2)
    report["geo_rings_mass_ok"] = sum(ring_counts.values()) == N_ROWS
    # centroid/bounds == direct replay on one ring
    from elasticsearch_analysis_combo_spark.query.geo import haversine_km
    dist = haversine_km(F.lit(10.0), F.lit(20.0), F.col("lat"),
                        F.col("lon"))
    near = ev.filter(dist < 3000.0)
    want = near.agg(
        F.avg("lat").alias("clat"), F.avg("lon").alias("clon"),
        F.count(F.lit(1)).alias("n"), F.max("lat").alias("t"),
        F.min("lon").alias("l"),
    ).collect()[0]
    report["geo_centroid_identity"] = (
        abs(by[("*-3000.0", "c.lat")] - want["clat"]) < 1e-9
        and abs(by[("*-3000.0", "c.lon")] - want["clon"]) < 1e-9
        and by[("*-3000.0", "c.count")] == float(want["n"])
        and by[("*-3000.0", "b.top_left.lat")] == want["t"]
        and by[("*-3000.0", "b.top_left.lon")] == want["l"]
    )
    report["geo_ring_counts"] = ring_counts

    # ---- DSL geo_distance filter leaf == standalone evaluator at 2M
    t0 = time.time()
    pred = compile_filter({"geo_distance": {
        "distance": "3000km", "loc": {"lat": 10.0, "lon": 20.0},
        "lat_field": "lat", "lon_field": "lon"}})
    leaf_n = ev.filter(F.expr(pred)).count()
    std_n = geo_distance(ev, "lat", "lon", 10.0, 20.0, 3000.0).count()
    # row identity, not just counts: anti-join both ways is empty
    leaf_ids = ev.filter(F.expr(pred)).select("event_id")
    std_ids = geo_distance(ev, "lat", "lon", 10.0, 20.0,
                           3000.0).select("event_id")
    diff = (leaf_ids.exceptAll(std_ids).count()
            + std_ids.exceptAll(leaf_ids).count())
    report["geo_leaf_secs"] = round(time.time() - t0, 2)
    report["geo_leaf_rows"] = leaf_n
    report["geo_leaf_identity"] = leaf_n == std_n and diff == 0

    # ---- diversified_sampler: partitioning invariance + cap at 2M
    t0 = time.time()
    tree = {"s": {"diversified_sampler": {
        "field": "event_type", "max_docs_per_value": 40,
        "shard_size": 500, "key_field": "event_id"},
        "aggs": {"t": {"terms": {"field": "event_type", "size": 25}}}}}
    o7 = sorted(
        (r["agg"], r["key"], r["metric"], r["value"])
        for r in dsl_aggs(ev.repartition(7), tree).collect()
    )
    o64 = sorted(
        (r["agg"], r["key"], r["metric"], r["value"])
        for r in dsl_aggs(ev.repartition(64), tree).collect()
    )
    per_type = [v for (a, k, m, v) in o7 if a == "s>t"]
    total = [v for (a, k, m, v) in o7 if a == "s" and m == "doc_count"]
    report["divsamp_secs"] = round(time.time() - t0, 2)
    report["divsamp_partition_invariant"] = o7 == o64
    report["divsamp_cap_ok"] = all(v <= 40.0 for v in per_type)
    report["divsamp_total_ok"] = total == [500.0]

    # ---- rank_feature / feature-next-to-text at a 200k-doc corpus
    t0 = time.time()
    docs = ingest(generate_corpus(spark, N_DOCS)).cache()
    stats = build_term_stats(docs, CFG).cache()
    n_docs = stats.select("doc_id").distinct().count()
    avgdl = stats.select("doc_id", "dl").distinct().agg(
        F.avg("dl")
    ).collect()[0][0]
    term_df = stats.groupBy("term").agg(F.count("*").alias("df"))
    # docIDs from ingest are 64-bit hash-derived — multiply AFTER a
    # pmod or ANSI mode overflows (CLAUDE.md gotcha)
    meta = docs.selectExpr(
        "doc_id",
        "CASE WHEN pmod(doc_id, 11) = 0 THEN NULL"
        " ELSE pmod(pmod(doc_id, 1000003) * 2654435761, 1000) END AS pop",
    ).cache()
    meta.count()
    report["index_build_secs"] = round(time.time() - t0, 2)

    t0 = time.time()
    lone = dsl_topk(
        spark, stats, term_df, None,
        [(0, {"rank_feature": {"field": "pop",
                               "saturation": {"pivot": 100.0},
                               "boost": 2.0}})],
        CFG, n_docs, avgdl, doc_meta=meta, k=20,
    ).collect()
    want = meta.filter(F.col("pop").isNotNull()).select(
        "doc_id",
        (2.0 * F.col("pop").cast("double")
         / (F.col("pop").cast("double") + 100.0)).alias("score"),
    ).orderBy(F.desc("score"), F.asc("doc_id")).limit(20).collect()
    report["rank_feature_secs"] = round(time.time() - t0, 2)
    report["rank_feature_identity"] = (
        [(r["doc_id"], round(r["score"], 9)) for r in lone]
        == [(r["doc_id"], round(r["score"], 9)) for r in want]
    )

    t0 = time.time()
    mixed = {
        r["doc_id"]: r["score"]
        for r in dsl_topk(
            spark, stats, term_df, None,
            [(0, {"bool": {
                "must": [{"match": {"content": "the"}}],
                "should": [{"rank_feature": {
                    "field": "pop", "saturation": {"pivot": 100.0},
                    "boost": 2.0}}]}})],
            CFG, n_docs, avgdl, doc_meta=meta, k=20,
        ).collect()
    }
    base = dsl_topk(
        spark, stats, term_df, None,
        [(0, {"match": {"content": "the"}})],
        CFG, n_docs, avgdl, doc_meta=meta, k=N_DOCS,
    )
    manual = {
        r["doc_id"]: r["combined"]
        for r in base.join(meta, "doc_id", "left").select(
            "doc_id",
            (F.col("score") + F.coalesce(
                2.0 * F.col("pop").cast("double")
                / (F.col("pop").cast("double") + 100.0), F.lit(0.0),
            )).alias("combined"),
        ).orderBy(F.desc("combined"), F.asc("doc_id")).limit(20).collect()
    }
    report["feature_mix_secs"] = round(time.time() - t0, 2)
    report["feature_mix_identity"] = (
        sorted(mixed) == sorted(manual)
        and all(abs(mixed[d] - manual[d]) < 1e-9 for d in mixed)
    )

    # ---- query_string route == simple_query_string route
    t0 = time.time()
    a = dsl_topk(spark, stats, term_df, None,
                 [(0, {"query_string": {"query": "+the if -return"}})],
                 CFG, n_docs, avgdl, k=20).collect()
    b = dsl_topk(spark, stats, term_df, None,
                 [(0, {"simple_query_string":
                       {"query": "+the if -return"}})],
                 CFG, n_docs, avgdl, k=20).collect()
    key = lambda rows: sorted(  # noqa: E731
        (r["doc_id"], r["rank"], round(r["score"], 9)) for r in rows
    )
    report["qs_route_secs"] = round(time.time() - t0, 2)
    report["qs_route_identity"] = key(a) == key(b) and len(a) == 20

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "at_scale_r5g_features.json",
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    ok = all(v for k, v in report.items()
             if k.endswith(("_ok", "_identity", "_invariant")))
    print("ALL CHECKS:", "OK" if ok else "FAILED")
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
