"""At-scale validation for the round-4i surfaces (200k docs / 10M points).

* ngram_lm_perplexity over a 200k-doc code corpus: train + score in one
  plan, timed (the model tables are vocabulary-bounded; the scoring join
  keys on the bigram).
* span_multi (prefix + fuzzy clauses expanded against the full
  dictionary, capped): doc-range partitioned == single-task row
  identity, both timed — the multi-clause union must inherit the span
  family's fan-out.
* geo_polygon over 10M synthetic points: map-only parity check timed
  (throughput should track scan speed).
* scripted_metric over 10M event rows: distributed map+combine/reduce
  result must equal the plain SQL aggregate, timed.
* cumulative_cardinality over 10M (bucket, key) rows: spot-checked
  against a per-bucket exact distinct union, timed.

Run detached (~6-10 min):
  setsid nohup env PYTHONPATH=/root/repo python \
      scripts/validate_r4i_features.py > /tmp/r4i_features.log 2>&1 &
Writes BENCH/at_scale_r4i_features.json.
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
from elasticsearch_analysis_combo_spark.operators.text_quality import (  # noqa: E402
    ngram_lm_perplexity,
)
from elasticsearch_analysis_combo_spark.query.facets import (  # noqa: E402
    cumulative_cardinality_agg,
    scripted_metric_agg,
)
from elasticsearch_analysis_combo_spark.query.geo import geo_polygon  # noqa: E402
from elasticsearch_analysis_combo_spark.query.spans import (  # noqa: E402
    span_multi_near_match,
)
from elasticsearch_analysis_combo_spark.session import get_spark  # noqa: E402
from elasticsearch_analysis_combo_spark.sources.corpus import (  # noqa: E402
    generate_corpus,
    ingest,
)

N_DOCS = 200_000
N_POINTS = 10_000_000
CFG = ComboConfig(["whitespace"])

SPAN_MULTI_CLAUSES = {
    0: [("prefix", "re"), ("term", "cache")],     # stop-grade prefix
    1: [("term", "the"), ("fuzzy", ("token", 1))],
    2: [("wildcard", "str*"), ("prefix", "ca")],
}

POLY = [(-40.0, -100.0), (50.0, -80.0), (0.0, -20.0), (45.0, 60.0),
        (-50.0, 90.0)]


def _timed(out, label, fn, reps=3):
    times, res = [], None
    for _ in range(reps):
        t = time.time()
        res = fn()
        times.append(time.time() - t)
    out[label + "_p50_sec"] = round(sorted(times)[len(times) // 2], 3)
    return res


def main():
    spark = get_spark("r4i_features", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out = {"n_docs": N_DOCS, "n_points": N_POINTS}

    corpus = ingest(generate_corpus(spark, N_DOCS)).cache()
    corpus.count()
    docs = corpus.select("doc_id", F.col("content").alias("text")).cache()
    docs.count()

    # --- lm_perplexity: train + score one plan ---
    _timed(
        out, "lm_perplexity",
        lambda: ngram_lm_perplexity(docs).agg(
            F.sum("logprob_per_token"), F.sum("n_bigrams")
        ).collect(),
        reps=3,
    )
    row = ngram_lm_perplexity(docs).agg(
        F.count("*").alias("n"), F.avg("perplexity").alias("p")
    ).collect()[0]
    out["lm_perplexity_docs_scored"] = int(row["n"])
    out["lm_perplexity_mean"] = round(float(row["p"]), 2)

    # --- span_multi: partitioned == single over the full index ---
    t0 = time.time()
    stats = build_term_stats(corpus, CFG, content_col="content").cache()
    avgdl = float(stats.select(F.avg("dl")).collect()[0][0])
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

    def rows(range_bits):
        df = span_multi_near_match(
            spark, post, term_df, SPAN_MULTI_CLAUSES, slop=6,
            in_order=False, max_expansions=10, range_bits=range_bits,
        )
        return {
            (r["query_id"], r["doc_id"]): r["n_matches"] for r in df.collect()
        }

    single = _timed(out, "span_multi_single", lambda: rows(None))
    part = _timed(out, "span_multi_partitioned", lambda: rows(4))
    out["span_multi_equal"] = single == part
    out["span_multi_rows"] = len(single)

    # --- geo_polygon over 10M synthetic points (map-only) ---
    pts = spark.range(N_POINTS).select(
        F.col("id").alias("pid"),
        (F.pmod(F.col("id") * 37, F.lit(180_000)) / 1000.0 - 90.0)
        .alias("lat"),
        (F.pmod(F.col("id") * 101, F.lit(360_000)) / 1000.0 - 180.0)
        .alias("lon"),
    ).cache()
    pts.count()
    inside = _timed(
        out, "geo_polygon_10m",
        lambda: geo_polygon(pts, "lat", "lon", POLY).count(),
    )
    out["geo_polygon_inside"] = int(inside)

    # --- scripted_metric over 10M rows == SQL aggregate ---
    ev = spark.range(N_POINTS).select(
        F.pmod(F.col("id"), F.lit(16)).cast("string").alias("g"),
        (F.pmod(F.col("id") * 13, F.lit(1000)) / 10.0).alias("v"),
    ).cache()
    ev.count()
    sm = _timed(
        out, "scripted_metric_10m",
        lambda: {
            r["g"]: round(r["value"], 3)
            for r in scripted_metric_agg(
                ev, "g",
                lambda pdf: {"wsum": float((pdf["v"] ** 2).sum()),
                             "n": int(len(pdf))},
                lambda states: float(states["wsum"].sum()),
                state_schema="wsum double, n long",
            ).collect()
        },
    )
    ref = {
        r["g"]: round(r["value"], 3)
        for r in ev.groupBy("g").agg(
            F.sum(F.col("v") * F.col("v")).alias("value")
        ).collect()
    }
    out["scripted_metric_equal"] = sm == ref

    # --- cumulative_cardinality over 10M (bucket, key) rows ---
    cc_rows = spark.range(N_POINTS).select(
        F.pmod(F.col("id"), F.lit(365)).cast("int").alias("b"),
        F.pmod(F.col("id") * 7919, F.lit(2_000_000)).alias("u"),
    ).cache()
    cc_rows.count()
    cc = _timed(
        out, "cumulative_cardinality_10m",
        lambda: {
            r["b"]: r["cumulative_cardinality"]
            for r in cumulative_cardinality_agg(cc_rows, "b", "u").collect()
        },
    )
    # spot-check: the last bucket's cumulative == global distinct count
    out["cumulative_cardinality_final"] = cc[max(cc)]
    out["cumulative_cardinality_global_distinct"] = (
        cc_rows.select("u").distinct().count()
    )
    out["cumulative_cardinality_equal"] = (
        cc[max(cc)] == out["cumulative_cardinality_global_distinct"]
    )

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/at_scale_r4i_features.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
