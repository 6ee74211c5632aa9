"""At-scale validation of the round-4k/4l additions (200k docs).

* terms_agg_sharded vs the EXACT terms agg on a high-cardinality key
  (~50k distinct hosts): reported counts must be <= exact, the error
  bound must COVER the true miss (exact - reported <= bound) for every
  reported value, and the sharded plan must shuffle far fewer rows —
  wall times for both reported.
* cap_per_key over the same key: survivor counts obey the cap,
  partitioning-invariance spot-checked (repartition(7) == default).
* multi_index_topk (3 synthetic indices): per-index scores must equal
  the single-index BM25 run on that slice (rank identity).
* sig_heuristics at scale: chi_square/mi/gnd over a 200k-doc match set,
  wall time reported (the fg/bg shuffle is the match-set join).

Run detached (~6-10 min):
  setsid nohup env PYTHONPATH=/root/repo python \
      scripts/validate_r4l_features.py > /tmp/r4l_features.log 2>&1 &
Writes BENCH/at_scale_r4l_features.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from elasticsearch_analysis_combo_spark.analysis.combo import (  # noqa: E402
    ComboConfig,
)
from elasticsearch_analysis_combo_spark.analysis.udfs import (  # noqa: E402
    build_term_stats,
)
from elasticsearch_analysis_combo_spark.operators.sampling import (  # noqa: E402
    cap_per_key,
)
from elasticsearch_analysis_combo_spark.query.bm25 import (  # noqa: E402
    bm25_exhaustive_topk,
    multi_index_topk,
)
from elasticsearch_analysis_combo_spark.query.facets import (  # noqa: E402
    significant_terms,
    terms_agg_sharded,
)
from elasticsearch_analysis_combo_spark.session import get_spark  # noqa: E402
from elasticsearch_analysis_combo_spark.sources.corpus import (  # noqa: E402
    generate_corpus,
    ingest,
)

N_DOCS = 200_000
CFG = ComboConfig(["whitespace"])


def main():
    out = {"n_docs": N_DOCS}
    spark = get_spark("r4l_val", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = ingest(generate_corpus(spark, N_DOCS)).select(
        "doc_id", F.col("content").alias("text"),
        # ~50k distinct hosts, zipf-free uniform — the high-cardinality
        # terms-agg stress shape
        F.concat(F.lit("host"), F.pmod("doc_id", F.lit(50_000)))
        .alias("host"),
    ).cache()
    docs.count()

    # --- sharded terms agg vs exact ---
    t0 = time.time()
    exact = {
        r["host"]: r["cnt"]
        for r in docs.groupBy("host").agg(F.count("*").alias("cnt"))
        .collect()
    }
    out["exact_terms_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    sharded = terms_agg_sharded(
        docs, "host", size=20, shard_size=30, n_shards=32
    ).collect()
    out["sharded_terms_sec"] = round(time.time() - t0, 2)
    covered = sound = True
    for r in sharded:
        true = exact[r["value"]]
        rep, bound = r["doc_count"], r["doc_count_error_upper_bound"]
        sound &= rep <= true
        covered &= (true - rep) <= bound
    out["sharded_reported_lower_bound_ok"] = bool(sound)
    out["sharded_error_bound_covers_true_miss"] = bool(covered)
    out["sharded_rows"] = len(sharded)

    # --- cap_per_key ---
    t0 = time.time()
    capped = cap_per_key(docs.select("doc_id", "host"), "host", 2)
    n_capped = capped.count()
    out["cap_per_key_sec"] = round(time.time() - t0, 2)
    out["cap_max_ok"] = capped.groupBy("host").count().agg(
        F.max("count")).collect()[0][0] <= 2
    ids_a = capped.agg(F.expr("bit_xor(doc_id)")).collect()[0][0]
    ids_b = cap_per_key(
        docs.select("doc_id", "host").repartition(7), "host", 2
    ).agg(F.expr("bit_xor(doc_id)")).collect()[0][0]
    out["cap_rows"] = int(n_capped)
    out["cap_partitioning_invariant"] = bool(ids_a == ids_b)

    # --- multi-index search: per-index score identity ---
    stats = build_term_stats(
        docs.select("doc_id", F.col("text").alias("content")), CFG
    ).cache()
    stats.count()
    indices = {}
    for i in range(3):
        sub = stats.filter(F.pmod("doc_id", F.lit(3)) == i).cache()
        n = sub.select("doc_id").distinct().count()
        avgdl = float(sub.select("doc_id", "dl").distinct()
                      .agg(F.avg("dl")).collect()[0][0])
        tdf = sub.groupBy("term").agg(F.count("*").alias("df"))
        indices[f"idx{i}"] = (sub, tdf, n, avgdl)
    q = [(0, "import class"), (1, "return nil")]
    t0 = time.time()
    merged = multi_index_topk(spark, indices, q, CFG, k=20).collect()
    out["multi_index_sec"] = round(time.time() - t0, 2)
    # per-index score identity on the intersection (solo k is widened
    # to 200 because rounded-score TIES at the top-k boundary make raw
    # set-membership comparisons order-dependent)
    ok, n_got, n_matched = True, 0, 0
    for name, (sub, tdf, n, avgdl) in indices.items():
        solo = bm25_exhaustive_topk(
            spark, sub, tdf, q, CFG, n, avgdl, k=200
        ).collect()
        want = {(r["query_id"], r["doc_id"]): round(r["score"], 6)
                for r in solo}
        got = {(r["query_id"], r["doc_id"]): round(r["score"], 6)
               for r in merged if r["index"] == name}
        n_got += len(got)
        for key, v in got.items():
            if key in want:
                n_matched += 1
                ok &= want[key] == v
    out["multi_index_scores_match_solo"] = bool(ok)
    out["multi_index_solo_overlap"] = f"{n_matched}/{n_got}"
    out["multi_index_rows"] = len(merged)

    # --- significant_terms heuristics at scale ---
    n_docs = N_DOCS
    tdf_all = stats.groupBy("term").agg(F.count("*").alias("df"))
    for h in ("chi_square", "mutual_information", "gnd"):
        t0 = time.time()
        n = significant_terms(
            spark, stats, [(0, "import")], CFG, n_docs, size=10,
            min_doc_count=3, term_df=tdf_all, heuristic=h,
        ).count()
        out[f"sig_{h}_sec"] = round(time.time() - t0, 2)
        out[f"sig_{h}_rows"] = int(n)

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/at_scale_r4l_features.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
