"""At-scale validation for the round-5m surfaces (200k docs / 2M rows):

* sliced scroll export — 16-way portable-md5 slice of a 200k-doc frame:
  slices are disjoint, complete (counts + bit_xor checksums compose to
  the global ones), and IDENTICAL under 7-way vs 64-way input
  partitioning (the cluster-size-invariance property a parallel 100 TB
  dump needs).
* suggest_body — a 6-entry suggest section (two option-sets) against
  the full ~11k-term dictionary of a 200k-doc corpus: batched per
  option-set, term rows identical to a direct term_suggest call.
* hybrid multi-kNN sum — two knn sections over 200k 64-dim vectors
  fused by ES's additive rule: result IDENTICAL to the hand-composed
  union-sum of two brute-force runs; wall = two bounded GEMM legs +
  one window-sized groupBy.
* url_filter — 2M synthetic URLs: map-only wall, verdict counts
  IDENTICAL under 7-way vs 64-way partitioning.
* perplexity_buckets — 2M rows / 20 strata: per-stratum head/middle/
  tail tier sizes balanced (exact interpolated thirds over a
  continuous score), assignment partition-invariant.
* aggs compiler r5m kinds — scripted_metric + variable_width_histogram
  over 2M rows: vw bucket doc_counts conserve mass (sum == N),
  scripted_metric sum equals the direct aggregate.

Usage: python scripts/validate_r5m_features.py  (writes
BENCH/at_scale_r5m_features.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig
from elasticsearch_analysis_combo_spark.session import get_spark
from elasticsearch_analysis_combo_spark.sources.corpus import (
    generate_corpus,
    ingest,
)

N_DOCS = int(os.environ.get("R5M_DOCS", "200000"))
N_ROWS = int(os.environ.get("R5M_ROWS", "2000000"))
N_VECS = int(os.environ.get("R5M_VECS", "200000"))
DIM = 64
REPORT = {}


def main() -> None:
    spark = get_spark("validate_r5m", cores=32, shuffle_partitions=32)
    cfg = ComboConfig(["whitespace"])

    corpus = ingest(generate_corpus(spark, N_DOCS)).persist()
    REPORT["n_docs"] = corpus.count()

    # ---- 1. sliced export: disjoint + complete + partition-invariant
    from elasticsearch_analysis_combo_spark.query.body import (
        slice_predicate,
    )

    base = corpus.select("doc_id")
    glob = base.agg(
        F.count("*").alias("n"), F.bit_xor("doc_id").alias("x")
    ).collect()[0]
    m = 16
    t0 = time.time()
    per = []
    for i in range(m):
        r = base.filter(
            F.expr(slice_predicate({"id": i, "max": m}))
        ).agg(F.count("*").alias("n"),
              F.bit_xor("doc_id").alias("x")).collect()[0]
        per.append((int(r["n"]), int(r["x"] or 0)))
    slice_wall = time.time() - t0
    total = sum(n for n, _ in per)
    xor_all = 0
    for _, x in per:
        xor_all ^= x
    inv = []
    for parts in (7, 64):
        rp = base.repartition(parts)
        r = rp.filter(
            F.expr(slice_predicate({"id": 3, "max": m}))
        ).agg(F.count("*").alias("n"),
              F.bit_xor("doc_id").alias("x")).collect()[0]
        inv.append((int(r["n"]), int(r["x"] or 0)))
    REPORT["slice"] = {
        "m": m, "wall_16_passes_sec": round(slice_wall, 2),
        "complete": total == int(glob["n"]),
        "xor_composes": xor_all == int(glob["x"]),
        "partition_invariant": inv[0] == inv[1],
        "min_slice": min(n for n, _ in per),
        "max_slice": max(n for n, _ in per),
    }

    # ---- 2. suggest_body at dictionary scale ----
    from elasticsearch_analysis_combo_spark.analysis.udfs import (
        build_term_stats,
    )
    from elasticsearch_analysis_combo_spark.query.suggest import (
        suggest_body,
        term_suggest,
    )

    stats = build_term_stats(
        corpus, cfg, content_col="content"
    ).persist()
    term_df = stats.groupBy("term").agg(
        F.count("*").alias("df")
    ).persist()
    REPORT["vocab"] = term_df.count()
    section = {
        "a": {"text": "mergg", "term": {"max_edits": 2, "size": 5}},
        "b": {"text": "sortx", "term": {"max_edits": 2, "size": 5}},
        "c": {"text": "window", "term": {"max_edits": 2, "size": 5}},
        "d": {"text": "parttion", "term": {"max_edits": 1, "size": 3}},
        "e": {"prefix": "par", "completion": {"size": 5}},
        "f": {"text": "mergg the window", "phrase": {"max_edits": 2}},
    }
    t0 = time.time()
    body_rows = suggest_body(spark, term_df, section).collect()
    sug_wall = time.time() - t0
    direct = term_suggest(
        spark, term_df, [(0, "mergg"), (1, "sortx"), (2, "window")],
        max_edits=2, k=5,
    ).collect()
    got_a = sorted(
        (r["rank"], r["suggestion"]) for r in body_rows
        if r["name"] == "a"
    )
    want_a = sorted(
        (r["rank"], r["suggestion"]) for r in direct if r["query_id"] == 0
    )
    REPORT["suggest_body"] = {
        "wall_sec": round(sug_wall, 2),
        "rows": len(body_rows),
        "term_rows_match_direct": got_a == want_a,
        "kinds": sorted({r["kind"] for r in body_rows}),
    }

    # ---- 3. hybrid multi-kNN additive fusion at 200k vectors ----
    from elasticsearch_analysis_combo_spark.operators.similarity import (
        brute_force_cosine_topk,
    )
    from elasticsearch_analysis_combo_spark.query.dsl import hybrid_search

    emb = spark.range(N_VECS).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(1, {DIM}), j -> "
            "cast(pmod(conv(substr(md5(concat(cast(id as string), ':', "
            "cast(j as string))), 1, 15), 16, 10), 1000) as double) "
            "/ 500.0 - 1.0)"
        ).alias("embedding"),
    ).persist()
    emb.count()
    qv1 = [float(x) for x in
           emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    qv2 = [float(x) for x in
           emb.filter(F.col("vec_id") == 1).collect()[0]["embedding"]]
    body = {"knn": [
        {"field": "embedding", "query_vector": qv1, "k": 20},
        {"field": "embedding", "query_vector": qv2, "k": 20,
         "boost": 0.5},
    ]}
    t0 = time.time()
    hy = hybrid_search(
        spark, None, None, None, body, cfg, 0, 1.0, emb, k=20,
    ).collect()
    hy_wall = time.time() - t0
    # hand-composed replay
    import collections

    acc = collections.defaultdict(float)
    for leg, boost in ((qv1, 1.0), (qv2, 0.5)):
        rows = brute_force_cosine_topk(emb, [(0, leg)], k=20).collect()
        for r in rows:
            acc[int(r["vec_id"])] += round(float(r["cosine"]), 6) * boost
    want = sorted(
        acc.items(), key=lambda kv: (-round(kv[1], 6), kv[0])
    )[:20]
    got = [(int(r["doc_id"]), round(float(r["score"]), 6))
           for r in sorted(hy, key=lambda r: r["rank"])]
    want = [(d, round(s, 6)) for d, s in want]
    REPORT["hybrid"] = {
        "n_vecs": N_VECS, "wall_sec": round(hy_wall, 2),
        "matches_hand_composed": got == want,
    }

    # ---- 4. url_filter over 2M URLs: map-only + invariant ----
    from elasticsearch_analysis_combo_spark.operators.pipeline import (
        url_filter,
    )

    urls = spark.range(N_ROWS).selectExpr(
        "id as doc_id",
        "concat('https://h', cast(pmod(id, 1000) as string), "
        "'.example', case pmod(id, 4) when 0 then '.com' else '.org' "
        "end, '/p', repeat('/x', cast(pmod(id, 20) as int)), "
        "case pmod(id, 97) when 0 then '/casino' else '' end) as url"
    )

    def uf(frame):
        out = url_filter(
            frame, blocked_domains=["blocked.net"], max_path_depth=15,
        )
        return out.agg(
            F.count("*").alias("n"),
            F.sum(F.col("keep").cast("long")).alias("kept"),
            F.sum(F.col("blocked_keyword").cast("long")).alias("kw"),
            F.bit_xor(F.when(F.col("keep"), F.col("doc_id"))).alias("x"),
        ).collect()[0]

    t0 = time.time()
    a = uf(urls)
    url_wall = time.time() - t0
    b = uf(urls.repartition(7))
    REPORT["url_filter"] = {
        "n_rows": int(a["n"]), "wall_sec": round(url_wall, 2),
        "kept": int(a["kept"]), "keyword_blocked": int(a["kw"]),
        "partition_invariant": (
            (int(a["kept"]), int(a["kw"]), int(a["x"] or 0))
            == (int(b["kept"]), int(b["kw"]), int(b["x"] or 0))
        ),
    }

    # ---- 5. perplexity tiers: 2M rows / 20 strata ----
    from elasticsearch_analysis_combo_spark.operators.text_quality import (
        perplexity_buckets,
    )

    scored = spark.range(N_ROWS).selectExpr(
        "id as doc_id",
        "concat('s', cast(pmod(id, 20) as string)) as lang",
        "cast(conv(substr(md5(cast(id as string)), 1, 15), 16, 10) "
        "as double) as ppl",
    )
    t0 = time.time()
    tiers = perplexity_buckets(scored, ppl_col="ppl").groupBy("stratum", "bucket").count()
    trows = tiers.collect()
    tier_wall = time.time() - t0
    per_stratum = collections.defaultdict(dict)
    for r in trows:
        per_stratum[r["stratum"]][r["bucket"]] = int(r["count"])
    balanced = all(
        max(d.values()) - min(d.values()) <= 2 and len(d) == 3
        for d in per_stratum.values()
    )
    c = perplexity_buckets(scored.repartition(7), ppl_col="ppl").groupBy(
        "stratum", "bucket"
    ).count().collect()
    same = {(r["stratum"], r["bucket"]): int(r["count"]) for r in c} == {
        (r["stratum"], r["bucket"]): int(r["count"]) for r in trows
    }
    REPORT["perplexity_tiers"] = {
        "n_rows": N_ROWS, "strata": len(per_stratum),
        "wall_sec": round(tier_wall, 2),
        "tiers_balanced": balanced,
        "partition_invariant": same,
    }

    # ---- 6. compiler r5m kinds over 2M rows ----
    from elasticsearch_analysis_combo_spark.query.aggcompiler import (
        dsl_search_aggs,
    )

    frame = spark.range(N_ROWS).selectExpr(
        "id",
        "cast(pmod(id * id, 13) as double) as vx",
        "cast(pmod(id, 1000) as double) as v",
    )
    t0 = time.time()
    ag = dsl_search_aggs(frame, {"aggs": {
        "sm": {"scripted_metric": {"map_script": "v * 2",
                                   "reduce_script": "sum"}},
        "vw": {"variable_width_histogram": {"field": "vx",
                                            "buckets": 4}},
    }}).collect()
    agg_wall = time.time() - t0
    rows = {(r["agg"], r["key"], r["metric"]): r["value"] for r in ag}
    vw_mass = sum(
        v for (a, _, mtr), v in rows.items()
        if a == "vw" and mtr == "doc_count"
    )
    direct = frame.agg(F.sum(F.expr("v * 2"))).collect()[0][0]
    REPORT["aggs_r5m"] = {
        "wall_sec": round(agg_wall, 2),
        "vw_mass_conserved": vw_mass == float(N_ROWS),
        "scripted_metric_exact": abs(
            rows[("sm", "", "sm")] - float(direct)
        ) < 1e-6,
    }

    REPORT["all_ok"] = all([
        REPORT["slice"]["complete"],
        REPORT["slice"]["xor_composes"],
        REPORT["slice"]["partition_invariant"],
        REPORT["suggest_body"]["term_rows_match_direct"],
        REPORT["hybrid"]["matches_hand_composed"],
        REPORT["url_filter"]["partition_invariant"],
        REPORT["perplexity_tiers"]["tiers_balanced"],
        REPORT["perplexity_tiers"]["partition_invariant"],
        REPORT["aggs_r5m"]["vw_mass_conserved"],
        REPORT["aggs_r5m"]["scripted_metric_exact"],
    ])
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "at_scale_r5m_features.json",
    )
    with open(out, "w") as f:
        json.dump(REPORT, f, indent=1)
    print(json.dumps(REPORT, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
