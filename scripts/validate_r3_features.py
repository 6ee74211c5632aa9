"""At-scale validation for the round-3 query surfaces (200k docs).

One 200k-doc positional index, then for each new surface: the scale-safe
evaluator's equality against its reference path plus wall-clock —
evidence that the round-3 features inherit the doc-range fan-out /
candidate-union shapes rather than re-introducing single-task hot paths:

* span_near (ordered + unordered, slop 2, stop-grade clauses):
  range-partitioned == single-task, both timed.
* simple_query_string with a stop-stop phrase clause: partitioned
  phrase routing == single-task routing, both timed.
* multi_match best_fields over derived title/body fields: per-field
  WAND candidate-union == exhaustive per-field evaluation (the
  exactness proof, validated at scale), both timed.
* rescore (phrase boost over the top-100 window): partitioned ==
  single-task phrase evaluation, both timed.

Run detached (~8-12 min):
  setsid nohup env PYTHONPATH=/root/repo python scripts/validate_r3_features.py \
      > /tmp/r3_features.log 2>&1 &
Writes BENCH/at_scale_r3_features.json.
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
from elasticsearch_analysis_combo_spark.operators.postings import (  # noqa: E402
    build_postings,
)
from elasticsearch_analysis_combo_spark.query.functionscore import (  # noqa: E402
    rescore_phrase_topk,
)
from elasticsearch_analysis_combo_spark.query.multifield import (  # noqa: E402
    derive_fields,
    field_corpus_stats,
    multi_match_topk,
    multi_match_wand_topk,
)
from elasticsearch_analysis_combo_spark.query.querystring import (  # noqa: E402
    simple_query_string_topk,
)
from elasticsearch_analysis_combo_spark.query.spans import (  # noqa: E402
    span_near_match,
    span_near_match_partitioned,
)
from elasticsearch_analysis_combo_spark.session import get_spark  # noqa: E402
from elasticsearch_analysis_combo_spark.sources.corpus import (  # noqa: E402
    generate_corpus,
    ingest,
)

N_DOCS = 200_000
MAX_BLOCKS_PER_ROW = 64
CFG = ComboConfig(["whitespace"])
SPANS = [(0, "the if"), (1, "token stream"), (2, "merge index segment")]
QS = [
    (0, '+merge "the if" -cache'),
    (1, 'token stream buffer*'),
    (2, '+"token stream" index'),
]
MM_QUERIES = [(0, "the merge index"), (1, "token stream cache")]
RESCORE = [(0, "token stream"), (1, "the if")]


def _timed(out, label, fn, reps=3):
    times, res = [], None
    for _ in range(reps):
        t = time.time()
        res = fn().collect()
        times.append(time.time() - t)
    out[label + "_p50_sec"] = round(sorted(times)[len(times) // 2], 3)
    return res


def _rows(rows):
    return sorted(tuple(r) for r in rows)


def main() -> None:
    spark = get_spark("r3_features", cores=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_docs": N_DOCS, "max_blocks_per_row": MAX_BLOCKS_PER_ROW}

    gen_dir = tempfile.mkdtemp(prefix="r3f_corpus_")
    generate_corpus(spark, N_DOCS).write.mode("overwrite").parquet(gen_dir)
    corpus = ingest(spark.read.parquet(gen_dir))
    t0 = time.time()
    stats_dir = tempfile.mkdtemp(prefix="r3f_stats_")
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
        with_positions=True, max_blocks_per_row=MAX_BLOCKS_PER_ROW,
    )
    pq_dir = tempfile.mkdtemp(prefix="r3f_postings_")
    postings.write.mode("overwrite").parquet(pq_dir)
    postings = spark.read.parquet(pq_dir)
    out["index_build_sec"] = round(time.time() - t0, 2)
    # materialized like the engine's published term_df table — a lazy
    # groupBy here would re-aggregate the full stats per reference and
    # charge that to every query timing
    td_dir = tempfile.mkdtemp(prefix="r3f_termdf_")
    stats.groupBy("term").agg(F.count("*").alias("df")).write.mode(
        "overwrite"
    ).parquet(td_dir)
    term_df = spark.read.parquet(td_dir)

    # ---- span_near ---------------------------------------------------------
    for in_order in (True, False):
        tag = "ordered" if in_order else "unordered"
        single = _timed(out, f"span_{tag}_single", lambda: span_near_match(
            spark, postings, SPANS, CFG, slop=2, in_order=in_order))
        part = _timed(out, f"span_{tag}_partitioned",
                      lambda: span_near_match_partitioned(
                          spark, postings, SPANS, CFG, slop=2,
                          in_order=in_order, range_bits=5))
        out[f"span_{tag}_equal"] = _rows(single) == _rows(part)
        out[f"span_{tag}_rows"] = len(single)

    # ---- simple_query_string (stop-stop phrase clause) ---------------------
    qs_single = _timed(out, "qs_single", lambda: simple_query_string_topk(
        spark, stats, term_df, postings, QS, CFG, n_idx, avgdl,
        k=10, partitioned_phrases=False))
    qs_part = _timed(out, "qs_partitioned", lambda: simple_query_string_topk(
        spark, stats, term_df, postings, QS, CFG, n_idx, avgdl,
        k=10, partitioned_phrases=True, range_bits=5))
    out["qs_equal"] = _rows(qs_single) == _rows(qs_part)
    out["qs_rows"] = len(qs_single)

    # ---- multi_match best_fields (derived title/body) ----------------------
    fielded = derive_fields(corpus, content_col="content", title_tokens=8)
    fstats, fmeta, fpost = {}, {}, {}
    for f in ("title", "body"):
        s_dir = tempfile.mkdtemp(prefix=f"r3f_{f}_")
        build_term_stats(fielded, CFG, content_col=f).write.mode(
            "overwrite"
        ).parquet(s_dir)
        s = spark.read.parquet(s_dir)
        fstats[f] = s
        n_f, avg_f = field_corpus_stats(s)
        fmeta[f] = (n_f, avg_f)
        fp_dir = tempfile.mkdtemp(prefix=f"r3f_post_{f}_")
        build_postings(
            s, avgdl=avg_f, hot_terms=hot, salt_shards=8,
            with_positions=False, max_blocks_per_row=MAX_BLOCKS_PER_ROW,
        ).write.mode("overwrite").parquet(fp_dir)
        fpost[f] = spark.read.parquet(fp_dir)
    boosts = {"title": 2.0, "body": 1.0}
    mm_wand = _timed(out, "multi_match_wand", lambda: multi_match_wand_topk(
        spark, fpost, fmeta, MM_QUERIES, CFG, boosts=boosts, k=10))
    mm_wand_part = _timed(
        out, "multi_match_wand_partitioned",
        lambda: multi_match_wand_topk(
            spark, fpost, fmeta, MM_QUERIES, CFG, boosts=boosts, k=10,
            partitioned=True, range_bits=5))
    mm_exh = _timed(out, "multi_match_exhaustive", lambda: multi_match_topk(
        spark, fstats, MM_QUERIES, CFG, kind="best_fields", boosts=boosts,
        tie_breaker=0.0, k=10, field_meta=fmeta))

    def key6(rows):
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
            for r in rows
        )

    out["multi_match_equal"] = key6(mm_wand) == key6(mm_exh)
    out["multi_match_partitioned_equal"] = key6(mm_wand_part) == key6(mm_exh)

    # ---- rescore -----------------------------------------------------------
    rs_single = _timed(out, "rescore_single", lambda: rescore_phrase_topk(
        spark, postings, stats, term_df, RESCORE, CFG, n_idx, avgdl,
        window_size=100, rescore_weight=2.0, k=10,
        partitioned_phrases=False))
    rs_part = _timed(out, "rescore_partitioned", lambda: rescore_phrase_topk(
        spark, postings, stats, term_df, RESCORE, CFG, n_idx, avgdl,
        window_size=100, rescore_weight=2.0, k=10,
        partitioned_phrases=True))
    out["rescore_equal"] = _rows(rs_single) == _rows(rs_part)

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/at_scale_r3_features.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
