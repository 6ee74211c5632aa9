"""At-scale validation for the round-4 surfaces (200k docs).

One 200k-doc positional index, then:

* span_or / span_first / span_not on stop-grade clause terms:
  range-partitioned == single-task (row identity), both timed — the new
  span algebra inherits the doc-range fan-out rather than
  re-introducing a one-task-per-query hot path.
* bool filter context: the filtered result is exactly the unfiltered
  ranking restricted to allowed docs (score identity), timed.
* deterministic sampling: hash_sample and stratified_sample_exact
  return IDENTICAL row sets under 8-partition and 64-partition inputs —
  the parallelism-invariance claim (same rows on any cluster size)
  proven at 200k, plus wall-clock.
* diversified_sampler over a stop-grade match set (~200k scored rows),
  timed.

Run detached (~6-10 min):
  setsid nohup env PYTHONPATH=/root/repo python \
      scripts/validate_r4_features.py > /tmp/r4_features.log 2>&1 &
Writes BENCH/at_scale_r4_features.json.
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
from elasticsearch_analysis_combo_spark.operators.sampling import (  # noqa: E402
    hash_sample,
    stratified_sample_exact,
)
from elasticsearch_analysis_combo_spark.query.boolean import (  # noqa: E402
    bm25_filtered_topk,
)
from elasticsearch_analysis_combo_spark.query.bm25 import (  # noqa: E402
    bm25_exhaustive_topk,
    bm25_scored,
)
from elasticsearch_analysis_combo_spark.query.facets import (  # noqa: E402
    diversified_sampler_agg,
)
from elasticsearch_analysis_combo_spark.query.spans import (  # noqa: E402
    span_first_match,
    span_not_match,
    span_or_match,
)
from elasticsearch_analysis_combo_spark.session import get_spark  # noqa: E402
from elasticsearch_analysis_combo_spark.sources.corpus import (  # noqa: E402
    generate_corpus,
    ingest,
)

N_DOCS = 200_000
MAX_BLOCKS_PER_ROW = 64
CFG = ComboConfig(["whitespace"])
SPAN_OR = [(0, "the if return"), (1, "token stream")]
SPAN_FIRST = [(0, "the def")]
SPAN_NOT = [(0, "the", "if"), (1, "if", "return")]
BM25_Q = [(0, "the if"), (1, "token stream cache")]


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
    spark = get_spark("r4_features", cores=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_docs": N_DOCS, "max_blocks_per_row": MAX_BLOCKS_PER_ROW}

    gen_dir = tempfile.mkdtemp(prefix="r4f_corpus_")
    generate_corpus(spark, N_DOCS).write.mode("overwrite").parquet(gen_dir)
    corpus = ingest(spark.read.parquet(gen_dir))
    t0 = time.time()
    stats_dir = tempfile.mkdtemp(prefix="r4f_stats_")
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
    pq_dir = tempfile.mkdtemp(prefix="r4f_postings_")
    postings.write.mode("overwrite").parquet(pq_dir)
    postings = spark.read.parquet(pq_dir)
    out["index_build_sec"] = round(time.time() - t0, 2)
    td_dir = tempfile.mkdtemp(prefix="r4f_termdf_")
    stats.groupBy("term").agg(F.count("*").alias("df")).write.mode(
        "overwrite"
    ).parquet(td_dir)
    term_df = spark.read.parquet(td_dir)

    # ---- span algebra: partitioned == single on stop-grade clauses --------
    for tag, fn, args in (
        ("span_or", span_or_match, (SPAN_OR,)),
        ("span_first", span_first_match, (SPAN_FIRST,)),
        ("span_not", span_not_match, (SPAN_NOT,)),
    ):
        kw = {"end": 5} if tag == "span_first" else (
            {"post": 1} if tag == "span_not" else {}
        )
        single = _timed(out, f"{tag}_single", lambda: fn(
            spark, postings, args[0], CFG, **kw))
        part = _timed(out, f"{tag}_partitioned", lambda: fn(
            spark, postings, args[0], CFG, range_bits=5, **kw))
        out[f"{tag}_equal"] = _rows(single) == _rows(part)
        out[f"{tag}_rows"] = len(single)

    # ---- bool filter context: restriction without rescoring ---------------
    meta = corpus.select("doc_id", F.length("content").alias("n_chars"))
    meta_dir = tempfile.mkdtemp(prefix="r4f_meta_")
    meta.write.mode("overwrite").parquet(meta_dir)
    meta = spark.read.parquet(meta_dir)
    pred = "n_chars >= 200 AND n_chars < 2000"
    filt = _timed(out, "filter_context", lambda: bm25_filtered_topk(
        spark, stats, term_df, BM25_Q, CFG, n_idx, avgdl, meta, pred,
        k=10))
    base = {
        (r["query_id"], r["doc_id"]): round(r["score"], 9)
        for r in bm25_exhaustive_topk(
            spark, stats, term_df, BM25_Q, CFG, n_idx, avgdl, k=100_000
        ).collect()
    }
    allowed = {r["doc_id"] for r in meta.filter(pred).collect()}
    out["filter_context_allowed_only"] = all(
        r["doc_id"] in allowed for r in filt
    )
    out["filter_context_scores_unperturbed"] = all(
        abs(round(r["score"], 9) - base[(r["query_id"], r["doc_id"])]) < 1e-9
        for r in filt
    )
    out["filter_context_rows"] = len(filt)

    # ---- deterministic sampling: parallelism invariance at 200k -----------
    docs8 = corpus.select("doc_id", "lang").repartition(8)
    docs64 = corpus.select("doc_id", "lang").repartition(64)
    t = time.time()
    s8 = {r["doc_id"] for r in hash_sample(docs8, 0.01, seed=7).collect()}
    out["hash_sample_p50_sec"] = round(time.time() - t, 3)
    s64 = {r["doc_id"] for r in hash_sample(docs64, 0.01, seed=7).collect()}
    out["hash_sample_parallelism_invariant"] = s8 == s64
    out["hash_sample_rows"] = len(s8)
    e8 = {
        r["doc_id"]
        for r in stratified_sample_exact(docs8, "lang", 100, seed=7).collect()
    }
    e64 = {
        r["doc_id"]
        for r in stratified_sample_exact(docs64, "lang", 100, seed=7).collect()
    }
    out["sample_exact_parallelism_invariant"] = e8 == e64

    # ---- diversified sampler over a stop-grade match set ------------------
    hits = bm25_scored(
        spark, stats, term_df, [(0, "the if")], CFG, n_idx, avgdl
    )
    lang = corpus.select("doc_id", "lang")
    _timed(out, "diversified_sampler", lambda: diversified_sampler_agg(
        hits, lang, "lang", "lang", max_docs_per_value=50, shard_size=200))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/at_scale_r4_features.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
