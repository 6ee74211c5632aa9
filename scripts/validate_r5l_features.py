"""At-scale validation for the round-5l surfaces (200k synthetic docs):

* percolate_dsl — a 100-query DSL registry over 200k docs is ONE
  map-only projection: measure wall, then re-run on a different
  partitioning and assert the (doc_id, query_id) match set is
  IDENTICAL (the cluster-size-invariance property).
* terms_enum — prefix walks over the full ~11k-term dictionary;
  search_after paging concatenates to the full walk exactly.
* training_order — 200k rows, shard/sort assignment identical under
  8-way vs 64-way input partitioning; per-epoch orders differ.

Usage: python scripts/validate_r5l_features.py  (writes
BENCH/at_scale_r5l_features.json)
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

N_DOCS = int(os.environ.get("R5L_DOCS", "200000"))
REPORT = {}


def main() -> None:
    spark = get_spark("validate_r5l", cores=32, shuffle_partitions=32)
    cfg = ComboConfig(["whitespace"])

    corpus = ingest(generate_corpus(spark, N_DOCS)).select(
        "doc_id", "content", (F.length("content")).alias("n_chars")
    ).persist()
    n = corpus.count()
    REPORT["n_docs"] = n

    # ---- percolate_dsl: 100-query registry, map-only ----
    from elasticsearch_analysis_combo_spark.query.percolate import (
        percolate_dsl,
    )

    vocab = [
        "def", "return", "class", "import", "the", "if", "for", "index",
        "merge", "query", "sort", "hash", "table", "scan", "join",
    ]
    registry = []
    qid = 0
    for i in range(40):
        a, b = vocab[i % len(vocab)], vocab[(i + 3) % len(vocab)]
        registry.append((qid, {"match": {"content": f"{a} {b}"}})); qid += 1
    for i in range(30):
        a, b = vocab[i % len(vocab)], vocab[(i + 5) % len(vocab)]
        registry.append((qid, {"match": {"content": {
            "query": f"{a} {b}", "operator": "and"}}})); qid += 1
    for i in range(20):
        a, b = vocab[i % len(vocab)], vocab[(i + 7) % len(vocab)]
        registry.append((qid, {"match_phrase": {"content": f"{a} {b}"}}))
        qid += 1
    for i in range(10):
        a = vocab[i % len(vocab)]
        registry.append((qid, {"bool": {
            "must": [{"match": {"content": a}}],
            "filter": [{"range": {"n_chars": {"gte": 100}}}],
        }})); qid += 1
    REPORT["registry_size"] = len(registry)

    t0 = time.time()
    m8 = percolate_dsl(
        spark, corpus.repartition(8), registry, cfg,
        content_col="content",
    )
    x8 = m8.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.hash("doc_id", "query_id")).alias("x"),
    ).collect()[0]
    REPORT["percolate_wall_sec"] = round(time.time() - t0, 2)
    REPORT["percolate_matches"] = x8["n"]
    t0 = time.time()
    m64 = percolate_dsl(
        spark, corpus.repartition(64), registry, cfg,
        content_col="content",
    )
    x64 = m64.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.hash("doc_id", "query_id")).alias("x"),
    ).collect()[0]
    REPORT["percolate_wall_sec_64p"] = round(time.time() - t0, 2)
    REPORT["percolate_partition_invariant"] = (
        (x8["n"], x8["x"]) == (x64["n"], x64["x"])
    )

    # ---- terms_enum over the full dictionary ----
    from elasticsearch_analysis_combo_spark.analysis.udfs import (
        build_term_stats,
    )
    from elasticsearch_analysis_combo_spark.query.suggest import terms_enum

    term_df = (
        build_term_stats(corpus, cfg, content_col="content")
        .groupBy("term").agg(F.count("*").alias("df"))
        .persist()
    )
    REPORT["vocab_size"] = term_df.count()
    t0 = time.time()
    full = [r["term"] for r in
            terms_enum(term_df, "s", size=100000).collect()]
    REPORT["terms_enum_wall_sec"] = round(time.time() - t0, 2)
    REPORT["terms_enum_prefix_terms"] = len(full)
    pages, after = [], None
    while True:
        page = [r["term"] for r in
                terms_enum(term_df, "s", size=500,
                           search_after=after).collect()]
        if not page:
            break
        pages.extend(page)
        after = page[-1]
        if len(page) < 500:
            break
    REPORT["terms_enum_paging_equals_full"] = pages == full

    # ---- training_order invariance at 200k ----
    from elasticsearch_analysis_combo_spark.operators.sampling import (
        training_order,
    )

    def sig(df):
        return df.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.hash("doc_id", "shard", "sort_key")).alias("x"),
        ).collect()[0]

    t0 = time.time()
    a = sig(training_order(corpus.repartition(8).select("doc_id"),
                           seed=3, epoch=0, n_shards=1024))
    b = sig(training_order(corpus.repartition(64).select("doc_id"),
                           seed=3, epoch=0, n_shards=1024))
    e1 = sig(training_order(corpus.select("doc_id"),
                            seed=3, epoch=1, n_shards=1024))
    REPORT["training_order_wall_sec"] = round(time.time() - t0, 2)
    REPORT["training_order_partition_invariant"] = (
        (a["n"], a["x"]) == (b["n"], b["x"])
    )
    REPORT["training_order_epochs_differ"] = a["x"] != e1["x"]

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "at_scale_r5l_features.json",
    )
    with open(out, "w") as f:
        json.dump(REPORT, f, indent=1)
    print(json.dumps(REPORT))
    spark.stop()


if __name__ == "__main__":
    main()
