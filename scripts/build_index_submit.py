"""spark-submit entrypoint: build (or resume) the inverted index and
optionally run queries — the production path of BASELINE.json north_rule
("runs via spark-submit --py-files on a multi-executor cluster").

Package the library once:
    cd /root/repo && zip -qr /tmp/combo_spark.zip elasticsearch_analysis_combo_spark

Cluster run (N or 4N executors — identical invocation):
    spark-submit --py-files /tmp/combo_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        scripts/build_index_submit.py \
        --corpus s3://bucket/corpus --corpus-format iceberg \
        --index-dir s3://bucket/indexes/main \
        --analyzers whitespace,standard,identifier --dedup \
        --query "getFooBar merge_segments" --k 10

Local smoke:
    spark-submit --master "local[8]" --py-files /tmp/combo_spark.zip \
        scripts/build_index_submit.py --generate 500 --index-dir /tmp/idx \
        --analyzers whitespace,identifier --dedup --query "merge index"
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--corpus", help="corpus table/path (repo,path,commit,lang,content)")
    src.add_argument("--generate", type=int, help="generate N synthetic docs instead")
    ap.add_argument("--corpus-format", default="parquet",
                    help="parquet|iceberg (iceberg falls back to parquet if jars absent)")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--analyzers", default="whitespace,standard,identifier")
    ap.add_argument("--dedup", action="store_true")
    ap.add_argument("--lang-col", default=None)
    ap.add_argument("--salt-shards", type=int, default=16)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument("--skip-sha-guard", action="store_true")
    ap.add_argument("--query", action="append", default=[],
                    help="run a BM25 WAND query after building (repeatable)")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("combo_index_build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig
    from elasticsearch_analysis_combo_spark.plans.index_build import build_index
    from elasticsearch_analysis_combo_spark.query.wand import wand_topk
    from elasticsearch_analysis_combo_spark.sources.corpus import (
        generate_corpus,
        ingest,
        read_corpus,
    )

    if args.generate:
        corpus = ingest(generate_corpus(spark, args.generate))
    else:
        raw = read_corpus(spark, args.corpus, fmt=args.corpus_format)
        corpus = ingest(raw, strict=not args.skip_sha_guard)

    config = ComboConfig(
        [a.strip() for a in args.analyzers.split(",") if a.strip()],
        deduplication=args.dedup,
    )
    t0 = time.time()
    index = build_index(
        spark, corpus, config, args.index_dir,
        lang_col=args.lang_col, salt_shards=args.salt_shards,
        block_size=args.block_size, with_positions=not args.no_positions,
        input_fingerprint=args.corpus or f"synthetic:{args.generate}",
    )
    wall = time.time() - t0
    print(json.dumps({
        "event": "index_built", "index_dir": args.index_dir,
        "n_docs": index.meta.n_docs, "avgdl": index.meta.avgdl,
        "wall_sec": round(wall, 2),
        "files_per_sec": round(index.meta.n_docs / wall, 2) if wall else None,
    }))

    if args.query:
        queries = list(enumerate(args.query))
        rows = wand_topk(spark, index, queries, config, k=args.k).collect()
        for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
            print(json.dumps({
                "query_id": r["query_id"], "query": args.query[r["query_id"]],
                "rank": r["rank"], "doc_id": r["doc_id"],
                "score": round(r["score"], 6),
            }))
    spark.stop()


if __name__ == "__main__":
    main()
