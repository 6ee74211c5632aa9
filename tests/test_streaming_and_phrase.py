"""Streaming incremental ingest (generations + compaction) and positional
phrase matching."""

import numpy as np
import pytest

from elasticsearch_analysis_combo_spark.analysis.combo import (
    ComboConfig,
    analyze_text,
)
from elasticsearch_analysis_combo_spark.query.phrase import phrase_match
from elasticsearch_analysis_combo_spark.sources.corpus import (
    CORPUS_SCHEMA,
    generate_corpus,
    ingest,
)
from elasticsearch_analysis_combo_spark.streaming.ingest import (
    compact_generations,
    start_incremental_ingest,
    stream_corpus,
)

from tests.oracle import build_oracle_index

CFG = ComboConfig(["whitespace", "standard"], deduplication=True)


def test_incremental_ingest_equals_batch(spark, tmp_path):
    drop_dir = str(tmp_path / "drop")
    idx_dir = str(tmp_path / "idx")
    full = ingest(generate_corpus(spark, 120)).cache()
    a = full.filter("pmod(doc_id, 2) = 0")
    b = full.filter("pmod(doc_id, 2) = 1")
    schema = full.schema

    # batch 1 lands, stream drains it
    a.write.mode("overwrite").parquet(f"{drop_dir}/batch1")
    stream = stream_corpus(spark, f"{drop_dir}/*", schema)
    q = start_incremental_ingest(stream, CFG, idx_dir)
    q.awaitTermination(120)

    # batch 2 lands later; a NEW availableNow query resumes from the same
    # checkpoint and must process ONLY the new files (exactly-once)
    b.write.mode("overwrite").parquet(f"{drop_dir}/batch2")
    stream2 = stream_corpus(spark, f"{drop_dir}/*", schema)
    q2 = start_incremental_ingest(stream2, CFG, idx_dir)
    q2.awaitTermination(120)

    postings, n_docs, avgdl = compact_generations(spark, idx_dir, salt_shards=4)
    docs = [(r["doc_id"], r["content"], r["lang"])
            for r in full.select("doc_id", "content", "lang").collect()]
    exp_postings, exp_dl, exp_n, exp_avgdl = build_oracle_index(docs, CFG)
    assert n_docs == exp_n
    assert abs(avgdl - exp_avgdl) < 1e-9
    got = {(r["term"], r["df"], r["cf"]) for r in postings.collect()}
    exp = {
        (t, len(pl), sum(tf for tf, _ in pl.values()))
        for t, pl in exp_postings.items()
    }
    assert got == exp


def test_phrase_match(spark, tmp_path):
    rows = [
        (0, "merge the segment then merge the segment again"),
        (1, "segment merge is not the merge segment"),
        (2, "merge merge segment"),
        (3, "nothing relevant here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    from elasticsearch_analysis_combo_spark.analysis.udfs import build_term_stats
    from elasticsearch_analysis_combo_spark.operators.postings import (
        build_segments,
        merge_segments,
    )

    cfg = ComboConfig(["whitespace"])
    stats = build_term_stats(docs, cfg)
    segs = build_segments(stats, avgdl=7.0, salt_shards=2, block_size=4)
    postings = merge_segments(segs, avgdl=7.0, block_size=4)
    out = phrase_match(
        spark, postings, [(0, "merge the segment"), (1, "merge segment"), (2, "zzz qqq")], cfg
    ).collect()
    got = {(r["query_id"], r["doc_id"]): r["n_matches"] for r in out}
    assert got[(0, 0)] == 2          # phrase occurs twice in doc 0
    assert (0, 1) not in got
    assert got[(1, 1)] == 1          # "merge segment" tail of doc 1
    assert got[(1, 2)] == 1
    assert not any(q == 2 for q, _ in got)  # unseen phrase -> no rows
