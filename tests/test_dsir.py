"""DSIR importance resampling (operators/dsir.py): target-likeness
ordering, determinism across partitionings, length normalization."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.operators.dsir import (
    dsir_log_weights,
    dsir_resample,
)


@pytest.fixture(scope="module")
def corpora(spark):
    rows = []
    # 30 "webby" docs, 30 "wiki-like" docs (the target style), each
    # with a unique tail token so no two texts are identical
    for i in range(30):
        rows.append((i, "click here buy now free offer u%d" % i))
    for i in range(30, 60):
        rows.append((i, "the history of science article cites u%d" % i))
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(1000 + j, "history of science article references source%d" % j)
         for j in range(10)],
        "doc_id long, text string",
    )
    return raw, target


def test_target_like_docs_rank_higher(corpora):
    raw, target = corpora
    w = dsir_log_weights(raw, target, num_buckets=512).collect()
    ws = {r["doc_id"]: r["log_weight"] for r in w}
    assert len(ws) == 60
    wiki = [ws[d] for d in range(30, 60)]
    webby = [ws[d] for d in range(30)]
    # every wiki-like doc outweighs every webby doc on this corpus
    assert min(wiki) > max(webby)
    sel = dsir_resample(raw, target, k=20, num_buckets=512).collect()
    picked = {r["doc_id"] for r in sel}
    assert sum(1 for d in picked if d >= 30) >= 16  # heavy enrichment
    assert [r["rank"] for r in sorted(sel, key=lambda r: r["rank"])] == \
        list(range(1, 21))


def test_deterministic_and_partitioning_invariant(corpora):
    raw, target = corpora
    a = dsir_resample(raw, target, k=10, num_buckets=512, seed=3).collect()
    b = dsir_resample(
        raw.repartition(7), target.repartition(3), k=10,
        num_buckets=512, seed=3,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_length_normalize_and_seed_changes_selection(corpora):
    raw, target = corpora
    n = dsir_resample(
        raw, target, k=10, num_buckets=512, length_normalize=True
    ).collect()
    assert len(n) == 10
    s1 = {r["doc_id"] for r in
          dsir_resample(raw, target, k=10, num_buckets=512, seed=1)
          .collect()}
    s2 = {r["doc_id"] for r in
          dsir_resample(raw, target, k=10, num_buckets=512, seed=2)
          .collect()}
    assert s1 != s2  # the Gumbel noise actually samples


def test_empty_docs_dropped(spark, corpora):
    raw, target = corpora
    with_empty = raw.unionByName(
        spark.createDataFrame([(999, "")], "doc_id long, text string")
    )
    w = dsir_log_weights(with_empty, target, num_buckets=512).collect()
    assert 999 not in {r["doc_id"] for r in w}
