"""training_order: deterministic seeded shuffle + sharding for
data-parallel training readers."""

import hashlib

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"t{i}") for i in range(200)], "doc_id long, text string"
    )


def _rows(df):
    return sorted(
        (r["doc_id"], r["shard"], r["sort_key"]) for r in df.collect()
    )


def test_deterministic_and_partitioning_invariant(spark, docs):
    from elasticsearch_analysis_combo_spark.operators.sampling import (
        training_order,
    )

    a = _rows(training_order(docs, seed=7, epoch=0, n_shards=8))
    b = _rows(training_order(docs.repartition(13), seed=7, epoch=0,
                             n_shards=8))
    assert a == b
    assert len(a) == 200
    assert all(0 <= s < 8 for _, s, _ in a)


def test_hash_matches_hashlib(spark, docs):
    from elasticsearch_analysis_combo_spark.operators.sampling import (
        training_order,
    )

    out = {r["doc_id"]: (r["shard"], r["sort_key"])
           for r in training_order(docs, seed=7, epoch=3,
                                   n_shards=8).collect()}
    for k in (0, 17, 199):
        h = int(hashlib.md5(f"7:3:{k}".encode()).hexdigest()[:15], 16)
        assert out[k] == (h % 8, h)


def test_epoch_reshuffles(spark, docs):
    from elasticsearch_analysis_combo_spark.operators.sampling import (
        training_order,
    )

    e0 = {r["doc_id"]: r["sort_key"]
          for r in training_order(docs, seed=7, epoch=0).collect()}
    e1 = {r["doc_id"]: r["sort_key"]
          for r in training_order(docs, seed=7, epoch=1).collect()}
    # independent permutations: the vast majority of keys move
    moved = sum(1 for k in e0 if e0[k] != e1[k])
    assert moved >= 195


def test_shard_balance(spark, docs):
    from elasticsearch_analysis_combo_spark.operators.sampling import (
        training_order,
    )

    per = (
        training_order(docs, seed=1, epoch=0, n_shards=4)
        .groupBy("shard").count().collect()
    )
    counts = {r["shard"]: r["count"] for r in per}
    assert set(counts) == {0, 1, 2, 3}
    assert all(c >= 25 for c in counts.values())  # ~50 each


def test_validation(spark, docs):
    from elasticsearch_analysis_combo_spark.operators.sampling import (
        training_order,
    )

    with pytest.raises(ValueError, match="n_shards"):
        training_order(docs, n_shards=0)
    with pytest.raises(ValueError, match="epoch"):
        training_order(docs, epoch=-1)
