"""Deterministic portable sampling (operators/sampling.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
    stratified_sample_exact,
    train_val_split,
)


@pytest.fixture(scope="module")
def tbl(spark):
    rows = [(i, "a" if i % 3 else "b") for i in range(600)]
    return spark.createDataFrame(rows, "doc_id long, src string").cache()


def _py_u60(seed, key):
    return int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:15], 16)


def test_hash_sample_matches_python_md5(tbl):
    got = {r["doc_id"] for r in hash_sample(tbl, 0.3, seed=7).collect()}
    exp = {
        i for i in range(600) if _py_u60(7, i) < int(0.3 * (1 << 60))
    }
    assert got == exp
    # rate lands near the target
    assert 0.2 < len(got) / 600 < 0.4


def test_hash_sample_stable_under_repartition(tbl):
    a = {r["doc_id"] for r in hash_sample(tbl, 0.25, seed=1).collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(tbl.repartition(13), 0.25, seed=1).collect()
    }
    assert a == b


def test_stratified_sample_per_stratum_rates(tbl):
    out = stratified_sample(
        tbl, "src", {"a": 0.5, "b": 0.1}, seed=3
    ).collect()
    got_a = {r["doc_id"] for r in out if r["src"] == "a"}
    got_b = {r["doc_id"] for r in out if r["src"] == "b"}
    exp_a = {
        i for i in range(600)
        if i % 3 and _py_u60(3, i) < int(0.5 * (1 << 60))
    }
    exp_b = {
        i for i in range(600)
        if not i % 3 and _py_u60(3, i) < int(0.1 * (1 << 60))
    }
    assert got_a == exp_a and got_b == exp_b
    # unlisted strata default to 0
    out2 = stratified_sample(tbl, "src", {"a": 0.5}, seed=3).collect()
    assert all(r["src"] == "a" for r in out2)


def test_stratified_sample_exact_counts_and_determinism(tbl):
    out = stratified_sample_exact(tbl, "src", 25, seed=9)
    counts = {
        r["src"]: r["n"]
        for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"a": 25, "b": 25}
    # deterministic: the chosen ids are the hash-smallest per stratum
    chosen_b = sorted(
        r["doc_id"] for r in out.filter("src = 'b'").collect()
    )
    all_b = sorted(
        (i for i in range(600) if not i % 3),
        key=lambda i: (_py_u60(9, i), i),
    )[:25]
    assert chosen_b == sorted(all_b)
    # n larger than the stratum returns the whole stratum
    tiny = stratified_sample_exact(
        tbl.filter("doc_id < 5"), "src", 100, seed=9
    )
    assert tiny.count() == 5


def test_train_val_split_partitions_exactly(tbl):
    train, val = train_val_split(tbl, 0.2, seed=5)
    t = {r["doc_id"] for r in train.collect()}
    v = {r["doc_id"] for r in val.collect()}
    assert t | v == set(range(600)) and not (t & v)
    # appending rows does not move old assignments
    more = tbl.sparkSession.createDataFrame(
        [(1000 + i, "a") for i in range(50)], "doc_id long, src string"
    )
    t2, v2 = train_val_split(tbl.unionByName(more), 0.2, seed=5)
    assert {r["doc_id"] for r in t2.collect()} >= t
    assert {r["doc_id"] for r in v2.collect()} >= v


def test_fraction_validation(tbl):
    with pytest.raises(ValueError):
        hash_sample(tbl, 1.5)
    with pytest.raises(ValueError):
        stratified_sample(tbl, "src", {"a": -0.1})
    with pytest.raises(ValueError):
        stratified_sample_exact(tbl, "src", 0)
