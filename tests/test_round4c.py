"""Round-4c surfaces: pipeline aggregations (derivative /
cumulative_sum / moving_fn avg, bucket_script, percentile_ranks) and
filtered kNN (pre-filter cosine top-k)."""

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.operators.similarity import (
    brute_force_cosine_topk,
    filtered_cosine_topk,
)
from elasticsearch_analysis_combo_spark.query.facets import (
    bucket_script_agg,
    percentile_ranks_agg,
    pipeline_aggs,
)


@pytest.fixture(scope="module")
def buckets(spark):
    # two groups, ordered buckets with known counts
    rows = [
        ("a", "2024-01-01", 10),
        ("a", "2024-01-02", 13),
        ("a", "2024-01-03", 7),
        ("a", "2024-01-04", 20),
        ("b", "2024-01-01", 5),
        ("b", "2024-01-02", 5),
    ]
    return spark.createDataFrame(rows, "grp string, bucket string, cnt long")


def test_pipeline_aggs_derivative_cumsum_moving(buckets):
    out = pipeline_aggs(buckets, "cnt", "bucket", group_col="grp", window=3)
    got = {
        (r["grp"], r["bucket"]): (
            r["derivative"],
            r["cumulative_sum"],
            r["moving_avg"],
        )
        for r in out.collect()
    }
    # first bucket per group: derivative is null (ES emits none)
    assert got[("a", "2024-01-01")] == (None, 10, 10.0)
    assert got[("a", "2024-01-02")] == (3, 23, 11.5)
    # trailing window of 3: (10+13+7)/3
    d, c, m = got[("a", "2024-01-03")]
    assert (d, c) == (-6, 30) and math.isclose(m, 30 / 3)
    # window slides: (13+7+20)/3
    d, c, m = got[("a", "2024-01-04")]
    assert (d, c) == (13, 50) and math.isclose(m, 40 / 3)
    # groups are independent partitions
    assert got[("b", "2024-01-01")] == (None, 5, 5.0)
    assert got[("b", "2024-01-02")] == (0, 10, 5.0)


def test_pipeline_aggs_ungrouped(buckets):
    one = buckets.filter(F.col("grp") == "a")
    out = pipeline_aggs(one, "cnt", "bucket", group_col=None, window=2)
    rows = {r["bucket"]: r for r in out.collect()}
    assert rows["2024-01-04"]["cumulative_sum"] == 50
    assert math.isclose(rows["2024-01-04"]["moving_avg"], (7 + 20) / 2)


def test_bucket_script_ratio_of_sums(spark):
    rows = [("x", 10.0, 0.1), ("x", 30.0, 0.2), ("y", 5.0, 0.0)]
    df = spark.createDataFrame(rows, "k string, price double, disc double")
    out = bucket_script_agg(
        df, "k", "sum(price * disc)", "sum(price)"
    )
    got = {r["k"]: r for r in out.collect()}
    assert math.isclose(got["x"]["num"], 10.0 * 0.1 + 30.0 * 0.2)
    assert math.isclose(got["x"]["den"], 40.0)
    assert math.isclose(got["x"]["value"], 7.0 / 40.0)
    # zero-discount bucket: ratio is exactly 0, not null
    assert got["y"]["value"] == 0.0


def test_percentile_ranks_vector(spark):
    df = spark.createDataFrame(
        [("g", float(v)) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]],
        "k string, v double",
    )
    out = percentile_ranks_agg(df, "v", [2.5, 5.0, 100.0], group_col="k")
    got = {r["value"]: r["percentile_rank"] for r in out.collect()}
    assert math.isclose(got[2.5], 20.0)  # 2 of 10 values <= 2.5
    assert math.isclose(got[5.0], 50.0)
    assert math.isclose(got[100.0], 100.0)
    # ungrouped path returns one row per probe too
    got2 = {
        r["value"]: r["percentile_rank"]
        for r in percentile_ranks_agg(df, "v", [5.0]).collect()
    }
    assert math.isclose(got2[5.0], 50.0)


@pytest.fixture(scope="module")
def emb(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8)).astype("float32")
    rows = [
        (i, [float(x) for x in vecs[i]], i % 3) for i in range(40)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).cache()


def test_filtered_cosine_topk_prefilter_semantics(emb):
    q = emb.filter(F.col("vec_id") == 0).collect()[0]
    queries = [(0, [float(x) for x in q["embedding"]])]
    out = filtered_cosine_topk(
        emb, queries, "label = 1", k=5
    ).collect()
    # every hit satisfies the predicate (pre-filter: k matching vectors)
    labels = {
        r["label"]
        for r in emb.filter(
            F.col("vec_id").isin([x["vec_id"] for x in out])
        ).collect()
    }
    assert labels == {1} and len(out) == 5
    # equals brute force over the pre-filtered candidate set
    expect = brute_force_cosine_topk(
        emb.filter("label = 1"), queries, k=5
    ).collect()
    assert [(r["rank"], r["vec_id"]) for r in out] == [
        (r["rank"], r["vec_id"]) for r in expect
    ]
