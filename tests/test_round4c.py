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


# ---------------------------------------------------------------------------
# rare_terms / auto_date_histogram / diversified_sampler / runtime fields


def test_rare_terms_long_tail(spark):
    from elasticsearch_analysis_combo_spark.query.facets import rare_terms_agg

    rows = [("a", "u1")] * 5 + [("a", "u2")] * 2 + [("a", "u3")] + [
        ("b", "u1")
    ]
    df = spark.createDataFrame(rows, "et string, uid string")
    out = rare_terms_agg(df, "uid", max_doc_count=2, group_col="et")
    got = {(r["et"], r["uid"]): r["doc_count"] for r in out.collect()}
    # u1 in group a has 5 events -> excluded; same uid in group b has 1
    assert got == {("a", "u2"): 2, ("a", "u3"): 1, ("b", "u1"): 1}
    with pytest.raises(ValueError):
        rare_terms_agg(df, "uid", max_doc_count=0)


def test_auto_date_histogram_ladder(spark):
    from elasticsearch_analysis_combo_spark.query.facets import (
        auto_date_histogram_agg,
    )

    rows = [
        (f"2024-01-{d:02d} {h:02d}:15:00",)
        for d in range(1, 4)
        for h in (0, 6, 12)
    ]
    df = spark.createDataFrame(rows, "ts string")
    # 9 distinct hours fit in 10 -> hour
    out = auto_date_histogram_agg(df, "ts", target_buckets=10)
    assert out.select("interval").distinct().collect()[0][0] == "hour"
    assert out.count() == 9
    # 9 hours > 5 but 3 days fit -> day, counts roll up
    out2 = auto_date_histogram_agg(df, "ts", target_buckets=5)
    assert out2.select("interval").distinct().collect()[0][0] == "day"
    got = {r["bucket"]: r["doc_count"] for r in out2.collect()}
    assert got == {
        "2024-01-01 00:00:00": 3,
        "2024-01-02 00:00:00": 3,
        "2024-01-03 00:00:00": 3,
    }
    # nothing fits -> year fallback
    out3 = auto_date_histogram_agg(df, "ts", target_buckets=0 + 1)
    assert out3.select("interval").distinct().collect()[0][0] in (
        "month", "year"
    )


def test_diversified_sampler_caps_and_samples(spark):
    from elasticsearch_analysis_combo_spark.query.facets import (
        diversified_sampler_agg,
    )

    hits = spark.createDataFrame(
        [(0, d, 10.0 - d) for d in range(6)],
        "query_id int, doc_id long, score double",
    )
    meta = spark.createDataFrame(
        [(0, "s1"), (1, "s1"), (2, "s1"), (3, "s2"), (4, "s2"), (5, "s3")],
        "doc_id long, src string",
    )
    # cap 1 per src, shard 2: best hit per src = docs 0,3,5 -> top2 = 0,3
    out = diversified_sampler_agg(
        hits, meta, "src", "src", max_docs_per_value=1, shard_size=2
    )
    got = {(r["query_id"], r["src"]): r["doc_count"] for r in out.collect()}
    assert got == {(0, "s1"): 1, (0, "s2"): 1}
    # cap 2, shard 10: docs 0,1 (s1), 3,4 (s2), 5 (s3)
    out2 = diversified_sampler_agg(
        hits, meta, "src", "src", max_docs_per_value=2, shard_size=10
    )
    got2 = {(r["query_id"], r["src"]): r["doc_count"] for r in out2.collect()}
    assert got2 == {(0, "s1"): 2, (0, "s2"): 2, (0, "s3"): 1}


def test_runtime_field_json_extract(spark):
    from elasticsearch_analysis_combo_spark.query.facets import (
        with_runtime_field,
    )

    df = spark.createDataFrame(
        [('{"k": 3}',), ('{"k": 7}',), ("{}",)], "props string"
    )
    out = with_runtime_field(
        df, "k", "cast(get_json_object(props, '$.k') as int)"
    )
    vals = sorted(
        (r["k"] for r in out.collect()), key=lambda x: (x is None, x)
    )
    assert vals == [3, 7, None]


def test_ivf_filtered_equals_filtered_brute_force_at_full_probe(emb):
    from elasticsearch_analysis_combo_spark.operators.similarity import (
        ivf_cosine_topk,
    )

    q = emb.filter(F.col("vec_id") == 1).collect()[0]
    queries = [(1, [float(x) for x in q["embedding"]])]
    out = ivf_cosine_topk(
        emb, queries, k=5, n_cells=4, n_probe=4, seed=11,
        filter_expr="label = 2",
    ).collect()
    labels = {
        r["label"]
        for r in emb.filter(
            F.col("vec_id").isin([x["vec_id"] for x in out])
        ).collect()
    }
    assert labels == {2} and len(out) == 5
    expect = brute_force_cosine_topk(
        emb.filter("label = 2"), queries, k=5
    ).collect()
    assert [(r["rank"], r["vec_id"]) for r in out] == [
        (r["rank"], r["vec_id"]) for r in expect
    ]
