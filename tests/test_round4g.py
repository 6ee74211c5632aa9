"""Round-4g additions: multi_terms / top_metrics / t_test / boxplot /
rate aggregations, ES parent-child (has_child / has_parent) join
queries, and the deterministic model-based quality classifier."""

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.query.facets import (
    boxplot_agg,
    multi_terms_agg,
    rate_agg,
    t_test_agg,
    top_metrics_agg,
)
from elasticsearch_analysis_combo_spark.query.relations import (
    has_child_query,
    has_parent_query,
)
from elasticsearch_analysis_combo_spark.operators.text_quality import (
    QUALITY_MODEL_BIAS,
    QUALITY_MODEL_THRESHOLD,
    QUALITY_MODEL_WEIGHTS,
    quality_classifier,
    quality_score,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


# ------------------------------------------------------------------ aggs

def test_multi_terms(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", "y"), ("b", "x"), ("b", "x"),
         ("b", "x"), ("c", "z")],
        "k1 string, k2 string",
    )
    got = [tuple(r) for r in multi_terms_agg(df, ["k1", "k2"], size=2).collect()]
    assert got == [("b", "x", 3), ("a", "x", 2)]
    # min_doc_count prunes singletons
    got2 = multi_terms_agg(df, ["k1", "k2"], size=10, min_doc_count=2).collect()
    assert {(r["k1"], r["k2"]) for r in got2} == {("b", "x"), ("a", "x")}


def test_top_metrics(spark):
    df = spark.createDataFrame(
        [("g1", 1.0, 10.0), ("g1", 5.0, 50.0), ("g2", 3.0, 30.0),
         ("g2", 2.0, 20.0)],
        "g string, s double, m double",
    )
    got = {
        r["g"]: (r["sort_value"], r["m"])
        for r in top_metrics_agg(df, "s", ["m"], group_col="g").collect()
    }
    assert got == {"g1": (5.0, 50.0), "g2": (3.0, 30.0)}
    asc = {
        r["g"]: r["m"]
        for r in top_metrics_agg(
            df, "s", ["m"], group_col="g", ascending=True
        ).collect()
    }
    assert asc == {"g1": 10.0, "g2": 20.0}


def test_t_test_welch(spark):
    a = [1.0, 2.0, 3.0, 4.0]
    b = [2.0, 4.0, 6.0, 8.0, 10.0]
    df = spark.createDataFrame(
        [("a", v) for v in a] + [("b", v) for v in b], "side string, v double"
    )
    r = t_test_agg(df, "v", "side = 'a'", "side = 'b'").collect()[0]
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    want = (ma - mb) / math.sqrt(va / len(a) + vb / len(b))
    assert r["n_a"] == 4 and r["n_b"] == 5
    assert r["t_value"] == pytest.approx(want, rel=1e-12)


def test_boxplot(spark):
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 10)], "g string, v double"
    )
    r = boxplot_agg(df, "v", group_col="g").collect()[0]
    assert (r["min"], r["q2"], r["max"]) == (1.0, 5.0, 9.0)
    assert r["q1"] == 3.0 and r["q3"] == 7.0


def test_rate_agg(spark, events):
    # per-hour event rate out of daily buckets == daily count / 24
    daily = {
        (r["event_type"], r["bucket"]): r["rate"]
        for r in rate_agg(
            events, "ts", "day", 3600.0, group_col="event_type"
        ).collect()
    }
    counts = {
        (r["event_type"], r["bucket"]): r["n"]
        for r in events.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("bucket")
        ).agg(F.count("*").alias("n")).collect()
    }
    assert daily.keys() == counts.keys() and daily
    for k, v in daily.items():
        assert v == pytest.approx(counts[k] / 24.0, rel=1e-12)
    with pytest.raises(ValueError):
        rate_agg(events, "ts", "fortnight", 3600.0)


# ------------------------------------------------------------ parent-child

@pytest.fixture(scope="module")
def tpch(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    return orders, lineitem


def test_has_child(spark, tpch):
    orders, lineitem = tpch
    got = has_child_query(
        orders, lineitem, "o_orderkey", "l_orderkey",
        "l_quantity >= 45", score_mode="max",
        score_expr="l_extendedprice", min_children=2,
    )
    rows = {r["o_orderkey"]: (r["n_children"], r["score"]) for r in got.collect()}
    # reference computation in plain Spark
    want = {
        r["l_orderkey"]: (r["n"], r["mx"])
        for r in lineitem.filter("l_quantity >= 45")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n"), F.max("l_extendedprice").alias("mx"))
        .filter("n >= 2").collect()
    }
    valid_parents = {r["o_orderkey"] for r in orders.collect()}
    want = {k: v for k, v in want.items() if k in valid_parents}
    assert rows == want and rows


def test_has_child_validation(spark, tpch):
    orders, lineitem = tpch
    with pytest.raises(ValueError):
        has_child_query(orders, lineitem, "o_orderkey", "l_orderkey",
                        "l_quantity > 0", score_mode="median",
                        score_expr="l_quantity")
    with pytest.raises(ValueError):
        has_child_query(orders, lineitem, "o_orderkey", "l_orderkey",
                        "l_quantity > 0", score_mode="sum")


def test_has_parent(spark, tpch):
    orders, lineitem = tpch
    got = has_parent_query(
        lineitem, orders, "o_orderkey", "l_orderkey",
        "o_totalprice > 200000", score_expr="o_totalprice",
    )
    assert "score" in got.columns
    keys = {r["o_orderkey"] for r in
            orders.filter("o_totalprice > 200000").collect()}
    n_want = lineitem.filter(F.col("l_orderkey").isin(list(keys))).count()
    assert got.count() == n_want and n_want > 0


# ------------------------------------------------------------- classifier

def test_quality_classifier_algebra(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    feats = {r["doc_id"]: r for r in quality_score(docs).collect()}
    got = {r["doc_id"]: r for r in quality_classifier(docs).collect()}
    assert got.keys() == feats.keys()
    for did, r in got.items():
        f = feats[did]
        z = QUALITY_MODEL_BIAS
        z += QUALITY_MODEL_WEIGHTS["log_n_tokens"] * math.log1p(f["n_tokens"])
        z += QUALITY_MODEL_WEIGHTS["mean_token_len"] * f["mean_token_len"]
        z += QUALITY_MODEL_WEIGHTS["stopword_ratio"] * f["stopword_ratio"]
        z += QUALITY_MODEL_WEIGHTS["digit_ratio"] * f["digit_ratio"]
        z += QUALITY_MODEL_WEIGHTS["distinct_ratio"] * f["distinct_ratio"]
        p = 1.0 / (1.0 + math.exp(-z))
        assert r["p_keep"] == pytest.approx(round(p, 6), abs=2e-6)
        assert r["keep"] == (p >= QUALITY_MODEL_THRESHOLD)
    # both classes present on real data (threshold isn't degenerate)
    assert {r["keep"] for r in got.values()} == {True, False}


def test_quality_classifier_custom_weights(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(10)
    allpos = quality_classifier(
        docs, weights={"digit_ratio": 0.0, "log_n_tokens": 0.0,
                       "mean_token_len": 0.0, "stopword_ratio": 0.0,
                       "distinct_ratio": 0.0},
        bias=10.0,
    ).collect()
    assert all(r["keep"] and r["p_keep"] > 0.999 for r in allpos)


def test_has_parent_same_key_name(spark):
    # both tables name the join key identically (the common ES
    # join-field shape): the output must keep the CHILD's key column
    parents = spark.createDataFrame(
        [(1, 500.0), (2, 50.0)], "join_key long, price double"
    )
    children = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "join_key long, payload string"
    )
    got = has_parent_query(
        children, parents, "join_key", "join_key",
        "price > 100", score_expr="price",
    )
    assert "join_key" in got.columns
    rows = {(r["join_key"], r["payload"], r["score"]) for r in got.collect()}
    assert rows == {(1, "a", 500.0), (1, "b", 500.0)}
