"""Round-4j surfaces: percentiles_bucket sibling pipeline agg and the
nested query's inner_hits path exercised end-to-end."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------- percentiles_bucket


def test_percentiles_bucket_exact_interpolation(spark):
    from elasticsearch_analysis_combo_spark.query.facets import (
        percentiles_bucket_agg,
    )

    # bucket metric values per group — percentiles over BUCKETS, the
    # ES sibling semantics (not over raw events)
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
            ("b", 10.0), ("b", 30.0)]
    df = spark.createDataFrame(rows, "g string, doc_count double")
    out = {
        (r["g"], r["percent"]): r["value"]
        for r in percentiles_bucket_agg(
            df, "doc_count", [50.0, 75.0], group_col="g"
        ).collect()
    }
    # linear interpolation between closest ranks (percentile_cont)
    assert out[("a", 50.0)] == pytest.approx(2.5)
    assert out[("a", 75.0)] == pytest.approx(3.25)
    assert out[("b", 50.0)] == pytest.approx(20.0)
    assert out[("b", 75.0)] == pytest.approx(25.0)


def test_percentiles_bucket_global_and_units(spark):
    from elasticsearch_analysis_combo_spark.query.facets import (
        percentiles_bucket_agg,
    )

    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 101)], "doc_count double"
    )
    out = {r["percent"]: r["value"]
           for r in percentiles_bucket_agg(df, "doc_count", [99.0]).collect()}
    # ES-unit percents come back (99.0, not 0.99)
    assert set(out) == {99.0}
    assert out[99.0] == pytest.approx(99.01)


# ------------------------------------------------------------ inner_hits


def test_nested_inner_hits_keeps_only_matching_objects(spark):
    from elasticsearch_analysis_combo_spark.query.relations import (
        nested_query,
    )

    df = spark.createDataFrame(
        [
            (1, [(1, 50.0), (2, 10.0), (3, 60.0)]),
            (2, [(1, 46.0)]),          # only 1 match -> min_children cut
            (3, [(1, 5.0), (2, 6.0)]),  # no match
        ],
        "id long, items array<struct<lineno:long, qty:double>>",
    )
    out = nested_query(
        df, "items", "x.qty >= 45", score_mode="max", score_expr="x.qty",
        min_children=2, inner_hits=True,
    )
    rows = out.select(
        "id", "n_nested", "score", F.explode("items_hits").alias("h")
    ).select("id", "n_nested", "score", "h.lineno").collect()
    got = sorted((r["id"], r["n_nested"], r["score"], r["lineno"])
                 for r in rows)
    # parent 1 matches twice (linenos 1 and 3); the non-matching nested
    # object (lineno 2) is NOT in the hits
    assert got == [(1, 2, 60.0, 1), (1, 2, 60.0, 3)]


def test_nested_inner_hits_plan_is_map_only(spark):
    from elasticsearch_analysis_combo_spark.query.relations import (
        nested_query,
    )

    df = spark.createDataFrame(
        [(1, [(1, 50.0)])],
        "id long, items array<struct<lineno:long, qty:double>>",
    )
    out = nested_query(df, "items", "x.qty >= 45", inner_hits=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffle: in-row array algebra
