"""Round-5j: bucket_correlation / bucket_count_ks_test sibling
pipelines, DSL script filter leaf, parent agg, geo_line agg, terms
lookup resolution."""

import math

import pytest
from pyspark.sql import functions as F


def _long(rows):
    return {(r["agg"], r["key"], r["metric"]): r["value"] for r in rows}


@pytest.fixture(scope="module")
def series_df(spark):
    # value v in bucket floor(x/10): buckets 0..3 with doc counts
    # 1, 2, 3, 4 and sums 5, 12, 21, 40
    data = []
    vals = {0: [5.0], 1: [5.0, 7.0], 2: [6.0, 7.0, 8.0],
            3: [10.0, 10.0, 10.0, 10.0]}
    for b, vs in vals.items():
        for v in vs:
            data.append((b * 10 + 1.0, v))
    return spark.createDataFrame(data, "x double, v double")


def _pearson(xs, ys):
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    vx = sum((a - mx) ** 2 for a in xs)
    vy = sum((b - my) ** 2 for b in ys)
    return cov / math.sqrt(vx * vy)


def test_bucket_correlation(spark, series_df):
    from elasticsearch_analysis_combo_spark.query.aggcompiler import (
        dsl_search_aggs,
    )

    exps = [1.0, 2.0, 4.0, 9.0]
    out = dsl_search_aggs(series_df, {"aggs": {
        "h": {"histogram": {"field": "x", "interval": 10.0}},
        "corr": {"bucket_correlation": {
            "buckets_path": "h>_count",
            "function": {"count_correlation": {
                "indicator": {"expectations": exps}}},
        }},
    }})
    got = _long(out.collect())
    want = _pearson([1.0, 2.0, 3.0, 4.0], exps)
    assert got[("corr", "", "corr.correlation")] == pytest.approx(want)


def test_bucket_correlation_metric_path(spark, series_df):
    from elasticsearch_analysis_combo_spark.query.aggcompiler import (
        dsl_search_aggs,
    )

    exps = [0.0, 1.0, 2.0, 3.0]
    out = dsl_search_aggs(series_df, {"aggs": {
        "h": {"histogram": {"field": "x", "interval": 10.0},
              "aggs": {"sv": {"sum": {"field": "v"}}}},
        "corr": {"bucket_correlation": {
            "buckets_path": "h>sv",
            "function": {"count_correlation": {
                "indicator": {"expectations": exps}}},
        }},
    }})
    got = _long(out.collect())
    want = _pearson([5.0, 12.0, 21.0, 40.0], exps)
    assert got[("corr", "", "corr.correlation")] == pytest.approx(want)


def test_bucket_count_ks_test(spark, series_df):
    from elasticsearch_analysis_combo_spark.query.aggcompiler import (
        dsl_search_aggs,
    )

    out = dsl_search_aggs(series_df, {"aggs": {
        "h": {"histogram": {"field": "x", "interval": 10.0}},
        "ks": {"bucket_count_ks_test": {
            "buckets_path": "h>_count",
            "alternative": ["less", "greater", "two_sided"],
        }},
    }})
    got = _long(out.collect())
    counts = [1.0, 2.0, 3.0, 4.0]
    tot = sum(counts)
    ecdf, acc = [], 0.0
    for c in counts:
        acc += c
        ecdf.append(acc / tot)
    ucdf = [(i + 1) / 4.0 for i in range(4)]
    greater = max(e - u for e, u in zip(ecdf, ucdf))
    less = max(u - e for e, u in zip(ecdf, ucdf))
    assert got[("ks", "", "ks.greater")] == pytest.approx(greater)
    assert got[("ks", "", "ks.less")] == pytest.approx(less)
    assert got[("ks", "", "ks.two_sided")] == pytest.approx(
        max(greater, less)
    )


def test_bucket_count_ks_test_fractions(spark, series_df):
    from elasticsearch_analysis_combo_spark.query.aggcompiler import (
        dsl_search_aggs,
    )

    fr = [4.0, 3.0, 2.0, 1.0]
    out = dsl_search_aggs(series_df, {"aggs": {
        "h": {"histogram": {"field": "x", "interval": 10.0}},
        "ks": {"bucket_count_ks_test": {
            "buckets_path": "h>_count", "fractions": fr,
            "alternative": ["two_sided"],
        }},
    }})
    got = _long(out.collect())
    counts = [1.0, 2.0, 3.0, 4.0]

    def cdf(xs):
        out, acc = [], 0.0
        for x in xs:
            acc += x
            out.append(acc / sum(xs))
        return out

    want = max(abs(e - f) for e, f in zip(cdf(counts), cdf(fr)))
    assert got[("ks", "", "ks.two_sided")] == pytest.approx(want)


def test_ks_requires_ordered_sibling(spark, series_df):
    from elasticsearch_analysis_combo_spark.query.aggcompiler import (
        dsl_search_aggs,
    )

    with pytest.raises(ValueError, match="histogram"):
        dsl_search_aggs(series_df, {"aggs": {
            "t": {"terms": {"field": "x", "size": 5}},
            "ks": {"bucket_count_ks_test": {"buckets_path": "t>_count"}},
        }}).collect()


def test_script_filter_leaf(spark):
    from elasticsearch_analysis_combo_spark.query.dsl import (
        compile_filter,
    )

    sql = compile_filter({"script": {"script": {
        "source": "price * qty > 100"}}})
    assert sql == "(price * qty > 100)"
    # string shorthand + bool composition
    sql2 = compile_filter({"bool": {
        "filter": [{"term": {"status": "open"}},
                   {"script": {"script": "v % 2 = 0"}}],
    }})
    assert "(v % 2 = 0)" in sql2 and "status" in sql2
    with pytest.raises(ValueError, match="non-empty"):
        compile_filter({"script": {"script": "  "}})


def test_script_filter_in_search_aggs(spark):
    from elasticsearch_analysis_combo_spark.query.aggcompiler import (
        dsl_search_aggs,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "doc_id long, v double"
    )
    out = dsl_search_aggs(df, {
        "query": {"script": {"script": {"source": "v >= 5"}}},
        "aggs": {"n": {"value_count": {"field": "v"}}},
    })
    got = _long(out.collect())
    assert got[("n", "", "n")] == 5.0
    assert got[("n", "", "doc_count")] == 5.0


def test_script_const_leaf_scores(spark):
    """script in query position = constant-score membership (same as
    term/range const leaves)."""
    from elasticsearch_analysis_combo_spark.query.dsl import compile_dsl

    cq = compile_dsl({"script": {
        "script": {"source": "v > 3"}, "boost": 2.5}})
    assert cq.filter_sql == "(v > 3)"
    assert cq.const_offset == pytest.approx(2.5)


def test_parent_agg(spark):
    from elasticsearch_analysis_combo_spark.query.relations import (
        parent_agg,
    )

    parents = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "pid long, budget double"
    )
    children = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (2, "b"), (3, "b")],
        "ppid long, tag string",
    )
    out = {
        r["tag"]: (r["doc_count"], r["tb"])
        for r in parent_agg(
            children, parents, "ppid", "pid", "tag",
            metric_exprs={"tb": "sum(budget)"},
        ).collect()
    }
    # tag a -> parents {1, 2} (parent 1 counted ONCE despite 2 children)
    assert out["a"] == (2, 30.0)
    assert out["b"] == (2, 50.0)


def test_geo_line_agg(spark):
    from elasticsearch_analysis_combo_spark.query.geo import geo_line_agg

    df = spark.createDataFrame(
        [("t1", 3, 1.0, 10.0), ("t1", 1, 2.0, 20.0), ("t1", 2, 3.0, 30.0),
         ("t2", 1, 5.0, 50.0)],
        "track string, ts int, lat double, lon double",
    )
    out = {
        r["track"]: r
        for r in geo_line_agg(
            df, "lat", "lon", "ts", group_col="track"
        ).collect()
    }
    assert out["t1"]["line"] == (
        "LINESTRING (20.000000 2.000000, 30.000000 3.000000, "
        "10.000000 1.000000)"
    )
    assert out["t1"]["point_count"] == 3 and out["t1"]["complete"]
    assert out["t2"]["line"] == "LINESTRING (50.000000 5.000000)"


def test_geo_line_truncation_and_desc(spark):
    from elasticsearch_analysis_combo_spark.query.geo import geo_line_agg

    df = spark.createDataFrame(
        [("t", i, float(i), float(10 * i)) for i in range(1, 6)],
        "track string, ts int, lat double, lon double",
    )
    asc = geo_line_agg(df, "lat", "lon", "ts", group_col="track",
                       size=3).collect()[0]
    assert asc["line"] == (
        "LINESTRING (10.000000 1.000000, 20.000000 2.000000, "
        "30.000000 3.000000)"
    )
    assert asc["point_count"] == 3 and not asc["complete"]
    dsc = geo_line_agg(df, "lat", "lon", "ts", group_col="track",
                       size=3, sort_order="desc").collect()[0]
    assert dsc["line"] == (
        "LINESTRING (50.000000 5.000000, 40.000000 4.000000, "
        "30.000000 3.000000)"
    )


def test_geo_line_ungrouped(spark):
    from elasticsearch_analysis_combo_spark.query.geo import geo_line_agg

    df = spark.createDataFrame(
        [(2, 1.0, 2.0), (1, 3.0, 4.0)], "ts int, lat double, lon double"
    )
    r = geo_line_agg(df, "lat", "lon", "ts").collect()[0]
    assert r["line"] == (
        "LINESTRING (4.000000 3.000000, 2.000000 1.000000)"
    )


def test_resolve_terms_lookup(spark):
    from elasticsearch_analysis_combo_spark.query.dsl import (
        compile_filter,
        resolve_terms_lookup,
    )

    colors = spark.createDataFrame(
        [(1, ["red", "blue"]), (2, ["green"])],
        "doc_id long, palette array<string>",
    )
    node = {"bool": {"filter": [
        {"terms": {"color": {"index": "colors", "id": 1,
                             "path": "palette"}}},
        {"terms": {"status": ["open"]}},
    ]}}
    got = resolve_terms_lookup(node, {"colors": colors})
    assert got["bool"]["filter"][0] == {
        "terms": {"color": ["red", "blue"]}
    }
    assert got["bool"]["filter"][1] == {"terms": {"status": ["open"]}}
    sql = compile_filter(got)
    assert "'red'" in sql and "'blue'" in sql
    with pytest.raises(ValueError, match="not found"):
        resolve_terms_lookup(
            {"terms": {"c": {"index": "colors", "id": 99,
                             "path": "palette"}}},
            {"colors": colors},
        )
    with pytest.raises(ValueError, match="unknown lookup index"):
        resolve_terms_lookup(
            {"terms": {"c": {"index": "nope", "id": 1, "path": "p"}}},
            {"colors": colors},
        )
