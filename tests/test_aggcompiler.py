"""ES aggs-tree compiler (query/aggcompiler.py): hand vectors per
bucket/metric kind, nesting, terms order semantics, filter context and
match-set composition."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.query.aggcompiler import (
    dsl_aggs,
    dsl_search_aggs,
)


@pytest.fixture(scope="module")
def sales(spark):
    rows = [
        # (doc_id, status, prio, price)
        (1, "O", "HI", 10.0),
        (2, "O", "HI", 30.0),
        (3, "O", "LO", 50.0),
        (4, "F", "HI", 100.0),
        (5, "F", "LO", 200.0),
        (6, "P", "LO", 300.0),
        (7, "P", None, None),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, status string, prio string, price double"
    )


def _rows(df):
    return {
        (r["agg"], r["key"], r["metric"]): r["value"] for r in df.collect()
    }


def test_terms_with_metrics_one_pass(sales):
    out = _rows(dsl_aggs(sales, {
        "by_status": {
            "terms": {"field": "status", "size": 10},
            "aggs": {"avg_price": {"avg": {"field": "price"}},
                     "n_prices": {"value_count": {"field": "price"}}},
        }
    }))
    assert out[("by_status", "O", "doc_count")] == 3.0
    assert out[("by_status", "O", "avg_price")] == 30.0
    assert out[("by_status", "P", "doc_count")] == 2.0
    # value_count skips nulls (ES semantics)
    assert out[("by_status", "P", "n_prices")] == 1.0


def test_terms_order_by_sub_metric_and_size(sales):
    out = dsl_aggs(sales, {
        "t": {"terms": {"field": "status", "size": 2,
                        "order": {"m": "desc"}},
              "aggs": {"m": {"max": {"field": "price"}}}}
    })
    keys = {r["key"] for r in out.collect()}
    # max price: P=300, F=200, O=50 -> top 2 = P, F
    assert keys == {"P", "F"}


def test_nested_terms_restricted_to_surviving_parents(sales):
    out = _rows(dsl_aggs(sales, {
        "t": {"terms": {"field": "status", "size": 1},  # only O (3 docs)
              "aggs": {"p": {"terms": {"field": "prio", "size": 10}}}}
    }))
    inner = {k for k in out if k[0] == "t>p"}
    assert inner == {("t>p", "O|HI", "doc_count"),
                     ("t>p", "O|LO", "doc_count")}
    assert out[("t>p", "O|HI", "doc_count")] == 2.0


def test_histogram_extended_bounds_and_range(sales):
    out = _rows(dsl_aggs(sales, {
        "h": {"histogram": {"field": "price", "interval": 100.0,
                            "min_doc_count": 0,
                            "extended_bounds": {"min": 0, "max": 400}}},
        "r": {"range": {"field": "price",
                        "ranges": [{"to": 100}, {"from": 100}]},
              "aggs": {"s": {"sum": {"field": "price"}}}},
    }))
    assert out[("h", "0.0000", "doc_count")] == 3.0
    assert out[("h", "400.0000", "doc_count")] == 0.0  # empty via bounds
    assert out[("r", "*-100", "doc_count")] == 3.0
    assert out[("r", "100-*", "s")] == 600.0


def test_filters_missing_and_global_metric(sales):
    out = _rows(dsl_aggs(sales, {
        "f": {"filters": {"filters": {"cheap": "price < 100",
                                      "rich": "price >= 100"}},
              "aggs": {"a": {"avg": {"field": "price"}}}},
        "miss": {"missing": {"field": "prio"}},
        "total": {"sum": {"field": "price"}},
    }))
    assert out[("f", "cheap", "doc_count")] == 3.0
    assert out[("f", "rich", "a")] == 200.0
    assert out[("miss", "_missing", "doc_count")] == 1.0
    assert out[("total", "", "total")] == 690.0
    assert out[("total", "", "doc_count")] == 7.0


def test_date_histogram(spark):
    df = spark.createDataFrame(
        [("2024-01-03 10:00:00",), ("2024-01-15 11:00:00",),
         ("2024-02-01 00:00:00",)],
        "ts string",
    ).select(F.col("ts").cast("timestamp").alias("ts"))
    out = _rows(dsl_aggs(df, {
        "m": {"date_histogram": {"field": "ts",
                                 "calendar_interval": "month"}}
    }))
    assert out[("m", "2024-01-01 00:00:00", "doc_count")] == 2.0
    assert out[("m", "2024-02-01 00:00:00", "doc_count")] == 1.0


def test_filter_context_and_match_set(sales, spark):
    body = {"query": {"term": {"status": {"value": "O"}}},
            "aggs": {"t": {"terms": {"field": "prio", "size": 10}}}}
    out = _rows(dsl_search_aggs(sales, body))
    assert out[("t", "HI", "doc_count")] == 2.0
    assert ("t", "LO", "doc_count") in out
    matched = spark.createDataFrame([(1,), (4,)], "doc_id long")
    out2 = _rows(dsl_search_aggs(
        sales, {"aggs": {"t": {"terms": {"field": "status",
                                         "size": 10}}}},
        match_doc_ids=matched,
    ))
    assert out2 == {("t", "O", "doc_count"): 1.0,
                    ("t", "F", "doc_count"): 1.0}


def test_stats_and_percentiles_metrics(sales):
    out = _rows(dsl_aggs(sales, {
        "t": {"terms": {"field": "status", "size": 10},
              "aggs": {"s": {"stats": {"field": "price"}},
                       "p": {"percentiles": {"field": "price",
                                             "percents": [50, 100]}}}}
    }))
    assert out[("t", "O", "s.count")] == 3.0
    assert out[("t", "O", "s.min")] == 10.0
    assert out[("t", "O", "s.max")] == 50.0
    assert out[("t", "O", "s.avg")] == 30.0
    assert out[("t", "O", "s.sum")] == 90.0
    assert out[("t", "O", "p.50")] == 30.0
    assert out[("t", "F", "p.100")] == 200.0
    # stats under filters rides the same conditional pass
    out2 = _rows(dsl_aggs(sales, {
        "f": {"filters": {"filters": {"rich": "price >= 100"}},
              "aggs": {"s": {"stats": {"field": "price"}}}}
    }))
    assert out2[("f", "rich", "s.sum")] == 600.0
    assert out2[("f", "rich", "s.count")] == 3.0


def test_terms_missing_include_exclude(sales):
    out = _rows(dsl_aggs(sales, {
        "t": {"terms": {"field": "prio", "size": 10, "missing": "NONE"}}
    }))
    assert out[("t", "NONE", "doc_count")] == 1.0  # the null-prio doc
    inc = _rows(dsl_aggs(sales, {
        "t": {"terms": {"field": "status", "size": 10, "include": "O|F"}}
    }))
    assert {k[1] for k in inc} == {"O", "F"}
    exc = _rows(dsl_aggs(sales, {
        "t": {"terms": {"field": "status", "size": 10, "exclude": "O"}}
    }))
    assert {k[1] for k in exc} == {"F", "P"}
    hm = _rows(dsl_aggs(sales, {
        "h": {"histogram": {"field": "price", "interval": 100.0,
                            "missing": 0.0}}
    }))
    # the null-price doc lands in bucket 0 via missing
    assert hm[("h", "0.0000", "doc_count")] == 4.0


def test_es_response_folding(sales):
    from elasticsearch_analysis_combo_spark.query.aggcompiler import (
        es_response,
    )

    resp = es_response(dsl_aggs(sales, {
        "by_status": {"terms": {"field": "status", "size": 10},
                      "aggs": {"a": {"avg": {"field": "price"}},
                               "p": {"terms": {"field": "prio",
                                               "size": 10}}}},
        "total": {"sum": {"field": "price"}},
    }))
    by_key = {b["key"]: b for b in resp["by_status"]["buckets"]}
    assert by_key["O"]["doc_count"] == 3
    assert by_key["O"]["a"]["value"] == 30.0
    inner = {b["key"]: b for b in by_key["O"]["p"]["buckets"]}
    assert inner["HI"]["doc_count"] == 2
    # top-level metric agg flattens like ES (no buckets wrapper)
    assert resp["total"]["total"]["value"] == 690.0
    assert resp["total"]["doc_count"] == 7


def test_unknown_kinds_raise(sales):
    with pytest.raises(ValueError):
        dsl_aggs(sales, {"x": {"geo_centroid": {"field": "p"}}}).collect()
    with pytest.raises(ValueError):
        dsl_aggs(sales, {"t": {"terms": {"field": "status",
                                         "order": {"nope": "desc"}}}})


def test_filters_nested_under_terms_and_bucket_under_filters(sales):
    out = _rows(dsl_aggs(sales, {
        "t": {"terms": {"field": "status", "size": 10},
              "aggs": {"f": {"filters": {"filters":
                                         {"cheap": "price < 100",
                                          "rich": "price >= 100"}},
                             "aggs": {"a": {"avg": {"field": "price"}}}}}}
    }))
    assert out[("t>f", "O|cheap", "doc_count")] == 3.0
    assert out[("t>f", "O|cheap", "a")] == 30.0
    assert out[("t>f", "F|rich", "doc_count")] == 2.0
    assert out[("t>f", "F|rich", "a")] == 150.0
    # bucket agg nested under a filters bucket (the recursion path)
    out2 = _rows(dsl_aggs(sales, {
        "f": {"filters": {"filters": {"cheap": "price < 100"}},
              "aggs": {"s": {"terms": {"field": "status", "size": 10}}}}
    }))
    assert out2[("f>s", "cheap|O", "doc_count")] == 3.0
