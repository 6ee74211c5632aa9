"""Round-5h aggs-compiler widening: ip_prefix / categorize_text
buckets and the change_point sibling pipeline — hand vectors per kind
(reference semantics: ES aggregation docs; change_point mirrors the
standalone facets.change_point_agg CUSUM already gate-oracled)."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.query.aggcompiler import (
    dsl_aggs,
)


@pytest.fixture(scope="module")
def logs(spark):
    rows = [
        # (doc_id, day, ip, msg, price)
        (1, "2024-01-01", "10.0.0.10", "job 42 started on node 3", 10.0),
        (2, "2024-01-02", "10.0.0.200", "job 77 started on node 9", 12.0),
        (3, "2024-01-03", "10.0.1.5", "disk full at /var/log1", 11.0),
        (4, "2024-01-04", "10.0.2.1", "JOB 9 STARTED ON NODE 1", 50.0),
        (5, "2024-01-05", "10.0.0.1", "disk full at /opt2", 52.0),
        (6, "2024-01-06", "10.1.0.1", None, 51.0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, day string, ip string, msg string, price double"
    )
    return df.withColumn("ts", F.to_timestamp("day"))


def _rows(df):
    return {
        (r["agg"], r["key"], r["metric"]): r["value"] for r in df.collect()
    }


def test_ip_prefix_bucket(logs):
    out = _rows(dsl_aggs(logs, {
        "nets": {"ip_prefix": {"field": "ip", "prefix_length": 24}},
    }))
    assert out[("nets", "10.0.0.0", "doc_count")] == 3.0
    assert out[("nets", "10.0.1.0", "doc_count")] == 1.0
    assert out[("nets", "10.0.2.0", "doc_count")] == 1.0
    assert out[("nets", "10.1.0.0", "doc_count")] == 1.0
    # /12 folds the second octet's low nibble: every row -> 10.0.0.0
    wide = _rows(dsl_aggs(logs, {
        "nets": {"ip_prefix": {"field": "ip", "prefix_length": 12,
                               "append_prefix_length": True}},
    }))
    assert wide[("nets", "10.0.0.0/12", "doc_count")] == 6.0
    # metric sub-aggs ride the one groupBy pass
    sub = _rows(dsl_aggs(logs, {
        "nets": {"ip_prefix": {"field": "ip", "prefix_length": 24},
                 "aggs": {"p": {"sum": {"field": "price"}}}},
    }))
    assert sub[("nets", "10.0.0.0", "p")] == 74.0


def test_ip_prefix_guards(logs):
    with pytest.raises(ValueError, match="prefix_length"):
        dsl_aggs(logs, {"n": {"ip_prefix": {"field": "ip",
                                            "prefix_length": 33}}})
    with pytest.raises(ValueError, match="IPv4"):
        dsl_aggs(logs, {"n": {"ip_prefix": {
            "field": "ip", "prefix_length": 8, "is_ipv6": True}}})


def test_categorize_text_bucket(logs):
    out = _rows(dsl_aggs(logs, {
        "cats": {"categorize_text": {"field": "msg"}},
    }))
    # digits drop from the signature; case folds; the null msg drops
    assert out[("cats", "job started on node", "doc_count")] == 3.0
    assert out[("cats", "disk full at", "doc_count")] == 2.0
    assert ("cats", "", "doc_count") not in out
    # the terms-style size cut applies (top categories by doc_count)
    cut = _rows(dsl_aggs(logs, {
        "cats": {"categorize_text": {"field": "msg", "size": 1}},
    }))
    assert list(cut) == [("cats", "job started on node", "doc_count")]


def test_change_point_sibling(logs):
    out = _rows(dsl_aggs(logs, {
        "daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"v": {"avg": {"field": "price"}}},
        },
        "cp": {"change_point": {"buckets_path": "daily>v"}},
    }))
    # series 10,12,11,50,52,51 (mean 31): CUSUM -21,-40,-60,-41,-20,0
    # -> argmax |S| at the 3rd bucket; shift = 51 - 11 = 40
    assert list({k[1] for k in out if k[0] == "cp"}) == [
        "2024-01-03 00:00:00"
    ]
    assert out[("cp", "2024-01-03 00:00:00", "cp.cusum_score")] == \
        pytest.approx(60.0)
    assert out[("cp", "2024-01-03 00:00:00", "cp.shift")] == \
        pytest.approx(40.0)


def test_change_point_histogram_numeric_order(spark):
    # histogram keys render "%.4f": "9.0000" > "10.0000" lexically —
    # the sibling must order NUMERICALLY for the CUSUM series
    rows = [(float(i), 1.0 if i < 9 else 9.0) for i in range(12)]
    df = spark.createDataFrame(rows, "x double, v double")
    out = _rows(dsl_aggs(df, {
        "h": {"histogram": {"field": "x", "interval": 1.0},
              "aggs": {"m": {"max": {"field": "v"}}}},
        "cp": {"change_point": {"buckets_path": "h>m"}},
    }))
    (key,) = {k[1] for k in out if k[0] == "cp"}
    assert key == "8.0000"
    assert out[("cp", key, "cp.shift")] == pytest.approx(8.0)


def test_frequent_item_sets_route(spark):
    rows = [
        (1, ["a", "b", "c"]), (2, ["a", "b"]), (3, ["a", "b"]),
        (4, ["a", "c"]), (5, ["b"]), (6, ["d"]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, tags array<string>")
    out = _rows(dsl_aggs(df, {
        "sets": {"frequent_item_sets": {
            "fields": [{"field": "tags"}], "min_support_docs": 3,
            "size": 10}},
    }))
    # singletons: a=4, b=4 survive (c=2, d=1 pruned); pair a|b = 3
    assert out[("sets", "a", "doc_count")] == 4.0
    assert out[("sets", "b", "doc_count")] == 4.0
    assert out[("sets", "a|b", "doc_count")] == 3.0
    assert out[("sets", "a|b", "set_size")] == 2.0
    assert ("sets", "c", "doc_count") not in out
    # minimum_support ratio form: 0.5 of 6 docs -> 3 docs, same result
    ratio = _rows(dsl_aggs(df, {
        "sets": {"frequent_item_sets": {
            "fields": [{"field": "tags"}], "minimum_support": 0.5}},
    }))
    assert {k for k in ratio if k[2] == "doc_count"} == {
        ("sets", "a", "doc_count"), ("sets", "b", "doc_count"),
        ("sets", "a|b", "doc_count"),
    }
    # minimum_set_size=2 keeps pairs only
    pairs_only = _rows(dsl_aggs(df, {
        "sets": {"frequent_item_sets": {
            "fields": [{"field": "tags"}], "min_support_docs": 3,
            "minimum_set_size": 2}},
    }))
    assert {k[1] for k in pairs_only} == {"a|b"}
    with pytest.raises(ValueError, match="one entry"):
        dsl_aggs(df, {"s": {"frequent_item_sets": {
            "fields": [{"field": "tags"}, {"field": "x"}]}}})


def test_change_point_requires_ordered_sibling(logs):
    with pytest.raises(ValueError, match="change_point"):
        dsl_aggs(logs, {
            "t": {"terms": {"field": "ip", "size": 10}},
            "cp": {"change_point": {"buckets_path": "t>_count"}},
        })
