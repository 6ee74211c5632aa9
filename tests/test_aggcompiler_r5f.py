"""Round-5f aggs-compiler widening: string_stats metric, serial_diff /
moving_fn parent pipelines, percentiles_bucket sibling, random_sampler /
geohash_grid / ip_range / auto_date_histogram buckets — hand vectors per
kind (reference semantics: ES aggregation docs; the compiler mirrors the
standalone facets/geo kernels already gate-oracled)."""

import datetime

import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.query.aggcompiler import (
    dsl_aggs,
)


@pytest.fixture(scope="module")
def shop(spark):
    rows = [
        # (doc_id, day, ip, tag, price, note)
        (1, "2024-01-01 05:00:00", "10.0.0.10", "a", 10.0, "xx"),
        (2, "2024-01-01 09:00:00", "10.0.0.200", "a", 20.0, "yyyy"),
        (3, "2024-01-02 05:00:00", "10.0.1.5", "b", 30.0, "z"),
        (4, "2024-01-02 18:00:00", "10.0.2.1", "b", 40.0, "wwwwww"),
        (5, "2024-01-03 05:00:00", "10.0.0.1", "a", 50.0, "vvv"),
        (6, "2024-01-04 05:00:00", "10.1.0.1", "c", 60.0, "u"),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, day string, ip string, tag string, "
        "price double, note string",
    )
    return df.withColumn("ts", F.to_timestamp("day"))


def _rows(df):
    return {
        (r["agg"], r["key"], r["metric"]): r["value"] for r in df.collect()
    }


def test_string_stats_metric(shop):
    out = _rows(dsl_aggs(shop, {
        "notes": {"string_stats": {"field": "note"}},
    }))
    assert out[("notes", "", "doc_count")] == 6.0
    assert out[("notes", "", "notes.count")] == 6.0
    assert out[("notes", "", "notes.min_length")] == 1.0
    assert out[("notes", "", "notes.max_length")] == 6.0
    # lengths 2,4,1,6,3,1 -> avg 17/6
    assert out[("notes", "", "notes.avg_length")] == pytest.approx(17 / 6)


def test_string_stats_entropy_raises(shop):
    with pytest.raises(ValueError, match="string_stats"):
        dsl_aggs(shop, {
            "notes": {"string_stats": {"field": "note",
                                       "show_distribution": True}},
        })


def test_serial_diff_and_moving_fn(shop):
    out = _rows(dsl_aggs(shop, {
        "daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {
                "v": {"sum": {"field": "price"}},
                "d2": {"serial_diff": {"buckets_path": "v", "lag": 2}},
                "mv": {"moving_fn": {
                    "buckets_path": "v", "window": 2,
                    "script": "MovingFunctions.unweightedAvg(values)"}},
            },
        },
    }))
    # day sums: 30, 70, 50, 60
    d = ["2024-01-0%d 00:00:00" % i for i in (1, 2, 3, 4)]
    assert [out[("daily", k, "v")] for k in d] == [30.0, 70.0, 50.0, 60.0]
    # serial_diff lag 2: null, null, 50-30, 60-70
    assert out[("daily", d[0], "d2")] is None
    assert out[("daily", d[1], "d2")] is None
    assert out[("daily", d[2], "d2")] == 20.0
    assert out[("daily", d[3], "d2")] == -10.0
    # moving avg window 2 INCLUDING current (ES shift=0: [i-w+1, i])
    assert out[("daily", d[0], "mv")] == 30.0
    assert out[("daily", d[1], "mv")] == 50.0
    assert out[("daily", d[2], "mv")] == 60.0
    assert out[("daily", d[3], "mv")] == 55.0


def test_moving_fn_unknown_script_raises(shop):
    with pytest.raises(ValueError, match="moving_fn"):
        dsl_aggs(shop, {
            "daily": {
                "date_histogram": {"field": "ts",
                                   "calendar_interval": "day"},
                "aggs": {
                    "v": {"sum": {"field": "price"}},
                    "m": {"moving_fn": {"buckets_path": "v", "window": 2,
                                        "script": "holt(values, 0.3)"}},
                },
            },
        })


def test_percentiles_bucket_sibling(shop):
    out = _rows(dsl_aggs(shop, {
        "daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"v": {"sum": {"field": "price"}}},
        },
        "v_pcts": {"percentiles_bucket": {
            "buckets_path": "daily>v", "percents": [50.0, 100.0]}},
    }))
    # bucket v values sorted: 30, 50, 60, 70 -> p50 = 55 (interp), p100 = 70
    assert out[("v_pcts", "", "v_pcts.50")] == 55.0
    assert out[("v_pcts", "", "v_pcts.100")] == 70.0


def test_random_sampler_rescale_and_determinism(shop, spark):
    from elasticsearch_analysis_combo_spark.operators.sampling import (
        hash_sample,
    )

    p, seed = 0.5, 3
    sampled = hash_sample(shop, p, key_col="doc_id", seed=seed)
    n = sampled.count()
    s = sampled.agg(F.sum("price")).collect()[0][0]
    by_tag = {
        r["tag"]: r["c"]
        for r in sampled.groupBy("tag").agg(
            F.count("*").alias("c")).collect()
    }
    assert 0 < n < 6  # the fixture straddles the threshold
    out = _rows(dsl_aggs(shop, {
        "samp": {
            "random_sampler": {"probability": p, "seed": seed,
                               "key_field": "doc_id"},
            "aggs": {
                "sv": {"sum": {"field": "price"}},
                "tags": {"terms": {"field": "tag", "size": 10}},
            },
        },
    }))
    assert out[("samp", "", "doc_count")] == n * 2.0
    assert out[("samp", "", "sv")] == pytest.approx(s * 2.0)
    for tag, c in by_tag.items():
        assert out[("samp>tags", tag, "doc_count")] == c * 2.0


def test_random_sampler_unsafe_metric_raises(shop):
    with pytest.raises(ValueError, match="random_sampler"):
        dsl_aggs(shop, {
            "samp": {
                "random_sampler": {"probability": 0.5,
                                   "key_field": "doc_id"},
                "aggs": {"q": {"percentiles": {"field": "price"}}},
            },
        })


def test_geohash_grid_bucket(spark):
    # canonical vector: (57.64911, 10.40744) -> geohash u4pruydqqvj
    df = spark.createDataFrame(
        [(1, 57.64911, 10.40744), (2, 57.64911, 10.40744),
         (3, -33.86, 151.21)],
        "doc_id long, lat double, lon double",
    )
    out = _rows(dsl_aggs(df, {
        "cells": {"geohash_grid": {"lat_field": "lat", "lon_field": "lon",
                                   "precision": 5}},
    }))
    assert out[("cells", "u4pru", "doc_count")] == 2.0
    # Sydney lands in r3gx2 (precision-5 cell)
    assert sum(v for (a, k, m), v in out.items()
               if m == "doc_count") == 3.0


def test_ip_range_bucket(shop):
    out = _rows(dsl_aggs(shop, {
        "nets": {"ip_range": {"field": "ip", "ranges": [
            {"to": "10.0.0.128", "key": "low"},
            {"from": "10.0.0.128", "to": "10.0.2.0", "key": "mid"},
            {"from": "10.0.2.0", "key": "high"}]}},
    }))
    # low: 10.0.0.10, 10.0.0.1; mid: 10.0.0.200, 10.0.1.5;
    # high: 10.0.2.1, 10.1.0.1
    assert out[("nets", "low", "doc_count")] == 2.0
    assert out[("nets", "mid", "doc_count")] == 2.0
    assert out[("nets", "high", "doc_count")] == 2.0


def test_auto_date_histogram_picks_interval(shop):
    # 6 distinct hours > 4 target -> falls to day (4 distinct days <= 4)
    out = _rows(dsl_aggs(shop, {
        "auto": {"auto_date_histogram": {"field": "ts", "buckets": 4}},
    }))
    keys = sorted(k for (a, k, m) in out)
    assert keys == ["2024-01-0%d 00:00:00" % i for i in (1, 2, 3, 4)]
    assert out[("auto", "2024-01-02 00:00:00", "doc_count")] == 2.0


def test_top_hits_under_terms(shop):
    out = dsl_aggs(shop, {
        "tags": {
            "terms": {"field": "tag", "size": 2},
            "aggs": {"best": {"top_hits": {
                "size": 2, "sort": [{"price": "desc"}],
                "_source": ["doc_id"]}}},
        },
    })
    rows = {(r["agg"], r["key"], r["metric"]): r["value"]
            for r in out.collect()}
    # top-2 tags by count: a (3 docs), b (2 docs)
    assert rows[("tags", "a", "best.1.doc_id")] == 5.0  # price 50
    assert rows[("tags", "a", "best.2.doc_id")] == 2.0  # price 20
    assert rows[("tags", "b", "best.1.doc_id")] == 4.0  # price 40
    assert rows[("tags", "b", "best.2.doc_id")] == 3.0
    # tag c fell to the size cut -> no hits emitted for it
    assert not any(k == "c" for (a, k, m) in rows if a == "tags"
                   and m.startswith("best."))


def test_rate_metric(shop):
    out = dsl_aggs(shop, {
        "h12": {
            "date_histogram": {"field": "ts", "fixed_interval": "12h"},
            "aggs": {
                "per_hour": {"rate": {"field": "price", "unit": "hour"}},
                "docs_per_day": {"rate": {"unit": "day"}},
            },
        },
    })
    rows = {(r["key"], r["metric"]): r["value"] for r in out.collect()}
    # bucket 2024-01-01 00:00:00 holds docs 1,2 (prices 10+20), span
    # 12h: per_hour = 30/12; docs_per_day = 2 / 0.5
    assert rows[("2024-01-01 00:00:00", "per_hour")] == pytest.approx(2.5)
    assert rows[("2024-01-01 00:00:00", "docs_per_day")] == 4.0
    # doc 4 at 18:00 is its own bucket
    assert rows[("2024-01-02 12:00:00", "per_hour")] == pytest.approx(
        40.0 / 12)


def test_rate_varying_calendar_raises(shop):
    with pytest.raises(ValueError, match="varying"):
        dsl_aggs(shop, {
            "m": {"date_histogram": {"field": "ts",
                                     "calendar_interval": "month"},
                  "aggs": {"r": {"rate": {"unit": "day"}}}},
        })


def test_median_absolute_deviation(shop):
    out = dsl_aggs(shop, {
        "tags": {
            "terms": {"field": "tag", "size": 10},
            "aggs": {"mad": {"median_absolute_deviation": {
                "field": "price"}}},
        },
    })
    rows = {(r["key"], r["metric"]): r["value"] for r in out.collect()}
    # tag a prices 10,20,50: median 20, |x-20| = 10,0,30 -> MAD 10
    assert rows[("a", "mad")] == 10.0
    # tag b prices 30,40: median 35, deviations 5,5 -> MAD 5
    assert rows[("b", "mad")] == 5.0
    # tag c single price -> MAD 0
    assert rows[("c", "mad")] == 0.0


def test_adjacency_matrix_bucket(shop):
    out = _rows(dsl_aggs(shop, {
        "adj": {"adjacency_matrix": {"filters": {
            "cheap": "price < 35",
            "early": "ts < timestamp('2024-01-02 12:00:00')",
        }}, "aggs": {"s": {"sum": {"field": "price"}}}},
    }))
    # cheap: docs 1,2,3 (10,20,30); early: 1,2,3; cheap&early: 1,2,3
    assert out[("adj", "cheap", "doc_count")] == 3.0
    assert out[("adj", "early", "doc_count")] == 3.0
    assert out[("adj", "cheap&early", "doc_count")] == 3.0
    assert out[("adj", "cheap", "s")] == 60.0
    # empty intersections don't emit
    out2 = {k for k in _rows(dsl_aggs(shop, {
        "adj": {"adjacency_matrix": {"filters": {
            "lo": "price < 15", "hi": "price > 55"}}}},
    ))}
    assert ("adj", "lo&hi", "doc_count") not in out2
    with pytest.raises(ValueError, match="metrics"):
        dsl_aggs(shop, {"adj": {
            "adjacency_matrix": {"filters": {"a": "price < 35"}},
            "aggs": {"t": {"terms": {"field": "tag"}}}}})


def test_geotile_grid_bucket(spark):
    # zoom 2: Copenhagen-ish (57.65, 10.41) -> tile 2/2/1;
    # Sydney (-33.86, 151.21) -> x=floor(331.21/360*4)=3,
    # y: mercator(-33.86) ~ -0.625 -> (1+0.199)/2*4 ~ 2.39 -> 2
    df = spark.createDataFrame(
        [(1, 57.65, 10.41), (2, 57.65, 10.41), (3, -33.86, 151.21)],
        "doc_id long, lat double, lon double",
    )
    out = _rows(dsl_aggs(df, {
        "tiles": {"geotile_grid": {"lat_field": "lat",
                                   "lon_field": "lon", "precision": 2}},
    }))
    assert out[("tiles", "2/2/1", "doc_count")] == 2.0
    assert out[("tiles", "2/3/2", "doc_count")] == 1.0


def test_t_test_metric(shop):
    out = _rows(dsl_aggs(shop, {
        "tt": {"t_test": {
            "a": {"field": "price", "filter": {"term": {"tag": "a"}}},
            "b": {"field": "price", "filter": {"term": {"tag": "b"}}},
        }},
    }))
    # a: 10,20,50 (mean 80/3, var_samp 433.333); b: 30,40 (35, 50)
    ma, va, na = 80 / 3, 1300 / 3, 3
    mb, vb, nb = 35.0, 50.0, 2
    want = (ma - mb) / ((va / na + vb / nb) ** 0.5)
    assert out[("tt", "", "tt")] == pytest.approx(want)


def test_extended_stats_bucket_sibling(shop):
    out = _rows(dsl_aggs(shop, {
        "daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"v": {"sum": {"field": "price"}}},
        },
        "xs": {"extended_stats_bucket": {"buckets_path": "daily>v"}},
    }))
    # v values: 30, 70, 50, 60 -> avg 52.5, var_pop 218.75
    assert out[("xs", "", "xs.count")] == 4.0
    assert out[("xs", "", "xs.avg")] == 52.5
    assert out[("xs", "", "xs.variance")] == pytest.approx(218.75)
    assert out[("xs", "", "xs.sum_of_squares")] == pytest.approx(
        30**2 + 70**2 + 50**2 + 60**2)


def test_normalize_and_moving_percentiles(shop):
    out = _rows(dsl_aggs(shop, {
        "daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {
                "v": {"sum": {"field": "price"}},
                "pct": {"normalize": {"buckets_path": "v",
                                      "method": "percent_of_sum"}},
                "r01": {"normalize": {"buckets_path": "v",
                                      "method": "rescale_0_1"}},
                "mp": {"moving_percentiles": {
                    "buckets_path": "v", "window": 3,
                    "percents": [50.0]}},
            },
        },
    }))
    d = ["2024-01-0%d 00:00:00" % i for i in (1, 2, 3, 4)]
    # v: 30, 70, 50, 60; sum 210
    assert out[("daily", d[0], "pct")] == pytest.approx(30 / 210, abs=1e-6)
    assert out[("daily", d[1], "r01")] == 1.0
    assert out[("daily", d[0], "r01")] == 0.0
    # trailing window-3 medians: [30]->30, [30,70]->50, [30,70,50]->50,
    # [70,50,60]->60
    assert out[("daily", d[0], "mp.50")] == 30.0
    assert out[("daily", d[1], "mp.50")] == 50.0
    assert out[("daily", d[2], "mp.50")] == 50.0
    assert out[("daily", d[3], "mp.50")] == 60.0


def test_bucket_sort_truncates_buckets(shop):
    out = _rows(dsl_aggs(shop, {
        "daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {
                "v": {"sum": {"field": "price"}},
                "keep": {"bucket_sort": {"sort": [{"v": "desc"}],
                                         "size": 2}},
            },
        },
    }))
    keys = {k for (a, k, m) in out}
    # top-2 by v: day2 (70), day4 (60)
    assert keys == {"2024-01-02 00:00:00", "2024-01-04 00:00:00"}


def test_cumulative_cardinality(shop):
    out = _rows(dsl_aggs(shop, {
        "daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {
                "tags_day": {"cardinality": {"field": "tag"}},
                "tags_total": {"cumulative_cardinality": {
                    "buckets_path": "tags_day"}},
            },
        },
    }))
    d = ["2024-01-0%d 00:00:00" % i for i in (1, 2, 3, 4)]
    # tags per day: {a}, {b}, {a}, {c} -> cumulative 1, 2, 2, 3
    assert [out[("daily", k, "tags_total")] for k in d] == \
        [1.0, 2.0, 2.0, 3.0]


def test_matrix_stats_metric(shop):
    out = _rows(dsl_aggs(shop, {
        "mx": {"matrix_stats": {"fields": ["price", "doc_id"]}},
    }))
    import statistics
    prices = [10.0, 20.0, 30.0, 40.0, 50.0, 60.0]
    ids = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    mp, mi = sum(prices) / 6, sum(ids) / 6
    cov = sum((p - mp) * (i - mi) for p, i in zip(prices, ids)) / 6
    assert out[("mx", "", "mx.price.mean")] == pytest.approx(mp)
    assert out[("mx", "", "mx.price:doc_id.covariance")] == \
        pytest.approx(cov)
    # price is a perfect linear function of doc_id -> correlation 1
    assert out[("mx", "", "mx.price:doc_id.correlation")] == \
        pytest.approx(1.0)
    assert out[("mx", "", "mx.price:price.covariance")] == \
        pytest.approx(statistics.pvariance(prices))


def test_geo_distance_bucket_and_geo_metrics(spark):
    from elasticsearch_analysis_combo_spark.query.aggcompiler import (
        dsl_aggs,
    )

    rows = [
        (1, 0.0, 0.0, "a"),    # 0 km from origin
        (2, 0.0, 1.0, "a"),    # ~111.2 km
        (3, 0.0, 3.0, "b"),    # ~333.6 km
        (4, 45.0, 90.0, "b"),  # far
        (5, None, None, "a"),  # null point -> no ring bucket
    ]
    df = spark.createDataFrame(
        rows, "id long, lat double, lon double, g string"
    )
    out = {
        (r["agg"], r["key"], r["metric"]): r["value"]
        for r in dsl_aggs(df, {
            "rings": {"geo_distance": {
                "origin": {"lat": 0.0, "lon": 0.0},
                "ranges": [{"to": 200.0}, {"from": 200.0}]},
                "aggs": {"c": {"geo_centroid": {}}}},
            "by_g": {"terms": {"field": "g", "size": 5},
                     "aggs": {"b": {"geo_bounds": {}}}},
        }).collect()
    }
    assert out[("rings", "*-200.0", "doc_count")] == 2.0
    assert out[("rings", "200.0-*", "doc_count")] == 2.0
    assert out[("rings", "*-200.0", "c.lat")] == 0.0
    assert out[("rings", "*-200.0", "c.lon")] == 0.5
    assert out[("rings", "*-200.0", "c.count")] == 2.0
    # null point never enters a ring
    assert sum(v for (a, k, m), v in out.items()
               if a == "rings" and m == "doc_count") == 4.0
    # bounds: top_left = (max lat, min lon), bottom_right inverse
    assert out[("by_g", "b", "b.top_left.lat")] == 45.0
    assert out[("by_g", "b", "b.top_left.lon")] == 3.0
    assert out[("by_g", "b", "b.bottom_right.lat")] == 0.0
    assert out[("by_g", "b", "b.bottom_right.lon")] == 90.0
    assert out[("by_g", "a", "b.top_left.lat")] == 0.0
    assert out[("by_g", "a", "b.bottom_right.lon")] == 1.0
    # meters unit scales the ring edges
    m = {
        (r["agg"], r["key"], r["metric"]): r["value"]
        for r in dsl_aggs(df, {
            "rm": {"geo_distance": {
                "origin": {"lat": 0.0, "lon": 0.0}, "unit": "m",
                "ranges": [{"to": 200000.0}, {"from": 200000.0}]}},
        }).collect()
    }
    assert m[("rm", "*-200000.0", "doc_count")] == 2.0


def test_sampler_and_diversified_sampler_buckets(spark):
    from elasticsearch_analysis_combo_spark.query.aggcompiler import (
        dsl_aggs,
    )

    rows = [(i, "a" if i < 8 else "b", float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    spec = {"s": {"diversified_sampler": {
        "field": "g", "max_docs_per_value": 1, "shard_size": 2,
        "key_field": "id"},
        "aggs": {"t": {"terms": {"field": "g", "size": 10}}}}}
    out = {
        (r["agg"], r["key"], r["metric"]): r["value"]
        for r in dsl_aggs(df, spec).collect()
    }
    # cap 1 per g value then cut 2 -> exactly one a + one b survive
    assert out[("s", "", "doc_count")] == 2.0
    assert out[("s>t", "a", "doc_count")] == 1.0
    assert out[("s>t", "b", "doc_count")] == 1.0
    # plain sampler: first shard_size rows in md5 order, SAMPLE-scale
    spec2 = {"s2": {"sampler": {"shard_size": 3, "key_field": "id"},
                    "aggs": {"m": {"avg": {"field": "v"}}}}}
    out2 = {
        (r["agg"], r["key"], r["metric"]): r["value"]
        for r in dsl_aggs(df, spec2).collect()
    }
    assert out2[("s2", "", "doc_count")] == 3.0
    # partitioning invariance: the md5 order picks the SAME sample
    out2b = {
        (r["agg"], r["key"], r["metric"]): r["value"]
        for r in dsl_aggs(df.repartition(7), spec2).collect()
    }
    assert out2 == out2b
