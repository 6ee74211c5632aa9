"""Geo queries: bounding box, distance (box prefilter + haversine),
distance-ring aggregation."""

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.query.geo import (
    EARTH_RADIUS_KM,
    geo_bounding_box,
    geo_distance,
    geo_distance_agg,
    haversine_km,
)


def _hav(lat1, lon1, lat2, lon2):
    rl1, rl2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1) / 2
    dlon = math.radians(lon2 - lon1) / 2
    a = (math.sin(dlat) ** 2
         + math.cos(rl1) * math.cos(rl2) * math.sin(dlon) ** 2)
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


@pytest.fixture(scope="module")
def pts(spark):
    rows = [
        (0, 0.0, 0.0),
        (1, 1.0, 1.0),
        (2, 10.0, 10.0),
        (3, -45.0, 170.0),
        (4, 52.52, 13.40),   # Berlin
        (5, 48.86, 2.35),    # Paris
    ]
    return spark.createDataFrame(rows, "id long, lat double, lon double")


def test_haversine_matches_python(spark, pts):
    out = pts.withColumn(
        "d", haversine_km(F.lit(0.0), F.lit(0.0), F.col("lat"), F.col("lon"))
    ).collect()
    for r in out:
        assert abs(r["d"] - _hav(0, 0, r["lat"], r["lon"])) < 1e-9
    # Berlin-Paris is a known ~878 km hop
    bp = spark.range(1).select(
        haversine_km(F.lit(52.52), F.lit(13.40), F.lit(48.86), F.lit(2.35))
        .alias("d")
    ).collect()[0]["d"]
    assert 870 < bp < 890


def test_bounding_box_and_validation(spark, pts):
    got = {
        r["id"]
        for r in geo_bounding_box(
            pts, "lat", "lon", top=15.0, left=-1.0, bottom=-1.0, right=15.0
        ).collect()
    }
    assert got == {0, 1, 2}
    with pytest.raises(ValueError):
        geo_bounding_box(pts, "lat", "lon", 1, 5, 2, 4)  # bottom > top
    with pytest.raises(ValueError):
        geo_bounding_box(pts, "lat", "lon", 2, 5, 1, 4)  # left > right


def test_geo_distance_equals_unboxed_haversine(spark, pts):
    out = geo_distance(pts, "lat", "lon", 0.0, 0.0, 2000.0).collect()
    expect = {
        r["id"]: _hav(0, 0, r["lat"], r["lon"])
        for r in pts.collect()
        if _hav(0, 0, r["lat"], r["lon"]) <= 2000.0
    }
    assert {r["id"] for r in out} == set(expect)
    for r in out:
        assert abs(r["distance_km"] - expect[r["id"]]) < 1e-9
    with pytest.raises(ValueError):
        geo_distance(pts, "lat", "lon", 0, 0, -5)


def test_geo_distance_polar_origin_box_degenerates(spark, pts):
    # at the pole cos(lat)=0: prefilter must not drop anything the
    # haversine would keep
    out = geo_distance(pts, "lat", "lon", 90.0, 0.0, 6000.0).collect()
    expect = {
        r["id"] for r in pts.collect()
        if _hav(90, 0, r["lat"], r["lon"]) <= 6000.0
    }
    assert {r["id"] for r in out} == expect


def test_geo_distance_rings(spark, pts):
    out = geo_distance_agg(
        pts, "lat", "lon", 0.0, 0.0,
        [(None, 200.0), (200.0, 2000.0), (2000.0, None)],
    ).collect()
    got = {(r["from"], r["to"]): r["doc_count"] for r in out}
    # point 0 at the origin; point 1 ~157 km; point 2 ~1569 km
    assert got[("*", "200.0")] == 2
    assert got[("200.0", "2000.0")] == 1
    assert got[("2000.0", "*")] == 3


def test_geo_distance_antimeridian_wrap(spark):
    pts = spark.createDataFrame(
        [(0, 0.0, 179.5), (1, 0.0, -179.9), (2, 0.0, 170.0),
         (3, 0.0, -170.0)],
        "id long, lat double, lon double",
    )
    # origin just west of the dateline: the match on the OTHER side of
    # ±180 must survive the box prefilter
    out = geo_distance(pts, "lat", "lon", 0.0, 179.5, 200.0).collect()
    got = {r["id"] for r in out}
    expect = {
        r["id"] for r in pts.collect()
        if _hav(0.0, 179.5, r["lat"], r["lon"]) <= 200.0
    }
    assert got == expect and 1 in got


def test_geo_distance_high_latitude_tangent(spark):
    # origin at 60N, 1000 km: the naive d/(R cos lat) box under-covers;
    # place a point just inside the circle but beyond that naive dlon
    import math as m

    naive_dlon = m.degrees(1000.0 / (EARTH_RADIUS_KM * m.cos(m.radians(60))))
    probe_lon = naive_dlon + 0.15   # beyond the naive box
    probe_lat = 61.3                # near the circle's tangent latitude
    d = _hav(60.0, 0.0, probe_lat, probe_lon)
    assert d <= 1000.0              # genuinely inside the circle
    pts = spark.createDataFrame(
        [(0, probe_lat, probe_lon)], "id long, lat double, lon double"
    )
    out = geo_distance(pts, "lat", "lon", 60.0, 0.0, 1000.0).collect()
    assert {r["id"] for r in out} == {0}
