"""ES geo queries — geo_bounding_box, geo_distance, geo_distance agg.

The reference's ES host ships these on every index with a geo_point
mapping; here they are pure SQL-expression operators over (lat, lon)
double columns, engine-portable (radians/sin/cos/asin/sqrt exist in
Spark and every SQL engine) and pushdown-friendly:

* ``geo_bounding_box`` is a plain range predicate — Catalyst pushes all
  four bounds into the parquet scan (row-group pruning on lat/lon
  min/max stats), the same shape ES gets from its BKD tree.
* ``geo_distance`` is the classic two-stage cut: a DERIVED bounding box
  (the distance's lat/lon extent around the origin) prunes at scan
  speed, then the exact haversine keeps the circle. Only box survivors
  pay the trig.
* ``geo_distance_agg`` buckets the match set by distance rings (ES's
  geo_distance aggregation), one partial-aggregated pass.

Coordinates at the poles: the longitude extent degenerates as
cos(lat) -> 0; the prefilter widens to the full [-180, 180] there
(correct, just less selective — identical to ES's own behavior).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (haversine; double trig, whole-stage
    codegen — identical formula is valid SQL in any engine)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2.0
    dlon = F.radians(lon2 - lon1) / 2.0
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    )
    return 2.0 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def geo_bounding_box(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    top: float,
    left: float,
    bottom: float,
    right: float,
) -> DataFrame:
    """ES ``geo_bounding_box``: rows inside [bottom, top] x [left,
    right] (inclusive, non-dateline-crossing box — split a crossing box
    into two calls and union, as ES docs advise for custom logic)."""
    if bottom > top:
        raise ValueError(f"bottom {bottom} > top {top}")
    if left > right:
        raise ValueError(
            f"left {left} > right {right} (dateline-crossing: split + union)"
        )
    return df.filter(
        (F.col(lat_col) >= bottom) & (F.col(lat_col) <= top)
        & (F.col(lon_col) >= left) & (F.col(lon_col) <= right)
    )


def geo_distance(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    origin_lat: float,
    origin_lon: float,
    distance_km: float,
) -> DataFrame:
    """ES ``geo_distance``: rows within ``distance_km`` of the origin,
    with a pushdown bounding-box prefilter before the exact haversine.
    Adds a ``distance_km`` column (exact, for sorting — ES's
    ``_geo_distance`` sort comes free)."""
    if distance_km <= 0:
        raise ValueError(f"distance_km must be positive: {distance_km}")
    dlat = math.degrees(distance_km / EARTH_RADIUS_KM)
    # the circle's true longitude extent is asin(sin(d/R)/cos(lat)) —
    # NOT (d/R)/cos(lat), which under-covers at high latitude (the
    # circle's east/west tangent sits poleward of the origin's parallel)
    ang = distance_km / EARTH_RADIUS_KM
    coslat = math.cos(math.radians(origin_lat))
    sin_ratio = math.sin(min(ang, math.pi / 2)) / coslat if coslat > 0 else 2.0
    cond = (F.col(lat_col) >= origin_lat - dlat) & (
        F.col(lat_col) <= origin_lat + dlat
    )
    if (
        sin_ratio < 1.0
        and origin_lat - dlat > -90.0
        and origin_lat + dlat < 90.0
    ):
        dlon = math.degrees(math.asin(sin_ratio))
        lo, hi = origin_lon - dlon, origin_lon + dlon
        if lo >= -180.0 and hi <= 180.0:
            cond = cond & (F.col(lon_col) >= lo) & (F.col(lon_col) <= hi)
        else:
            # antimeridian wrap: the interval splits into two ranges
            cond = cond & (
                (F.col(lon_col) >= ((lo + 180.0) % 360.0) - 180.0)
                | (F.col(lon_col) <= ((hi + 180.0) % 360.0) - 180.0)
            )
    # else: circle reaches a pole or wraps every longitude — lat-only box
    boxed = df.filter(cond)
    dist = haversine_km(
        F.lit(float(origin_lat)), F.lit(float(origin_lon)),
        F.col(lat_col), F.col(lon_col),
    )
    return boxed.withColumn("distance_km", dist).filter(
        F.col("distance_km") <= float(distance_km)
    )


def geo_distance_agg(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    origin_lat: float,
    origin_lon: float,
    ranges: list[tuple[float | None, float | None]],
    group_col: str | None = None,
) -> DataFrame:
    """ES ``geo_distance`` aggregation: doc counts per distance ring
    [from, to) around the origin (None = open end; empty rings kept
    with count 0, as ES renders them). One distance projection + one
    partial-aggregated pass over all rings."""
    dist = haversine_km(
        F.lit(float(origin_lat)), F.lit(float(origin_lon)),
        F.col(lat_col), F.col(lon_col),
    )
    d = df.withColumn("_d", dist)
    keys = [F.col(group_col)] if group_col else []
    aggs = []
    for i, (lo, hi) in enumerate(ranges):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("_d") >= float(lo))
        if hi is not None:
            cond = cond & (F.col("_d") < float(hi))
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"_r{i}")
        )
    out = d.groupBy(*keys).agg(*aggs) if keys else d.agg(*aggs)
    rings = F.array(
        *[
            F.struct(
                F.lit("*" if lo is None else str(float(lo))).alias("from"),
                F.lit("*" if hi is None else str(float(hi))).alias("to"),
                F.col(f"_r{i}").alias("doc_count"),
            )
            for i, (lo, hi) in enumerate(ranges)
        ]
    )
    gcols = [group_col] if group_col else []
    return out.select(*gcols, F.explode(rings).alias("_b")).select(
        *gcols,
        F.col("_b.from").alias("from"),
        F.col("_b.to").alias("to"),
        F.col("_b.doc_count").cast("long").alias("doc_count"),
    )


def geotile_grid_agg(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    precision: int = 7,
    with_centroid: bool = True,
) -> DataFrame:
    """ES ``geotile_grid`` aggregation (+ optional per-tile
    ``geo_centroid``): bucket points into web-mercator map tiles at the
    given zoom ``precision`` (2^p x 2^p world grid, the slippy-map
    x/y/z scheme ES emits as "z/x/y" keys). Tile math is pure codegen
    arithmetic; the whole agg is ONE partial-aggregated groupBy on the
    tile key — at 100 TB the map-side combine collapses each task to
    <= 4^p rows and the centroid ships as (sum, count) partials.
    Latitudes are clamped to the web-mercator domain (+/-85.0511), as
    ES does."""
    if not 0 <= precision <= 29:
        raise ValueError("precision must be in [0, 29]")
    n = float(1 << precision)
    lat = F.greatest(F.lit(-85.0511287798), F.least(F.lit(85.0511287798),
                                                    F.col(lat_col)))
    lon = F.col(lon_col)
    x = F.floor((lon + 180.0) / 360.0 * n).cast("long")
    lat_rad = F.radians(lat)
    mercator = F.log(F.tan(lat_rad) + 1.0 / F.cos(lat_rad))
    y = F.floor((1.0 - mercator / math.pi) / 2.0 * n).cast("long")
    # clamp the x/y edge cases (lon=180, lat at the clamp boundary)
    x = F.least(F.greatest(x, F.lit(0)), F.lit(int(n) - 1))
    y = F.least(F.greatest(y, F.lit(0)), F.lit(int(n) - 1))
    keyed = df.withColumn("tile_x", x).withColumn("tile_y", y)
    aggs = [F.count("*").alias("doc_count")]
    if with_centroid:
        aggs += [
            F.avg(F.col(lat_col)).alias("centroid_lat"),
            F.avg(F.col(lon_col)).alias("centroid_lon"),
        ]
    return (
        keyed.groupBy(F.lit(precision).alias("zoom"), "tile_x", "tile_y")
        .agg(*aggs)
    )


GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_sql_expr(precision: int,
                     lon_i: str = "lon_i", lat_i: str = "lat_i") -> str:
    """ONE SQL expression computing the base-32 geohash string from the
    pre-quantized integer cells ``lon_i``/``lat_i`` (see
    :func:`geohash_grid_agg` for the quantization). Uses only
    floor/cast/%/concat/substr, which evaluate IDENTICALLY in Spark SQL
    and DuckDB — the gate oracle runs this exact text, so the
    interleaved-bit encoding is cross-engine verified rather than
    trusted. Geohash bit i (MSB first) alternates lon, lat."""
    total = 5 * precision
    lon_bits = (total + 1) // 2
    chars = []
    for c in range(precision):
        bit_terms = []
        for j in range(5):  # global bit index = 5c + j
            g = 5 * c + j
            src, idx = (("lon_i", g // 2) if g % 2 == 0
                        else ("lat_i", g // 2))
            nbits = lon_bits if src == "lon_i" else total - lon_bits
            name = lon_i if src == "lon_i" else lat_i
            shift = nbits - 1 - idx
            bit = f"(cast(floor({name} / {1 << shift}) as bigint) % 2)"
            bit_terms.append(f"{bit} * {1 << (4 - j)}")
        val = " + ".join(bit_terms)
        chars.append(
            f"substr('{GEOHASH32}', cast({val} as int) + 1, 1)"
        )
    return "concat(" + ", ".join(chars) + ")"


def geohash_grid_agg(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    precision: int = 5,
    with_centroid: bool = True,
) -> DataFrame:
    """ES ``geohash_grid`` aggregation: bucket points into base-32
    geohash cells at ``precision`` chars (the classic ES geo agg;
    :func:`geotile_grid_agg` is the slippy-map sibling). Same 100 TB
    shape: the hash is pure codegen arithmetic and the whole agg is ONE
    partial-aggregated groupBy — map-side combine collapses each task
    to at most 32^precision rows, centroids ride as avg partials."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total - lon_bits
    lon_i = F.least(
        F.floor((F.col(lon_col) + 180.0) / 360.0 * (1 << lon_bits))
        .cast("long"),
        F.lit((1 << lon_bits) - 1),
    )
    lat_i = F.least(
        F.floor((F.col(lat_col) + 90.0) / 180.0 * (1 << lat_bits))
        .cast("long"),
        F.lit((1 << lat_bits) - 1),
    )
    keyed = (
        df.withColumn("lon_i", F.greatest(lon_i, F.lit(0)))
        .withColumn("lat_i", F.greatest(lat_i, F.lit(0)))
        .withColumn("geohash", F.expr(geohash_sql_expr(precision)))
    )
    aggs = [F.count("*").alias("doc_count")]
    if with_centroid:
        aggs += [
            F.avg(F.col(lat_col)).alias("centroid_lat"),
            F.avg(F.col(lon_col)).alias("centroid_lon"),
        ]
    return keyed.groupBy("geohash").agg(*aggs)


def geo_polygon(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    vertices: list[tuple[float, float]],
) -> DataFrame:
    """ES ``geo_polygon`` query: rows whose point falls inside the
    polygon given as [(lat, lon), ...] (ES's points list; closing edge
    implied). Two-stage like ``geo_distance``: the polygon's bounding
    box prunes at scan speed (plain range predicate — parquet row-group
    stats), then ray-casting parity (odd crossing count of a westward
    ray) keeps the interior. Each edge test is a guarded codegen
    expression — the division only evaluates under the lat-straddle
    branch, so ANSI mode never sees a zero denominator. Points exactly
    on an edge are boundary-implementation-defined, as in ES/Lucene.
    Non-convex and self-intersecting (even-odd rule) polygons work."""
    if len(vertices) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    lats = [float(la) for la, _ in vertices]
    lons = [float(lo) for _, lo in vertices]
    lat, lon = F.col(lat_col), F.col(lon_col)
    boxed = df.filter(
        (lat >= min(lats)) & (lat <= max(lats))
        & (lon >= min(lons)) & (lon <= max(lons))
    )
    crossings = F.lit(0)
    n = len(vertices)
    for i in range(n):
        yi, xi = lats[i], lons[i]
        yj, xj = lats[(i + 1) % n], lons[(i + 1) % n]
        straddles = (F.lit(yi) > lat) != (F.lit(yj) > lat)
        crossing = F.when(
            straddles,
            F.when(
                lon < (xj - xi) * (lat - yi) / (yj - yi) + xi,
                F.lit(1),
            ).otherwise(F.lit(0)),
        ).otherwise(F.lit(0))
        crossings = crossings + crossing
    return boxed.filter(F.pmod(crossings, F.lit(2)) == 1)


def geo_bounds_agg(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """ES ``geo_bounds`` aggregation: the tightest lat/lon box holding
    the (grouped) point set, reported as ES's top_left / bottom_right
    corners. One partial-aggregated min/max pass — four scalars per
    group at any scale. (``wrap_longitude`` dateline splitting is not
    modeled; boxes are plain min/max as with ES wrap_longitude=false.)"""
    aggs = [
        F.max(F.col(lat_col)).alias("top_left_lat"),
        F.min(F.col(lon_col)).alias("top_left_lon"),
        F.min(F.col(lat_col)).alias("bottom_right_lat"),
        F.max(F.col(lon_col)).alias("bottom_right_lon"),
    ]
    if group_col:
        return df.groupBy(group_col).agg(*aggs)
    return df.agg(*aggs)


def geo_line_agg(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    sort_col: str,
    group_col: str | None = None,
    size: int = 10000,
    sort_order: str = "asc",
) -> DataFrame:
    """ES ``geo_line`` aggregation: per group, the points joined into a
    WKT ``LINESTRING (lon lat, ...)`` ordered by ``sort_col`` (a track
    from timestamped positions), keeping the ``size`` points at the
    sort extreme exactly as ES does (asc keeps the smallest sort
    values; ES caps size at 10k for the same per-bucket-boundedness
    reason this cap exists). Sort ties break on (lon, lat) so the line
    is total-ordered in both engines. Plan shape: the size cut is a
    rank filter (WindowGroupLimit — partial limiting BEFORE the
    shuffle, so a million-point track ships only ``size`` rows), the
    assembly one ordered array_sort over the capped group, and the
    ``complete`` flag joins a bucket-sized count frame back. Output:
    (group?, line, point_count, complete)."""
    from pyspark.sql import Window

    if sort_order not in ("asc", "desc"):
        raise ValueError(f"sort_order must be asc|desc: {sort_order!r}")
    gcols = [group_col] if group_col else []
    part = Window.partitionBy(*gcols) if gcols else Window.partitionBy(
        F.lit(1)
    )
    ordc = [
        F.col(sort_col).asc() if sort_order == "asc"
        else F.col(sort_col).desc(),
        F.col(lon_col).asc(), F.col(lat_col).asc(),
    ]
    kept = df.withColumn(
        "_rk", F.row_number().over(part.orderBy(*ordc))
    ).filter(F.col("_rk") <= size)
    pt = F.struct(
        F.col("_rk").alias("rk"),
        F.col(lon_col).cast("double").alias("lon"),
        F.col(lat_col).cast("double").alias("lat"),
    )
    lines = (kept.groupBy(*gcols) if gcols else kept.groupBy()).agg(
        F.collect_list(pt).alias("_pts")
    )
    line = F.concat(
        F.lit("LINESTRING ("),
        F.array_join(
            F.transform(
                F.array_sort("_pts"),
                lambda p: F.format_string("%.6f %.6f", p.lon, p.lat),
            ),
            ", ",
        ),
        F.lit(")"),
    )
    totals = (df.groupBy(*gcols) if gcols else df.groupBy()).agg(
        F.count(F.lit(1)).alias("_tot")
    )
    joined = (
        lines.join(totals, gcols) if gcols
        else lines.crossJoin(totals)
    )
    return joined.select(
        *gcols,
        line.alias("line"),
        F.size("_pts").alias("point_count"),
        (F.col("_tot") <= size).alias("complete"),
    )
