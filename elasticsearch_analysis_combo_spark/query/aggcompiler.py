"""ES ``_search`` body ``aggs`` section -> DataFrame plans.

The reference plugin lives inside ES ``_search``
(``AnalysisComboPlugin.java`` registers the analyzer the whole search
request — query AND aggs — consumes); ``query/dsl.py`` compiles the
``query`` half, this module compiles the ``aggs`` half onto any
DataFrame, composing with the same filter context.

Supported (v1, the Kibana-dashboard core; round-5d widened):
- bucket aggs: ``terms`` (size, min_doc_count, ``order`` by
  _count/_key/any sibling metric), ``histogram`` (interval,
  min_doc_count, extended_bounds at leaf level), ``date_histogram``
  (calendar_interval hour/day/month/year OR ``fixed_interval``
  "30m"/"12h"/"7d" epoch-floored buckets), ``range`` (from/to, open
  ends), ``date_range`` (timestamp bounds), ``multi_terms``
  (composite field tuples, size/order as terms), ``filters`` (named
  predicate buckets + ``other_bucket``/``other_bucket_key`` for the
  none-matching remainder), ``missing``, ``composite`` (the pagination
  workhorse: asc tuple order over terms/histogram/date_histogram
  sources, strictly-after ``after`` key, size cut — both on the
  REDUCED bucket frame), ``global`` (top level of
  ``dsl_search_aggs`` — escapes the query's filter context),
  ``significant_terms`` (top level of ``dsl_search_aggs`` — keyword
  JLH significance of the match set vs the pre-query universe),
  ``rare_terms`` (doc_count <= max_doc_count tail over the reduced
  bucket frame), ``ip_range`` (uint32 dotted-quad compare),
  ``geohash_grid`` (base-32 cell via the shared Spark==DuckDB
  bit-interleave SQL; ``lat_field``/``lon_field`` columns),
  ``auto_date_histogram`` (smallest fitting calendar interval — one
  scalar ladder pass), ``random_sampler`` (portable md5 Bernoulli
  sample; doc_count + sum/value_count rescaled by 1/probability at
  every depth, non-rescalable metrics raise), ``geo_distance``
  ([from, to) haversine rings around an origin — the distance rides
  the bucket-key projection; ``unit`` km/m), ``sampler`` /
  ``diversified_sampler`` (first shard_size rows per bucket in
  portable md5 order of ``key_field`` — the deterministic stand-in
  for ES's score order on a scoreless frame; diversified caps each
  ``field`` value at max_docs_per_value first; sample-scale counts)
- metric aggs: avg/sum/min/max/value_count/cardinality (HLL++,
  rsd 0.005), stats, extended_stats (+ sum_of_squares, population
  variance/std_deviation), weighted_avg, percentile_ranks (one
  count-when per probe), boxplot (five-number summary, exact
  quartiles), top_metrics (size-1 max_by/min_by), percentiles (exact
  interpolated, ``name.50`` rows; swap approx_percentile at 100 TB),
  string_stats (length half — count/min/max/avg_length; the entropy
  half needs facets.string_stats_agg's char-explode pass),
  geo_centroid (avg lat/lon + point count) and geo_bounds
  (top_left/bottom_right envelope) over ``lat_field``/``lon_field``
  column pairs;
  under keyed buckets also rate (date_histogram children: sum or
  doc_count per ``unit`` of the bucket span; varying calendar lengths
  raise), median_absolute_deviation (bucket median rides the main
  pass, |x-median| median is a second bucket-keyed pass), and
  top_hits (per-bucket top ``size`` rows by ``sort`` via
  WindowGroupLimit, emitted as ``name.rank.field`` rows per numeric
  ``_source`` field; _source fields append as ascending tiebreaks so
  the cut is total where ES leaves shard order)
- pipeline aggs: parent ``derivative`` / ``cumulative_sum`` /
  ``serial_diff`` (lag-N delta) / ``moving_fn`` (trailing window
  incl. current bucket, MovingFunctions unweightedAvg/max/min/sum) /
  ``moving_percentiles`` (trailing exact quantile_cont) /
  ``normalize`` (rescale_0_1 / percent_of_sum / z_score / softmax) /
  ``bucket_sort`` (rank-truncate; children semi-join survivors) /
  ``cumulative_cardinality`` (first-seen reduction over the surviving
  bucket spine — exact where ES chains HLL sketches)
  (ordered histogram/date_histogram axis where order matters) /
  ``bucket_script`` / ``bucket_selector`` (all over the node's
  REDUCED bucket frame — bucket-count-sized windows, never row data);
  sibling ``avg_bucket`` / ``min_bucket`` / ``max_bucket`` /
  ``sum_bucket`` / ``stats_bucket`` / ``extended_stats_bucket`` /
  ``percentiles_bucket`` (exact, as ES computes sibling percentiles) /
  ``bucket_correlation`` (Pearson r vs indicator expectations) /
  ``bucket_count_ks_test`` (exact K-S distances vs expected fractions,
  per alternative)
  (reduce a sibling's per-bucket metric via its long frame, grouped
  by the enclosing-bucket key prefix)
- nesting: bucket > bucket > ... > metrics at any depth (keys
  accumulate into a composite groupBy key — the whole sub-tree level
  is ONE partial-aggregated shuffle, the repo's flatten-the-agg-tree
  pattern from ``stats_agg(group_col=[...])``)

Output is LONG format — one row per (bucket, metric) with
``(agg, key, metric, value)``:
- ``agg``: the tree path, e.g. ``"by_status>price_hist"``
- ``key``: composite bucket key, parent-first, ``|``-joined; numeric
  keys render as ``%.4f`` (C printf — identical in Spark/DuckDB),
  timestamps as ``yyyy-MM-dd HH:mm:ss``
- ``metric``: ``"doc_count"`` or the metric agg's name
- ``value``: double

Scale shape: every bucket node is one groupBy over the (already
filter-pruned) input with map-side partials; terms' size cut is an
ordered limit over the REDUCED bucket set; children of a size-limited
terms agg semi-join the surviving keys (broadcast — at most ``size``
rows) so sub-aggregations never aggregate buckets the parent dropped.
Row data is never re-shuffled per metric — all of a node's metrics
ride one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.tinydf import tiny_df

BUCKET_KINDS = (
    "terms", "histogram", "date_histogram", "range", "filters", "missing",
    "multi_terms", "date_range", "rare_terms", "composite",
    "ip_range", "geohash_grid", "auto_date_histogram", "random_sampler",
    "adjacency_matrix", "geotile_grid", "geo_distance", "sampler",
    "diversified_sampler", "ip_prefix", "categorize_text",
    "filter", "nested", "reverse_nested", "variable_width_histogram",
)
METRIC_KINDS = (
    "avg", "sum", "min", "max", "value_count", "cardinality", "stats",
    "percentiles", "extended_stats", "weighted_avg", "percentile_ranks",
    "boxplot", "top_metrics", "string_stats", "t_test", "matrix_stats",
    "geo_centroid", "geo_bounds", "scripted_metric",
)


def _compile_filter_node(node: dict) -> str:
    """DSL filter node -> SQL predicate (lazy import: dsl.py imports
    nothing from this module, but keep the edge one-way at runtime)."""
    from .dsl import compile_filter

    return compile_filter(node)
# pipeline aggs UNDER a bucket node (computed over that node's reduced
# bucket frame, ordered by bucket key — histogram/date_histogram parents)
PARENT_PIPELINE_KINDS = (
    "derivative", "cumulative_sum", "bucket_script", "bucket_selector",
    "serial_diff", "moving_fn", "normalize", "moving_percentiles",
    "bucket_sort",
)
# pipeline aggs NEXT TO a bucket node (reduce a sibling's bucket metric
# to one value per enclosing bucket)
SIBLING_PIPELINE_KINDS = (
    "avg_bucket", "min_bucket", "max_bucket", "sum_bucket", "stats_bucket",
    "percentiles_bucket", "extended_stats_bucket", "change_point",
    "bucket_correlation", "bucket_count_ks_test",
)
# metric kinds whose values stay valid under random_sampler rescale:
# sum/value_count scale by 1/p; ratio/extreme metrics are unbiased
# as-is; everything else (stats' embedded counts, quantiles of a
# sample, HLL cardinality) would silently report sample-scale numbers,
# so those raise under a sampler.
_SAMPLER_SAFE_METRICS = (
    "avg", "sum", "min", "max", "value_count", "weighted_avg",
    "top_metrics",
)

_CAL = {"hour": "hour", "day": "day", "month": "month", "year": "year"}

_FIXED_UNITS = {"s": 1, "m": 60, "h": 3600, "d": 86400}


def _fixed_interval_seconds(spec: str) -> int:
    """ES fixed_interval string ("30m", "12h", "7d") -> seconds.
    Sub-second units raise (the engine buckets at second grain)."""
    import re as _re

    m = _re.fullmatch(r"(\d+)(s|m|h|d)", str(spec))
    if not m:
        raise ValueError(f"unsupported fixed_interval: {spec!r}")
    return int(m.group(1)) * _FIXED_UNITS[m.group(2)]

_SIMPLE_METRICS = {
    "avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
    "value_count": F.count,
    "cardinality": lambda c: F.approx_count_distinct(c, 0.005),
}

DEFAULT_PERCENTS = (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0)


def _metric_plan(kind: str, body: dict, name: str, field_col,
                 scale: float = 1.0):
    """(agg_exprs, emits) for one metric node: the aggregate columns to
    ride the bucket's single groupBy pass, and the (label, column)
    pairs to unpivot from the aggregated frame. ``field_col`` lets the
    filters agg wrap the field in ``when(pred, ...)`` — every metric
    kind stays a one-pass conditional aggregate. ``scale`` != 1 is the
    random_sampler's 1/probability rescale: it multiplies the
    count-based metrics (sum, value_count) back to original-scale
    units, exactly as ES reports sampled aggs."""
    if kind in _SIMPLE_METRICS:
        if scale != 1.0 and kind in ("sum", "value_count"):
            return (
                [(_SIMPLE_METRICS[kind](field_col)
                  * F.lit(scale)).alias(name)],
                [(name, F.col(name))],
            )
        return (
            [_SIMPLE_METRICS[kind](field_col).alias(name)],
            [(name, F.col(name))],
        )
    if kind == "stats":
        # ES stats = count/min/max/avg/sum, all in the same pass
        return (
            [
                F.count(field_col).alias(f"{name}__count"),
                F.min(field_col).alias(f"{name}__min"),
                F.max(field_col).alias(f"{name}__max"),
                F.avg(field_col).alias(f"{name}__avg"),
                F.sum(field_col).alias(f"{name}__sum"),
            ],
            [
                (f"{name}.{s}", F.col(f"{name}__{s}"))
                for s in ("count", "min", "max", "avg", "sum")
            ],
        )
    if kind == "extended_stats":
        # ES extended_stats = stats + sum_of_squares + population
        # variance/std_deviation, all in the one pass
        return (
            [
                F.count(field_col).alias(f"{name}__count"),
                F.min(field_col).alias(f"{name}__min"),
                F.max(field_col).alias(f"{name}__max"),
                F.avg(field_col).alias(f"{name}__avg"),
                F.sum(field_col).alias(f"{name}__sum"),
                F.sum(field_col * field_col).alias(f"{name}__sum_of_squares"),
                F.var_pop(field_col).alias(f"{name}__variance"),
                F.stddev_pop(field_col).alias(f"{name}__std_deviation"),
            ],
            [
                (f"{name}.{s}", F.col(f"{name}__{s}"))
                for s in ("count", "min", "max", "avg", "sum",
                          "sum_of_squares", "variance", "std_deviation")
            ],
        )
    if kind == "percentiles":
        # exact interpolated (percentile_cont semantics — DuckDB
        # quantile_cont parity); swap approx_percentile at 100 TB
        percents = [float(p) for p in body.get("percents",
                                               DEFAULT_PERCENTS)]
        arr = F.array(*[F.lit(p / 100.0) for p in percents])
        return (
            [F.percentile(field_col, arr).alias(f"{name}__pcts")],
            [
                (f"{name}.{p:g}",
                 F.element_at(F.col(f"{name}__pcts"), i + 1))
                for i, p in enumerate(percents)
            ],
        )
    if kind == "percentile_ranks":
        # inverse percentiles: fraction (0-100) of values <= each probe;
        # one count-when per probe rides the same pass (the
        # facets.percentile_ranks_agg convention)
        values = [float(v) for v in body["values"]]
        return (
            [
                (
                    F.sum(F.when(field_col <= F.lit(v), 1).otherwise(0))
                    * 100.0 / F.count(field_col)
                ).alias(f"{name}__pr{i}")
                for i, v in enumerate(values)
            ],
            [
                (f"{name}.{v:g}", F.col(f"{name}__pr{i}"))
                for i, v in enumerate(values)
            ],
        )
    if kind == "boxplot":
        # five-number summary in the one pass (exact quartiles for
        # oracle parity — facets.boxplot_agg convention)
        arr = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
        return (
            [
                F.min(field_col).alias(f"{name}__min"),
                F.max(field_col).alias(f"{name}__max"),
                F.percentile(field_col, arr).alias(f"{name}__q"),
            ],
            [
                (f"{name}.min", F.col(f"{name}__min")),
                (f"{name}.q1", F.element_at(F.col(f"{name}__q"), 1)),
                (f"{name}.q2", F.element_at(F.col(f"{name}__q"), 2)),
                (f"{name}.q3", F.element_at(F.col(f"{name}__q"), 3)),
                (f"{name}.max", F.col(f"{name}__max")),
            ],
        )
    if kind == "string_stats":
        # ES string_stats, the length half: count + min/max/avg_length
        # ride the one groupBy pass. The Shannon-entropy half needs a
        # character explode (a second, amplifying pass) that cannot
        # ride a bucket's single aggregate — facets.string_stats_agg
        # computes it standalone; requesting it here raises.
        if body.get("show_distribution"):
            raise ValueError(
                "string_stats show_distribution/entropy needs the "
                "standalone facets.string_stats_agg (char-explode pass)"
            )
        length = F.length(field_col)
        return (
            [
                F.count(field_col).alias(f"{name}__count"),
                F.min(length).alias(f"{name}__min_length"),
                F.max(length).alias(f"{name}__max_length"),
                F.avg(length).alias(f"{name}__avg_length"),
            ],
            [
                (f"{name}.{s}", F.col(f"{name}__{s}"))
                for s in ("count", "min_length", "max_length",
                          "avg_length")
            ],
        )
    raise ValueError(f"unsupported metric agg: {kind}")


def _split_node(node: dict):
    """(kind, body, sub_aggs) for one named agg node."""
    sub = node.get("aggs") or node.get("aggregations") or {}
    kinds = [k for k in node if k not in ("aggs", "aggregations")]
    if len(kinds) != 1:
        raise ValueError(f"agg node needs exactly one type, got {kinds}")
    return kinds[0], node[kinds[0]], sub


def _key_expr(kind: str, body: dict):
    """Bucket key column (string-rendered) for one bucket agg. ES's
    ``missing`` knob maps null field values to the given key instead of
    dropping the doc; terms' ``include``/``exclude`` regexes filter the
    key space (a null key drops the row downstream)."""
    field = body.get("field")
    missing = body.get("missing")
    if kind in ("terms", "rare_terms"):
        key = F.col(field).cast("string")
        if missing is not None:
            key = F.coalesce(key, F.lit(str(missing)))
        if body.get("include") is not None:
            key = F.when(key.rlike(str(body["include"])), key)
        if body.get("exclude") is not None:
            key = F.when(~key.rlike(str(body["exclude"])), key)
        return key
    if kind == "histogram":
        interval = float(body["interval"])
        fcol = F.col(field)
        if missing is not None:
            fcol = F.coalesce(fcol, F.lit(float(missing)))
        b = F.floor(fcol / F.lit(interval)) * F.lit(interval)
        # format_string renders NULL as the string 'null' — guard so
        # null-field docs drop out of the bucket key like ES
        return F.when(
            fcol.isNotNull(),
            F.format_string("%.4f", b.cast("double")),
        )
    if kind == "date_histogram":
        fixed = body.get("fixed_interval")
        if fixed is not None:
            # ES fixed_interval ("30m", "12h", "7d"): epoch-floored
            # buckets, independent of calendar boundaries
            secs = _fixed_interval_seconds(fixed)
            return F.date_format(
                F.timestamp_seconds(
                    F.floor(F.unix_timestamp(F.col(field)) / secs)
                    * F.lit(secs)
                ),
                "yyyy-MM-dd HH:mm:ss",
            )
        cal = body.get("calendar_interval", body.get("interval", "day"))
        if cal not in _CAL:
            raise ValueError(f"unsupported calendar_interval: {cal}")
        return F.date_format(
            F.date_trunc(_CAL[cal], F.col(field)), "yyyy-MM-dd HH:mm:ss"
        )
    if kind == "range":
        field_c = F.col(field)
        expr = F.lit(None).cast("string")
        # reversed so earlier ranges win ties (ES buckets are disjoint
        # by construction; overlapping ranges need the filters agg)
        for r in reversed(body["ranges"]):
            lo, hi = r.get("from"), r.get("to")
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (field_c >= F.lit(lo))
            if hi is not None:
                cond = cond & (field_c < F.lit(hi))
            name = r.get(
                "key", f"{lo if lo is not None else '*'}-"
                       f"{hi if hi is not None else '*'}"
            )
            expr = F.when(cond, F.lit(name)).otherwise(expr)
        return expr
    if kind == "date_range":
        # range over a timestamp axis: from/to are timestamp strings
        # ([from, to) half-open, as ES); keys default "from-to"
        field_c = F.col(field).cast("timestamp")
        expr = F.lit(None).cast("string")
        for r in reversed(body["ranges"]):
            lo, hi = r.get("from"), r.get("to")
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (field_c >= F.to_timestamp(F.lit(str(lo))))
            if hi is not None:
                cond = cond & (field_c < F.to_timestamp(F.lit(str(hi))))
            name = r.get(
                "key", f"{lo if lo is not None else '*'}-"
                       f"{hi if hi is not None else '*'}"
            )
            expr = F.when(cond, F.lit(name)).otherwise(expr)
        return expr
    if kind == "multi_terms":
        # composite key over a tuple of fields; docs missing ANY field
        # drop, as ES. Components join with '|', the long format's
        # composite-key separator.
        fields = [t["field"] for t in body["terms"]]
        nonnull = F.lit(True)
        for f_ in fields:
            nonnull = nonnull & F.col(f_).isNotNull()
        return F.when(
            nonnull,
            F.concat_ws("|", *[F.col(f_).cast("string") for f_ in fields]),
        )
    if kind == "missing":
        return F.when(F.col(field).isNull(), F.lit("_missing"))
    if kind == "ip_range":
        # ES ip_range: [from, to) IPv4 buckets. Addresses compare as
        # uint32 (dotted-quad split — pure codegen arithmetic); bounds
        # parse driver-side via ipaddress into integer literals.
        # Overlapping ranges resolve first-listed-wins (the compiler's
        # range convention); empty buckets drop (groupBy only sees
        # present keys) — facets.ip_range_agg keeps zeros standalone.
        import ipaddress

        parts = F.split(F.col(field), r"\.")
        ip = (
            parts.getItem(0).cast("long") * 16777216
            + parts.getItem(1).cast("long") * 65536
            + parts.getItem(2).cast("long") * 256
            + parts.getItem(3).cast("long")
        )
        expr = F.lit(None).cast("string")
        for r in reversed(body["ranges"]):
            lo, hi = r.get("from"), r.get("to")
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (ip >= int(ipaddress.IPv4Address(lo)))
            if hi is not None:
                cond = cond & (ip < int(ipaddress.IPv4Address(hi)))
            name = r.get(
                "key", f"{lo if lo is not None else '*'}-"
                       f"{hi if hi is not None else '*'}"
            )
            expr = F.when(cond, F.lit(name)).otherwise(expr)
        return expr
    if kind == "ip_prefix":
        # ES 8.2 ip_prefix: bucket = the network address of the IP
        # masked to ``prefix_length`` bits (IPv4; is_ipv6 raises). The
        # dotted-quad -> uint32 -> mask -> dotted-quad round trip is
        # pure codegen integer arithmetic, one map-side projection;
        # ``append_prefix_length`` suffixes "/k" like ES's keyed form.
        plen = int(body["prefix_length"])
        if not 0 <= plen <= 32:
            raise ValueError(f"prefix_length must be in [0, 32]: {plen}")
        if body.get("is_ipv6"):
            raise ValueError("ip_prefix supports IPv4 only")
        parts = F.split(F.col(field), r"\.")
        ip = (
            parts.getItem(0).cast("long") * 16777216
            + parts.getItem(1).cast("long") * 65536
            + parts.getItem(2).cast("long") * 256
            + parts.getItem(3).cast("long")
        )
        mask = ((0xFFFFFFFF << (32 - plen)) & 0xFFFFFFFF) if plen else 0
        net = ip.bitwiseAND(F.lit(mask))
        quad = F.concat_ws(
            ".",
            F.floor(net / F.lit(16777216)).cast("long").cast("string"),
            F.pmod(F.floor(net / F.lit(65536)).cast("long"), F.lit(256))
            .cast("string"),
            F.pmod(F.floor(net / F.lit(256)).cast("long"), F.lit(256))
            .cast("string"),
            F.pmod(net, F.lit(256)).cast("string"),
        )
        if body.get("append_prefix_length"):
            quad = F.concat(quad, F.lit(f"/{plen}"))
        return F.when(F.col(field).isNotNull(), quad)
    if kind == "categorize_text":
        # ES ML categorize_text, deterministic analogue (the
        # facets.categorize_text_agg signature): the category key is
        # the first ``max_tokens`` lowercased tokens containing NO
        # digit, space-joined — timestamps/ids/counters drop out.
        # Array-side split+filter+slice, map-only.
        max_tokens = int(body.get("max_tokens", 10))
        toks = F.split(F.lower(F.col(field)), r"\s+")
        sig = F.array_join(
            F.slice(
                F.filter(toks, lambda x: ~x.rlike("[0-9]")),
                1, max_tokens,
            ),
            " ",
        )
        return F.when(F.col(field).isNotNull(), sig)
    if kind == "geo_distance":
        # ES geo_distance agg: [from, to) rings around an origin. The
        # haversine rides the bucket-key projection (geo.haversine_km —
        # the same double trig the gate oracles replay); overlapping
        # ranges resolve first-listed-wins, the compiler's range
        # convention. ``unit`` km (default) or m.
        from .geo import haversine_km

        latf = body.get("lat_field", "lat")
        lonf = body.get("lon_field", "lon")
        origin = body["origin"]
        olat, olon = float(origin["lat"]), float(origin["lon"])
        unit = body.get("unit", "km")
        if unit not in ("km", "m"):
            raise ValueError(f"unsupported geo_distance unit: {unit}")
        dist = haversine_km(
            F.lit(olat), F.lit(olon), F.col(latf), F.col(lonf)
        )
        if unit == "m":
            dist = dist * 1000.0
        expr = F.lit(None).cast("string")
        for r in reversed(body["ranges"]):
            lo, hi = r.get("from"), r.get("to")
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (dist >= float(lo))
            if hi is not None:
                cond = cond & (dist < float(hi))
            name = r.get(
                "key", f"{lo if lo is not None else '*'}-"
                       f"{hi if hi is not None else '*'}"
            )
            expr = F.when(cond, F.lit(name)).otherwise(expr)
        return F.when(
            F.col(latf).isNotNull() & F.col(lonf).isNotNull(), expr
        )
    if kind == "geohash_grid":
        # ES geohash_grid: base-32 geohash cell at ``precision`` chars.
        # ES addresses one geo_point field; a parquet table carries
        # (lat, lon) doubles, so the node takes ``lat_field`` /
        # ``lon_field`` (documented engine convention). The interleave
        # is geo.geohash_sql_expr — the SAME SQL text the DuckDB
        # oracles run — with the [-180,180)/[-90,90) quantization
        # inlined as sub-expressions, all whole-stage codegen.
        from .geo import geohash_sql_expr

        precision = int(body.get("precision", 5))
        if not 1 <= precision <= 12:
            raise ValueError("precision must be in [1, 12]")
        lat = body.get("lat_field", "lat")
        lon = body.get("lon_field", "lon")
        total = 5 * precision
        lon_bits = (total + 1) // 2
        lat_bits = total - lon_bits
        lon_i = (
            f"(least(greatest(cast(floor((({lon}) + 180.0) / 360.0 * "
            f"{1 << lon_bits}) as bigint), 0), {(1 << lon_bits) - 1}))"
        )
        lat_i = (
            f"(least(greatest(cast(floor((({lat}) + 90.0) / 180.0 * "
            f"{1 << lat_bits}) as bigint), 0), {(1 << lat_bits) - 1}))"
        )
        text = geohash_sql_expr(precision, lon_i=lon_i, lat_i=lat_i)
        return F.when(
            F.col(lat).isNotNull() & F.col(lon).isNotNull(),
            F.expr(text),
        )
    if kind == "geotile_grid":
        # ES geotile_grid: web-mercator slippy tiles at zoom
        # ``precision``, keyed "z/x/y" — the geo.geotile_grid_agg tile
        # math (lat clamped to +/-85.0511, edge x/y clamped), pure
        # codegen arithmetic
        import math as _math

        precision = int(body.get("precision", 7))
        if not 0 <= precision <= 29:
            raise ValueError("precision must be in [0, 29]")
        latf = body.get("lat_field", "lat")
        lonf = body.get("lon_field", "lon")
        n = float(1 << precision)
        lat_c = F.greatest(
            F.lit(-85.0511287798),
            F.least(F.lit(85.0511287798), F.col(latf)),
        )
        x = F.floor((F.col(lonf) + 180.0) / 360.0 * n).cast("long")
        lat_rad = F.radians(lat_c)
        mercator = F.log(F.tan(lat_rad) + 1.0 / F.cos(lat_rad))
        y = F.floor((1.0 - mercator / _math.pi) / 2.0 * n).cast("long")
        x = F.least(F.greatest(x, F.lit(0)), F.lit(int(n) - 1))
        y = F.least(F.greatest(y, F.lit(0)), F.lit(int(n) - 1))
        return F.when(
            F.col(latf).isNotNull() & F.col(lonf).isNotNull(),
            F.concat_ws("/", F.lit(str(precision)),
                        x.cast("string"), y.cast("string")),
        )
    raise ValueError(f"unsupported bucket agg: {kind}")


def _unpivot(g: DataFrame, path: str, key_cols: list[str],
             emits: list[tuple], scale: float = 1.0) -> DataFrame:
    """(agg, key, metric, value) rows from one aggregated bucket frame;
    ``emits`` = (label, column-over-the-aggregated-frame) pairs.
    ``scale`` != 1 rescales doc_count by the random_sampler's
    1/probability (ES reports sampled doc counts in original-scale
    units at every depth under the sampler)."""
    key = (
        F.concat_ws("|", *[F.col(c) for c in key_cols])
        if key_cols else F.lit("")
    )
    dc = F.col("doc_count").cast("double")
    if scale != 1.0:
        dc = dc * F.lit(scale)
    pairs = [
        F.struct(
            F.lit("doc_count").alias("metric"),
            dc.alias("value"),
        )
    ] + [
        F.struct(F.lit(label).alias("metric"),
                 col.cast("double").alias("value"))
        for label, col in emits
    ]
    return g.select(
        F.lit(path).alias("agg"),
        key.alias("key"),
        F.explode(F.array(*pairs)).alias("_mv"),
    ).select("agg", "key", F.col("_mv.metric"), F.col("_mv.value"))


def _metric_sub_plans(metric_sub: dict, wrap=None, scale: float = 1.0):
    """Aggregate columns + emit pairs for a bucket node's metric
    sub-aggs (one combined groupBy pass). ``wrap`` optionally maps the
    field column (the filters agg's ``when(pred, ...)``); ``scale`` is
    the enclosing random_sampler's 1/probability rescale (metrics whose
    sampled values would be silently wrong raise)."""
    agg_cols, emits = [], []
    for mname, mnode in metric_sub.items():
        mkind, mbody, msub = _split_node(mnode)
        if msub:
            raise ValueError("metric aggs cannot have sub-aggs")
        if scale != 1.0 and mkind not in _SAMPLER_SAFE_METRICS:
            raise ValueError(
                f"{mkind} under random_sampler would report "
                "sample-scale values; supported sampled metrics: "
                f"{_SAMPLER_SAFE_METRICS}"
            )
        if mkind == "weighted_avg":
            # ES weighted_avg: sum(value*weight)/sum(weight) — both
            # sides wrapped so the filters agg's conditional holds
            vcol = F.col(mbody["value"]["field"])
            wcol = F.col(mbody["weight"]["field"])
            if wrap is not None:
                vcol, wcol = wrap(vcol), wrap(wcol)
            agg_cols.append(
                (F.sum(vcol * wcol) / F.sum(wcol)).alias(mname)
            )
            emits.append((mname, F.col(mname)))
            continue
        if mkind == "t_test":
            # ES t_test (heteroscedastic/Welch): two filtered
            # populations' count/mean/sample-variance ride the ONE
            # pass as conditional aggregates; the t statistic is
            # column algebra over the aggregated frame. Filters are
            # DSL filter nodes (compile_filter) or raw SQL predicates.
            if str(mbody.get("type", "heteroscedastic")) != \
                    "heteroscedastic":
                raise ValueError(
                    "t_test supports type=heteroscedastic (Welch); "
                    "paired/homoscedastic need facets.t_test_agg"
                )

            def side(spec):
                col = F.col(spec["field"])
                filt = spec.get("filter")
                if filt is not None:
                    pred = (
                        F.expr(filt) if isinstance(filt, str)
                        else F.expr(_compile_filter_node(filt))
                    )
                    col = F.when(pred, col)
                if wrap is not None:
                    col = wrap(col)
                return col

            ca, cb = side(mbody["a"]), side(mbody["b"])
            agg_cols.extend([
                F.count(ca).alias(f"{mname}__na"),
                F.avg(ca).alias(f"{mname}__ma"),
                F.var_samp(ca).alias(f"{mname}__va"),
                F.count(cb).alias(f"{mname}__nb"),
                F.avg(cb).alias(f"{mname}__mb"),
                F.var_samp(cb).alias(f"{mname}__vb"),
            ])
            se = F.sqrt(
                F.col(f"{mname}__va") / F.col(f"{mname}__na")
                + F.col(f"{mname}__vb") / F.col(f"{mname}__nb")
            )
            emits.append((
                mname,
                (F.col(f"{mname}__ma") - F.col(f"{mname}__mb")) / se,
            ))
            continue
        if mkind == "matrix_stats":
            # ES matrix_stats: per ordered field pair (i <= j),
            # population covariance + Pearson correlation, field means
            # on the diagonal entries — all Spark built-in aggregates
            # riding the ONE pass (the facets.matrix_stats_agg shape);
            # emits ``name.fa:fb.covariance`` / ``.correlation`` plus
            # per-field ``name.f.mean`` rows
            if wrap is not None:
                raise ValueError(
                    "matrix_stats under a conditional bucket "
                    "(filters/adjacency_matrix) is unsupported"
                )
            mfields = list(mbody["fields"])
            for c in mfields:
                agg_cols.append(F.avg(F.col(c)).alias(f"{mname}__m_{c}"))
                emits.append(
                    (f"{mname}.{c}.mean", F.col(f"{mname}__m_{c}"))
                )
            for i, ca in enumerate(mfields):
                for cb in mfields[i:]:
                    agg_cols.append(
                        F.covar_pop(ca, cb).alias(f"{mname}__cv_{ca}_{cb}")
                    )
                    agg_cols.append(
                        F.corr(ca, cb).alias(f"{mname}__cr_{ca}_{cb}")
                    )
                    emits.append((
                        f"{mname}.{ca}:{cb}.covariance",
                        F.col(f"{mname}__cv_{ca}_{cb}"),
                    ))
                    emits.append((
                        f"{mname}.{ca}:{cb}.correlation",
                        F.col(f"{mname}__cr_{ca}_{cb}"),
                    ))
            continue
        if mkind == "top_metrics":
            # ES top_metrics (size 1): the metric value from the row at
            # the sort column's extreme — max_by/min_by rides the same
            # one-pass aggregate (ties: undefined pick, as ES; use a
            # unique sort column for deterministic replay)
            ms = mbody["metrics"]
            if isinstance(ms, list):
                if len(ms) != 1:
                    raise ValueError(
                        "top_metrics supports exactly one metric here"
                    )
                ms = ms[0]
            mfield = ms["field"]
            ((sfield, sdir),) = mbody["sort"].items()
            if isinstance(sdir, dict):
                sdir = sdir.get("order", "asc")
            mcol, scol = F.col(mfield), F.col(sfield)
            if wrap is not None:
                mcol, scol = wrap(mcol), wrap(scol)
            fn = F.max_by if sdir == "desc" else F.min_by
            agg_cols.append(fn(mcol, scol).alias(mname))
            emits.append((f"{mname}.{mfield}", F.col(mname)))
            continue
        if mkind in ("geo_centroid", "geo_bounds"):
            # ES geo metrics. A geo_point field maps to (lat_field,
            # lon_field) double columns (the geohash_grid convention);
            # both ride the one groupBy pass as plain aggregates.
            if "field" in mbody:
                raise ValueError(
                    f"{mkind} takes lat_field/lon_field column names "
                    "(a geo_point field maps to two double columns "
                    "on a parquet table), not ES's single `field`"
                )
            latc = F.col(mbody.get("lat_field", "lat"))
            lonc = F.col(mbody.get("lon_field", "lon"))
            if wrap is not None:
                latc, lonc = wrap(latc), wrap(lonc)
            if mkind == "geo_centroid":
                agg_cols.extend([
                    F.avg(latc).alias(f"{mname}__lat"),
                    F.avg(lonc).alias(f"{mname}__lon"),
                    F.count(latc).alias(f"{mname}__count"),
                ])
                emits.extend([
                    (f"{mname}.lat", F.col(f"{mname}__lat")),
                    (f"{mname}.lon", F.col(f"{mname}__lon")),
                    (f"{mname}.count",
                     F.col(f"{mname}__count").cast("double")),
                ])
            else:
                # top_left = (max lat, min lon); bottom_right inverse
                agg_cols.extend([
                    F.max(latc).alias(f"{mname}__t"),
                    F.min(latc).alias(f"{mname}__b"),
                    F.min(lonc).alias(f"{mname}__l"),
                    F.max(lonc).alias(f"{mname}__r"),
                ])
                emits.extend([
                    (f"{mname}.top_left.lat", F.col(f"{mname}__t")),
                    (f"{mname}.top_left.lon", F.col(f"{mname}__l")),
                    (f"{mname}.bottom_right.lat", F.col(f"{mname}__b")),
                    (f"{mname}.bottom_right.lon", F.col(f"{mname}__r")),
                ])
            continue
        if mkind == "scripted_metric":
            # ES scripted_metric, the JSON-friendly subset: the
            # ``map_script`` is a SQL expression over the row (the
            # Painless map-state analogue, same dialect contract as
            # runtime_mappings) and ``reduce_script`` names one of
            # sum / avg / min / max / value_count. ``init`` and
            # ``combine`` are implicit: Spark's partial (map-side)
            # aggregation IS the per-shard combine, which is exactly
            # the scripted_metric execution contract — so this rides
            # the bucket's ONE groupBy pass with zero Python.
            # Arbitrary Python-callable states -> the standalone
            # facets.scripted_metric_agg (mapInPandas partial states).
            red = str(mbody.get("reduce_script", "sum"))
            fns = {"sum": F.sum, "avg": F.avg, "min": F.min,
                   "max": F.max, "value_count": F.count}
            if red not in fns:
                raise ValueError(
                    f"scripted_metric reduce_script must be one of "
                    f"{sorted(fns)}: {red!r} (python-state scripts -> "
                    "facets.scripted_metric_agg)"
                )
            mcol = F.expr(mbody["map_script"])
            if wrap is not None:
                mcol = wrap(mcol)
            agg_cols.append(fns[red](mcol).alias(mname))
            emits.append((mname, F.col(mname)))
            continue
        fcol = F.col(mbody["field"])
        if wrap is not None:
            fcol = wrap(fcol)
        a, e = _metric_plan(mkind, mbody, mname, fcol, scale=scale)
        agg_cols.extend(a)
        emits.extend(e)
    return agg_cols, emits


def _compile_node(
    rows: DataFrame,
    name: str,
    node: dict,
    path: str,
    parent_keys: list[str],
    scale: float = 1.0,
) -> list[DataFrame]:
    kind, body, sub = _split_node(node)
    mypath = f"{path}>{name}" if path else name

    if kind in METRIC_KINDS:
        # metric at top level / directly under a bucket is handled by
        # the PARENT's groupBy pass; standalone (no bucket above) =
        # global reduce
        agg_cols, emits = _metric_sub_plans({name: node}, scale=scale)
        aggs = [F.count(F.lit(1)).alias("doc_count")] + agg_cols
        g = (rows.groupBy(*[F.col(c) for c in parent_keys]).agg(*aggs)
             if parent_keys else rows.agg(*aggs))
        return [_unpivot(g, mypath, parent_keys, emits, scale=scale)]

    if kind == "random_sampler":
        # ES random_sampler (8.2+): sub-aggregate a Bernoulli sample of
        # the rows, reporting doc_count (and count-based metrics) in
        # ORIGINAL-scale units via the 1/probability rescale. The
        # sample is the engine-portable keyed md5 filter — a pure
        # map-side predicate, so at 100 TB the shuffle carries only
        # ``probability`` of the rows and any cluster picks the SAME
        # rows (DuckDB-replayable). ES's doc-key is implicit; a parquet
        # table names its key via ``key_field`` (engine convention).
        from ..operators.sampling import hash_sample

        p = float(body["probability"])
        if not 0.0 < p <= 1.0:
            raise ValueError(f"probability must be in (0, 1]: {p}")
        seed = int(body.get("seed", 42))
        key_field = body.get("key_field", "doc_id")
        sampled = hash_sample(rows, p, key_col=key_field, seed=seed)
        inv = scale / p
        metric_sub = {
            n: s for n, s in sub.items()
            if _split_node(s)[0] in METRIC_KINDS
        }
        bucket_sub = {
            n: s for n, s in sub.items() if n not in metric_sub
        }
        agg_cols, emits = _metric_sub_plans(metric_sub, scale=inv)
        aggs = [F.count(F.lit(1)).alias("doc_count")] + agg_cols
        g = (
            sampled.groupBy(*[F.col(c) for c in parent_keys]).agg(*aggs)
            if parent_keys else sampled.agg(*aggs)
        )
        outs = [_unpivot(g, mypath, parent_keys, emits, scale=inv)]
        outs.extend(
            _compile_level(sampled, bucket_sub, mypath, parent_keys,
                           scale=inv)
        )
        return outs

    if kind in ("sampler", "diversified_sampler"):
        # ES sampler / diversified_sampler over a flat frame: keep the
        # first ``shard_size`` rows per enclosing bucket in PORTABLE
        # md5 order of ``key_field`` (a metadata frame carries no
        # scores; ES's "best hits" order is a score rank — this
        # deterministic stand-in picks the SAME sample under any
        # partitioning and replays in DuckDB). diversified_sampler
        # additionally caps each ``field`` value at
        # ``max_docs_per_value`` BEFORE the cut (kills one-dominant-
        # value skew, exactly ES's intent). Both cuts are row_number
        # windows -> WindowGroupLimit: each map task forwards at most
        # the cap per key, so shuffles carry samples, never row sets.
        # Sub-aggs report SAMPLE-scale counts (ES sampler semantics —
        # no rescale; random_sampler is the rescaling variant).
        shard_size = int(body.get("shard_size", 100))
        if shard_size < 1:
            raise ValueError("shard_size must be >= 1")
        key_field = body.get("key_field", "doc_id")
        ord_col = F.conv(
            F.substring(F.md5(F.col(key_field).cast("string")), 1, 15),
            16, 10,
        ).cast("bigint")
        work = rows.withColumn("_smp_ord", ord_col)
        pcols = [F.col(c) for c in parent_keys]
        if kind == "diversified_sampler":
            div = body["field"]
            cap = int(body.get("max_docs_per_value", 1))
            if cap < 1:
                raise ValueError("max_docs_per_value must be >= 1")
            w_div = Window.partitionBy(*pcols, F.col(div)).orderBy(
                "_smp_ord", key_field
            )
            work = (
                work.withColumn("_smp_dv", F.row_number().over(w_div))
                .filter(F.col("_smp_dv") <= cap).drop("_smp_dv")
            )
        w_top = Window.partitionBy(
            *(pcols if pcols else [F.lit(1)])
        ).orderBy("_smp_ord", key_field)
        sampled = (
            work.withColumn("_smp_rk", F.row_number().over(w_top))
            .filter(F.col("_smp_rk") <= shard_size)
            .drop("_smp_rk", "_smp_ord")
        )
        metric_sub = {
            n: s for n, s in sub.items()
            if _split_node(s)[0] in METRIC_KINDS
        }
        bucket_sub = {n: s for n, s in sub.items() if n not in metric_sub}
        agg_cols, emits = _metric_sub_plans(metric_sub, scale=scale)
        aggs = [F.count(F.lit(1)).alias("doc_count")] + agg_cols
        g = (
            sampled.groupBy(*pcols).agg(*aggs)
            if parent_keys else sampled.agg(*aggs)
        )
        outs = [_unpivot(g, mypath, parent_keys, emits, scale=scale)]
        outs.extend(
            _compile_level(sampled, bucket_sub, mypath, parent_keys,
                           scale=scale)
        )
        return outs

    if kind == "auto_date_histogram":
        # ES auto_date_histogram: pick the smallest calendar interval
        # whose distinct bucket count fits ``buckets``, then bucket as
        # a plain date_histogram. The choice is ONE scalar aggregate
        # (four countDistinct partials -> 1 row — the audited
        # facets.auto_date_histogram_agg pattern), deterministic and
        # oracle-replayable; the chosen resolution shows in the key
        # format (the long format carries no response-level interval
        # field, unlike the standalone agg).
        from .facets import AUTO_DH_LADDER

        target = int(body.get("buckets", 50))
        if target < 1:
            raise ValueError("buckets must be >= 1")
        ts = F.col(body["field"]).cast("timestamp")
        counts = rows.agg(
            *[
                F.countDistinct(F.date_trunc(iv, ts)).alias(iv)
                for iv in AUTO_DH_LADDER
            ]
        ).collect()[0]
        interval = AUTO_DH_LADDER[-1]
        for iv in AUTO_DH_LADDER:
            if int(counts[iv]) <= target:
                interval = iv
                break
        rewritten = {
            "date_histogram": {
                "field": body["field"], "calendar_interval": interval,
            },
        }
        if sub:
            rewritten["aggs"] = sub
        return _compile_node(rows, name, rewritten, path, parent_keys,
                             scale=scale)

    if kind == "variable_width_histogram":
        # ES variable_width_histogram: dynamic-width 1D clustering.
        # ES's version is approximate and shard-order-dependent (its
        # docs say so); this is the DETERMINISTIC analogue the
        # standalone facets.variable_width_histogram_agg defines:
        # boundaries = the ``buckets - 1`` largest gaps of the DISTINCT
        # value axis (ties -> lower value; bounded by value
        # cardinality, not row count — pre-quantize continuous data),
        # collected as tiny literals (the auto_date_histogram
        # convention), after which the node REWRITES to a ``range``
        # bucket with injected min/max/centroid metric sub-aggs — so
        # assignment is a pure key expression and everything rides ONE
        # groupBy pass. Under a parent bucket the boundaries are
        # GLOBAL (one axis scan), not per-parent-bucket.
        target = int(body.get("buckets", 10))
        if target < 1:
            raise ValueError(f"buckets must be >= 1: {target}")
        fld = body["field"]
        v = rows.select(F.col(fld).alias("_v")).distinct()
        gaps = (
            v.withColumn(
                "_gap",
                F.col("_v") - F.lag("_v").over(Window.orderBy("_v")),
            ).filter(F.col("_gap").isNotNull())
        )
        bnd = sorted(
            r["_v"]
            for r in gaps.orderBy(F.desc("_gap"), F.asc("_v"))
            .limit(target - 1).collect()
        ) if target > 1 else []
        ranges = []
        for i, (lo, hi) in enumerate(zip([None] + bnd, bnd + [None])):
            r = {"key": str(i)}
            if lo is not None:
                r["from"] = float(lo)
            if hi is not None:
                r["to"] = float(hi)
            ranges.append(r)
        inject = {
            "min": {"min": {"field": fld}},
            "max": {"max": {"field": fld}},
            "centroid": {"avg": {"field": fld}},
        }
        clash = sorted(set(inject) & set(sub))
        if clash:
            raise ValueError(
                f"variable_width_histogram reserves sub-agg names "
                f"{sorted(inject)}; rename {clash}"
            )
        rewritten = {
            "range": {"field": fld, "ranges": ranges},
            "aggs": {**inject, **sub},
        }
        return _compile_node(rows, name, rewritten, path, parent_keys,
                             scale=scale)

    if kind == "filter":
        # ES single-filter bucket (the Kibana workhorse): narrow the
        # frame, count it, recurse. The body is a DSL filter node
        # (compiled by query.dsl.compile_filter) or a raw SQL predicate
        # string — either way ONE predicate that fuses into the scan
        # (no extra pass; Catalyst pushes it through the sub-tree).
        pred = body if isinstance(body, str) else _compile_filter_node(
            body
        )
        work = rows.filter(F.expr(pred))
        metric_sub = {
            n: s for n, s in sub.items()
            if _split_node(s)[0] in METRIC_KINDS
        }
        bucket_sub = {n: s for n, s in sub.items() if n not in metric_sub}
        agg_cols, emits = _metric_sub_plans(metric_sub, scale=scale)
        aggs = [F.count(F.lit(1)).alias("doc_count")] + agg_cols
        g = (work.groupBy(*[F.col(c) for c in parent_keys]).agg(*aggs)
             if parent_keys else work.agg(*aggs))
        outs = [_unpivot(g, mypath, parent_keys, emits, scale=scale)]
        outs.extend(
            _compile_level(work, bucket_sub, mypath, parent_keys,
                           scale=scale)
        )
        return outs

    if kind == "nested":
        # ES nested bucket over an array<struct> column: the exploded
        # sub-docs become the rows (doc_count = nested docs, exactly
        # ES), and replacing the array column with the struct makes
        # sub-agg field refs resolve as ES paths ("items.price" =
        # struct access, pure codegen). Map-side explode — no shuffle
        # of its own; sub-agg groupBys aggregate the exploded rows with
        # map-side partials, so at 100 TB the shuffle carries reduced
        # buckets, never the sub-doc fan-out.
        npath = body["path"]
        if npath not in rows.columns:
            raise ValueError(f"nested path is not a column: {npath!r}")
        work = rows.withColumn(npath, F.explode(F.col(npath)))
        metric_sub = {
            n: s for n, s in sub.items()
            if _split_node(s)[0] in METRIC_KINDS
        }
        bucket_sub = {n: s for n, s in sub.items() if n not in metric_sub}
        agg_cols, emits = _metric_sub_plans(metric_sub, scale=scale)
        aggs = [F.count(F.lit(1)).alias("doc_count")] + agg_cols
        g = (work.groupBy(*[F.col(c) for c in parent_keys]).agg(*aggs)
             if parent_keys else work.agg(*aggs))
        outs = [_unpivot(g, mypath, parent_keys, emits, scale=scale)]
        outs.extend(
            _compile_level(work, bucket_sub, mypath, parent_keys,
                           scale=scale)
        )
        return outs

    if kind == "reverse_nested":
        # ES reverse_nested (inside a nested context): jump back to
        # PARENT docs — doc_count = parents with >= 1 sub-doc surviving
        # the enclosing buckets, each parent once however many sub-docs
        # it contributed. ES keys parents by internal doc id; a parquet
        # frame names its key via ``id_field`` (engine convention, as
        # random_sampler's key_field). Sub-agg fields must be
        # PARENT-level columns (constant per doc — the kept duplicate
        # row is arbitrary but those columns are identical). Multi-level
        # re-nesting (ES ``path``) is unsupported and raises.
        if body.get("path") is not None:
            raise ValueError(
                "reverse_nested path (partial un-nest) is unsupported; "
                "only the full jump back to parent docs"
            )
        id_field = body.get("id_field", "doc_id")
        parents = rows.dropDuplicates([*parent_keys, id_field])
        metric_sub = {
            n: s for n, s in sub.items()
            if _split_node(s)[0] in METRIC_KINDS
        }
        bucket_sub = {n: s for n, s in sub.items() if n not in metric_sub}
        agg_cols, emits = _metric_sub_plans(metric_sub, scale=scale)
        aggs = [F.count(F.lit(1)).alias("doc_count")] + agg_cols
        g = (parents.groupBy(*[F.col(c) for c in parent_keys])
             .agg(*aggs)
             if parent_keys else parents.agg(*aggs))
        outs = [_unpivot(g, mypath, parent_keys, emits, scale=scale)]
        outs.extend(
            _compile_level(parents, bucket_sub, mypath, parent_keys,
                           scale=scale)
        )
        return outs

    if kind == "filters":
        outs = []
        preds = dict(body["filters"])
        if body.get("other_bucket") or body.get("other_bucket_key"):
            # ES other_bucket: docs matching NONE of the named filters.
            # A null predicate means "not matching" (ES semantics), so
            # each negated conjunct coalesces to TRUE on null
            okey = str(body.get("other_bucket_key", "_other_"))
            preds[okey] = " AND ".join(
                f"coalesce(NOT ({p}), TRUE)"
                for p in body["filters"].values()
            ) or "TRUE"
        # ONE conditional-aggregation pass computes every named bucket's
        # doc_count + metrics (plus nested buckets via recursion on the
        # filtered frame — each nested bucket is its own node anyway)
        metric_sub = {
            n: s for n, s in sub.items()
            if _split_node(s)[0] in METRIC_KINDS
        }
        bucket_sub = {n: s for n, s in sub.items() if n not in metric_sub}
        aggs, names, bemits = [], [], {}
        for bname, pred in preds.items():
            cond = F.expr(pred)
            aggs.append(
                F.sum(F.when(cond, 1).otherwise(0)).alias(f"_c_{bname}")
            )
            # prefix this bucket's metric aliases so every filter
            # bucket's conditional metrics share the ONE agg pass
            prefixed = {
                f"_x_{bname}_{m}": s for m, s in metric_sub.items()
            }
            a, e = _metric_sub_plans(
                prefixed, wrap=lambda c, cond=cond: F.when(cond, c),
                scale=scale,
            )
            aggs.extend(a)
            bemits[bname] = [
                (label.replace(f"_x_{bname}_", "", 1), col)
                for label, col in e
            ]
            names.append(bname)
        row = (rows.groupBy(*[F.col(c) for c in parent_keys]).agg(*aggs)
               if parent_keys else rows.agg(*aggs))
        for bname in names:
            sel = row.withColumn(
                "doc_count", F.coalesce(F.col(f"_c_{bname}"), F.lit(0))
            ).withColumn("_fk", F.lit(bname))
            outs.append(
                _unpivot(sel, mypath, parent_keys + ["_fk"],
                         bemits[bname], scale=scale)
            )
        for bname, pred in preds.items():
            if not bucket_sub:
                continue
            filtered = rows.filter(F.expr(pred)).withColumn(
                f"_fk_{mypath.count('>')}", F.lit(bname)
            )
            outs.extend(
                _compile_level(
                    filtered, bucket_sub, mypath,
                    parent_keys + [f"_fk_{mypath.count('>')}"],
                    scale=scale,
                )
            )
        return outs

    if kind == "adjacency_matrix":
        # ES adjacency_matrix: one bucket per named filter plus one per
        # intersecting pair (key "a&b", names sorted, ES's ``&``
        # separator knob) — ONE conditional-aggregation pass computes
        # every single and pair count (and any metric sub-aggs,
        # conditionally), exactly the filters-agg shape; only non-empty
        # buckets emit, as ES. Bucket sub-aggs would need 2^n filtered
        # recursions and raise (the standalone facets.adjacency_matrix
        # path covers per-cell drill-down).
        sep = str(body.get("separator", "&"))
        preds = dict(body["filters"])
        names = sorted(preds)
        cells = [(a, preds[a]) for a in names] + [
            (f"{a}{sep}{b}", f"({preds[a]}) AND ({preds[b]})")
            for i, a in enumerate(names) for b in names[i + 1:]
        ]
        metric_sub = {
            n: s for n, s in sub.items()
            if _split_node(s)[0] in METRIC_KINDS
        }
        if len(metric_sub) != len(sub):
            raise ValueError(
                "adjacency_matrix sub-aggs must be metrics"
            )
        aggs, bemits = [], {}
        for bname, pred in cells:
            cond = F.expr(pred)
            aggs.append(
                F.sum(F.when(cond, 1).otherwise(0)).alias(f"_c_{bname}")
            )
            prefixed = {
                f"_x_{bname}_{m}": s for m, s in metric_sub.items()
            }
            a, e = _metric_sub_plans(
                prefixed, wrap=lambda c, cond=cond: F.when(cond, c),
                scale=scale,
            )
            aggs.extend(a)
            bemits[bname] = [
                (label.replace(f"_x_{bname}_", "", 1), col)
                for label, col in e
            ]
        row = (rows.groupBy(*[F.col(c) for c in parent_keys]).agg(*aggs)
               if parent_keys else rows.agg(*aggs))
        outs = []
        for bname, _ in cells:
            sel = row.withColumn(
                "doc_count", F.coalesce(F.col(f"_c_{bname}"), F.lit(0))
            ).filter(F.col("doc_count") > 0).withColumn(
                "_ak", F.lit(bname)
            )
            outs.append(
                _unpivot(sel, mypath, parent_keys + ["_ak"],
                         bemits[bname], scale=scale)
            )
        return outs

    if kind == "composite":
        # ES composite agg: the pagination workhorse — buckets over a
        # tuple of sources in ASC key order, strictly after the `after`
        # key, size-limited. One partial-aggregated groupBy over the
        # TYPED source keys; the after filter and ordered limit run on
        # the REDUCED bucket frame (bucket-count-sized). Sub-buckets
        # and desc source order raise (the standalone
        # facets.composite_agg covers after-key replay paging too).
        if parent_keys:
            raise ValueError("composite must be a top-level agg (ES)")
        if any(
            _split_node(s)[0] not in METRIC_KINDS for s in sub.values()
        ):
            raise ValueError("composite sub-aggs must be metrics")
        size = int(body.get("size", 10))
        after = body.get("after")
        names, keyed = [], rows
        renders: list = []
        for i, src in enumerate(body["sources"]):
            (sname, snode), = src.items()
            (skind, sbody), = snode.items()
            if str(sbody.get("order", "asc")) != "asc":
                raise ValueError("composite source order must be asc")
            names.append(sname)
            if skind == "terms":
                t = F.col(sbody["field"]).cast("string")
                renders.append(F.col(f"_cs{i}"))
            elif skind == "histogram":
                iv = float(sbody["interval"])
                t = (F.floor(F.col(sbody["field"]) / iv)
                     * F.lit(iv)).cast("double")
                renders.append(
                    F.format_string("%.4f", F.col(f"_cs{i}"))
                )
            elif skind == "date_histogram":
                # the yyyy-MM-dd HH:mm:ss render sorts correctly
                t = _key_expr("date_histogram", sbody)
                renders.append(F.col(f"_cs{i}"))
            else:
                raise ValueError(
                    f"unsupported composite source: {skind}"
                )
            keyed = keyed.withColumn(f"_cs{i}", t).filter(
                F.col(f"_cs{i}").isNotNull()
            )
        agg_cols, emits = _metric_sub_plans(sub, scale=scale)
        g = keyed.groupBy(
            *[F.col(f"_cs{i}") for i in range(len(names))]
        ).agg(F.count(F.lit(1)).alias("doc_count"), *agg_cols)
        if after is not None:
            # strictly-after in tuple lexicographic order
            pred, eqs = F.lit(False), F.lit(True)
            for i, n in enumerate(names):
                c = F.col(f"_cs{i}")
                pred = pred | (eqs & (c > F.lit(after[n])))
                eqs = eqs & (c == F.lit(after[n]))
            g = g.filter(pred)
        g = g.orderBy(
            *[F.asc(f"_cs{i}") for i in range(len(names))]
        ).limit(size)
        for i in range(len(names)):
            g = g.withColumn(f"_ck{i}", renders[i])
        return [_unpivot(
            g, mypath, [f"_ck{i}" for i in range(len(names))], emits
        )]

    if kind == "frequent_item_sets":
        # ES frequent_item_sets (8.4 ML): market-basket mining over an
        # array field — delegates to the exact Apriori level-2 kernel
        # (facets.frequent_item_sets_agg: singleton prune, pairs from
        # surviving singletons only, per-doc cap knob bounding the pair
        # blowup). One field (ES's multi-field union raises); top-level
        # only. ES's ``minimum_support`` doc RATIO resolves via one
        # scalar count; ``min_support_docs`` passes the absolute count
        # directly (engine convention). Long rows: key = the itemset
        # sorted-joined "a|b", metrics doc_count + set_size.
        import math

        from .facets import frequent_item_sets_agg

        if parent_keys:
            raise ValueError(
                "frequent_item_sets must be a top-level agg"
            )
        if sub:
            raise ValueError("frequent_item_sets sub-aggs unsupported")
        if scale != 1.0:
            raise ValueError(
                "frequent_item_sets under random_sampler would report "
                "sample-scale supports"
            )
        flds = body.get("fields", [])
        if len(flds) != 1:
            raise ValueError(
                "frequent_item_sets needs exactly one entry in fields"
            )
        fld = (
            flds[0]["field"] if isinstance(flds[0], dict) else str(flds[0])
        )
        mss = int(body.get("minimum_set_size", 1))
        if mss not in (1, 2):
            raise ValueError(
                "minimum_set_size must be 1 or 2 (level-2 Apriori)"
            )
        if "min_support_docs" in body:
            msd = int(body["min_support_docs"])
        else:
            ratio = float(body.get("minimum_support", 0.1))
            msd = max(int(math.ceil(ratio * rows.count())), 1)
        out = frequent_item_sets_agg(
            rows, fld, min_support_docs=msd,
            size=int(body.get("size", 10)), max_set_size=2,
            id_col=body.get("key_field", "doc_id"),
            max_items_per_doc=body.get("max_items_per_doc"),
        )
        if mss == 2:
            out = out.filter(F.col("set_size") >= 2)
        return [out.select(
            F.lit(mypath).alias("agg"),
            F.array_join("items", "|").alias("key"),
            F.explode(F.array(
                F.struct(
                    F.lit("doc_count").alias("metric"),
                    F.col("doc_count").cast("double").alias("value"),
                ),
                F.struct(
                    F.lit("set_size").alias("metric"),
                    F.col("set_size").cast("double").alias("value"),
                ),
            )).alias("_mv"),
        ).select("agg", "key", F.col("_mv.metric"), F.col("_mv.value"))]

    # --- keyed bucket aggs (terms/histogram/date_histogram/range/missing)
    keycol = f"_k{len(parent_keys)}"
    keyed = rows.withColumn(keycol, _key_expr(kind, body)).filter(
        F.col(keycol).isNotNull()
    )
    key_cols = parent_keys + [keycol]

    metric_sub = {
        n: s for n, s in sub.items() if _split_node(s)[0] in METRIC_KINDS
    }
    pipe_sub = {
        n: s for n, s in sub.items()
        if _split_node(s)[0] in PARENT_PIPELINE_KINDS
    }
    tophits_sub = {
        n: s for n, s in sub.items() if _split_node(s)[0] == "top_hits"
    }
    rate_sub = {
        n: s for n, s in sub.items() if _split_node(s)[0] == "rate"
    }
    mad_sub = {
        n: s for n, s in sub.items()
        if _split_node(s)[0] == "median_absolute_deviation"
    }
    cc_sub = {
        n: s for n, s in sub.items()
        if _split_node(s)[0] == "cumulative_cardinality"
    }
    bucket_sub = {
        n: s for n, s in sub.items()
        if n not in metric_sub and n not in pipe_sub
        and n not in tophits_sub and n not in rate_sub
        and n not in mad_sub and n not in cc_sub
    }

    agg_cols, emits = _metric_sub_plans(metric_sub, scale=scale)
    for rname, rnode in rate_sub.items():
        # ES rate (date_histogram children only): sum(field) — or
        # doc_count when no field — divided by the bucket span measured
        # in ``unit`` intervals. Rides the ONE groupBy pass; calendar
        # parents with varying bucket length (month/year) raise.
        rbody = _split_node(rnode)[1]
        a, e = _rate_plan(rname, rbody, kind, body, scale)
        agg_cols.extend(a)
        emits.extend(e)
    for mname, mnode in mad_sub.items():
        # first pass of median_absolute_deviation: the per-bucket
        # median rides the main groupBy; the |x - median| median runs
        # as a second bucket-keyed pass below
        if scale != 1.0:
            raise ValueError(
                "median_absolute_deviation under random_sampler would "
                "report a sample-scale quantile"
            )
        mfield = _split_node(mnode)[1]["field"]
        agg_cols.append(
            F.percentile(F.col(mfield), F.lit(0.5)).alias(f"_med_{mname}")
        )
    aggs = [F.count(F.lit(1)).alias("doc_count")] + agg_cols
    g = keyed.groupBy(*[F.col(c) for c in key_cols]).agg(*aggs)

    min_dc = int(body.get("min_doc_count", 1))
    if min_dc > 0:
        g = g.filter(F.col("doc_count") >= min_dc)

    if kind == "rare_terms":
        # ES rare_terms: the LONG tail — values appearing at most
        # max_doc_count times; a filter over the reduced bucket frame
        # (no size cut; ES's CuckooFilter approximation is exact here)
        g = g.filter(
            F.col("doc_count") <= int(body.get("max_doc_count", 1))
        )

    if kind in ("terms", "multi_terms", "categorize_text"):
        size = int(body.get("size", 10))
        order = body.get("order", {"_count": "desc"})
        ((oname, odir),) = order.items()
        if oname == "_count":
            ocol = F.col("doc_count")
        elif oname == "_key":
            ocol = F.col(keycol)
        elif oname in metric_sub and \
                _split_node(metric_sub[oname])[0] in _SIMPLE_METRICS:
            ocol = F.round(F.col(oname), 6)
        else:
            raise ValueError(
                f"terms order references unknown metric: {oname}"
            )
        order_cols = [
            ocol.asc() if odir == "asc" else ocol.desc(),
            F.asc(keycol),
        ]
        if parent_keys:
            w = Window.partitionBy(
                *[F.col(c) for c in parent_keys]
            ).orderBy(*order_cols)
            g = (
                g.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= size).drop("_rn")
            )
        else:
            g = g.orderBy(*order_cols).limit(size)

    if kind == "histogram" and body.get("extended_bounds") and not \
            parent_keys and not bucket_sub:
        # leaf-level empty-bucket axis (the bounded-histogram pattern);
        # doc_count=0 rows carry null metrics, matching ES's empty
        # buckets
        import math

        interval = float(body["interval"])
        eb = body["extended_bounds"]
        loi = int(math.floor(float(eb["min"]) / interval))
        hii = int(math.floor(float(eb["max"]) / interval))
        # keys are exact interval multiples, so round() recovers the
        # index without float-truncation wobble on negatives
        idx_back = F.round(F.col(keycol).cast("double") / interval) \
            .cast("long")
        span = g.agg(
            F.least(F.min(idx_back), F.lit(loi)).alias("_lo"),
            F.greatest(F.max(idx_back), F.lit(hii)).alias("_hi"),
        )
        axis = span.select(
            F.explode(F.sequence("_lo", "_hi")).alias("_i")
        ).select(
            F.format_string(
                "%.4f", (F.col("_i") * F.lit(interval)).cast("double")
            ).alias(keycol)
        )
        g = (
            axis.join(g, keycol, "left")
            .withColumn("doc_count", F.coalesce("doc_count", F.lit(0)))
        )
        if min_dc > 0:
            g = g.filter(F.col("doc_count") >= min_dc)

    has_selector = False
    if pipe_sub:
        g, emits, has_selector = _apply_parent_pipeline(
            g, pipe_sub, kind, body, keycol, parent_keys, metric_sub, emits
        )

    outs = [_unpivot(g, mypath, key_cols, emits, scale=scale)]

    need_semi = kind in ("terms", "multi_terms") or has_selector
    child_rows = keyed
    if (need_semi or min_dc > 1) and (bucket_sub or tophits_sub
                                      or mad_sub or cc_sub):
        # children/top_hits/MAD see only the parent's SURVIVING buckets
        # (size cut, selector, min_doc_count). terms survivors are
        # <= size rows -> broadcast; other kinds' bucket frames stay a
        # plain (AQE-decided) semi join.
        keys = g.select(*key_cols).distinct()
        if kind in ("terms", "multi_terms"):
            keys = F.broadcast(keys)
        child_rows = keyed.join(keys, key_cols, "left_semi")

    for mname, mnode in mad_sub.items():
        # ES median_absolute_deviation: median(|x - median(x)|). Second
        # bucket-keyed pass over the rows joined with the first pass's
        # per-bucket median (bucket-count-sized dim side); exact
        # interpolated percentile both times — swap approx_percentile
        # at 100 TB, same call shape (the facets kernel's convention).
        mfield = _split_node(mnode)[1]["field"]
        med = g.select(*key_cols, F.col(f"_med_{mname}"))
        if kind in ("terms", "multi_terms"):
            med = F.broadcast(med)
        mg = (
            child_rows.join(med, key_cols)
            .groupBy(*[F.col(c) for c in key_cols])
            .agg(
                F.percentile(
                    F.abs(F.col(mfield) - F.col(f"_med_{mname}")),
                    F.lit(0.5),
                ).alias("_mad")
            )
        )
        key = (
            F.concat_ws("|", *[F.col(c) for c in key_cols])
            if key_cols else F.lit("")
        )
        outs.append(mg.select(
            F.lit(mypath).alias("agg"), key.alias("key"),
            F.lit(mname).alias("metric"),
            F.col("_mad").cast("double").alias("value"),
        ))

    for tname, tnode in tophits_sub.items():
        outs.append(
            _top_hits_rows(child_rows, tname, _split_node(tnode)[1],
                           mypath, key_cols)
        )

    for cname, cnode in cc_sub.items():
        # ES cumulative_cardinality ("total distinct users to date"):
        # buckets_path names a sibling cardinality sub-agg; its FIELD
        # reduces to a first-seen bucket per value (one groupBy on the
        # value — the facets first-seen reduction, EXACT where ES
        # chains HLL sketches), new arrivals aggregate per bucket, and
        # a cumulative window over the surviving bucket spine finishes
        # it — the window sees bucket counts, never values.
        if kind not in ("histogram", "date_histogram"):
            raise ValueError(
                "cumulative_cardinality needs a histogram or "
                f"date_histogram parent, got {kind}"
            )
        bp = _split_node(cnode)[1]["buckets_path"]
        target = metric_sub.get(bp)
        if target is None or _split_node(target)[0] != "cardinality":
            raise ValueError(
                "cumulative_cardinality buckets_path must name a "
                "sibling cardinality sub-agg"
            )
        fld = _split_node(target)[1]["field"]
        first_seen = child_rows.groupBy(
            *[F.col(c) for c in parent_keys], F.col(fld).alias("_ccv")
        ).agg(F.min(keycol).alias(keycol))
        news = first_seen.groupBy(
            *[F.col(c) for c in key_cols]
        ).agg(F.count("*").alias("_new"))
        spine = g.select(*key_cols)
        occ = (
            F.col(keycol).cast("double") if kind == "histogram"
            else F.col(keycol)
        )
        wcc = (
            Window.partitionBy(*[F.col(c) for c in parent_keys])
            .orderBy(occ)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = (
            spine.join(news, key_cols, "left")
            .withColumn("_new", F.coalesce(F.col("_new"), F.lit(0)))
            .withColumn("_cc", F.sum("_new").over(wcc))
        )
        key = (
            F.concat_ws("|", *[F.col(c) for c in key_cols])
            if key_cols else F.lit("")
        )
        outs.append(cum.select(
            F.lit(mypath).alias("agg"), key.alias("key"),
            F.lit(cname).alias("metric"),
            F.col("_cc").cast("double").alias("value"),
        ))

    outs.extend(_compile_level(child_rows, bucket_sub, mypath, key_cols,
                               scale=scale))
    return outs


_RATE_UNITS = {
    "second": 1, "minute": 60, "hour": 3600, "day": 86400,
    "week": 604800,
}


def _rate_plan(name: str, body: dict, pkind: str, pbody: dict,
               scale: float):
    """ES ``rate`` metric: one (agg_col, emit) pair riding the parent
    date_histogram's groupBy pass — sum(field) (or the doc count)
    divided by the bucket span in ``unit`` intervals. Calendar parents
    whose bucket length varies (month/year) raise; week/quarter units
    likewise need the varying-length calendar ES delegates to."""
    if pkind != "date_histogram":
        raise ValueError("rate needs a date_histogram parent")
    fixed = pbody.get("fixed_interval")
    if fixed is not None:
        span = _fixed_interval_seconds(fixed)
    else:
        cal = pbody.get("calendar_interval", pbody.get("interval", "day"))
        if cal not in ("hour", "day"):
            raise ValueError(
                f"rate under calendar_interval {cal!r} has a varying "
                "bucket length; use a fixed_interval parent"
            )
        span = 3600 if cal == "hour" else 86400
    unit = body.get("unit", "day")
    if unit not in _RATE_UNITS:
        raise ValueError(f"unsupported rate unit: {unit!r}")
    divisor = span / _RATE_UNITS[unit]
    field = body.get("field")
    src = F.sum(F.col(field)) if field else F.count(F.lit(1))
    col = (src * F.lit(scale) / F.lit(divisor)).alias(name)
    return [col], [(name, F.col(name))]


def _top_hits_rows(child_rows: DataFrame, name: str, body: dict,
                   path: str, key_cols: list[str]) -> DataFrame:
    """ES ``top_hits`` under a bucket: the bucket's top ``size`` rows
    by ``sort``, emitted as ``{name}.{rank}.{field}`` rows per
    ``_source`` field (the long format carries doubles, so _source
    fields must be numeric). ES breaks sort ties by shard order
    (nondeterministic); for cross-engine replay the _source fields
    append as ascending tiebreaks, making the cut total. The
    row_number filter is WindowGroupLimit — each map task forwards at
    most ``size`` rows per bucket, so the shuffle carries hits, not
    buckets."""
    size = int(body.get("size", 3))
    sorts = body.get("sort", [])
    if isinstance(sorts, dict):
        sorts = [sorts]
    order = []
    for s in sorts:
        (f_, d), = s.items()
        if isinstance(d, dict):
            d = d.get("order", "asc")
        order.append(F.col(f_).desc() if d == "desc" else F.col(f_).asc())
    fields = body.get("_source", [])
    if not fields:
        raise ValueError(
            "top_hits needs a _source list naming numeric fields "
            "(the long output format carries doubles)"
        )
    order += [F.col(f_).asc() for f_ in fields]
    if not order:
        raise ValueError("top_hits needs a sort")
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(*order)
    hits = (
        child_rows.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= size)
    )
    key = (
        F.concat_ws("|", *[F.col(c) for c in key_cols])
        if key_cols else F.lit("")
    )
    pairs = [
        F.struct(
            F.concat(
                F.lit(f"{name}."), F.col("_rk").cast("string"),
                F.lit(f".{f_}"),
            ).alias("metric"),
            F.col(f_).cast("double").alias("value"),
        )
        for f_ in fields
    ]
    return hits.select(
        F.lit(path).alias("agg"), key.alias("key"),
        F.explode(F.array(*pairs)).alias("_mv"),
    ).select("agg", "key", F.col("_mv.metric"), F.col("_mv.value"))


def _resolve_bucket_metric(path: str, metric_sub: dict):
    """buckets_path leaf -> column name on the reduced bucket frame.
    ``_count`` / ``doc_count`` map to the bucket count; otherwise the
    path must name a SIMPLE metric sub-agg (or weighted_avg) whose
    alias is a plain column."""
    if path in ("_count", "doc_count"):
        return "doc_count"
    if path in metric_sub:
        mkind = _split_node(metric_sub[path])[0]
        if mkind in _SIMPLE_METRICS or mkind == "weighted_avg":
            return path
    raise ValueError(
        f"buckets_path {path!r} must be _count or a simple metric sub-agg"
    )


def _script_expr(body: dict, metric_sub: dict):
    """bucket_script / bucket_selector: substitute the buckets_path
    variables into the (SQL-expression) script — each variable resolves
    to a plain column of the reduced bucket frame, so the script runs as
    codegen column algebra over bucket-count-sized data."""
    import re as _re

    bp = body["buckets_path"]
    script = body["script"]
    if isinstance(script, dict):  # ES {"script": {"source": ...}}
        script = script.get("source", "")
    for var, path in sorted(bp.items(), key=lambda kv: -len(kv[0])):
        col = _resolve_bucket_metric(path, metric_sub)
        script = _re.sub(rf"\b{_re.escape(var)}\b", col, script)
    return F.expr(script)


def _apply_parent_pipeline(
    g: DataFrame,
    pipe_sub: dict,
    kind: str,
    body: dict,
    keycol: str,
    parent_keys: list[str],
    metric_sub: dict,
    emits: list[tuple],
):
    """Parent pipeline aggs over one node's REDUCED bucket frame ``g``
    (bucket-count-sized — the window sees buckets, never rows).
    derivative/cumulative_sum need an ordered axis, so they require a
    histogram/date_histogram parent; bucket_script emits a computed
    metric; bucket_selector filters the buckets (children then semi-join
    the survivors). Returns (g, emits, has_selector)."""
    has_selector = False
    ordered_kinds = (
        "derivative", "cumulative_sum", "serial_diff", "moving_fn",
        "moving_percentiles",
    )
    if any(_split_node(s)[0] in ordered_kinds for s in pipe_sub.values()):
        if kind == "histogram":
            ocol = F.col(keycol).cast("double")
        elif kind == "date_histogram":
            ocol = F.col(keycol)  # yyyy-MM-dd HH:mm:ss sorts lexically
        else:
            raise ValueError(
                "derivative/cumulative_sum/serial_diff/moving_fn need "
                f"a histogram or date_histogram parent, got {kind}"
            )
        w = Window.partitionBy(*[F.col(c) for c in parent_keys]).orderBy(
            ocol
        )
    for pname, pnode in pipe_sub.items():
        pkind, pbody, psub = _split_node(pnode)
        if psub:
            raise ValueError("pipeline aggs cannot have sub-aggs")
        if pkind == "derivative":
            src = F.col(_resolve_bucket_metric(pbody["buckets_path"],
                                               metric_sub))
            g = g.withColumn(f"_p_{pname}", src - F.lag(src).over(w))
            emits.append((pname, F.col(f"_p_{pname}")))
        elif pkind == "cumulative_sum":
            src = F.col(_resolve_bucket_metric(pbody["buckets_path"],
                                               metric_sub))
            g = g.withColumn(
                f"_p_{pname}",
                F.sum(src).over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
            emits.append((pname, F.col(f"_p_{pname}")))
        elif pkind == "serial_diff":
            # ES serial_diff: metric minus the metric ``lag`` buckets
            # earlier (lag=1 == derivative; larger lags deseasonalize);
            # the first ``lag`` buckets emit null, as ES
            src = F.col(_resolve_bucket_metric(pbody["buckets_path"],
                                               metric_sub))
            lag = int(pbody.get("lag", 1))
            if lag < 1:
                raise ValueError(f"serial_diff lag must be >= 1: {lag}")
            g = g.withColumn(f"_p_{pname}", src - F.lag(src, lag).over(w))
            emits.append((pname, F.col(f"_p_{pname}")))
        elif pkind == "moving_fn":
            # ES moving_fn at shift=0: the window offered to the
            # function is [i - window + 1, i] — trailing, INCLUDING the
            # current bucket (MovingFunctions' from = index - window +
            # shift + 1). Supported scripts are the named
            # MovingFunctions reductions; shift != 0 raises.
            import re as _re

            src = F.col(_resolve_bucket_metric(pbody["buckets_path"],
                                               metric_sub))
            window = int(pbody["window"])
            if window < 1:
                raise ValueError(f"moving_fn window must be >= 1")
            if int(pbody.get("shift", 0)) != 0:
                raise ValueError("moving_fn shift != 0 unsupported")
            script = pbody.get("script", "")
            if isinstance(script, dict):
                script = script.get("source", "")
            m = _re.search(r"MovingFunctions\.(\w+)\s*\(", script)
            fname = m.group(1) if m else str(script).strip()
            fn = {
                "unweightedAvg": F.avg, "max": F.max,
                "min": F.min, "sum": F.sum,
            }.get(fname)
            if fn is None:
                raise ValueError(
                    f"unsupported moving_fn script: {script!r} "
                    "(unweightedAvg/max/min/sum)"
                )
            mv = w.rowsBetween(-(window - 1), 0)
            g = g.withColumn(f"_p_{pname}", fn(src).over(mv))
            emits.append((pname, F.col(f"_p_{pname}")))
        elif pkind == "normalize":
            # ES normalize: rescale a sibling metric across the bucket
            # set — an UNORDERED window over the reduced frame; a zero
            # denominator yields null, as ES. Values round to 6dp for
            # cross-engine replay (the facets.normalize_agg convention).
            src = F.col(_resolve_bucket_metric(pbody["buckets_path"],
                                               metric_sub))
            method = pbody.get("method", "rescale_0_1")
            wu = Window.partitionBy(*[F.col(c) for c in parent_keys])
            if method == "rescale_0_1":
                rng = F.max(src).over(wu) - F.min(src).over(wu)
                val = F.when(rng != 0, (src - F.min(src).over(wu)) / rng)
            elif method == "percent_of_sum":
                val = src / F.sum(src).over(wu)
            elif method == "z_score":
                sd = F.stddev_pop(src).over(wu)
                val = F.when(sd != 0, (src - F.avg(src).over(wu)) / sd)
            elif method == "softmax":
                val = F.exp(src) / F.sum(F.exp(src)).over(wu)
            else:
                raise ValueError(f"unknown normalize method {method!r}")
            g = g.withColumn(f"_p_{pname}", F.round(val, 6))
            emits.append((pname, F.col(f"_p_{pname}")))
        elif pkind == "moving_percentiles":
            # ES moving_percentiles: exact continuous percentiles over
            # a trailing window of buckets (current inclusive, leading
            # windows shrink) — quantile_cont interpolation over a
            # sorted collect_list of <= window bucket values
            src = F.col(_resolve_bucket_metric(pbody["buckets_path"],
                                               metric_sub))
            window = int(pbody["window"])
            if window < 1:
                raise ValueError("moving_percentiles window must be >= 1")
            percents = [float(p) for p in pbody.get("percents",
                                                    (50.0, 90.0))]
            mv = w.rowsBetween(-(window - 1), 0)
            arr = F.array_sort(F.collect_list(src).over(mv))
            g = g.withColumn(f"_pa_{pname}", arr)
            n = F.size(F.col(f"_pa_{pname}"))
            for i, p in enumerate(percents):
                rank = F.lit(p / 100.0) * (n - 1).cast("double")
                lo = F.floor(rank).cast("int")
                frac = rank - lo
                val = (
                    F.element_at(F.col(f"_pa_{pname}"), lo + 1)
                    * (1.0 - frac)
                    + F.element_at(
                        F.col(f"_pa_{pname}"),
                        F.least(lo + 2, n),
                    ) * frac
                )
                g = g.withColumn(f"_p_{pname}_{i}", F.round(val, 6))
                emits.append(
                    (f"{pname}.{p:g}", F.col(f"_p_{pname}_{i}"))
                )
        elif pkind == "bucket_sort":
            # ES bucket_sort: order buckets by metric paths and keep
            # [from, from+size) — a rank filter over the reduced frame
            # (WindowGroupLimit); children then see only survivors
            order = []
            for s in pbody.get("sort", []):
                (bp, d), = s.items()
                if isinstance(d, dict):
                    d = d.get("order", "asc")
                col = F.col(_resolve_bucket_metric(bp, metric_sub))
                order.append(col.desc() if d == "desc" else col.asc())
            order.append(F.asc(keycol))  # total order for replay
            size = int(pbody.get("size", 10))
            from_ = int(pbody.get("from", 0))
            ws = Window.partitionBy(
                *[F.col(c) for c in parent_keys]
            ).orderBy(*order)
            g = (
                g.withColumn("_bs_rk", F.row_number().over(ws))
                .filter((F.col("_bs_rk") > from_)
                        & (F.col("_bs_rk") <= from_ + size))
                .drop("_bs_rk")
            )
            has_selector = True
        elif pkind == "bucket_script":
            g = g.withColumn(
                f"_p_{pname}", _script_expr(pbody, metric_sub)
            )
            emits.append((pname, F.col(f"_p_{pname}")))
        elif pkind == "bucket_selector":
            g = g.filter(_script_expr(pbody, metric_sub))
            has_selector = True
    return g, emits, has_selector


def _sibling_rows(
    frames: dict[str, DataFrame],
    name: str,
    kind: str,
    body: dict,
    path: str,
    parent_keys: list[str],
    node_kinds: dict[str, str] | None = None,
) -> DataFrame:
    """Sibling pipeline agg (avg/min/max/sum/stats_bucket): reduce a
    sibling bucket agg's per-bucket metric to ONE value per enclosing
    bucket. Runs over the sibling's already-reduced LONG frame
    (bucket-count-sized); the enclosing-bucket key is the first
    ``len(parent_keys)`` components of the composite key."""
    bp = body["buckets_path"]
    if ">" in bp:
        sib, metric = bp.split(">", 1)
    else:
        sib, metric = bp, "_count"
    if metric == "_count":
        metric = "doc_count"
    if sib not in frames:
        raise ValueError(
            f"buckets_path references unknown sibling agg: {sib!r}"
        )
    src = frames[sib].filter(F.col("metric") == metric)
    if parent_keys:
        pkey = F.array_join(
            F.slice(F.split(F.col("key"), "\\|"), 1, len(parent_keys)),
            "|",
        )
    else:
        pkey = F.lit("")
    mypath = f"{path}>{name}" if path else name
    if kind == "change_point":
        # ES change_point (8.x, sibling form): locate the single most
        # likely level shift in the sibling's bucket-metric series —
        # the facets.change_point_agg CUSUM over the REDUCED long
        # frame (bucket-count-sized, never rows). Needs an ordered
        # axis: a histogram sibling orders numerically on its rendered
        # key, a date_histogram lexically (yyyy-MM-dd HH:mm:ss sorts).
        # The located bucket's key becomes the output key component
        # (parent|located); metrics = cusum_score (max |S_k|) + shift
        # (mean(after) - mean(before)), the thresholdable analogue of
        # ES's change-type p_value.
        from .facets import change_point_agg

        ck = F.element_at(F.split(F.col("key"), "\\|"), -1)
        sib_kind = (node_kinds or {}).get(sib)
        if sib_kind == "histogram":
            order_expr = ck.cast("double")
        elif sib_kind == "date_histogram":
            order_expr = ck
        else:
            raise ValueError(
                "change_point needs a histogram or date_histogram "
                f"sibling, got {sib_kind}"
            )
        series = src.select(
            pkey.alias("_pk"), ck.alias("_ck"),
            order_expr.alias("_ord"), F.col("value"),
        )
        cp = change_point_agg(
            series, "_ck", "value", group_col="_pk", order_col="_ord"
        )
        out_key = (
            F.concat_ws("|", F.col("_pk"), F.col("change_point"))
            if parent_keys else F.col("change_point")
        )
        pairs = [
            F.struct(
                F.lit(f"{name}.{m}").alias("metric"),
                F.col(m).cast("double").alias("value"),
            )
            for m in ("cusum_score", "shift")
        ]
        return cp.select(
            F.lit(mypath).alias("agg"), out_key.alias("key"),
            F.explode(F.array(*pairs)).alias("_mv"),
        ).select("agg", "key", F.col("_mv.metric"), F.col("_mv.value"))
    if kind in ("bucket_correlation", "bucket_count_ks_test"):
        # ES 8.x ML sibling pipelines, deterministic analogues over the
        # sibling's REDUCED bucket series (bucket-count-sized, never
        # raw rows). Both need an ordered axis — same sibling rule as
        # change_point: histogram orders numerically on its rendered
        # key, date_histogram lexically.
        ck = F.element_at(F.split(F.col("key"), "\\|"), -1)
        sib_kind = (node_kinds or {}).get(sib)
        if sib_kind == "histogram":
            order_expr = ck.cast("double")
        elif sib_kind == "date_histogram":
            order_expr = ck
        else:
            raise ValueError(
                f"{kind} needs a histogram or date_histogram sibling, "
                f"got {sib_kind}"
            )
        w_ord = Window.partitionBy("_pk").orderBy("_ord")
        series = src.select(
            pkey.alias("_pk"), order_expr.alias("_ord"), F.col("value")
        ).withColumn("_i", F.row_number().over(w_ord))
        spark = src.sparkSession
        if kind == "bucket_correlation":
            # ES bucket_correlation (function: count_correlation):
            # correlate the sibling's bucket-metric series with the
            # caller's indicator expectations, paired in bucket-key
            # order (histogram bucket order IS key order). The
            # deterministic analogue reports plain Pearson r over the
            # paired series — the thresholdable core of ES's
            # count-correlation formula.
            exps = (
                body.get("function", {})
                .get("count_correlation", {})
                .get("indicator", {})
                .get("expectations")
            )
            if not exps:
                raise ValueError(
                    "bucket_correlation requires function."
                    "count_correlation.indicator.expectations"
                )
            ind = tiny_df(spark,
                [(i + 1, float(e)) for i, e in enumerate(exps)],
                "_i int, _e double",
            )
            corr = (
                series.join(F.broadcast(ind), "_i")
                .groupBy("_pk")
                .agg(F.corr("value", "_e").alias("_v"))
            )
            return corr.select(
                F.lit(mypath).alias("agg"),
                F.col("_pk").alias("key"),
                F.lit(f"{name}.correlation").alias("metric"),
                F.col("_v").cast("double").alias("value"),
            )
        # bucket_count_ks_test: Kolmogorov-Smirnov distances between
        # the empirical CDF of the sibling's bucket values and the
        # expected CDF (caller ``fractions``, default uniform). ES
        # reports sampled p-values; the deterministic analogue reports
        # the EXACT D statistic per alternative so callers can
        # threshold: greater = max(ecdf - expected), less =
        # max(expected - ecdf), two_sided = max of both.
        alts = body.get("alternative", ["two_sided"])
        bad = [a for a in alts if a not in ("less", "greater",
                                            "two_sided")]
        if bad:
            raise ValueError(f"unknown ks_test alternative(s): {bad}")
        fracs = body.get("fractions")
        w_cum = w_ord.rowsBetween(Window.unboundedPreceding,
                                  Window.currentRow)
        w_all = Window.partitionBy("_pk").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        series = series.withColumn(
            "_ecdf",
            F.sum("value").over(w_cum) / F.sum("value").over(w_all),
        )
        if fracs is not None:
            fr = tiny_df(spark,
                [(i + 1, float(x)) for i, x in enumerate(fracs)],
                "_i int, _f double",
            )
            series = series.join(F.broadcast(fr), "_i").withColumn(
                "_fcdf",
                F.sum("_f").over(w_cum) / F.sum("_f").over(w_all),
            )
        else:
            series = series.withColumn(
                "_fcdf",
                F.col("_i").cast("double")
                / F.count(F.lit(1)).over(w_all),
            )
        agg = series.groupBy("_pk").agg(
            F.max(F.col("_ecdf") - F.col("_fcdf")).alias("greater"),
            F.max(F.col("_fcdf") - F.col("_ecdf")).alias("less"),
            F.max(F.abs(F.col("_ecdf") - F.col("_fcdf")))
            .alias("two_sided"),
        )
        pairs = [
            F.struct(
                F.lit(f"{name}.{a}").alias("metric"),
                F.col(a).cast("double").alias("value"),
            )
            for a in alts
        ]
        return agg.select(
            F.lit(mypath).alias("agg"),
            F.col("_pk").alias("key"),
            F.explode(F.array(*pairs)).alias("_mv"),
        ).select("agg", "key", F.col("_mv.metric"), F.col("_mv.value"))
    grouped = src.groupBy(pkey.alias("_pk"))
    if kind == "percentiles_bucket":
        # ES percentiles_bucket: EXACT percentiles of the sibling's
        # bucket metric (ES sorts the bucket values plainly here,
        # unlike the t-digest percentiles metric) — one interpolated
        # percentile over the bucket-count-sized long frame
        percents = [float(p) for p in body.get("percents",
                                               DEFAULT_PERCENTS)]
        arr = F.array(*[F.lit(p / 100.0) for p in percents])
        agg = grouped.agg(F.percentile(F.col("value"), arr).alias("_q"))
        pairs = [
            F.struct(
                F.lit(f"{name}.{p:g}").alias("metric"),
                F.element_at(F.col("_q"), i + 1)
                .cast("double").alias("value"),
            )
            for i, p in enumerate(percents)
        ]
        return agg.select(
            F.lit(mypath).alias("agg"),
            F.col("_pk").alias("key"),
            F.explode(F.array(*pairs)).alias("_mv"),
        ).select("agg", "key", F.col("_mv.metric"), F.col("_mv.value"))
    if kind in ("stats_bucket", "extended_stats_bucket"):
        stats_cols = [
            F.count("value").alias("count"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
            F.avg("value").alias("avg"),
            F.sum("value").alias("sum"),
        ]
        labels = ["count", "min", "max", "avg", "sum"]
        if kind == "extended_stats_bucket":
            # + sum_of_squares and POPULATION variance/std over the
            # sibling's bucket values, as the extended_stats metric
            stats_cols += [
                F.sum(F.col("value") * F.col("value"))
                .alias("sum_of_squares"),
                F.var_pop("value").alias("variance"),
                F.stddev_pop("value").alias("std_deviation"),
            ]
            labels += ["sum_of_squares", "variance", "std_deviation"]
        agg = grouped.agg(*stats_cols)
        pairs = [
            F.struct(
                F.lit(f"{name}.{s}").alias("metric"),
                F.col(s).cast("double").alias("value"),
            )
            for s in labels
        ]
        return agg.select(
            F.lit(mypath).alias("agg"),
            F.col("_pk").alias("key"),
            F.explode(F.array(*pairs)).alias("_mv"),
        ).select("agg", "key", F.col("_mv.metric"), F.col("_mv.value"))
    fn = {
        "avg_bucket": F.avg, "min_bucket": F.min,
        "max_bucket": F.max, "sum_bucket": F.sum,
    }[kind]
    return grouped.agg(fn("value").alias("_v")).select(
        F.lit(mypath).alias("agg"),
        F.col("_pk").alias("key"),
        F.lit(name).alias("metric"),
        F.col("_v").cast("double").alias("value"),
    )


def _significant_terms_rows(
    fg: DataFrame, bg: DataFrame, name: str, body: dict
) -> DataFrame:
    """ES ``significant_terms`` over a KEYWORD field: values unusually
    frequent in the query's match set (foreground) vs the whole index
    (background) — JLH score ``(fg% - bg%) * (fg% / bg%)`` over
    per-value doc counts (the text variant over the inverted index
    lives in query/facets.py::significant_terms). Two partial-aggregated
    passes; the totals ride as broadcast 1-row cross joins, never a
    driver collect; the size cut is an ordered limit over the REDUCED
    value set."""
    field = body["field"]
    size = int(body.get("size", 10))
    min_dc = int(body.get("min_doc_count", 3))
    key = F.col(field).cast("string")
    fgc = fg.filter(key.isNotNull()).groupBy(key.alias("_k")).agg(
        F.count(F.lit(1)).alias("fg_count")
    )
    bgc = bg.filter(key.isNotNull()).groupBy(key.alias("_k")).agg(
        F.count(F.lit(1)).alias("bg_count")
    )
    fgt = fg.agg(F.count(F.lit(1)).alias("_fgn"))
    bgt = bg.agg(F.count(F.lit(1)).alias("_bgn"))
    j = (
        fgc.join(bgc, "_k")
        .crossJoin(F.broadcast(fgt))
        .crossJoin(F.broadcast(bgt))
        .filter(F.col("fg_count") >= min_dc)
        .withColumn("_fgp", F.col("fg_count") / F.col("_fgn"))
        .withColumn("_bgp", F.col("bg_count") / F.col("_bgn"))
        .withColumn(
            "score",
            (F.col("_fgp") - F.col("_bgp"))
            * (F.col("_fgp") / F.col("_bgp")),
        )
    )
    top = j.orderBy(F.desc(F.round("score", 9)), F.asc("_k")).limit(size)
    pairs = [
        F.struct(F.lit(m).alias("metric"), c.cast("double").alias("value"))
        for m, c in (
            ("doc_count", F.col("fg_count")),
            ("bg_count", F.col("bg_count")),
            ("score", F.col("score")),
        )
    ]
    return top.select(
        F.lit(name).alias("agg"),
        F.col("_k").alias("key"),
        F.explode(F.array(*pairs)).alias("_mv"),
    ).select("agg", "key", F.col("_mv.metric"), F.col("_mv.value"))


def _significant_text_rows(
    fg: DataFrame, bg: DataFrame, name: str, body: dict
) -> DataFrame:
    """ES ``significant_text`` (round 5i in the compiler): significant
    terms straight over the RAW text of the match set — ES's
    re-analyze-on-the-fly agg, no index touched. Whitespace tokens
    counted ONCE per doc (per-doc dedup, ES rule), JLH
    ``(fg% - bg%) * (fg% / bg%)`` against the pre-query universe as
    background; ``exclude`` drops the query's own terms. Same shape as
    :func:`_significant_terms_rows` with a tokenizing projection in
    front: two partial-aggregated passes over exploded distinct tokens
    (the text never shuffles beyond its own doc's token set), totals as
    broadcast 1-row cross joins, ordered-limit size cut. The
    ``filter_duplicate_text`` / ``background_filter`` knobs live on the
    standalone ``facets.significant_text_agg`` — here they raise."""
    unsupported = sorted(
        set(body) & {"filter_duplicate_text", "background_filter"}
    )
    if unsupported:
        raise ValueError(
            f"significant_text options {unsupported} are standalone-only "
            "(facets.significant_text_agg)"
        )
    field = body["field"]
    size = int(body.get("size", 10))
    min_dc = int(body.get("min_doc_count", 3))
    exclude = [str(x) for x in (body.get("exclude") or [])]

    def tok(df: DataFrame) -> DataFrame:
        t = df.select(
            F.explode(
                F.array_distinct(F.split(F.col(field).cast("string"), " "))
            ).alias("_k")
        ).filter(F.col("_k") != "")
        if exclude:
            t = t.filter(~F.col("_k").isin(exclude))
        return t

    fgc = tok(fg).groupBy("_k").agg(F.count(F.lit(1)).alias("fg_count"))
    bgc = tok(bg).groupBy("_k").agg(F.count(F.lit(1)).alias("bg_count"))
    fgt = fg.agg(F.count(F.lit(1)).alias("_fgn"))
    bgt = bg.agg(F.count(F.lit(1)).alias("_bgn"))
    j = (
        fgc.join(bgc, "_k")
        .crossJoin(F.broadcast(fgt))
        .crossJoin(F.broadcast(bgt))
        .filter(F.col("fg_count") >= min_dc)
        .withColumn("_fgp", F.col("fg_count") / F.col("_fgn"))
        .withColumn("_bgp", F.col("bg_count") / F.col("_bgn"))
        .withColumn(
            "score",
            (F.col("_fgp") - F.col("_bgp"))
            * (F.col("_fgp") / F.col("_bgp")),
        )
    )
    top = j.orderBy(F.desc(F.round("score", 9)), F.asc("_k")).limit(size)
    pairs = [
        F.struct(F.lit(m).alias("metric"), c.cast("double").alias("value"))
        for m, c in (
            ("doc_count", F.col("fg_count")),
            ("bg_count", F.col("bg_count")),
            ("score", F.col("score")),
        )
    ]
    return top.select(
        F.lit(name).alias("agg"),
        F.col("_k").alias("key"),
        F.explode(F.array(*pairs)).alias("_mv"),
    ).select("agg", "key", F.col("_mv.metric"), F.col("_mv.value"))


def _compile_level(
    rows: DataFrame, nodes: dict, path: str, parent_keys: list[str],
    scale: float = 1.0,
) -> list[DataFrame]:
    """Compile one level of the aggs tree: regular nodes first (each
    node's OWN bucket frame recorded by name), then sibling pipeline
    nodes referencing them."""
    outs: list[DataFrame] = []
    frames: dict[str, DataFrame] = {}
    siblings: list[tuple[str, str, dict]] = []
    for name, node in nodes.items():
        kind, body, sub = _split_node(node)
        if kind in SIBLING_PIPELINE_KINDS:
            siblings.append((name, kind, body))
            continue
        child_outs = _compile_node(rows, name, node, path, parent_keys,
                                   scale=scale)
        if child_outs:
            frames[name] = child_outs[0]
        outs.extend(child_outs)
    if siblings:
        node_kinds = {n: _split_node(nd)[0] for n, nd in nodes.items()}
        for name, kind, body in siblings:
            outs.append(
                _sibling_rows(frames, name, kind, body, path,
                              parent_keys, node_kinds=node_kinds)
            )
    return outs


def dsl_aggs(rows: DataFrame, aggs: dict) -> DataFrame:
    """Compile an ES ``aggs`` tree over ``rows``; returns the long
    ``(agg, key, metric, value)`` frame (one union of per-node plans —
    each node one partial-aggregated pass)."""
    outs = _compile_level(rows, aggs, "", [])
    if not outs:  # hits-only body: empty aggregations, ES-style
        return tiny_df(rows.sparkSession,
            [], "agg string, key string, metric string, value double"
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def es_response(rows) -> dict:
    """Fold the long ``(agg, key, metric, value)`` frame (or its
    collected rows) into the nested ES ``aggregations`` response shape:
    ``{agg: {"buckets": [{"key": ..., "doc_count": n, metric:
    {"value": v}}]}}``, with child aggs nested inside their parent
    bucket via the ``parent>child`` path and ``pkey|ckey`` composite
    keys. Driver-side convenience over the ALREADY-REDUCED bucket rows
    (bucket-count-sized, never row-scale) — the distributed shape stays
    the long frame."""
    if hasattr(rows, "collect"):
        rows = rows.collect()
    buckets: dict = {}  # (path, key) -> bucket dict
    out: dict = {}
    for r in sorted(rows, key=lambda r: (r["agg"].count(">"), r["agg"],
                                         r["key"] or "", r["metric"])):
        path, key, metric, value = (
            r["agg"], r["key"] or "", r["metric"], r["value"]
        )
        b = buckets.get((path, key))
        if b is None:
            b = {"key": key.rsplit("|", 1)[-1] if key else key}
            buckets[(path, key)] = b
            if ">" in path:
                ppath, cname = path.rsplit(">", 1)
                pkey = key.rsplit("|", 1)[0] if "|" in key else ""
                parent = buckets.get((ppath, pkey), {})
                parent.setdefault(cname, {"buckets": []})["buckets"] \
                    .append(b)
            else:
                out.setdefault(path, {"buckets": []})["buckets"].append(b)
        if metric == "doc_count":
            b["doc_count"] = int(value) if value is not None else 0
        else:
            b[metric] = {"value": value}
    # top-level metric-only aggs (single '' bucket) flatten like ES
    for name, node in list(out.items()):
        bs = node["buckets"]
        if len(bs) == 1 and bs[0]["key"] == "":
            flat = {k: v for k, v in bs[0].items() if k != "key"}
            out[name] = flat
    return out


def dsl_search_aggs(
    rows: DataFrame,
    body: dict,
    match_doc_ids: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``_search`` with an ``aggs`` section: the ``query`` is applied
    as FILTER CONTEXT (term/terms/range/exists/ids/bool-of-those —
    compiled by :func:`query.dsl.compile_dsl`, pushed into the scan);
    aggregations then run over the match set. For scoring/text queries
    pass the matched ids as ``match_doc_ids`` (e.g. from
    ``dsl_topk``/``bm25_filtered_topk``'s doc set) — they semi-join
    PRE-aggregation, the same pre-rank composition the DSL ranker uses.
    ``runtime_mappings`` (ES runtime fields: ``{name: {"script": <SQL
    expr>}}``) compile into the plan before the query/aggs see them, so
    a runtime field works as a bucket/metric field for free."""
    for rname, spec in (body.get("runtime_mappings") or {}).items():
        script = spec["script"] if isinstance(spec, dict) else spec
        if isinstance(script, dict):  # ES {"script": {"source": ...}}
            script = script.get("source", "")
        rows = rows.withColumn(rname, F.expr(script))
    rows0 = rows  # pre-query universe (the ES `global` bucket's scope)
    q = body.get("query")
    if q is not None:
        from elasticsearch_analysis_combo_spark.query.dsl import compile_dsl

        cq = compile_dsl({"bool": {"filter": [q]}})
        if cq.filter_sql:
            rows = rows.filter(F.expr(cq.filter_sql))
    if match_doc_ids is not None:
        rows = rows.join(
            match_doc_ids.select(F.col(id_col)).distinct(),
            id_col, "left_semi",
        )
    aggs = dict(body.get("aggs", body.get("aggregations", {})))
    # ES `global` buckets escape the query's filter context: their
    # sub-tree compiles over the PRE-query universe, and the global
    # node itself is one all-docs bucket
    global_outs: list[DataFrame] = []
    for name in [
        n for n in aggs if _split_node(aggs[n])[0] == "significant_terms"
    ]:
        _, sbody, ssub = _split_node(aggs.pop(name))
        if ssub:
            raise ValueError("significant_terms sub-aggs unsupported")
        global_outs.append(
            _significant_terms_rows(rows, rows0, name, sbody)
        )
    for name in [
        n for n in aggs if _split_node(aggs[n])[0] == "significant_text"
    ]:
        _, sbody, ssub = _split_node(aggs.pop(name))
        if ssub:
            raise ValueError("significant_text sub-aggs unsupported")
        global_outs.append(
            _significant_text_rows(rows, rows0, name, sbody)
        )
    for name in [n for n in aggs if _split_node(aggs[n])[0] == "global"]:
        _, _, sub = _split_node(aggs.pop(name))
        global_outs.append(
            rows0.agg(F.count(F.lit(1)).alias("doc_count")).select(
                F.lit(name).alias("agg"),
                F.lit("").alias("key"),
                F.lit("doc_count").alias("metric"),
                F.col("doc_count").cast("double").alias("value"),
            )
        )
        global_outs.extend(_compile_level(rows0, sub, name, []))
    res = dsl_aggs(rows, aggs)
    for o in global_outs:
        res = res.unionByName(o)
    return res
