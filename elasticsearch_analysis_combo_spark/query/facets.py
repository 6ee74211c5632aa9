"""Search aggregations (ES ``aggs``): facets over the full match set.

An ES ``_search`` with a ``terms`` or ``histogram`` aggregation computes
bucket counts over EVERY matching document (not just the top-k page) —
the host behavior a reference user drives daily alongside ranked
retrieval. The match set for an OR query is every doc containing at
least one analyzed query term.

Scale shape: query terms are a broadcast dimension; the match set is a
distinct (query_id, doc_id) projection of the pre-aggregated term stats
(one shuffle); bucket counting is a partial-aggregated groupBy on
(query_id, bucket). The metadata join runs match-set × doc-meta on
doc_id — co-partitioned if the caller bucketed both by doc_id, plain
shuffle join otherwise; no posting payload is shipped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.tinydf import tiny_df

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig
from elasticsearch_analysis_combo_spark.query.bm25 import analyze_queries


def _match_set(
    spark: SparkSession,
    term_stats: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
) -> DataFrame:
    """Distinct (query_id, doc_id) for docs containing >=1 query term.
    The literal isin pushes into the stats scan (a broadcast join alone
    doesn't prune parquet row groups)."""
    qrows = analyze_queries(queries, config)
    qterms = tiny_df(spark, qrows, "query_id int, term string")
    return (
        term_stats.filter(F.col("term").isin(sorted({t for _, t in qrows})))
        .join(F.broadcast(qterms), "term")
        .select("query_id", "doc_id")
        .distinct()
    )


def search_facet_terms(
    spark: SparkSession,
    term_stats: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    doc_meta: DataFrame,
    facet_col: str,
    size: int = 10,
) -> DataFrame:
    """ES ``terms`` aggregation: per query, the top ``size`` values of
    ``facet_col`` among all matching docs, with doc counts. Ties break by
    value (ascending) — deterministic, matching the ES tie order."""
    matches = _match_set(spark, term_stats, queries, config)
    buckets = (
        matches.join(doc_meta.select("doc_id", facet_col), "doc_id")
        .groupBy("query_id", F.col(facet_col).alias("value"))
        .agg(F.count("*").alias("doc_count"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("doc_count"), F.asc("value")
    )
    return (
        buckets.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= size)
        .select("query_id", "rank", "value", "doc_count")
    )


def collapse_topk(
    spark: SparkSession,
    term_stats: DataFrame,
    term_df: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    doc_meta: DataFrame,
    collapse_field: str,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``collapse``: top-k hits with at most ONE hit per value of
    ``collapse_field`` — the best-scoring doc represents its group
    (doc_id tiebreak), e.g. one result per domain/author/source.

    Collapsing must happen over the FULL scored set (a group's winner may
    sit below the uncollapsed top-k), so this scores exhaustively, joins
    the collapse key, keeps each (query, value) max, and ranks — every
    step partial-aggregated; the ranking tail sees at most one row per
    distinct field value. Docs without a ``doc_meta`` row collapse into
    a shared null group (ES's missing-field collapse), not silently
    dropped."""
    from elasticsearch_analysis_combo_spark.query.bm25 import bm25_scored

    scored = bm25_scored(
        spark, term_stats, term_df, queries, config, n_docs, avgdl,
        k1=k1, b=b,
    ).join(doc_meta.select("doc_id", collapse_field), "doc_id", "left")
    # both windows rank on the 6-rounded score (doc_id tiebreak): group
    # winners and final order must not flip on near-tied floats across
    # engines (same policy as _rerank_rounded)
    wg = Window.partitionBy("query_id", collapse_field).orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    winners = (
        scored.withColumn("_gn", F.row_number().over(wg))
        .filter(F.col("_gn") == 1)
        .drop("_gn")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    return (
        winners.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "doc_id",
            F.col(collapse_field).alias("collapse_value"), "score",
        )
    )


def collapse_inner_hits_topk(
    spark: SparkSession,
    term_stats: DataFrame,
    term_df: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    doc_meta: DataFrame,
    collapse_field: str,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    inner_size: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``collapse`` WITH ``inner_hits``: the top-k groups (ranked by
    their best hit, exactly :func:`collapse_topk`) each carry their own
    top ``inner_size`` members — the "best N results per domain" shape.
    Inner hits come back EXPLODED as rows (query_id, outer_rank,
    collapse_value, inner_rank, doc_id, score): outer_rank 1..k orders
    groups, inner_rank 1..inner_size orders docs within the group, and
    the (outer_rank, inner_rank=1) rows ARE the plain collapse result.
    Both window cuts trigger WindowGroupLimit rank pushdown, so tasks
    forward at most inner_size rows per group before the final rank."""
    from elasticsearch_analysis_combo_spark.query.bm25 import bm25_scored

    scored = bm25_scored(
        spark, term_stats, term_df, queries, config, n_docs, avgdl,
        k1=k1, b=b,
    ).join(doc_meta.select("doc_id", collapse_field), "doc_id", "left")
    wg = Window.partitionBy("query_id", collapse_field).orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    inner = scored.withColumn("_in", F.row_number().over(wg)).filter(
        F.col("_in") <= inner_size
    )
    # group rank = rank of each group's WINNER among winners
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    winners = (
        inner.filter(F.col("_in") == 1)
        .withColumn("outer_rank", F.row_number().over(w))
        .filter(F.col("outer_rank") <= k)
        .select("query_id", collapse_field, "outer_rank")
    )
    return (
        inner.join(winners, ["query_id", collapse_field])
        .select(
            "query_id", "outer_rank",
            F.col(collapse_field).alias("collapse_value"),
            F.col("_in").alias("inner_rank"), "doc_id", "score",
        )
    )


def change_point_agg(
    df: DataFrame,
    key_col: str,
    value_col: str,
    group_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """ES ``change_point`` aggregation, deterministic analogue: locate
    the single most likely level shift in a (key-ordered) metric series
    with the classic CUSUM statistic — S_k = cumsum(x_i - mean), change
    point = argmax |S_k| (the split maximizing the between-segment mean
    difference weighted by size), magnitude = mean(after) -
    mean(before). ES's ML implementation tests several change types;
    this reports the level-shift case with the raw max-|CUSUM| score so
    callers can threshold. Pure window arithmetic: two passes over each
    group's series, no driver collection — at scale the series per
    group is the bucket list of an upstream date_histogram (small), not
    raw rows. ``order_col`` (default ``key_col``) sets the series
    order when the reported key needs a different sort type (the aggs
    compiler orders a histogram parent's string keys numerically)."""
    ocol = order_col or key_col
    gcols = [group_col] if group_col else []
    part = Window.partitionBy(*gcols) if gcols else Window.partitionBy(
        F.lit(1)
    )
    w_all = part.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_cum = part.orderBy(ocol).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    x = F.col(value_col).cast("double")
    cum = (
        df.withColumn("_mean", F.avg(x).over(w_all))
        .withColumn("_n", F.count("*").over(w_all))
        .withColumn("_i", F.row_number().over(part.orderBy(ocol)))
        .withColumn("_s", F.sum(x - F.col("_mean")).over(w_cum))
        .withColumn("_cum", F.sum(x).over(w_cum))
    )
    # argmax |S_k| over k < n (a split needs a non-empty right segment),
    # ties to the earliest key — deterministic cross-engine
    w_pick = part.orderBy(F.desc(F.abs(F.col("_s"))), F.asc("_i"))
    best = (
        cum.filter(F.col("_i") < F.col("_n"))
        .withColumn("_r", F.row_number().over(w_pick))
        .filter(F.col("_r") == 1)
    )
    tot = df.groupBy(*gcols).agg(
        F.sum(x).alias("_tot"), F.count("*").alias("_cnt")
    )
    joined = best.join(tot, gcols) if gcols else best.crossJoin(
        F.broadcast(tot)
    )
    out_cols = gcols + [
        F.col(key_col).alias("change_point"),
        F.abs(F.col("_s")).alias("cusum_score"),
        (
            (F.col("_tot") - F.col("_cum"))
            / (F.col("_cnt") - F.col("_i"))
            - F.col("_cum") / F.col("_i")
        ).alias("shift"),
    ]
    return joined.select(*out_cols)


def significant_terms(
    spark: SparkSession,
    term_stats: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    n_docs: int,
    size: int = 10,
    min_doc_count: int = 3,
    term_df: DataFrame | None = None,
    heuristic: str = "jlh",
) -> DataFrame:
    """ES ``significant_terms``: vocabulary terms unusually frequent in
    the query's match set versus the whole corpus. ``heuristic`` picks
    the ES scoring heuristic (all pure column arithmetic over the same
    fg/bg counts — identical plan, different score expression):

    * ``jlh`` (default): ``(fg% - bg%) * (fg% / bg%)``.
    * ``chi_square``: Pearson chi-square over the 2x2 contingency table
      (term-in/out x matchset-in/out; ES cites the same test, with
      ``include_negatives``: anti-correlated terms get a NEGATIVE
      score, as ES's default does).
    * ``mutual_information``: expected mutual information of the 2x2
      table (the Manning/Raghavan/Schuetze IR-book eq. 13.17 that ES's
      docs cite), signed like chi_square.
    * ``gnd``: Google Normalized Distance (Cilibrasi & Vitanyi 2007,
      ES's cited source) with f(x)=matchset size, f(y)=bg_df,
      f(x,y)=fg_df, reported as the similarity ``exp(-ngd)`` (monotone
      in the paper's distance, so ranking is distance-faithful).

    The query's own terms trivially top the list and are excluded, as
    ES effectively does by interest.

    Plan: match set (distinct (query, doc)) joins back to the per-doc term
    stats — the one inherently match-set-sized shuffle (ES samples shard
    tops instead; at 100 TB pass a sampled match set in). Doc frequencies
    per (query, term) partial-aggregate before the window cut. Pass the
    index's precomputed ``term_df`` (term, df) as the background table —
    deriving it per call re-shuffles the whole stats table."""
    if heuristic not in ("jlh", "chi_square", "mutual_information", "gnd"):
        raise ValueError(f"unknown heuristic: {heuristic!r}")
    qterms = set(analyze_queries(queries, config))
    matches = _match_set(spark, term_stats, queries, config)
    n_match = (
        matches.groupBy("query_id").agg(F.count("*").alias("n_fg"))
    )
    fg = (
        matches.join(term_stats.select("doc_id", "term"), "doc_id")
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("fg_df"))  # (doc, term) stats rows unique
        .filter(F.col("fg_df") >= min_doc_count)
    )
    if term_df is not None:
        bg = term_df.select("term", F.col("df").alias("bg_df"))
    else:
        bg = term_stats.groupBy("term").agg(F.count("*").alias("bg_df"))
    qt = tiny_df(spark,
        sorted(qterms), "query_id int, term string"
    ).withColumn("_isq", F.lit(1))
    scored = (
        fg.join(F.broadcast(n_match), "query_id")
        .join(bg, "term")
        .join(F.broadcast(qt), ["query_id", "term"], "left")
        .filter(F.col("_isq").isNull())
        .withColumn("fg_pct", F.col("fg_df") / F.col("n_fg"))
        .withColumn("bg_pct", F.col("bg_df") / F.lit(float(n_docs)))
    )
    if heuristic == "jlh":
        score = (F.col("fg_pct") - F.col("bg_pct")) * (
            F.col("fg_pct") / F.col("bg_pct")
        )
    else:
        # 2x2 contingency cells (background is a superset, ES default):
        # a = term & in-set, b = term & out-set, c/d = no-term rows
        N = F.lit(float(n_docs))
        a = F.col("fg_df").cast("double")
        b = (F.col("bg_df") - F.col("fg_df")).cast("double")
        c = (F.col("n_fg") - F.col("fg_df")).cast("double")
        d = N - F.col("n_fg") - b
        # rate comparison by cross-multiplication: division-free, so a
        # match set covering the whole corpus (b+d = 0) stays defined
        # under ANSI mode (found by the 200k-doc validation run)
        sign = F.when(
            a * (b + d) >= b * (a + c), F.lit(1.0)
        ).otherwise(F.lit(-1.0))
        if heuristic == "chi_square":
            denom = (a + b) * (c + d) * (a + c) * (b + d)
            score = F.when(
                denom > 0,
                sign * N * F.pow(a * d - b * c, 2.0) / denom,
            ).otherwise(F.lit(0.0))
        elif heuristic == "mutual_information":
            def _cell(n_xy, p_x, p_y):
                p = n_xy / N
                return F.when(
                    n_xy > 0, p * F.log2(p / (p_x * p_y))
                ).otherwise(F.lit(0.0))

            p_t, p_nt = (a + b) / N, (c + d) / N
            p_in, p_out = (a + c) / N, (b + d) / N
            score = sign * (
                _cell(a, p_t, p_in) + _cell(b, p_t, p_out)
                + _cell(c, p_nt, p_in) + _cell(d, p_nt, p_out)
            )
        else:  # gnd
            fx = F.log(F.col("n_fg").cast("double"))
            fy = F.log(F.col("bg_df").cast("double"))
            fxy = F.log(a)
            denom = F.log(N) - F.least(fx, fy)
            # degenerate: term and match set both cover the corpus ->
            # distance 0 (identical) if co-occurrence is total, else
            # maximal distance (score 0)
            score = F.when(
                denom > 0,
                F.exp(-((F.greatest(fx, fy) - fxy) / denom)),
            ).when(F.greatest(fx, fy) == fxy, F.lit(1.0)).otherwise(
                F.lit(0.0)
            )
    scored = scored.withColumn("score", score)
    # rank on the 6-rounded score (term tiebreak): near-tied floats must
    # not flip rank order across engines (same policy as _rerank_rounded)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= size)
        .select(
            "query_id", "rank", "term",
            F.col("fg_df").cast("long").alias("fg_df"),
            F.col("bg_df").cast("long").alias("bg_df"),
            "score",
        )
    )


def significant_text_agg(
    docs: DataFrame,
    match_pred: str,
    text_col: str = "text",
    size: int = 10,
    min_doc_count: int = 3,
    exclude: list[str] | None = None,
    sample_fraction: float | None = None,
    seed: int = 42,
    filter_duplicate_text: bool = False,
    background_filter: str | None = None,
) -> DataFrame:
    """ES ``significant_text``: significant-terms straight over the RAW
    text of the match set (``match_pred``, a SQL predicate over the
    table) — no index required, ES's re-analyze-on-the-fly agg. Terms
    are whitespace tokens counted ONCE per doc (ES's per-doc dedup),
    scored with JLH ``(fg% - bg%) * (fg% / bg%)`` against the whole
    table as background; ``exclude`` drops the query's own terms (ES
    excludes by interest).

    ``filter_duplicate_text=True`` is ES's copy-paste defense: docs with
    byte-identical ``text_col`` count ONCE (the min-doc_id copy
    survives, deterministic). ES streams near-duplicate token sequences
    through a DedupTokenFilter; this is the exact-text variant of that
    defense — divergence documented, oracle replays it. The dedup
    shuffles only (md5, doc_id) pairs, never the text, and prunes BOTH
    sides so fg%/bg% stay comparable. ``background_filter`` (a SQL
    predicate) narrows the background set, ES's background_filter knob
    — bg_df and n_bg count only docs matching it (the foreground
    predicate is NOT auto-intersected, as in ES); terms absent from
    the background set drop out (JLH is undefined at bg_df=0).

    Plan: ONE tokenized projection feeds both sides — foreground =
    predicate-filtered docs (pushdown) -> distinct (doc, term) ->
    per-term counts; background = the same projection (optionally
    background-filtered). Both are partial-aggregated token-level
    shuffles; at 100 TB set ``sample_fraction`` to sample the
    FOREGROUND docs before exploding (ES's sampler-wrapped
    significant_text — the background stays exact, fg/bg percentages
    stay unbiased in expectation)."""
    if filter_duplicate_text:
        keep = (
            docs.groupBy(F.md5(F.col(text_col)).alias("_h"))
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        docs = docs.join(keep, "doc_id", "left_semi")
    bg_pred = F.expr(background_filter) if background_filter else F.lit(True)
    base = docs.select(
        "doc_id",
        F.expr(match_pred).alias("_m"),
        bg_pred.alias("_bg"),
        F.explode(
            F.array_distinct(F.split(F.col(text_col), " "))
        ).alias("term"),
    ).filter(F.col("term") != "")
    if sample_fraction is not None:
        fg_docs = (
            docs.filter(F.expr(match_pred)).select("doc_id")
            .sample(sample_fraction, seed=seed)
        )
        base_fg = base.join(fg_docs, "doc_id").filter(F.col("_m"))
        n_fg = fg_docs.count()
        n_bg = docs.filter(bg_pred).count()
    else:
        base_fg = base.filter(F.col("_m"))
        # both totals in ONE counting pass over the pruned projection
        g = docs.agg(
            F.count(F.when(bg_pred, 1)).alias("n_bg"),
            F.count(F.when(F.expr(match_pred), 1)).alias("n_fg"),
        ).collect()[0]
        n_fg, n_bg = int(g["n_fg"]), int(g["n_bg"])
    if n_fg == 0:
        return tiny_df(docs.sparkSession,
            [], "rank long, term string, fg_df long, bg_df long, score double"
        )
    fg = (
        base_fg.groupBy("term")
        .agg(F.count(F.lit(1)).alias("fg_df"))
        .filter(F.col("fg_df") >= min_doc_count)
    )
    bg = (
        base.filter(F.col("_bg"))
        .groupBy("term").agg(F.count(F.lit(1)).alias("bg_df"))
    )
    scored = fg.join(bg, "term")
    if exclude:
        scored = scored.filter(~F.col("term").isin(list(exclude)))
    scored = (
        scored.withColumn("fg_pct", F.col("fg_df") / F.lit(float(n_fg)))
        .withColumn("bg_pct", F.col("bg_df") / F.lit(float(n_bg)))
        .withColumn(
            "score",
            (F.col("fg_pct") - F.col("bg_pct"))
            * (F.col("fg_pct") / F.col("bg_pct")),
        )
    )
    # orderBy+limit = TakeOrderedAndProject over the reduced buckets
    # (the match-set vocabulary can be huge — never a global
    # single-partition window); the rank window then sees <= size rows
    topk = scored.orderBy(
        F.desc(F.round("score", 6)), F.asc("term")
    ).limit(size)
    w = Window.orderBy(F.desc(F.round("score", 6)), F.asc("term"))
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select(
            F.col("rank").cast("long").alias("rank"), "term",
            F.col("fg_df").cast("long").alias("fg_df"),
            F.col("bg_df").cast("long").alias("bg_df"),
            "score",
        )
    )


def search_facet_range(
    spark: SparkSession,
    term_stats: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    doc_meta: DataFrame,
    value_col: str,
    ranges: list[tuple[float | None, float | None]],
) -> DataFrame:
    """ES ``range`` aggregation: per query, doc counts per explicit
    bucket ``[from, to)`` (from inclusive, to exclusive, either side
    open-ended with None — the ES convention) over all matching docs.
    Buckets may overlap (a doc counts in every bucket it falls in, as ES
    ranges do); empty buckets are emitted with doc_count 0 so the bucket
    list is stable. One match-set join, one partial-aggregated groupBy;
    the bucket table is a literal broadcast dimension."""
    matches = _match_set(spark, term_stats, queries, config)
    bounds = tiny_df(spark,
        [
            (i, float(lo) if lo is not None else None,
             float(hi) if hi is not None else None)
            for i, (lo, hi) in enumerate(ranges)
        ],
        "bucket int, lo double, hi double",
    )
    vals = matches.join(doc_meta.select("doc_id", value_col), "doc_id")
    counted = (
        vals.join(
            F.broadcast(bounds),
            (F.col("lo").isNull() | (F.col(value_col) >= F.col("lo")))
            & (F.col("hi").isNull() | (F.col(value_col) < F.col("hi"))),
        )
        .groupBy("query_id", "bucket")
        .agg(F.count("*").alias("doc_count"))
    )
    # emit empty buckets: cross the per-query bucket list, left-join counts
    qids = matches.select("query_id").distinct()
    return (
        qids.crossJoin(F.broadcast(bounds))
        .join(counted, ["query_id", "bucket"], "left")
        .select(
            "query_id", "bucket", "lo", "hi",
            F.coalesce(F.col("doc_count"), F.lit(0)).alias("doc_count"),
        )
    )


def date_histogram_agg(
    rows: DataFrame,
    ts_col: str,
    interval: str = "day",
    group_col: str | None = None,
) -> DataFrame:
    """ES ``date_histogram`` with a calendar interval (``hour``/``day``/
    ``week``/``month``/``quarter``/``year``), optionally segmented by a
    keyword column (the nested terms+date_histogram shape). Pure
    ``date_trunc`` + partial-aggregated groupBy — scan speed at any
    scale; the bucket is returned as a formatted string so results are
    engine-portable (TIMESTAMP_NTZ inputs are cast first, per the
    events.parquet convention). Empty buckets are omitted
    (``min_doc_count: 1``)."""
    allowed = {"hour", "day", "week", "month", "quarter", "year"}
    if interval not in allowed:
        raise ValueError(f"interval must be one of {sorted(allowed)}")
    bucket = F.date_format(
        F.date_trunc(interval, F.col(ts_col).cast("timestamp")),
        "yyyy-MM-dd HH:mm:ss",
    ).alias("bucket")
    keys = ([F.col(group_col)] if group_col else []) + [bucket]
    return (
        rows.groupBy(*keys)
        .agg(F.count("*").alias("doc_count"))
    )


def cardinality_agg(
    rows: DataFrame,
    col: str,
    group_col: str | None = None,
    rsd: float = 0.005,
) -> DataFrame:
    """ES ``cardinality`` aggregation: approximate distinct count via
    HyperLogLog++ (``approx_count_distinct``) — mergeable sketch state,
    so the shuffle carries fixed-size registers instead of the distinct
    value set (the 100 TB shape; exact countDistinct shuffles every
    distinct value). ``rsd`` is the target relative standard deviation;
    the default 0.005 (~2^16 registers, measured exact for gate-scale
    cardinalities up to a few hundred, ±0.5% at larger n) keeps the
    per-group sketch buffer small — rsd 0.001 allocates ~16 MB per
    group buffer and was measured 8x slower for no gate-visible gain.
    The driver oracle compares against an exact DuckDB count at a
    cardinality inside the sketch's collision-free regime."""
    keys = [F.col(group_col)] if group_col else []
    agg = F.approx_count_distinct(col, rsd).alias("cardinality")
    return rows.groupBy(*keys).agg(agg) if keys else rows.agg(agg)


def stats_agg(
    rows: DataFrame,
    col: str,
    group_col: str | list[str] | None = None,
    extended: bool = False,
) -> DataFrame:
    """ES ``stats`` / ``extended_stats`` aggregation: count, min, max,
    avg, sum (+ population variance/stddev and sum of squares when
    ``extended``) over a numeric column, optionally per keyword group.
    ``group_col`` may be a LIST of columns — that is exactly ES's
    nested bucket chain (terms > date_histogram > stats and friends):
    every level of an ES sub-aggregation tree flattens to one composite
    grouping key, so the whole chain stays ONE partial-aggregated
    shuffle instead of ES's per-level reduce. All Spark built-ins."""
    c = F.col(col)
    aggs = [
        F.count(c).alias("count"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.avg(c).alias("avg"),
        F.sum(c).alias("sum"),
    ]
    if extended:
        aggs += [
            F.var_pop(c).alias("variance"),
            F.stddev_pop(c).alias("std_deviation"),
            F.sum(c * c).alias("sum_of_squares"),
        ]
    if group_col is None:
        keys = []
    elif isinstance(group_col, str):
        keys = [F.col(group_col)]
    else:
        keys = [F.col(g) for g in group_col]
    return rows.groupBy(*keys).agg(*aggs) if keys else rows.agg(*aggs)


def percentiles_agg(
    rows: DataFrame,
    col: str,
    percents: list[float],
    group_col: str | None = None,
) -> DataFrame:
    """ES ``percentiles`` aggregation. Spark's exact ``percentile``
    (linear interpolation between closest ranks — the same definition as
    ANSI ``percentile_cont``) rather than the t-digest ES uses, so the
    result is deterministic and oracle-comparable; at 100 TB swap in
    ``approx_percentile`` (mergeable sketch) with the same call shape.
    One aggregate computes the whole percent list; the array is exploded
    to (group, percent, value) rows."""
    pcts = [float(p) for p in percents]
    agg = F.percentile(F.col(col), F.array(*[F.lit(p) for p in pcts]))
    keys = [F.col(group_col)] if group_col else []
    out = rows.groupBy(*keys).agg(agg.alias("_vals")) if keys else rows.agg(
        agg.alias("_vals")
    )
    pairs = F.arrays_zip(
        F.array(*[F.lit(p) for p in pcts]).alias("percent"),
        F.col("_vals").alias("value"),
    )
    return out.select(
        *([group_col] if group_col else []),
        F.explode(pairs).alias("_p"),
    ).select(
        *([group_col] if group_col else []),
        F.col("_p.percent").alias("percent"),
        F.col("_p.value").alias("value"),
    )


def weighted_avg_agg(
    rows: DataFrame,
    value_col: str,
    weight_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """ES ``weighted_avg`` aggregation: sum(value*weight)/sum(weight),
    optionally per keyword group — a single partial-aggregated groupBy."""
    num = F.sum(F.col(value_col) * F.col(weight_col))
    den = F.sum(F.col(weight_col))
    keys = [F.col(group_col)] if group_col else []
    agg = (num / den).alias("weighted_avg")
    return rows.groupBy(*keys).agg(agg) if keys else rows.agg(agg)


def _filter_memberships(
    spark: SparkSession,
    term_stats: DataFrame,
    named_filters: dict[str, str],
    config: ComboConfig,
) -> DataFrame:
    """Distinct (name, doc_id) for docs matching >=1 analyzed term of each
    named filter query — the shared membership table behind ``filters``
    and ``adjacency_matrix``. Same literal-isin pushdown + broadcast-dim
    shape as _match_set."""
    names = sorted(named_filters)
    idx = {i: n for i, n in enumerate(names)}
    qrows = analyze_queries(
        [(i, named_filters[n]) for i, n in idx.items()], config
    )
    qterms = tiny_df(spark, qrows, "fid int, term string")
    name_dim = tiny_df(spark,
        [(i, n) for i, n in idx.items()], "fid int, name string"
    )
    return (
        term_stats.filter(F.col("term").isin(sorted({t for _, t in qrows})))
        .join(F.broadcast(qterms), "term")
        .join(F.broadcast(name_dim), "fid")
        .select("name", "doc_id")
        .distinct()
    )


def filters_agg(
    spark: SparkSession,
    term_stats: DataFrame,
    named_filters: dict[str, str],
    config: ComboConfig,
) -> DataFrame:
    """ES ``filters`` aggregation: one named bucket per filter query,
    counting docs that match it (a doc may land in several buckets).
    Empty buckets are emitted with 0 (ES keeps the declared bucket
    list stable)."""
    members = _filter_memberships(spark, term_stats, named_filters, config)
    counted = members.groupBy("name").agg(F.count("*").alias("doc_count"))
    names = tiny_df(spark,
        [(n,) for n in sorted(named_filters)], "name string"
    )
    # broadcast the counted side (left side of a left join can't build)
    return names.join(F.broadcast(counted), "name", "left").select(
        "name", F.coalesce(F.col("doc_count"), F.lit(0)).alias("doc_count")
    )


def adjacency_matrix_agg(
    spark: SparkSession,
    term_stats: DataFrame,
    named_filters: dict[str, str],
    config: ComboConfig,
) -> DataFrame:
    """ES ``adjacency_matrix`` aggregation: doc counts for every named
    filter AND every pairwise intersection (key ``a&b``, names in sorted
    order, as ES emits them). Empty intersections are omitted (ES
    behavior). The pair join shuffles the membership table on doc_id
    once; membership is distinct (name, doc) so output is bounded by
    n_filters² buckets."""
    # localCheckpoint (eager), not cache: the membership table feeds the
    # single-bucket counts AND the self-join; a persist with no
    # unpersist would accumulate executor blocks across a long-lived
    # session (same lifetime fix as querystring/functionscore)
    members = _filter_memberships(
        spark, term_stats, named_filters, config
    ).localCheckpoint(eager=True)
    singles = members.groupBy(F.col("name").alias("key")).agg(
        F.count("*").alias("doc_count")
    )
    a = members.alias("a")
    b = members.alias("b")
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("a.name") < F.col("b.name"))
        .groupBy(
            F.concat(F.col("a.name"), F.lit("&"), F.col("b.name")).alias("key")
        )
        .agg(F.count("*").alias("doc_count"))
    )
    return singles.unionByName(pairs)


#: bucket fan-out for per-group top-k (same rationale as boolean._rank_topk)
TOP_HITS_BUCKETS = 32


def top_hits_agg(
    doc_meta: DataFrame,
    group_col: str,
    sort_col: str,
    k: int = 3,
    ascending: bool = False,
) -> DataFrame:
    """ES ``top_hits`` sub-aggregation under a ``terms`` bucket: the top
    ``k`` docs per bucket ordered by ``sort_col`` (doc_id tiebreak).
    Two-stage exact top-k — per-(group, doc-hash-bucket) first so no
    single sort task sees a whole 100 TB group, then the global window
    over <= TOP_HITS_BUCKETS*k survivors per group."""
    direction = F.asc(sort_col) if ascending else F.desc(sort_col)
    bucket = F.pmod(F.hash("doc_id"), F.lit(TOP_HITS_BUCKETS))
    wb = Window.partitionBy(group_col, bucket).orderBy(
        direction, F.asc("doc_id")
    )
    pruned = (
        doc_meta.withColumn("_bn", F.row_number().over(wb))
        .filter(F.col("_bn") <= k)
        .drop("_bn")
    )
    w = Window.partitionBy(group_col).orderBy(direction, F.asc("doc_id"))
    return (
        pruned.withColumn("hit_rank", F.row_number().over(w))
        .filter(F.col("hit_rank") <= k)
        .select(group_col, "hit_rank", "doc_id", sort_col)
    )


def composite_agg(
    rows: DataFrame,
    sources: list[str],
    size: int = 10,
    after: tuple | None = None,
) -> DataFrame:
    """ES ``composite`` aggregation: multi-source buckets streamed in
    source-key order with ``after``-key pagination — THE way to page an
    unbounded bucket set (terms aggs truncate; composite walks them all).
    GroupBy on the source tuple, lexicographic ``> after`` filter, then
    sort+limit — Spark compiles that to TakeOrderedAndProject (per-
    partition partial top-N, no global sort), so a page costs one
    partial-agg shuffle regardless of total bucket count."""
    grouped = rows.groupBy(*sources).agg(F.count("*").alias("doc_count"))
    if after is not None:
        if len(after) != len(sources):
            raise ValueError("after key arity must match sources")
        pred = F.lit(False)
        for i in range(len(sources)):
            clause = F.col(sources[i]) > F.lit(after[i])
            for j in range(i):
                clause = clause & (F.col(sources[j]) == F.lit(after[j]))
            pred = pred | clause
        grouped = grouped.filter(pred)
    return grouped.orderBy(*[F.asc(c) for c in sources]).limit(size)


def matrix_stats_agg(rows: DataFrame, cols: list[str]) -> DataFrame:
    """ES ``matrix_stats`` aggregation: per ordered field pair (i <= j),
    row count, field means, population covariance and Pearson correlation
    (the diagonal carries variance / correlation 1). All Spark built-in
    aggregates in ONE partial-aggregated pass — the pair expansion is
    column-wise, not a data fan-out."""
    aggs = [F.count(F.col(cols[0])).alias("count")]
    for c in cols:
        aggs.append(F.avg(F.col(c)).alias(f"_mean_{c}"))
    for i, ca in enumerate(cols):
        for cb in cols[i:]:
            aggs.append(F.covar_pop(ca, cb).alias(f"_cov_{ca}_{cb}"))
            aggs.append(F.corr(ca, cb).alias(f"_cor_{ca}_{cb}"))
    one = rows.agg(*aggs)
    pair_rows = []
    for i, ca in enumerate(cols):
        for cb in cols[i:]:
            pair_rows.append(
                F.struct(
                    F.lit(ca).alias("col_a"),
                    F.lit(cb).alias("col_b"),
                    F.col("count").alias("count"),
                    F.col(f"_mean_{ca}").alias("mean_a"),
                    F.col(f"_mean_{cb}").alias("mean_b"),
                    F.col(f"_cov_{ca}_{cb}").alias("covariance"),
                    F.col(f"_cor_{ca}_{cb}").alias("correlation"),
                )
            )
    return one.select(F.explode(F.array(*pair_rows)).alias("_p")).select(
        "_p.col_a", "_p.col_b", "_p.count",
        "_p.mean_a", "_p.mean_b", "_p.covariance", "_p.correlation",
    )


def pipeline_aggs(
    buckets: DataFrame,
    metric_col: str,
    order_col: str,
    group_col: str | None = None,
    window: int = 3,
) -> DataFrame:
    """ES pipeline aggregations over a bucketed parent (e.g. a
    date_histogram): ``derivative`` (bucket-over-bucket delta),
    ``cumulative_sum``, and ``moving_fn`` avg over a trailing window of
    ``window`` buckets — each an ordered window function over the
    ALREADY-AGGREGATED bucket rows, so the window partition holds bucket
    counts (thousands), never raw events; this is exactly how ES chains
    them post-reduce. The first bucket's derivative is null (ES emits no
    derivative there)."""
    part = [group_col] if group_col else []
    w = Window.partitionBy(*part).orderBy(F.asc(order_col))
    mv = w.rowsBetween(-(window - 1), 0)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    return buckets.select(
        *part,
        order_col,
        metric_col,
        (F.col(metric_col) - F.lag(metric_col, 1).over(w)).alias("derivative"),
        F.sum(metric_col).over(cum).alias("cumulative_sum"),
        F.avg(metric_col).over(mv).alias("moving_avg"),
    )


def bucket_script_agg(
    rows: DataFrame,
    group_col: str,
    numerator_expr: str,
    denominator_expr: str,
    script: str = "num / den",
) -> DataFrame:
    """ES ``bucket_script`` pipeline aggregation: a per-bucket value
    computed from sibling metric aggregations (the canonical
    ratio-of-sums). ``numerator_expr``/``denominator_expr`` are SQL
    aggregate expressions evaluated per bucket; ``script`` combines the
    resulting ``num``/``den`` columns. One partial-aggregated groupBy —
    the script math is a per-bucket projection."""
    return (
        rows.groupBy(group_col)
        .agg(
            F.expr(numerator_expr).alias("num"),
            F.expr(denominator_expr).alias("den"),
        )
        .withColumn("value", F.expr(script))
        .select(group_col, "num", "den", "value")
    )


def percentile_ranks_agg(
    rows: DataFrame,
    col: str,
    values: list[float],
    group_col: str | None = None,
) -> DataFrame:
    """ES ``percentile_ranks`` aggregation: for each probe value, the
    fraction (0-100) of column values <= it — the inverse of
    percentiles. One aggregate pass computes all probes (a
    count-when per probe), partial-aggregated."""
    keys = [F.col(group_col)] if group_col else []
    aggs = [
        (F.sum(F.when(F.col(col) <= F.lit(float(v)), 1).otherwise(0))
         * 100.0 / F.count(F.col(col))).alias(f"_r{i}")
        for i, v in enumerate(values)
    ]
    out = rows.groupBy(*keys).agg(*aggs) if keys else rows.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(float(v)).alias("value"),
                F.col(f"_r{i}").alias("percentile_rank"),
            )
            for i, v in enumerate(values)
        ]
    )
    return out.select(
        *([group_col] if group_col else []), F.explode(pairs).alias("_p")
    ).select(
        *([group_col] if group_col else []),
        F.col("_p.value").alias("value"),
        F.col("_p.percentile_rank").alias("percentile_rank"),
    )


def rare_terms_agg(
    rows: DataFrame,
    col: str,
    max_doc_count: int = 1,
    group_col: str | None = None,
) -> DataFrame:
    """ES ``rare_terms`` aggregation: the LONG TAIL — values appearing
    in at most ``max_doc_count`` docs (the opposite cut of ``terms``,
    which surfaces the head). ES approximates with a CuckooFilter to
    bound memory; here one partial-aggregated groupBy is exact AND
    scale-safe: map-side combine collapses each value to one count per
    task before the shuffle, and the post-filter output is tiny by
    definition of the query."""
    if max_doc_count < 1:
        raise ValueError("max_doc_count must be >= 1")
    keys = ([F.col(group_col)] if group_col else []) + [F.col(col)]
    return (
        rows.groupBy(*keys)
        .agg(F.count("*").alias("doc_count"))
        .filter(F.col("doc_count") <= max_doc_count)
    )


AUTO_DH_LADDER = ["hour", "day", "month", "year"]


def auto_date_histogram_agg(
    rows: DataFrame,
    ts_col: str,
    target_buckets: int = 50,
    group_col: str | None = None,
) -> DataFrame:
    """ES ``auto_date_histogram``: pick the smallest calendar interval
    from hour -> day -> month -> year whose DISTINCT bucket count fits
    ``target_buckets``, then bucket with it (year is the fallback when
    nothing fits). The interval choice is ONE scalar aggregate pass
    (four countDistinct sketches over truncations — engine-replayable,
    no sampling); the result carries the chosen ``interval`` so callers
    see which resolution they got, as ES returns it."""
    if target_buckets < 1:
        raise ValueError("target_buckets must be >= 1")
    ts = F.col(ts_col).cast("timestamp")
    counts = rows.agg(
        *[
            F.countDistinct(F.date_trunc(iv, ts)).alias(iv)
            for iv in AUTO_DH_LADDER
        ]
    ).collect()[0]
    interval = AUTO_DH_LADDER[-1]
    for iv in AUTO_DH_LADDER:
        if int(counts[iv]) <= target_buckets:
            interval = iv
            break
    out = date_histogram_agg(
        rows, ts_col, interval=interval, group_col=group_col
    )
    return out.withColumn("interval", F.lit(interval))


def diversified_sampler_agg(
    hits: DataFrame,
    doc_meta: DataFrame,
    diversify_col: str,
    agg_col: str,
    max_docs_per_value: int = 1,
    shard_size: int = 100,
) -> DataFrame:
    """ES ``diversified_sampler`` + a terms/avg sub-aggregation: from a
    scored match set take the best ``shard_size`` hits per query AFTER
    capping each ``diversify_col`` value at ``max_docs_per_value``
    (kills the one-dominant-source skew before sub-aggregating), then
    aggregate the sample by ``agg_col``. Order is the engine's
    deterministic (rounded score desc, doc_id) rank, so the sample —
    and therefore the sub-agg — is reproducible cross-engine. Both
    row_number filters trigger WindowGroupLimit rank pushdown: each map
    task forwards at most max_docs_per_value (then shard_size) rows per
    partition key, so the shuffles carry samples, not match sets."""
    scored = hits.join(
        doc_meta, "doc_id"
    ).withColumn("_s6", F.round("score", 6))
    w_div = Window.partitionBy("query_id", diversify_col).orderBy(
        F.desc("_s6"), F.asc("doc_id")
    )
    w_top = Window.partitionBy("query_id").orderBy(
        F.desc("_s6"), F.asc("doc_id")
    )
    sample = (
        scored.withColumn("_dv", F.row_number().over(w_div))
        .filter(F.col("_dv") <= max_docs_per_value)
        .withColumn("_rk", F.row_number().over(w_top))
        .filter(F.col("_rk") <= shard_size)
    )
    return sample.groupBy("query_id", F.col(agg_col)).agg(
        F.count("*").alias("doc_count"),
        F.avg("_s6").alias("avg_score"),
    )


def sampler_agg(
    hits: DataFrame,
    doc_meta: DataFrame,
    agg_col: str,
    shard_size: int = 100,
) -> DataFrame:
    """ES ``sampler`` aggregation: sub-aggregate only the best
    ``shard_size`` hits per query (the cheap cousin of
    :func:`diversified_sampler_agg`, no per-value cap). Order is the
    engine's deterministic (rounded score desc, doc_id) rank; the
    row_number filter triggers WindowGroupLimit rank pushdown, so the
    shuffle carries at most ``shard_size`` rows per query per task."""
    scored = hits.join(doc_meta, "doc_id").withColumn(
        "_s6", F.round("score", 6)
    )
    w_top = Window.partitionBy("query_id").orderBy(
        F.desc("_s6"), F.asc("doc_id")
    )
    sample = scored.withColumn("_rk", F.row_number().over(w_top)).filter(
        F.col("_rk") <= shard_size
    )
    return sample.groupBy("query_id", F.col(agg_col)).agg(
        F.count("*").alias("doc_count"),
        F.avg("_s6").alias("avg_score"),
    )


def random_sampler_agg(
    df: DataFrame,
    probability: float,
    group_col: str,
    value_col: str,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """ES ``random_sampler`` aggregation: metrics over a Bernoulli
    sample of the table, with ``doc_count``/``sum`` scaled back by
    ``1/probability`` (ES reports sampled aggs in original-scale units;
    ``avg`` needs no rescale). The sample is the engine-portable keyed
    md5 filter from operators.sampling — a pure map-side predicate, so
    at 100 TB the scan reads everything once but the shuffle carries
    only ``probability`` of the rows; the SAME rows are picked on any
    cluster, making the agg reproducible and DuckDB-replayable."""
    from elasticsearch_analysis_combo_spark.operators.sampling import (
        hash_sample,
    )

    inv = 1.0 / probability
    return (
        hash_sample(df, probability, key_col=key_col, seed=seed)
        .groupBy(group_col)
        .agg(
            (F.count("*") * inv).alias("doc_count"),
            (F.sum(value_col) * inv).alias("sum_scaled"),
            F.avg(value_col).alias("avg_value"),
        )
    )


def terms_agg_sharded(
    df: DataFrame,
    col: str,
    size: int = 10,
    shard_size: int | None = None,
    n_shards: int = 8,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """ES ``terms`` aggregation the way a SHARDED cluster computes it,
    including ES's ``doc_count_error_upper_bound``: rows route to
    ``n_shards`` deterministic shards (portable md5 of ``key_col`` —
    the stand-in for ES's routing hash), each shard contributes only
    its local top ``shard_size`` values (default ``size*1.5+10``, ES's
    default), and the coordinator sums the reported counts. A value's
    error bound is the sum, over shards that did NOT report it, of that
    shard's smallest reported count (a shard that returned fewer than
    shard_size values returned everything, so it contributes 0) —
    exactly ES's accounting.

    This is the 100 TB terms-agg shape: the exact agg shuffles every
    distinct (value) group; the sharded form shuffles at most
    ``n_shards * shard_size`` rows past the per-shard partial top-k
    (WindowGroupLimit), and the error bound keeps the approximation
    honest. Deterministic routing makes the result engine-replayable.

    Returns (value, doc_count, doc_count_error_upper_bound) — top
    ``size`` by (doc_count desc, value)."""
    if shard_size is None:
        shard_size = int(size * 1.5) + 10
    from elasticsearch_analysis_combo_spark.operators.sampling import _u60

    shard = F.pmod(_u60(key_col, seed), F.lit(n_shards))
    per = (
        df.withColumn("_sh", shard)
        .groupBy("_sh", F.col(col).alias("value"))
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("_sh").orderBy(F.desc("cnt"), F.asc("value"))
    kept = per.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") <= shard_size
    )
    # a shard's worst-case missed count: its smallest REPORTED count,
    # but only when the shard was truncated (returned exactly
    # shard_size values)
    mins = kept.groupBy("_sh").agg(
        F.when(F.count("*") == shard_size, F.min("cnt"))
        .otherwise(F.lit(0)).alias("shard_min")
    )
    total_min = mins.agg(F.sum("shard_min").alias("_tot"))
    reported = kept.join(mins, "_sh").groupBy("value").agg(
        F.sum("cnt").alias("doc_count"),
        F.sum("shard_min").alias("_seen_min"),
    )
    w_top = Window.partitionBy(F.lit(1)).orderBy(
        F.desc("doc_count"), F.asc("value")
    )
    return (
        reported.crossJoin(F.broadcast(total_min))
        .withColumn(
            "doc_count_error_upper_bound",
            F.col("_tot") - F.col("_seen_min"),
        )
        .withColumn("_r", F.row_number().over(w_top))
        .filter(F.col("_r") <= size)
        .select("value", "doc_count", "doc_count_error_upper_bound")
    )


def ip_to_long(col) -> "F.Column":
    """Dotted-quad IPv4 string -> uint32-as-long, pure codegen (split +
    arithmetic; no UDF)."""
    part = lambda i: F.split(col, r"\.")[i].cast("long")  # noqa: E731
    return (
        part(0) * 16777216 + part(1) * 65536 + part(2) * 256 + part(3)
    )


def ip_range_agg(
    df: DataFrame,
    ip_col: str,
    ranges: list[tuple[str | None, str | None]],
) -> DataFrame:
    """ES ``ip_range`` aggregation: explicit [from, to) IPv4 buckets
    (open ends allowed, overlap allowed, empty buckets kept with count
    0 — the date_range contract on the IP axis). Addresses compare as
    uint32 integers via :func:`ip_to_long`; the bucket dimension is a
    broadcast literal array and the whole agg is ONE partial-aggregated
    groupBy."""
    import ipaddress

    def lit_ip(s):
        return int(ipaddress.IPv4Address(s))

    ip = ip_to_long(F.col(ip_col))
    aggs, keys = [], []
    for i, (lo, hi) in enumerate(ranges):
        keys.append(f"{lo or '*'}-{hi or '*'}")
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (ip >= lit_ip(lo))
        if hi is not None:
            cond = cond & (ip < lit_ip(hi))
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"_b{i}")
        )
    # ONE conditional-aggregation pass (map-side partials -> 1 row);
    # the row then unfolds to one output row per bucket, zeros kept
    row = df.agg(*aggs)
    out = row.select(F.explode(F.array(*[
        F.struct(
            F.lit(i).alias("bucket_idx"), F.lit(k).alias("key"),
            F.col(f"_b{i}").alias("doc_count"),
        )
        for i, k in enumerate(keys)
    ])).alias("b"))
    return out.select("b.bucket_idx", "b.key", "b.doc_count")


def frequent_item_sets_agg(
    df: DataFrame,
    items_col: str,
    min_support_docs: int = 3,
    size: int = 10,
    max_set_size: int = 2,
    id_col: str = "doc_id",
    max_items_per_doc: int | None = None,
) -> DataFrame:
    """ES ``frequent_item_sets`` aggregation (the log/market-basket
    miner), deterministic Apriori analogue for set sizes 1 and 2:
    items are the DISTINCT values of an array column per document,
    singletons below ``min_support_docs`` docs are pruned, and pairs
    are generated only FROM surviving singletons (the Apriori
    anti-monotone property — a pair can't be frequent if a member
    isn't), so the self-join explodes frequent items only, never the
    raw vocabulary. Returns (set_size, items sorted-array, doc_count),
    top ``size`` per set size by (doc_count desc, items). ES's version
    samples and approximates; this is exact at the same semantics.

    ``max_items_per_doc`` caps the frequent items each DOCUMENT
    contributes to pair generation — top-n by (global doc_count desc,
    item asc), deterministic — bounding the per-doc pair blowup at
    n^2/2: a pathological doc carrying 10k frequent tags would
    otherwise emit 5e7 pair rows into one skew cell. The analogue of
    ES's sampled semantics knob; singleton counts are never capped,
    and pair counts are exact whenever every doc holds <= n frequent
    items (pinned by tests)."""
    if max_set_size not in (1, 2):
        raise ValueError("max_set_size must be 1 or 2")
    if max_items_per_doc is not None and max_items_per_doc < 2:
        raise ValueError("max_items_per_doc must be >= 2")
    items = (
        df.select(F.col(id_col).alias("_d"),
                  F.explode(F.array_distinct(items_col)).alias("item"))
    )
    singles = (
        items.groupBy("item")
        .agg(F.count("*").alias("doc_count"))
        .filter(F.col("doc_count") >= min_support_docs)
    )
    w1 = Window.partitionBy(F.lit(1)).orderBy(
        F.desc("doc_count"), F.asc("item")
    )
    out = (
        singles.withColumn("_r", F.row_number().over(w1))
        .filter(F.col("_r") <= size)
        .select(
            F.lit(1).alias("set_size"),
            F.array("item").alias("items"),
            F.col("doc_count").cast("long").alias("doc_count"),
        )
    )
    if max_set_size == 2:
        freq = items.join(
            F.broadcast(singles.select("item", "doc_count")), "item"
        )
        if max_items_per_doc is not None:
            wd = Window.partitionBy("_d").orderBy(
                F.desc("doc_count"), F.asc("item")
            )
            freq = (
                freq.withColumn("_dr", F.row_number().over(wd))
                .filter(F.col("_dr") <= max_items_per_doc)
            )
        freq = freq.select("_d", "item")
        a = freq.select("_d", F.col("item").alias("a"))
        b_ = freq.select("_d", F.col("item").alias("b"))
        pairs = (
            a.join(b_, "_d")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count("*").alias("doc_count"))
            .filter(F.col("doc_count") >= min_support_docs)
        )
        w2 = Window.partitionBy(F.lit(1)).orderBy(
            F.desc("doc_count"), F.asc("a"), F.asc("b")
        )
        out = out.unionByName(
            pairs.withColumn("_r", F.row_number().over(w2))
            .filter(F.col("_r") <= size)
            .select(
                F.lit(2).alias("set_size"),
                F.array("a", "b").alias("items"),
                F.col("doc_count").cast("long").alias("doc_count"),
            )
        )
    return out


def with_runtime_field(df: DataFrame, name: str, sql_expr: str) -> DataFrame:
    """ES runtime mappings (runtime fields): a query-time derived field
    defined by an expression, immediately usable by every agg/filter in
    this module — ES evaluates a Painless script per doc at query time;
    here the expression compiles into the plan (whole-stage codegen)
    and costs a projection, with pushdown-eligible predicates on top.
    JSON extraction (``get_json_object``) is the canonical use."""
    return df.withColumn(name, F.expr(sql_expr))


def search_facet_histogram(
    spark: SparkSession,
    term_stats: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    doc_meta: DataFrame,
    value_col: str,
    interval: float,
) -> DataFrame:
    """ES ``histogram`` aggregation: fixed-interval buckets
    (``floor(value / interval) * interval``) over all matching docs.
    Empty buckets are omitted (ES ``min_doc_count: 1``)."""
    matches = _match_set(spark, term_stats, queries, config)
    return (
        matches.join(doc_meta.select("doc_id", value_col), "doc_id")
        .withColumn(
            "bucket",
            F.floor(F.col(value_col) / F.lit(interval)) * F.lit(interval),
        )
        .groupBy("query_id", "bucket")
        .agg(F.count("*").alias("doc_count"))
        .select(
            "query_id",
            F.col("bucket").cast("double").alias("bucket"),
            "doc_count",
        )
    )


def terms_agg_ordered(
    rows: DataFrame,
    key_col: str,
    metric_exprs: dict[str, str],
    order_by: str,
    size: int = 10,
    ascending: bool = False,
    min_doc_count: int = 1,
) -> DataFrame:
    """ES ``terms`` aggregation with ``order`` by a SUB-AGGREGATION
    metric (e.g. ``"order": {"avg_price": "desc"}``) instead of
    doc_count: buckets rank by one of their own computed metrics.
    ``metric_exprs`` maps output name -> SQL aggregate expression;
    ``order_by`` names the ranking metric (or ``"doc_count"`` /
    ``"_key"``, the ES built-in orders).

    Plan: ONE partial-aggregated groupBy computes doc_count + every
    metric, then the global top-``size`` is an ordered limit over the
    already-reduced bucket set (TakeOrderedAndProject) — the ranking
    never sees row-level data, so a billion docs with a thousand keys
    rank over a thousand rows. Order metric rounds to 6 before
    comparison (key-ascending tiebreak) so near-tied floats can't flip
    cross-engine rank order."""
    aggs = [F.count(F.lit(1)).alias("doc_count")] + [
        F.expr(expr).alias(name) for name, expr in metric_exprs.items()
    ]
    buckets = (
        rows.groupBy(F.col(key_col).alias("key"))
        .agg(*aggs)
        .filter(F.col("doc_count") >= min_doc_count)
    )
    if order_by == "_key":
        order = [F.asc("key") if ascending else F.desc("key")]
    else:
        ocol = F.round(F.col(order_by), 6) if order_by in metric_exprs \
            else F.col(order_by)
        order = [ocol.asc() if ascending else ocol.desc(), F.asc("key")]
    topk = buckets.orderBy(*order).limit(size)
    w = Window.orderBy(*order)
    return topk.withColumn("rank", F.row_number().over(w)).select(
        F.col("rank").cast("long").alias("rank"),
        "key",
        F.col("doc_count").cast("long").alias("doc_count"),
        *metric_exprs.keys(),
    )


def histogram_bounded_agg(
    rows: DataFrame,
    value_col: str,
    interval: float,
    extended_bounds: tuple[float, float] | None = None,
    min_doc_count: int = 0,
    group_col: str | None = None,
) -> DataFrame:
    """ES ``histogram`` with ``extended_bounds`` + ``min_doc_count: 0``:
    emits EMPTY buckets across the union of the data span and the
    requested bounds (dashboards need the zero bars). With
    ``min_doc_count >= 1`` and no bounds this degrades to the plain
    histogram.

    Plan: row-level data reduces ONCE to (group, bucket_idx, count);
    the axis is generated from the per-group min/max indices (widened
    by the bounds) via ``sequence`` + explode — a bucket-count-sized
    table, never row-scale — then left-joins the counts. Null values
    are excluded (ES drops docs missing the field unless ``missing``
    maps them)."""
    keys = [F.col(group_col).alias("grp")] if group_col else []
    key_names = ["grp"] if group_col else []
    idx = F.floor(F.col(value_col) / F.lit(float(interval))).alias("_idx")
    counts = (
        rows.filter(F.col(value_col).isNotNull())
        .select(*keys, idx)
        .groupBy(*key_names, "_idx")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    lo = F.min("_idx")
    hi = F.max("_idx")
    if extended_bounds is not None:
        import math

        lo = F.least(lo, F.lit(int(math.floor(extended_bounds[0] / interval))))
        hi = F.greatest(
            hi, F.lit(int(math.floor(extended_bounds[1] / interval)))
        )
    span = counts.groupBy(*key_names).agg(lo.alias("_lo"), hi.alias("_hi"))
    axis = span.select(
        *key_names,
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("_idx"),
    )
    out = (
        axis.join(counts, key_names + ["_idx"], "left")
        .withColumn("doc_count", F.coalesce("doc_count", F.lit(0)))
        .filter(F.col("doc_count") >= min_doc_count)
        .withColumn(
            "bucket", (F.col("_idx") * F.lit(float(interval))).cast("double")
        )
    )
    return out.select(
        *key_names, "bucket", F.col("doc_count").cast("long").alias("doc_count")
    )


def sibling_bucket_stats(
    buckets: DataFrame,
    metric_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """ES sibling pipeline aggregations ``avg_bucket`` / ``min_bucket`` /
    ``max_bucket`` / ``sum_bucket`` / ``stats_bucket`` in one pass:
    reduce an ALREADY-bucketed parent's metric across its buckets to a
    single row (per outer group). Input rows are bucket counts
    (thousands), never raw events — the reduce is effectively free, and
    at 100 TB the expensive part remains the parent bucketing, which is
    one partial-aggregated shuffle."""
    keys = [F.col(group_col)] if group_col else []
    c = F.col(metric_col)
    aggs = [
        F.count(c).alias("bucket_count"),
        F.min(c).alias("min_bucket"),
        F.max(c).alias("max_bucket"),
        F.avg(c).alias("avg_bucket"),
        F.sum(c).alias("sum_bucket"),
    ]
    return buckets.groupBy(*keys).agg(*aggs) if keys else buckets.agg(*aggs)


def percentiles_bucket_agg(
    buckets: DataFrame,
    metric_col: str,
    percents: list[float],
    group_col: str | None = None,
) -> DataFrame:
    """ES ``percentiles_bucket`` sibling pipeline aggregation:
    percentiles of a parent aggregation's bucket metric across its
    buckets (per outer group), ES-style percents in [0, 100]. ES
    computes these EXACTLY (a plain sort of the bucket values, unlike
    the t-digest `percentiles` metric agg) — so the exact
    linear-interpolation :func:`percentiles_agg` is the faithful
    kernel, not a stand-in. Input rows are already-reduced bucket rows
    (thousands), so the exact quantile is effectively free; at 100 TB
    the cost remains the parent bucketing's one partial-aggregated
    shuffle. Emits (group?, percent, value) with ES-unit percents."""
    out = percentiles_agg(
        buckets, metric_col, [float(p) / 100.0 for p in percents],
        group_col=group_col,
    )
    return out.withColumn("percent", F.round(F.col("percent") * 100.0, 6))


def serial_diff_agg(
    buckets: DataFrame,
    metric_col: str,
    order_col: str,
    lag: int = 1,
    group_col: str | None = None,
) -> DataFrame:
    """ES ``serial_diff`` pipeline aggregation: metric minus the metric
    ``lag`` buckets earlier in bucket order (lag=1 is the derivative;
    larger lags deseasonalize). The first ``lag`` buckets emit null,
    exactly as ES does. Ordered window over bucket rows only."""
    part = [group_col] if group_col else []
    w = Window.partitionBy(*part).orderBy(F.asc(order_col))
    return buckets.withColumn(
        "serial_diff", F.col(metric_col) - F.lag(metric_col, lag).over(w)
    )


def bucket_selector_agg(buckets: DataFrame, predicate_sql: str) -> DataFrame:
    """ES ``bucket_selector`` pipeline aggregation: keep only buckets
    whose metrics satisfy a per-bucket script — a plain Catalyst filter
    over the already-reduced bucket rows (pushes past any subsequent
    window/sort the caller chains)."""
    return buckets.filter(F.expr(predicate_sql))


def bucket_sort_agg(
    buckets: DataFrame,
    sort_col: str,
    desc: bool = True,
    size: int = 10,
    from_: int = 0,
    group_col: str | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """ES ``bucket_sort`` pipeline aggregation: order buckets by a
    metric and truncate to [from, from+size) — per outer group when
    ``group_col`` is set. Emits ``bucket_rank`` (1-based position in
    the sort order). ``tiebreak_col`` makes the order total so the cut
    is deterministic cross-engine. Spark turns the rank-filter window
    into WindowGroupLimit, so each task retains only from+size rows."""
    part = [group_col] if group_col else []
    order = [F.desc(sort_col) if desc else F.asc(sort_col)]
    if tiebreak_col is not None:
        order.append(F.asc(tiebreak_col))
    w = Window.partitionBy(*part).orderBy(*order)
    return (
        buckets.withColumn("bucket_rank", F.row_number().over(w))
        .filter(
            (F.col("bucket_rank") > from_)
            & (F.col("bucket_rank") <= from_ + size)
        )
    )


def string_stats_agg(
    rows: DataFrame,
    col: str,
    group_col: str | None = None,
) -> DataFrame:
    """ES ``string_stats`` aggregation: count, min/max/avg length, and
    Shannon entropy (bits per character) of the bucket's character
    distribution. Lengths are one partial-aggregated pass; entropy is
    an explode to single characters + two more partial aggs, computed
    as ``log2(N) - sum(n_c*log2(n_c))/N`` so no per-character division
    happens before the final reduce. All JVM built-ins — the explode is
    the only data amplification (xN chars), the same cost ES pays
    scanning the strings."""
    keys = [F.col(group_col)] if group_col else []
    names = [group_col] if group_col else []
    c = F.col(col)
    base = (
        rows.groupBy(*keys).agg(
            F.count(c).alias("count"),
            F.min(F.length(c)).alias("min_length"),
            F.max(F.length(c)).alias("max_length"),
            F.avg(F.length(c)).alias("avg_length"),
        )
        if keys
        else rows.agg(
            F.count(c).alias("count"),
            F.min(F.length(c)).alias("min_length"),
            F.max(F.length(c)).alias("max_length"),
            F.avg(F.length(c)).alias("avg_length"),
        )
    )
    ch = rows.select(
        *keys, F.explode(F.split(c, "")).alias("_ch")
    ).filter(F.length("_ch") == 1)
    dist = ch.groupBy(*keys, F.col("_ch")).agg(F.count("*").alias("_n"))
    egrp = dist.groupBy(*keys) if keys else dist.groupBy()
    ent = egrp.agg(
        (
            F.log2(F.sum("_n"))
            - F.sum(F.col("_n") * F.log2("_n")) / F.sum("_n")
        ).alias("entropy")
    )
    if keys:
        return base.join(ent, names, "left")
    return base.crossJoin(ent)


def median_abs_deviation_agg(
    rows: DataFrame,
    col: str,
    group_col: str | None = None,
) -> DataFrame:
    """ES ``median_absolute_deviation`` aggregation:
    ``median(|x - median(x)|)``. ES computes both medians on a t-digest
    sketch; here both are Spark's exact interpolated ``percentile``
    (ANSI percentile_cont), deterministic and oracle-comparable — at
    100 TB swap ``approx_percentile`` with the same call shape. Two
    partial-aggregated passes; the per-group median rejoins the rows as
    a broadcast dim."""
    keys = [F.col(group_col)] if group_col else []
    names = [group_col] if group_col else []
    med = (
        rows.groupBy(*keys).agg(
            F.percentile(F.col(col), F.lit(0.5)).alias("_med")
        )
        if keys
        else rows.agg(F.percentile(F.col(col), F.lit(0.5)).alias("_med"))
    )
    joined = (
        rows.join(F.broadcast(med), names)
        if keys
        else rows.crossJoin(F.broadcast(med))
    )
    out = joined.groupBy(*keys) if keys else joined.groupBy()
    return out.agg(
        F.first("_med").alias("median"),
        F.percentile(F.abs(F.col(col) - F.col("_med")), F.lit(0.5)).alias(
            "mad"
        ),
    )


def missing_agg(
    rows: DataFrame,
    col: str,
    group_col: str | None = None,
) -> DataFrame:
    """ES ``missing`` aggregation: count of docs with no value for the
    field (null), per outer group — one partial-aggregated count-when."""
    keys = [F.col(group_col)] if group_col else []
    agg = F.sum(
        F.when(F.col(col).isNull(), 1).otherwise(0)
    ).alias("doc_count")
    return rows.groupBy(*keys).agg(agg) if keys else rows.agg(agg)


def global_agg(rows: DataFrame, metric_exprs: dict[str, str]) -> DataFrame:
    """ES ``global`` aggregation: metrics over the WHOLE table,
    escaping any query/filter context the caller's bucket tree is
    scoped to — the caller passes the unfiltered source, this computes
    the named SQL aggregate expressions in one reduce."""
    return rows.agg(
        *[F.expr(expr).alias(name) for name, expr in metric_exprs.items()]
    )


def multi_terms_agg(
    rows: DataFrame,
    cols: list[str],
    size: int = 10,
    min_doc_count: int = 1,
) -> DataFrame:
    """ES ``multi_terms`` aggregation: top-``size`` COMPOSITE keys by
    doc count (the terms agg over a tuple of fields). One
    partial-aggregated groupBy over the composite key; the global top-N
    is a single ordered limit on the already-reduced bucket set, so no
    second shuffle of row data."""
    out = (
        rows.groupBy(*[F.col(c) for c in cols])
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .filter(F.col("doc_count") >= min_doc_count)
    )
    return out.orderBy(
        F.desc("doc_count"), *[F.asc(c) for c in cols]
    ).limit(size)


def top_metrics_agg(
    rows: DataFrame,
    sort_col: str,
    metric_cols: list[str],
    group_col: str | None = None,
    size: int = 1,
    ascending: bool = False,
) -> DataFrame:
    """ES ``top_metrics`` aggregation: the metric column values from the
    row(s) with the largest (or smallest) ``sort_col``, per group — a
    rank-limited window (WindowGroupLimit pushes the limit into the
    sort, so no full per-group materialization). Ties break on the sort
    value only, deterministically via the metric columns."""
    order = [
        F.asc(sort_col) if ascending else F.desc(sort_col),
        *[F.asc(c) for c in metric_cols],
    ]
    w = Window.partitionBy(
        *([group_col] if group_col else [])
    ).orderBy(*order)
    return (
        rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= size)
        .select(
            *([group_col] if group_col else []),
            F.col("_rn").alias("rank"),
            F.col(sort_col).alias("sort_value"),
            *metric_cols,
        )
    )


def t_test_agg(
    rows: DataFrame,
    col: str,
    filter_a: str,
    filter_b: str,
    group_col: str | None = None,
) -> DataFrame:
    """ES ``t_test`` aggregation (heteroscedastic / Welch's, the ES
    default): the t statistic between the populations selected by two
    SQL predicates over the same table. Both populations reduce in ONE
    partial-aggregated pass (conditional aggregates), so adding the
    second filter costs no extra scan or shuffle."""
    a, b = F.expr(filter_a), F.expr(filter_b)
    c = F.col(col)
    ca, cb = F.when(a, c), F.when(b, c)
    keys = [F.col(group_col)] if group_col else []
    aggs = [
        F.count(ca).alias("_na"), F.avg(ca).alias("_ma"),
        F.var_samp(ca).alias("_va"),
        F.count(cb).alias("_nb"), F.avg(cb).alias("_mb"),
        F.var_samp(cb).alias("_vb"),
    ]
    base = rows.groupBy(*keys).agg(*aggs) if keys else rows.agg(*aggs)
    se = F.sqrt(
        F.col("_va") / F.col("_na") + F.col("_vb") / F.col("_nb")
    )
    return base.select(
        *([group_col] if group_col else []),
        F.col("_na").alias("n_a"),
        F.col("_nb").alias("n_b"),
        ((F.col("_ma") - F.col("_mb")) / se).alias("t_value"),
    )


def boxplot_agg(
    rows: DataFrame,
    col: str,
    group_col: str | None = None,
) -> DataFrame:
    """ES ``boxplot`` aggregation: min, q1, q2, q3, max per group. Exact
    ``percentile`` (ANSI percentile_cont interpolation) for deterministic
    oracle parity — at 100 TB swap ``approx_percentile`` (mergeable
    t-digest-style sketch, ES's own accuracy class) with the same shape.
    One aggregate computes the whole five-number summary."""
    c = F.col(col)
    q = F.percentile(c, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    keys = [F.col(group_col)] if group_col else []
    aggs = [
        F.min(c).alias("min"), F.max(c).alias("max"), q.alias("_q"),
    ]
    base = rows.groupBy(*keys).agg(*aggs) if keys else rows.agg(*aggs)
    return base.select(
        *([group_col] if group_col else []),
        "min",
        F.col("_q")[0].alias("q1"),
        F.col("_q")[1].alias("q2"),
        F.col("_q")[2].alias("q3"),
        "max",
    )


def rate_agg(
    rows: DataFrame,
    ts_col: str,
    bucket_interval: str,
    rate_unit_seconds: float,
    value_col: str | None = None,
    group_col: str | None = None,
) -> DataFrame:
    """ES ``rate`` aggregation inside a date_histogram: per-bucket
    count (or sum of ``value_col``) normalized to a rate per
    ``rate_unit_seconds`` (e.g. 3600 for per-hour rates out of daily
    buckets). Bucket seconds come from the interval literal, so the
    whole thing stays one partial-aggregated groupBy plus a map-side
    division."""
    interval_s = {
        "hour": 3600.0, "day": 86400.0, "week": 604800.0,
    }.get(bucket_interval)
    if interval_s is None:
        raise ValueError(f"unsupported interval: {bucket_interval}")
    bucket = F.date_trunc(bucket_interval, F.col(ts_col)).alias("bucket")
    metric = (
        F.sum(F.col(value_col)) if value_col else F.count(F.lit(1))
    ).cast("double")
    keys = ([F.col(group_col)] if group_col else []) + [bucket]
    return rows.groupBy(*keys).agg(
        (metric * F.lit(rate_unit_seconds / interval_s)).alias("rate")
    )


def normalize_agg(
    buckets: DataFrame,
    metric_col: str,
    method: str = "rescale_0_1",
    group_col: str | None = None,
) -> DataFrame:
    """ES ``normalize`` pipeline aggregation: rescale a sibling metric
    across the bucket set. Methods: ``rescale_0_1``
    ((x-min)/(max-min)), ``percent_of_sum`` (x/sum),
    ``z_score`` ((x-mean)/population stdev), ``softmax``
    (exp(x)/sum(exp(x))). Unbounded window over ALREADY-REDUCED bucket
    rows (thousands, never raw events); a constant metric yields null
    for rescale/z_score, as ES emits when the denominator is 0. Values
    round to 6dp for cross-engine reproducibility."""
    part = [group_col] if group_col else []
    # no orderBy: an unordered window aggregates over the whole partition
    w = Window.partitionBy(*part)
    x = F.col(metric_col)
    if method == "rescale_0_1":
        rng = F.max(x).over(w) - F.min(x).over(w)
        val = F.when(rng != 0, (x - F.min(x).over(w)) / rng)
    elif method == "percent_of_sum":
        val = x / F.sum(x).over(w)
    elif method == "z_score":
        sd = F.stddev_pop(x).over(w)
        val = F.when(sd != 0, (x - F.avg(x).over(w)) / sd)
    elif method == "softmax":
        val = F.exp(x) / F.sum(F.exp(x)).over(w)
    else:
        raise ValueError(f"unknown normalize method {method!r}")
    return buckets.withColumn("normalized", F.round(val, 6))


def cumulative_cardinality_agg(
    rows: DataFrame,
    bucket_col: str,
    key_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """ES ``cumulative_cardinality`` pipeline aggregation (the
    "new users per day / total users to date" question): per ordered
    bucket, how many DISTINCT keys have appeared in any bucket up to and
    including it. Exact, and cheaper than a per-bucket distinct-union:
    each key reduces to its FIRST bucket (one groupBy on the key), new
    arrivals aggregate per bucket, and a cumulative window over the
    bucket spine (every bucket present in ``rows``, including ones with
    no new keys) finishes it — the window sees bucket counts, never
    keys. Emits ``new_keys`` (ES's derivative view) + ``cumulative_cardinality``."""
    part = [group_col] if group_col else []
    first_seen = rows.groupBy(*part, F.col(key_col).alias("_k")).agg(
        F.min(bucket_col).alias(bucket_col)
    )
    news = first_seen.groupBy(*part, bucket_col).agg(
        F.count("*").alias("new_keys")
    )
    spine = rows.select(*part, bucket_col).distinct()
    w = (
        Window.partitionBy(*part)
        .orderBy(F.asc(bucket_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = spine.join(news, [*part, bucket_col], "left").withColumn(
        "new_keys", F.coalesce(F.col("new_keys"), F.lit(0)).cast("long")
    )
    return joined.withColumn(
        "cumulative_cardinality", F.sum("new_keys").over(w).cast("long")
    )


def moving_percentiles_agg(
    buckets: DataFrame,
    metric_col: str,
    order_col: str,
    window: int = 5,
    percents: list[float] | None = None,
    group_col: str | None = None,
) -> DataFrame:
    """ES ``moving_percentiles`` pipeline aggregation: exact continuous
    percentiles of the metric over a trailing window of ``window``
    buckets (current bucket inclusive, partial leading windows shrink —
    ES's shift=0 default). Linear interpolation at rank p/100*(n-1),
    the quantile_cont convention, so any SQL engine replays it. The
    window holds bucket rows only; the per-row sort is over <= window
    values."""
    percents = [50.0, 90.0] if percents is None else percents
    part = [group_col] if group_col else []
    w = (
        Window.partitionBy(*part)
        .orderBy(F.asc(order_col))
        .rowsBetween(-(window - 1), 0)
    )
    arr = F.array_sort(F.collect_list(F.col(metric_col)).over(w))
    out = buckets.withColumn("_arr", arr)
    n = F.size(F.col("_arr"))
    for p in percents:
        rank = F.lit(float(p) / 100.0) * (n - 1).cast("double")
        lo = F.floor(rank).cast("int")
        frac = rank - lo
        val = (
            F.element_at(F.col("_arr"), lo + 1) * (1.0 - frac)
            + F.element_at(
                F.col("_arr"), F.least(lo + 2, n)
            ) * frac
        )
        name = f"p{p:g}".replace(".", "_")
        out = out.withColumn(name, F.round(val, 6))
    return out.drop("_arr")


def scripted_metric_agg(
    rows: DataFrame,
    group_col: str,
    map_partial,
    reduce_states,
    state_schema: str,
    value_name: str = "value",
    value_type: str = "double",
) -> DataFrame:
    """ES ``scripted_metric`` aggregation, Spark-shaped: ES runs
    init/map per shard, combine per shard, reduce on the coordinator;
    here ``map_partial(pandas.DataFrame) -> dict`` plays init+map+combine
    over each PARTITION's slice of each bucket (Arrow-batched, map-side
    — the full rows never shuffle), the partial states (``state_schema``
    struct fields) shuffle instead, and ``reduce_states(pandas.DataFrame
    of states) -> scalar`` plays the reduce per bucket. At 100 TB the
    shuffle carries O(partitions x buckets) state rows, exactly the
    scripted-metric contract. Scripts are Python callables rather than
    Painless — deterministic callables keep the result engine-replayable.
    """
    import pandas as pd

    gtype = rows.schema[group_col].dataType.simpleString()
    partial_schema = f"{group_col} {gtype}, {state_schema}"

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for g, sub in pdf.groupby(group_col, sort=False):
                state = dict(map_partial(sub))
                state[group_col] = g
                out.append(state)
            yield pd.DataFrame(out)

    states = rows.mapInPandas(partials, schema=partial_schema)

    def red(key, pdf):
        return pd.DataFrame({group_col: [key[0]],
                             value_name: [reduce_states(pdf)]})

    return states.groupBy(group_col).applyInPandas(
        red, schema=f"{group_col} {gtype}, {value_name} {value_type}"
    )


def date_range_agg(
    rows: DataFrame,
    ts_col: str,
    ranges: list[tuple[str | None, str | None]],
    group_col: str | None = None,
) -> DataFrame:
    """ES ``date_range`` aggregation: explicit ``[from, to)`` timestamp
    buckets (from inclusive, to exclusive, either side open-ended with
    None), overlapping allowed, empty buckets emitted with doc_count 0 —
    the search_facet_range contract on a time axis. The bucket table is
    a broadcast literal dimension; one partial-aggregated groupBy."""
    spark = rows.sparkSession
    bounds = tiny_df(spark,
        [(i, lo, hi) for i, (lo, hi) in enumerate(ranges)],
        "bucket int, lo string, hi string",
    ).select(
        "bucket",
        F.col("lo").cast("timestamp").alias("lo"),
        F.col("hi").cast("timestamp").alias("hi"),
    )
    ts = F.col(ts_col).cast("timestamp")
    keys = [F.col(group_col)] if group_col else []
    counted = (
        rows.join(
            F.broadcast(bounds),
            (F.col("lo").isNull() | (ts >= F.col("lo")))
            & (F.col("hi").isNull() | (ts < F.col("hi"))),
        )
        .groupBy(*keys, F.col("bucket"))
        .agg(F.count("*").alias("doc_count"))
    )
    groups = (
        rows.select(group_col).distinct() if group_col
        else spark.range(1).select(F.lit(0).alias("_g"))
    )
    join_keys = ([group_col] if group_col else []) + ["bucket"]
    out_cols = ([group_col] if group_col else []) + [
        "bucket",
        F.date_format("lo", "yyyy-MM-dd HH:mm:ss").alias("from_ts"),
        F.date_format("hi", "yyyy-MM-dd HH:mm:ss").alias("to_ts"),
        F.coalesce(F.col("doc_count"), F.lit(0)).alias("doc_count"),
    ]
    return (
        groups.crossJoin(F.broadcast(bounds))
        .join(counted, join_keys, "left")
        .select(*out_cols)
    )


def variable_width_histogram_agg(
    rows: DataFrame,
    col: str,
    buckets: int = 10,
) -> DataFrame:
    """ES ``variable_width_histogram``: dynamic-width 1D clustering of a
    numeric field. ES's version is approximate and shard-order-dependent
    (its docs say so); this is the DETERMINISTIC analogue — split the
    sorted distinct-value axis at the ``buckets - 1`` largest gaps
    (ties broken by lower value), which is the exact 1D k-cluster
    objective for complete-linkage. Emits per cluster: min, max,
    centroid (avg) and doc_count, bucket-numbered left to right.

    Shape: the gap scan runs over the DISTINCT value set (one global
    sort window over distinct values — bounded by value cardinality,
    not row count; pre-quantize continuous data to keep it small). The
    (buckets-1) boundaries then ride as ONE collected array literal into
    a map-only assignment pass — rows never shuffle for assignment,
    only for the final per-bucket aggregation."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1: {buckets}")
    from pyspark.sql import Window

    v = rows.select(F.col(col).alias("_v")).distinct()
    w = Window.orderBy("_v")
    gaps = (
        v.withColumn("_gap", F.col("_v") - F.lag("_v").over(w))
        .filter(F.col("_gap").isNotNull())
    )
    # a cluster STARTS at each chosen boundary value
    bnd = [
        r._v
        for r in gaps.orderBy(F.desc("_gap"), F.asc("_v"))
        .limit(buckets - 1).collect()
    ] if buckets > 1 else []
    if bnd:
        bnd_arr = F.array(*[F.lit(float(b)) for b in sorted(bnd)])
        bucket = F.size(F.filter(bnd_arr, lambda b: b <= F.col(col)))
    else:  # fewer distinct values than buckets, or buckets == 1
        bucket = F.lit(0)
    assigned = rows.select(
        F.col(col).alias("_v"), bucket.alias("bucket"),
    )
    return (
        assigned.groupBy("bucket")
        .agg(
            F.min("_v").alias("min"),
            F.max("_v").alias("max"),
            F.avg("_v").alias("centroid"),
            F.count("*").alias("doc_count"),
        )
    )


def categorize_text_agg(
    rows: DataFrame,
    text_col: str,
    max_tokens: int = 10,
    group_col: str | None = None,
) -> DataFrame:
    """ES ML ``categorize_text``: cluster semi-structured log messages
    by their token pattern. ES drains messages through a token tree
    dropping numeric/variable parts; the deterministic analogue here:
    the category key is the first ``max_tokens`` lowercased tokens that
    contain NO digit (timestamps, ids, counters drop out), joined by a
    single space. Emits per category: doc_count and the lexicographically
    first raw message as the representative example. Map-only signature
    derivation (split + filter + slice array-side), one partial-aggregated
    groupBy on the signature."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    sig = F.array_join(
        F.slice(
            F.filter(toks, lambda x: ~x.rlike("[0-9]")),
            1, max_tokens,
        ),
        " ",
    )
    keys = [F.col(group_col)] if group_col else []
    return (
        rows.select(*keys, sig.alias("category"),
                    F.col(text_col).alias("_t"))
        .groupBy(*keys, F.col("category"))
        .agg(
            F.count("*").alias("doc_count"),
            F.min("_t").alias("example"),
        )
    )
