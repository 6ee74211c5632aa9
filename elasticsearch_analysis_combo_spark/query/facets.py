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
    qterms = spark.createDataFrame(qrows, "query_id int, term string")
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


def significant_terms(
    spark: SparkSession,
    term_stats: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    n_docs: int,
    size: int = 10,
    min_doc_count: int = 3,
    term_df: DataFrame | None = None,
) -> DataFrame:
    """ES ``significant_terms``: vocabulary terms unusually frequent in
    the query's match set versus the whole corpus, scored with the JLH
    heuristic ``(fg% - bg%) * (fg% / bg%)`` (fg% = share of matching docs
    containing the term, bg% = share of all docs). The query's own terms
    trivially top the list and are excluded, as ES effectively does by
    interest.

    Plan: match set (distinct (query, doc)) joins back to the per-doc term
    stats — the one inherently match-set-sized shuffle (ES samples shard
    tops instead; at 100 TB pass a sampled match set in). Doc frequencies
    per (query, term) partial-aggregate before the window cut. Pass the
    index's precomputed ``term_df`` (term, df) as the background table —
    deriving it per call re-shuffles the whole stats table."""
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
    qt = spark.createDataFrame(
        sorted(qterms), "query_id int, term string"
    ).withColumn("_isq", F.lit(1))
    scored = (
        fg.join(F.broadcast(n_match), "query_id")
        .join(bg, "term")
        .join(F.broadcast(qt), ["query_id", "term"], "left")
        .filter(F.col("_isq").isNull())
        .withColumn("fg_pct", F.col("fg_df") / F.col("n_fg"))
        .withColumn("bg_pct", F.col("bg_df") / F.lit(float(n_docs)))
        .withColumn(
            "score",
            (F.col("fg_pct") - F.col("bg_pct"))
            * (F.col("fg_pct") / F.col("bg_pct")),
        )
    )
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
