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
    """Distinct (query_id, doc_id) for docs containing >=1 query term."""
    qterms = spark.createDataFrame(
        analyze_queries(queries, config), "query_id int, term string"
    )
    return (
        term_stats.join(F.broadcast(qterms), "term")
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
