"""Compound scoring queries: ``boosting``, ``constant_score``,
``terms_set``, and ``function_score.random_score``.

These are the remaining ES compound-query staples the host (Lucene/ES,
``AnalysisComboPlugin.java:37-42`` delegates them) gives a reference
user for free. All four are pure DataFrame algebra over the
pre-aggregated (doc, term) stats: query terms are a broadcast
dimension, the one shuffle is the per-(query, doc) partial aggregate,
and ranking goes through the bucketed two-stage top-k so no task ever
sorts a full match set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.tinydf import tiny_df

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig
from elasticsearch_analysis_combo_spark.query.bm25 import (
    analyze_queries,
    bm25_scored,
)
from elasticsearch_analysis_combo_spark.query.boolean import _rank_topk


def boosting_topk(
    spark: SparkSession,
    term_stats: DataFrame,
    term_df: DataFrame,
    queries: list[tuple[int, str, str]],
    config: ComboConfig,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    negative_boost: float = 0.5,
) -> DataFrame:
    """ES ``boosting`` query: (query_id, positive, negative) texts. Docs
    matching the positive clause (>=1 analyzed term, OR semantics) score
    the usual BM25 sum; docs ALSO matching any negative term keep their
    rank slot but with score * ``negative_boost`` — demoted, not
    excluded (the difference from bool.must_not). The negative side is a
    distinct (query, doc) indicator left-joined onto the scored set —
    no second corpus pass beyond its term-filtered scan."""
    pos = bm25_scored(
        spark, term_stats, term_df, [(q[0], q[1]) for q in queries],
        config, n_docs, avgdl, k1=k1, b=b,
    )
    neg_rows = analyze_queries([(q[0], q[2]) for q in queries], config)
    if neg_rows:
        neg_terms = tiny_df(spark, neg_rows, "query_id int, term string")
        neg = (
            term_stats.filter(
                F.col("term").isin(sorted({t for _, t in neg_rows}))
            )
            .join(F.broadcast(neg_terms), "term")
            .select("query_id", "doc_id")
            .distinct()
            .withColumn("_neg", F.lit(1))
        )
        pos = pos.join(neg, ["query_id", "doc_id"], "left").withColumn(
            "score",
            F.when(F.col("_neg").isNotNull(),
                   F.col("score") * F.lit(float(negative_boost)))
            .otherwise(F.col("score")),
        ).drop("_neg")
    return _rank_topk(pos, k)


def constant_score_topk(
    spark: SparkSession,
    term_stats: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    k: int = 10,
    boost: float = 1.0,
) -> DataFrame:
    """ES ``constant_score``: filter context — every doc matching >=1
    analyzed term gets exactly ``boost`` as its score (no BM25 math, no
    df lookup). Deterministic rank order inside the tie is doc_id
    ascending (the ES _doc tiebreak)."""
    qrows = analyze_queries(queries, config)
    qterms = tiny_df(spark, qrows, "query_id int, term string")
    matched = (
        term_stats.filter(F.col("term").isin(sorted({t for _, t in qrows})))
        .join(F.broadcast(qterms), "term")
        .select("query_id", "doc_id")
        .distinct()
        .withColumn("score", F.lit(float(boost)))
    )
    return _rank_topk(matched, k)


def terms_set_topk(
    spark: SparkSession,
    term_stats: DataFrame,
    term_df: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    doc_meta: DataFrame,
    required_expr: str,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``terms_set`` query: a doc matches when it contains at least
    ``required`` of the query's analyzed terms, where ``required`` is a
    per-document value (ES ``minimum_should_match_field`` /
    ``..._script``) — here a SQL expression over ``doc_meta`` columns,
    clamped to [1, n_query_terms] exactly as Lucene's CoveringQuery
    clamps it. Matching docs score the BM25 sum of their matched terms.

    Plan: broadcast query dim against the stats, per-(query, doc)
    partial agg counts distinct matched terms, then one doc_id join to
    the metadata for the required-count expression — the metadata join
    is candidate-restricted, never corpus-wide."""
    qrows = analyze_queries(queries, config)
    qterms = tiny_df(spark, qrows, "query_id int, term string")
    n_terms: dict[int, int] = {qid: 0 for qid, _ in queries}
    for qid, _ in qrows:
        n_terms[qid] += 1
    qcounts = tiny_df(spark,
        [(qid, n) for qid, n in n_terms.items()], "query_id int, n_terms int"
    )
    all_terms = sorted({t for _, t in qrows})
    tdf = term_df.filter(F.col("term").isin(all_terms)).select("term", "df")
    from elasticsearch_analysis_combo_spark.query.bm25 import idf_expr

    scored = (
        term_stats.filter(F.col("term").isin(all_terms))
        .join(F.broadcast(qterms), "term")
        .join(F.broadcast(tdf), "term")
        .withColumn(
            "tscore",
            idf_expr(n_docs)
            * F.col("tf") * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl)),
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("tscore").alias("score"),
            F.count("*").alias("n_matched"),  # (term, doc) rows are unique
        )
    )
    req = doc_meta.select(
        "doc_id", F.expr(required_expr).cast("int").alias("_req_raw")
    )
    return _rank_topk(
        scored.join(req, "doc_id")
        .join(F.broadcast(qcounts), "query_id")
        .withColumn(
            "_req",
            F.least(F.greatest(F.col("_req_raw"), F.lit(1)), F.col("n_terms")),
        )
        .filter(F.col("n_matched") >= F.col("_req"))
        .select("query_id", "doc_id", "score"),
        k,
    )


def random_score_topk(
    spark: SparkSession,
    term_stats: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    seed: int,
    k: int = 10,
) -> DataFrame:
    """ES ``function_score.random_score`` with a seed: reproducible
    pseudo-random ordering of the match set (>=1 analyzed term), e.g.
    for sampled relevance audits. The score is a deterministic hash of
    (seed, doc_id) mapped to [0, 1): the top 15 hex digits of
    md5(seed || '#' || doc_id) over 2^60 — the engine-portable hash
    recipe (CLAUDE.md), so any SQL engine replays the exact ordering.
    Stays in whole-stage codegen (conv/md5 are JVM built-ins)."""
    qrows = analyze_queries(queries, config)
    qterms = tiny_df(spark, qrows, "query_id int, term string")
    matched = (
        term_stats.filter(F.col("term").isin(sorted({t for _, t in qrows})))
        .join(F.broadcast(qterms), "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(str(seed)), F.lit("#"),
                           F.col("doc_id").cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    scored = matched.withColumn("score", h / F.lit(float(1 << 60)))
    return _rank_topk(scored, k)
