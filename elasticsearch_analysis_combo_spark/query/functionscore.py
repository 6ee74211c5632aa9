"""function_score and rescore: post-retrieval score shaping.

Two ES staples a reference user layers onto every ranked query:

* ``function_score_topk`` — combine the BM25 score with a document-level
  function of a metadata field: ``field_value_factor`` (modifier none /
  log1p / sqrt, multiplied or summed per ``boost_mode``) or a ``gauss``
  decay around an origin (recency/length normalization).
* ``rescore_phrase_topk`` — ES's rescore window: take the top
  ``window_size`` BM25 hits per query, boost those where the query text
  also matches as a PHRASE (``score + weight * ln(1 + n_matches)``), and
  re-rank. The expensive positional evaluation runs only semantically
  (phrase matcher is corpus-wide but block-pruned to the query's terms);
  the combine itself touches ``window_size`` rows per query.

Both rank on the 6-rounded combined score (doc_id tiebreak) so near-tied
floats cannot flip cross-engine order.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig
from elasticsearch_analysis_combo_spark.query.bm25 import analyze_queries, idf_expr


def _bm25_scored(
    spark, term_stats, term_df, queries, config, n_docs, avgdl, k1, b
):
    qterms = spark.createDataFrame(
        analyze_queries(queries, config), "query_id int, term string"
    )
    tdf = term_df.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    ).select("term", "df")
    return (
        term_stats.join(F.broadcast(qterms), "term")
        .join(F.broadcast(tdf), "term")
        .withColumn(
            "tscore",
            idf_expr(n_docs)
            * F.col("tf") * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl)),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("tscore").alias("score"))
    )


def _rank_rounded(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def function_score_topk(
    spark: SparkSession,
    term_stats: DataFrame,
    term_df: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    n_docs: int,
    avgdl: float,
    doc_meta: DataFrame,
    field: str,
    function: str = "field_value_factor",
    factor: float = 1.0,
    modifier: str = "log1p",
    boost_mode: str = "multiply",
    origin: float = 0.0,
    scale: float = 1.0,
    decay: float = 0.5,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES function_score over the full match set (the function applies
    before the top-k cut — a decayed winner may come from outside the
    plain-BM25 top-k). ``function``: ``field_value_factor`` (with
    ``modifier``/``factor``/``boost_mode``) or ``gauss`` (with ``origin``/
    ``scale``/``decay``; always multiplies, as ES decay functions do)."""
    scored = _bm25_scored(
        spark, term_stats, term_df, queries, config, n_docs, avgdl, k1, b
    ).join(doc_meta.select("doc_id", field), "doc_id")
    fv = F.col(field).cast("double")
    if function == "field_value_factor":
        val = fv * factor
        if modifier == "log1p":
            val = F.log1p(val)
        elif modifier == "sqrt":
            val = F.sqrt(val)
        elif modifier != "none":
            raise ValueError(f"modifier must be none|log1p|sqrt: {modifier}")
        if boost_mode == "multiply":
            combined = F.col("score") * val
        elif boost_mode == "sum":
            combined = F.col("score") + val
        else:
            raise ValueError(f"boost_mode must be multiply|sum: {boost_mode}")
    elif function == "gauss":
        # ES gauss decay: exp(-(x-origin)^2 / (2 sigma^2)),
        # sigma^2 = -scale^2 / (2 ln decay)
        sigma2 = -(scale * scale) / (2.0 * math.log(decay))
        combined = F.col("score") * F.exp(
            -((fv - origin) * (fv - origin)) / (2.0 * sigma2)
        )
    else:
        raise ValueError(f"function must be field_value_factor|gauss: {function}")
    return _rank_rounded(
        scored.withColumn("score", combined).select(
            "query_id", "doc_id", "score"
        ),
        k,
    )


def rescore_phrase_topk(
    spark: SparkSession,
    postings: DataFrame,
    term_stats: DataFrame,
    term_df: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    n_docs: int,
    avgdl: float,
    window_size: int = 100,
    rescore_weight: float = 2.0,
    slop: int = 0,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    partitioned_phrases: bool = False,
) -> DataFrame:
    """ES rescore with a phrase boost: the top ``window_size`` BM25 hits
    per query re-rank by ``score + rescore_weight * ln(1 + n_matches)``
    where n_matches counts the query text's phrase occurrences (0 for
    docs without the phrase — they keep their base score, exactly ES's
    ``score_mode: total`` with an unmatched rescore query)."""
    from elasticsearch_analysis_combo_spark.query.phrase import (
        phrase_match,
        phrase_match_partitioned,
    )

    # the base window combines from the 6-rounded score (deterministic
    # cross-engine base, same policy the ranking itself uses)
    base = _rank_rounded(
        _bm25_scored(
            spark, term_stats, term_df, queries, config, n_docs, avgdl, k1, b
        ),
        window_size,
    ).withColumn("score", F.round("score", 6))
    if partitioned_phrases:
        ph = phrase_match_partitioned(spark, postings, queries, config, slop=slop)
    else:
        ph = phrase_match(spark, postings, queries, config, slop=slop)
    combined = (
        base.join(ph, ["query_id", "doc_id"], "left")
        .withColumn(
            "score",
            F.col("score")
            + rescore_weight * F.log1p(F.coalesce(F.col("n_matches"), F.lit(0))),
        )
        .select("query_id", "doc_id", "score")
    )
    return _rank_rounded(combined, k)
