"""Highlight offsets — the core of ES's ``highlight`` response feature.

For each (query_id, doc_id) hit, emit the character offsets of every
occurrence of the query's analyzed terms in the document, using the SAME
combo analysis as the index (offsets come from the analyzers' token spans,
reference ComboTokenStream offset semantics). Snippet assembly (ellipses,
tags) is presentation-side string work; the offsets are the engine's part.

Scale shape: only HIT documents are re-analyzed — a left-semi join prunes
the corpus scan to the hit list (tiny, broadcast) before the Arrow-batched
analysis pass, so cost is O(hits), not O(corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.tinydf import tiny_df

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig
from elasticsearch_analysis_combo_spark.analysis.udfs import analyze
from elasticsearch_analysis_combo_spark.query.bm25 import analyze_queries


def highlight_fragments(
    spark: SparkSession,
    docs: DataFrame,
    hits: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    content_col: str = "content",
    id_col: str = "doc_id",
    window: int = 20,
) -> DataFrame:
    """ES-style highlighted snippets: for every query-term occurrence in
    a hit document, the surrounding context with the match wrapped in
    ``<em>`` tags — ``...before<em>match</em>after...`` with ``window``
    characters of context on each side (clamped at the document edges).

    One deterministic fragment per occurrence (ES's unified highlighter
    emits per-fragment snippets too; per-occurrence is the exact,
    engine-replayable spec). Cost is O(hit occurrences): the offsets
    come from :func:`highlight_offsets` (hit-pruned analysis) and the
    fragment assembly is three substrings in whole-stage codegen —
    the corpus is never rescanned."""
    offs = highlight_offsets(
        spark, docs, hits, queries, config,
        content_col=content_col, id_col=id_col,
    )
    text = docs.select(
        F.col(id_col).alias("doc_id"), F.col(content_col).alias("_txt")
    )
    w = int(window)
    fs = F.greatest(F.lit(0), F.col("start_off") - w)
    frag = F.concat(
        F.expr("substr(_txt, cast(_fs as int) + 1, start_off - _fs)"),
        F.lit("<em>"),
        F.expr("substr(_txt, start_off + 1, end_off - start_off)"),
        F.lit("</em>"),
        F.expr(f"substr(_txt, end_off + 1, {w})"),
    )
    return (
        offs.join(text, "doc_id")
        .withColumn("_fs", fs)
        .withColumn("fragment", frag)
        .select(
            "query_id", "doc_id", "term", "start_off", "end_off",
            "fragment",
        )
    )


def highlight_offsets(
    spark: SparkSession,
    docs: DataFrame,
    hits: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, doc_id, term, start_off, end_off) for every query-term
    occurrence inside each hit document.

    ``hits``: (query_id, doc_id) pairs (e.g. a top-k result). Documents are
    re-analyzed with ``config``; each emitted token whose term matches one
    of the hit query's analyzed terms yields one offset row."""
    qrows = analyze_queries(queries, config)
    qterms = tiny_df(spark, qrows, "query_id int, term string")
    hit_pairs = hits.select(
        F.col("query_id").cast("int").alias("_hq"),
        F.col("doc_id").alias("_hd"),
    )
    pruned = docs.join(
        F.broadcast(hit_pairs.select(F.col("_hd").alias(id_col)).distinct()),
        id_col, "left_semi",
    )
    toks = (
        analyze(pruned, config, content_col=content_col)
        .select(F.col(id_col).alias("doc_id"), F.explode("tokens").alias("tok"))
        .select(
            "doc_id",
            F.col("tok.term").alias("term"),
            F.col("tok.start").alias("start_off"),
            F.col("tok.end").alias("end_off"),
        )
    )
    return (
        toks.join(F.broadcast(qterms), "term")
        .join(
            F.broadcast(hit_pairs),
            (F.col("query_id") == F.col("_hq")) & (F.col("doc_id") == F.col("_hd")),
            "left_semi",
        )
        .select("query_id", "doc_id", "term", "start_off", "end_off")
    )
