"""ES ``more_like_this``: find documents similar to given seed documents.

Reference host behavior (the plugin's merged analysis feeds ES's MLT
endpoint): the seed doc's terms rank by tf*idf, the top
``max_query_terms`` become an OR query, and hits rank by BM25 with the
seed itself excluded.

Determinism/oracle notes: term selection orders by (round(tf*idf, 6)
DESC, term ASC) so near-tied doubles select identically in Spark and the
DuckDB replay; ``min_doc_freq``/``min_term_freq`` mirror ES's defaults'
role (prune noise terms).

Plan shape: seed stats are a doc-id-filtered scan (seed count is tiny);
term selection is a per-seed window over at most the seed's vocabulary;
the expansion joins the stats table broadcast-side like every other
expansion query (query/boolean.py::_expansion_topk) — no full-corpus
pass beyond the term-filtered scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.tinydf import tiny_df

from elasticsearch_analysis_combo_spark.query.bm25 import idf_expr
from elasticsearch_analysis_combo_spark.query.boolean import _expansion_topk


def more_like_this(
    spark: SparkSession,
    term_stats: DataFrame,
    term_df: DataFrame,
    seed_doc_ids: list[int],
    n_docs: int,
    avgdl: float,
    max_query_terms: int = 25,
    min_term_freq: int = 1,
    min_doc_freq: int = 2,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(query_id, rank, doc_id, score) — query_id is the seed's index in
    ``seed_doc_ids``; the seed doc never appears in its own results."""
    if not seed_doc_ids:
        return tiny_df(spark,
            [], "query_id int, rank int, doc_id long, score double"
        )
    seeds = tiny_df(spark,
        [(i, int(d)) for i, d in enumerate(seed_doc_ids)],
        "query_id int, seed_doc_id long",
    )
    seed_stats = term_stats.join(
        F.broadcast(seeds),
        term_stats["doc_id"] == F.col("seed_doc_id"),
    ).select("query_id", "seed_doc_id", "term", "tf")
    sel = (
        seed_stats.filter(F.col("tf") >= min_term_freq)
        .join(term_df.select("term", "df"), "term")
        .filter(F.col("df") >= min_doc_freq)
        .withColumn(
            "_sel_score", F.round(F.col("tf") * idf_expr(n_docs), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("_sel_score"), F.asc("term")
    )
    expansions = (
        sel.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_query_terms)
        .select("query_id", "term", "df")
    )
    scored = _expansion_topk(
        term_stats, expansions, n_docs, avgdl, k + 1, k1, b
    )
    # drop each seed from its own hit list, then re-rank to k
    out = (
        scored.join(F.broadcast(seeds), "query_id")
        .filter(F.col("doc_id") != F.col("seed_doc_id"))
        .drop("seed_doc_id")
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        out.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
