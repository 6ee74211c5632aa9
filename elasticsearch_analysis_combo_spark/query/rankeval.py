"""ES ``_rank_eval`` API: score a ranking against rated documents.

The reference's host exposes ``_rank_eval`` so users can regression-test
relevance when they change analyzers — exactly the workflow this repo's
combo analyzers feed. Metrics follow the ES definitions:

* ``precision@k``: relevant-in-top-k / retrieved-in-top-k (ES counts
  only RETRIEVED docs in the denominator, not k).
* ``recall@k``: relevant-in-top-k / total-relevant-in-ratings.
* ``mrr``: 1 / rank of the first relevant hit (0 when none in top-k).
* ``dcg`` / ``ndcg``: sum((2^rel - 1) / log2(rank + 1)) over the top-k,
  normalized by the ideal ordering of the query's OWN ratings (ES's
  gain/discount forms).

Everything is column arithmetic over (hits x ratings) — one broadcast
join and one groupBy per metric set, no UDFs, so the evaluation runs at
any query-batch size. Unrated retrieved docs count as non-relevant
(rating 0), as ES does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_eval(
    hits: DataFrame,
    ratings: DataFrame,
    k: int = 10,
    relevant_rating_threshold: int = 1,
    maximum_relevance: int | None = None,
) -> DataFrame:
    """(query_id, rank, doc_id) hits x (query_id, doc_id, rating)
    ratings -> one row per query with precision_at_k / recall_at_k /
    mrr / dcg / ndcg / err. Queries present in ``ratings`` but
    retrieving nothing still report (all-zero metrics).

    ``err`` is ES's expected_reciprocal_rank (Chapelle et al. 2009):
    with per-doc stop probability ``R_i = (2^rel_i - 1) /
    2^max_rel``, ``ERR = sum_i R_i / i * prod_{j<i} (1 - R_j)``. ES
    makes ``maximum_relevance`` a required constant; pass it for exact
    parity, or leave ``None`` to derive each query's own max rating
    (documented divergence — convenient when grades are per-query).
    The rank-prefix product is a window ``exp(sum(log1p(-R)))`` with
    an any-zero guard (a max-grade doc zeroes everything after it), so
    the whole metric stays column arithmetic — no UDFs."""
    th = relevant_rating_threshold
    top = hits.filter(F.col("rank") <= k).select(
        "query_id", "rank", "doc_id"
    )
    rated = ratings.select(
        "query_id", "doc_id", F.col("rating").cast("double").alias("rating")
    )
    j = top.join(rated, ["query_id", "doc_id"], "left").withColumn(
        "rating", F.coalesce("rating", F.lit(0.0))
    )
    # ERR stop probabilities: R = (2^rating - 1) / 2^max_rel, with
    # max_rel a constant (ES) or the query's own max rating
    if maximum_relevance is not None:
        j = j.withColumn("_maxr", F.lit(float(maximum_relevance)))
    else:
        qmax = rated.groupBy("query_id").agg(
            F.max("rating").alias("_maxr")
        )
        j = j.join(F.broadcast(qmax), "query_id", "left").withColumn(
            "_maxr", F.coalesce("_maxr", F.lit(0.0))
        )
    Rstop = F.when(
        F.col("_maxr") > 0,
        (F.pow(2.0, F.col("rating")) - 1.0) / F.pow(2.0, F.col("_maxr")),
    ).otherwise(F.lit(0.0))
    w_prev = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    j = j.withColumn("_R", Rstop).withColumn(
        "_prefix_zeros",
        F.coalesce(
            F.sum(F.when(F.col("_R") >= 1.0, 1).otherwise(0)).over(w_prev),
            F.lit(0),
        ),
    ).withColumn(
        "_prefix_log",
        F.coalesce(
            F.sum(
                F.when(F.col("_R") < 1.0, F.log1p(-F.col("_R")))
            ).over(w_prev),
            F.lit(0.0),
        ),
    ).withColumn(
        "_err_c",
        F.when(F.col("_prefix_zeros") > 0, F.lit(0.0)).otherwise(
            F.col("_R") / F.col("rank") * F.exp(F.col("_prefix_log"))
        ),
    )
    rel = F.when(F.col("rating") >= th, 1.0).otherwise(0.0)
    per_q = j.groupBy("query_id").agg(
        F.count("*").alias("retrieved"),
        F.sum(rel).alias("rel_retrieved"),
        F.min(F.when(F.col("rating") >= th, F.col("rank"))).alias(
            "first_rel"
        ),
        F.sum(
            (F.pow(2.0, F.col("rating")) - 1.0)
            / F.log2(F.col("rank") + 1.0)
        ).alias("dcg"),
        F.sum("_err_c").alias("err"),
    )
    # ideal DCG from the query's OWN ratings, best-first
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rating"), F.asc("doc_id")
    )
    ideal = (
        rated.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(2.0, F.col("rating")) - 1.0)
                / F.log2(F.col("_r") + 1.0)
            ).alias("idcg"),
        )
    )
    totals = rated.groupBy("query_id").agg(
        F.sum(F.when(F.col("rating") >= th, 1).otherwise(0)).alias(
            "total_rel"
        )
    )
    return (
        totals.join(per_q, "query_id", "left")
        .join(ideal, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce("rel_retrieved", F.lit(0.0))
             / F.greatest(F.coalesce("retrieved", F.lit(0)), F.lit(1))
             ).alias("precision_at_k"),
            F.when(
                F.col("total_rel") > 0,
                F.coalesce("rel_retrieved", F.lit(0.0))
                / F.col("total_rel"),
            ).otherwise(F.lit(0.0)).alias("recall_at_k"),
            F.coalesce(
                1.0 / F.col("first_rel"), F.lit(0.0)
            ).alias("mrr"),
            F.coalesce("dcg", F.lit(0.0)).alias("dcg"),
            F.when(
                F.coalesce("idcg", F.lit(0.0)) > 0,
                F.coalesce("dcg", F.lit(0.0)) / F.col("idcg"),
            ).otherwise(F.lit(0.0)).alias("ndcg"),
            F.coalesce("err", F.lit(0.0)).alias("err"),
        )
    )
