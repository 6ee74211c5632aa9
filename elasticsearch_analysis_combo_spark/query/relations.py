"""ES parent-child (join field) queries: ``has_child`` and ``has_parent``.

ES models parent/child with a join field and co-locates families on one
shard; queries then run a per-shard ordinal join. The Spark-first
re-expression is a relational join on the parent key — which is exactly
what the join field encodes — with the child side PRE-AGGREGATED to one
row per parent key before the join, so the shuffle carries (key, count,
score) triples, never child payloads. At 100 TB co-locate by bucketing
both tables on the key (ES's shard co-location, declaratively); AQE
handles skewed parents.

Reference scope note: the reference plugin delegates all querying to its
ES host (AnalysisComboPlugin.java:37-42); this module re-expresses the
host's join-field surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCORE_FNS = {
    "sum": F.sum,
    "max": F.max,
    "min": F.min,
    "avg": F.avg,
}


def has_child_query(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    child_pred: str,
    score_mode: str = "none",
    score_expr: str | None = None,
    min_children: int = 1,
    max_children: int | None = None,
) -> DataFrame:
    """ES ``has_child``: parent rows with at least ``min_children`` (and
    at most ``max_children``) children matching ``child_pred`` (a SQL
    predicate over the child table). ``score_mode`` none|sum|max|min|avg
    aggregates ``score_expr`` (SQL over child columns) into a ``score``
    column; the output always carries ``n_children``.

    Shape: filter+aggregate the child side FIRST (one partial-aggregated
    shuffle to one row per parent key), then a key join — the matched-key
    set is the semi-join frontier, so no child row ever crosses the join.
    """
    if score_mode != "none" and score_mode not in _SCORE_FNS:
        raise ValueError(f"unsupported score_mode: {score_mode}")
    if score_mode != "none" and not score_expr:
        raise ValueError("score_mode requires score_expr")
    aggs = [F.count(F.lit(1)).alias("n_children")]
    if score_mode != "none":
        aggs.append(
            _SCORE_FNS[score_mode](F.expr(score_expr)).alias("score")
        )
    matched = (
        children.filter(F.expr(child_pred))
        .groupBy(F.col(child_key).alias(parent_key))
        .agg(*aggs)
        .filter(F.col("n_children") >= min_children)
    )
    if max_children is not None:
        matched = matched.filter(F.col("n_children") <= max_children)
    return parents.join(matched, parent_key)


def has_parent_query(
    children: DataFrame,
    parents: DataFrame,
    parent_key: str,
    child_key: str,
    parent_pred: str,
    score_expr: str | None = None,
) -> DataFrame:
    """ES ``has_parent``: child rows whose parent matches ``parent_pred``;
    with ``score_expr`` (SQL over parent columns) each child inherits its
    parent's score (ES ``score: true``). The parent side is filtered and
    projected to (key[, score]) before the join — the minimal build side,
    broadcastable when the predicate is selective (AQE decides from the
    post-filter size)."""
    cols = [F.col(parent_key)]
    if score_expr:
        cols.append(F.expr(score_expr).alias("score"))
    keys = parents.filter(F.expr(parent_pred)).select(*cols)
    return children.join(
        keys, children[child_key] == keys[parent_key]
    ).drop(parent_key)
