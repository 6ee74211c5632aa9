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


_NESTED_AGGS = {
    "sum": "aggregate({m}, cast(0.0 as double), (a, x) -> a + ({e}))",
    "max": "array_max(transform({m}, x -> cast(({e}) as double)))",
    "min": "array_min(transform({m}, x -> cast(({e}) as double)))",
    "avg": (
        "aggregate({m}, cast(0.0 as double), (a, x) -> a + ({e}))"
        " / size({m})"
    ),
}


def nested_query(
    df: DataFrame,
    path: str,
    pred: str,
    score_mode: str = "none",
    score_expr: str | None = None,
    min_children: int = 1,
    inner_hits: bool = False,
) -> DataFrame:
    """ES ``nested`` query over an ``array<struct>`` column ``path``:
    parent rows with at least ``min_children`` nested objects matching
    ``pred`` (a SQL predicate over the object's fields, referenced as
    ``x.field``). ``score_mode`` none|sum|max|min|avg aggregates
    ``score_expr`` (SQL over ``x.``) across the MATCHING objects into
    ``score``; ``inner_hits`` keeps the matching objects themselves as
    a ``{path}_hits`` column (ES inner_hits).

    Scale note: ES stores nested docs in the parent's Lucene block and
    runs a block join; Spark stores them in the parent's own row, so
    the whole query is per-row array algebra — ``filter``/``aggregate``
    higher-order functions, MAP-ONLY, zero shuffle, scan speed at any
    corpus size. This is the plan a hand-written block join can't beat.
    """
    if score_mode != "none" and score_mode not in _NESTED_AGGS:
        raise ValueError(f"unsupported score_mode: {score_mode}")
    if score_mode != "none" and not score_expr:
        raise ValueError("score_mode requires score_expr")
    matched = f"filter({path}, x -> {pred})"
    out = df.withColumn("_m", F.expr(matched)).filter(
        F.size("_m") >= min_children
    ).withColumn("n_nested", F.size("_m"))
    if score_mode != "none":
        out = out.withColumn(
            "score",
            F.expr(_NESTED_AGGS[score_mode].format(m="_m", e=score_expr)),
        )
    if inner_hits:
        out = out.withColumn(f"{path}_hits", F.col("_m"))
    return out.drop("_m")


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
    # drop the PARENT frame's key by reference, not by name: when both
    # tables name the key identically (the common ES join-field shape),
    # drop("<name>") would remove the child's key column too
    return children.join(
        keys, children[child_key] == keys[parent_key]
    ).drop(keys[parent_key])


def children_agg(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    group_col: str,
    metric_exprs: dict[str, str] | None = None,
) -> DataFrame:
    """ES ``children`` aggregation: bucket PARENTS by ``group_col``,
    then aggregate each bucket's CHILDREN (doc_count + optional SQL
    aggregate ``metric_exprs`` over child columns). The parent side is
    projected to its (key, bucket) pair before the join — the minimal
    build side, broadcastable when parents are dimension-sized; children
    never shuffle more than once and aggregate with map-side partials.
    Parents with no children drop out (ES emits doc_count only for
    buckets with child docs)."""
    keymap = parents.select(
        F.col(parent_key).alias("_pk"), F.col(group_col)
    )
    joined = children.join(
        keymap, children[child_key] == keymap["_pk"]
    ).drop("_pk")
    aggs = [F.count("*").alias("doc_count")]
    for name, expr in (metric_exprs or {}).items():
        aggs.append(F.expr(expr).alias(name))
    return joined.groupBy(group_col).agg(*aggs)


def parent_agg(
    children: DataFrame,
    parents: DataFrame,
    child_key: str,
    parent_key: str,
    group_col: str,
    metric_exprs: dict[str, str] | None = None,
) -> DataFrame:
    """ES ``parent`` aggregation (the mirror of :func:`children_agg`):
    bucket CHILDREN by ``group_col``, then aggregate each bucket's
    PARENT docs — doc_count = parents with >= 1 child in the bucket,
    plus optional SQL aggregates over parent columns. The child side
    reduces to DISTINCT (bucket, parent-key) pairs BEFORE the join (a
    parent counts once per bucket however many of its children land
    there), so the join probe is bucket x parent-key sized, never
    child-row sized; parents aggregate with map-side partials."""
    pairs = children.select(
        F.col(group_col), F.col(child_key).alias("_ck")
    ).distinct()
    joined = parents.join(
        pairs, parents[parent_key] == pairs["_ck"]
    ).drop("_ck")
    aggs = [F.count("*").alias("doc_count")]
    for name, expr in (metric_exprs or {}).items():
        aggs.append(F.expr(expr).alias(name))
    return joined.groupBy(group_col).agg(*aggs)


def reverse_nested_agg(
    df: DataFrame,
    path: str,
    nested_group_expr: str,
    id_col: str,
    pred: str | None = None,
) -> DataFrame:
    """ES ``reverse_nested`` aggregation: bucket by a NESTED field
    (``nested_group_expr``, SQL over the nested object as ``x``), but
    count PARENT documents per bucket — the "how many posts have a
    comment by each author" question (a plain nested terms agg would
    count comments). ``pred`` optionally restricts which nested objects
    key their parent. One explode + distinct-parent count per bucket
    (exact count_distinct on the parent id); the explode carries only
    (bucket_key, parent_id) pairs, never the nested payload."""
    objs = f"filter({path}, x -> {pred})" if pred else path
    pairs = df.select(
        F.col(id_col),
        F.explode(F.expr(objs)).alias("x"),
    ).select(
        F.col(id_col), F.expr(nested_group_expr).alias("key")
    )
    return pairs.groupBy("key").agg(
        F.countDistinct(F.col(id_col)).alias("doc_count")
    )
