"""BM25 scoring (SURVEY.md §2 B7, B9).

The reference delegates scoring to its Lucene 4.6 host; parameters are fixed
by BASELINE.json: k1=1.2, b=0.75, Lucene-style
``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``,
``score(q,d) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``.

Query analysis (B9) reuses the *same* combo analysis as indexing
(reference README.md:63 recommends identical index/search analyzers); the
query's analyzed terms are deduplicated (each distinct term contributes
once).

The exhaustive scorer is the rank-identity oracle for WAND and is itself
pure DataFrame algebra: query terms are a tiny broadcast dimension; the fact
table is the pre-aggregated (doc, term) stats; Catalyst does partial
aggregation on the score sum, and the top-k is a per-query window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.tinydf import tiny_df

from elasticsearch_analysis_combo_spark.analysis.combo import (
    ComboConfig,
    analyze_text,
)


def analyze_queries(
    queries: list[tuple[int, str]], config: ComboConfig
) -> list[tuple[int, str]]:
    """(query_id, text) -> distinct (query_id, term) rows, analyzed with the
    index's combo config (driver-side: query sets are tiny)."""
    out = []
    for qid, text in queries:
        terms = {t.term for t in analyze_text(text, config)}
        out.extend((qid, term) for term in sorted(terms))
    return out


def idf_expr(n_docs: int, df_col="df"):
    """Lucene BM25 idf, natural log (constant-folded by Catalyst where
    possible)."""
    return F.log(
        1.0 + (F.lit(float(n_docs)) - F.col(df_col) + 0.5) / (F.col(df_col) + 0.5)
    )


def bm25_scored(
    spark: SparkSession,
    term_stats: DataFrame,
    term_df: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    n_docs: int,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """All (query_id, doc_id, score) rows (no top-k cut) — the shared
    scoring block for post-retrieval shapers (function_score, rescore,
    collapse) that must transform the FULL scored set before ranking.
    Broadcast query dim, one (query_id, doc_id) partial-agg shuffle; the
    literal term isin pushes into the stats/dictionary scans (a broadcast
    join alone doesn't prune parquet row groups)."""
    qrows = analyze_queries(queries, config)
    qterms = tiny_df(spark, qrows, "query_id int, term string")
    all_terms = sorted({t for _, t in qrows})
    term_stats = term_stats.filter(F.col("term").isin(all_terms))
    tdf = term_df.filter(F.col("term").isin(all_terms)).select("term", "df")
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


def rank_topk_rounded(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k ranked on the 6-rounded score with doc_id tiebreak
    — the deterministic cross-engine ranking policy (near-tied raw floats
    must not flip order between Spark and an oracle)."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def bm25_search_after(
    spark: SparkSession,
    term_stats: DataFrame,
    term_df: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    n_docs: int,
    avgdl: float,
    cursors: dict[int, tuple[float, int]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``search_after`` pagination: the next ``k`` hits strictly after
    a per-query cursor ``(score, doc_id)`` in the ranking order
    (6-rounded score desc, doc_id asc — the engine's deterministic sort).
    Queries without a cursor get their first page. Exact and stateless —
    no scroll context to keep alive; deep pages cost one exhaustive
    evaluation (the ES trade-off is the same: search_after re-runs the
    query per page)."""
    scored = bm25_scored(
        spark, term_stats, term_df, queries, config, n_docs, avgdl,
        k1=k1, b=b,
    )
    if cursors:
        cur = tiny_df(spark,
            [(qid, float(s), int(d)) for qid, (s, d) in cursors.items()],
            "query_id int, c_score double, c_doc long",
        )
        scored = scored.join(F.broadcast(cur), "query_id", "left").filter(
            F.col("c_score").isNull()
            | (F.round("score", 6) < F.round("c_score", 6))
            | (
                (F.round("score", 6) == F.round("c_score", 6))
                & (F.col("doc_id") > F.col("c_doc"))
            )
        ).select("query_id", "doc_id", "score")
    return rank_topk_rounded(scored, k)


def sort_search_after(
    hits: DataFrame,
    sort_keys: list[tuple[str, str]],
    cursors: dict[int, tuple] | None = None,
    k: int = 10,
) -> DataFrame:
    """ES ``sort`` + ``search_after`` on ARBITRARY sort keys: page any
    per-query result set (a scored match set joined to metadata, a plain
    filtered table carrying query_id) by ``[(column, "asc"|"desc"),...]``
    with a per-query cursor of the previous page's last sort values.

    ``doc_id`` ascending is appended as the final tiebreak unless the
    caller sorts on it, making the order TOTAL — ES requires the same
    (its docs tell users to add a tiebreaker field, or pages skip/repeat
    rows on ties). A cursor therefore has one value per effective sort
    key, tiebreak included.

    Stateless and exact like :func:`bm25_search_after`: the cursor
    lowers to a lexicographic strictly-after predicate (evaluated
    JVM-side, pushable for the leading key), then one per-query window
    ranks the survivors — no scroll context, no driver state."""
    keys = list(sort_keys)
    if all(c != "doc_id" for c, _ in keys):
        keys.append(("doc_id", "asc"))
    for col, d in keys:
        if d not in ("asc", "desc"):
            raise ValueError(f"direction must be asc|desc: {col} {d}")
    if cursors:
        clauses = []
        for qid, vals in cursors.items():
            if len(vals) != len(keys):
                raise ValueError(
                    f"cursor for query {qid} has {len(vals)} values, "
                    f"need {len(keys)} (tiebreak included)"
                )
            # lexicographic strictly-after: OR over key prefixes
            after = None
            for i, (col, d) in enumerate(keys):
                cmp = (
                    F.col(col) > F.lit(vals[i]) if d == "asc"
                    else F.col(col) < F.lit(vals[i])
                )
                for j in range(i):
                    cmp = cmp & (F.col(keys[j][0]) == F.lit(vals[j]))
                after = cmp if after is None else (after | cmp)
            clauses.append((F.col("query_id") == qid) & after)
        # queries without a cursor get their first page
        no_cursor = ~F.col("query_id").isin(sorted(cursors))
        pred = no_cursor
        for c in clauses:
            pred = pred | c
        hits = hits.filter(pred)
    order = [
        F.asc(col) if d == "asc" else F.desc(col) for col, d in keys
    ]
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        hits.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def bm25_explain(
    spark: SparkSession,
    term_stats: DataFrame,
    term_df: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    n_docs: int,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES ``_explain``: the per-term score decomposition for every
    (query, matching doc) pair — one row per contributing term with the
    Lucene BM25 factors (idf, tf, field-length norm denominator,
    contribution) plus the doc's total. Same plan shape as the exhaustive
    scorer (broadcast query dim, one partial-agg shuffle); the total is a
    window sum so decomposition and total come from one pass."""
    from pyspark.sql import Window as W

    qrows = analyze_queries(queries, config)
    qterms = tiny_df(spark, qrows, "query_id int, term string")
    # literal isin pushdown on both scans (see bm25_exhaustive_topk)
    all_terms = sorted({t for _, t in qrows})
    term_stats = term_stats.filter(F.col("term").isin(all_terms))
    tdf = (
        term_df.filter(F.col("term").isin(all_terms))
        .join(F.broadcast(qterms.select("term").distinct()), "term")
    )
    rows = (
        term_stats.join(F.broadcast(qterms), "term")
        .join(F.broadcast(tdf.select("term", "df")), "term")
        .withColumn("idf", idf_expr(n_docs))
        .withColumn(
            "norm", F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl)
        )
        .withColumn(
            "contribution", F.col("idf") * F.col("tf") * (k1 + 1.0) / F.col("norm")
        )
    )
    w = W.partitionBy("query_id", "doc_id")
    return rows.select(
        "query_id", "doc_id", "term",
        F.col("tf").cast("long").alias("tf"),
        F.col("df").cast("long").alias("df"),
        "idf", "norm", "contribution",
        F.sum("contribution").over(w).alias("total_score"),
    )


def bm25_exhaustive_topk(
    spark: SparkSession,
    term_stats: DataFrame,
    term_df: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Exact top-k by full evaluation: the WAND-equivalence oracle (B8
    invariant) and the small-index fast path.

    Plan: broadcast(query terms) |><| stats  -> per-(query,doc) score sum
    -> per-query window top-k. The only shuffle is the groupBy on
    (query_id, doc_id); filters on term reach the parquet scan.
    """
    qrows = analyze_queries(queries, config)
    qterms = tiny_df(spark, qrows, "query_id int, term string")
    # literal isin on the join key: a semantic no-op next to the inner
    # broadcast join, but it reaches the parquet scan as a pushed filter
    # (row-group pruning) — the broadcast join alone does not
    all_terms = sorted({t for _, t in qrows})
    term_stats = term_stats.filter(F.col("term").isin(all_terms))
    tdf = (
        term_df.filter(F.col("term").isin(all_terms))
        .join(F.broadcast(qterms.select("term").distinct()), "term")
    )
    scored = (
        term_stats.join(F.broadcast(qterms), "term")
        .join(F.broadcast(tdf.select("term", "df")), "term")
        .withColumn(
            "score",
            idf_expr(n_docs)
            * F.col("tf") * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl)),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("score").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def multi_index_topk(
    spark: SparkSession,
    indices: dict[str, tuple[DataFrame, DataFrame, int, float]],
    queries: list[tuple[int, str]],
    config: ComboConfig,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    indices_boost: dict[str, float] | None = None,
    dfs: bool = False,
) -> DataFrame:
    """ES multi-index search (``GET idx_a,idx_b/_search``): evaluate the
    query against EVERY index with that index's OWN statistics and merge
    the hits into one ranking — exactly ES's query_then_fetch semantics,
    where BM25 idf/avgdl are per-shard/per-index and scores combine
    as-is (no cross-index df blending; ES users accept the same
    incomparability). ``indices`` maps index name ->
    (term_stats, term_df, n_docs, avgdl).

    Plan: one broadcast-scored pass PER index (each scan only reads its
    own stats table) unioned, then ONE global window top-k per query —
    the union adds no shuffle beyond each leg's (query, doc) partial
    agg. Returns (query_id, rank, index, doc_id, score); ties rank by
    (rounded score desc, index, doc_id) so the merge is deterministic
    cross-engine."""
    unknown = sorted(set(indices_boost or {}) - set(indices))
    if unknown:
        raise ValueError(f"indices_boost names unknown indices: {unknown}")
    gdf = gn = gavg = None
    if dfs:
        # ES dfs_query_then_fetch: a pre-query DFS phase collects the
        # GLOBAL term statistics (df summed over indices, total doc
        # count, doc-count-weighted avgdl) and every shard scores with
        # them — so scores are comparable across indices and IDENTICAL
        # to a single merged index holding all the docs (the invariant
        # tests pin). The blend is one union + groupBy over the
        # DICTIONARY frames (vocabulary-sized, tiny next to postings).
        parts = [
            tdf.select("term", F.col("df").cast("long").alias("df"))
            for _, (_, tdf, _, _) in sorted(indices.items())
        ]
        u = parts[0]
        for pz in parts[1:]:
            u = u.unionByName(pz)
        gdf = u.groupBy("term").agg(F.sum("df").alias("df"))
        gn = sum(n for _, (_, _, n, _) in indices.items())
        gavg = (
            sum(n * a for _, (_, _, n, a) in indices.items())
            / max(gn, 1)
        )
    legs = []
    for name, (stats, tdf, n_docs, avgdl) in sorted(indices.items()):
        leg = bm25_scored(
            spark, stats,
            gdf if dfs else tdf, queries, config,
            gn if dfs else n_docs, gavg if dfs else avgdl,
            k1=k1, b=b,
        ).withColumn("index", F.lit(name))
        boost = float((indices_boost or {}).get(name, 1.0))
        if boost != 1.0:
            # ES indices_boost: multiply every hit score from this
            # index before the merged ranking (request-body
            # ``indices_boost: [{name: factor}]``)
            leg = leg.withColumn("score", F.col("score") * F.lit(boost))
        legs.append(leg)
    merged = legs[0]
    for leg in legs[1:]:
        merged = merged.unionByName(leg)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 6)), F.asc("index"), F.asc("doc_id")
    )
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "index", "doc_id", "score")
    )
