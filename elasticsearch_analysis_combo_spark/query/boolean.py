"""Boolean / expansion query operators over the same index tables.

* conjunctive (AND) BM25 top-k — every analyzed query term must match
  (ES bool.must semantics); scoring stays BM25-summed. Pure DataFrame
  algebra: broadcast query terms |><| stats, per-(query,doc) agg keeps
  docs whose distinct matched-term count equals the query's term count.
* prefix-expansion search (ES prefix/match_phrase_prefix building block):
  a prefix expands to every vocabulary term starting with it; docs score
  as the BM25 sum over expanded terms. The term dictionary filter pushes
  into the scan — the posting/stats tables are term-clustered so row-group
  min/max stats prune non-matching files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.tinydf import tiny_df

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig
from elasticsearch_analysis_combo_spark.query.bm25 import analyze_queries, idf_expr


#: bucket fan-out for the pre-rank stage; the global window never sees
#: more than TOPK_BUCKETS * k rows per query
TOPK_BUCKETS = 32


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Exact per-query top-k in two stages: per-(query, doc-hash-bucket)
    top-k first, then a global window over the surviving
    ``TOPK_BUCKETS * k`` rows per query. A stop-word expansion over a
    100 TB index produces ~10^9 scored (query, doc) rows; a single
    per-query window task would sort all of them — the bucket stage keeps
    every sort partition-sized (same doc-range fan-out idea as
    wand_topk_partitioned, applied to the generic ranking tail). ANSI-safe
    ``pmod`` (negative hash), ``doc_id`` tie-break in both stages keeps
    the result deterministic and identical to the one-stage window."""
    bucket = F.pmod(F.hash("doc_id"), F.lit(TOPK_BUCKETS))
    wb = Window.partitionBy("query_id", bucket).orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    pruned = (
        scored.withColumn("_bn", F.row_number().over(wb))
        .filter(F.col("_bn") <= k)
        .drop("_bn")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def bm25_conjunctive_topk(
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
    """AND-semantics top-k: docs containing ALL the query's analyzed terms,
    ranked by the usual BM25 sum."""
    qrows = analyze_queries(queries, config)
    qterms = tiny_df(spark, qrows, "query_id int, term string")
    n_terms = {qid: 0 for qid, _ in queries}
    for qid, _ in qrows:
        n_terms[qid] += 1
    qcounts = tiny_df(spark,
        [(qid, n) for qid, n in n_terms.items()], "query_id int, n_terms int"
    )
    scored = (
        term_stats.join(F.broadcast(qterms), "term")
        .join(F.broadcast(term_df.join(
            F.broadcast(qterms.select("term").distinct()), "term"
        ).select("term", "df")), "term")
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
        .join(F.broadcast(qcounts), "query_id")
        .filter(F.col("n_matched") == F.col("n_terms"))
    )
    return _rank_topk(scored, k)


def bm25_boolean_topk(
    spark: SparkSession,
    term_stats: DataFrame,
    term_df: DataFrame,
    queries: list[tuple[int, str, str, str]],
    config: ComboConfig,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    minimum_should_match: int = 0,
    must_boost: float = 1.0,
    should_boost: float = 1.0,
) -> DataFrame:
    """ES ``bool`` query composition: (query_id, must, should, must_not)
    texts, any clause may be "".

    Semantics (the ES user's first non-trivial query):
      * a doc must contain ALL analyzed ``must`` terms;
      * it must contain NONE of the ``must_not`` terms;
      * with ``minimum_should_match`` > 0, at least that many distinct
        ``should`` terms must match (applied only to queries that have
        should terms, as ES does); with the default 0 and an empty
        ``must``, at least one ``should`` term must match;
      * score = BM25 sum over matched must+should terms, each weighted by
        its clause boost (ES per-clause ``boost``); each distinct term
        contributes once — should-terms duplicating must-terms fold into
        the must clause (scored with ``must_boost``, not counted toward
        ``minimum_should_match``).
    Pure-negative queries (only must_not) return no rows.

    Plan shape: query terms are a tiny broadcast dimension against the
    pre-aggregated (doc, term) stats; the exclusion is a left_anti join on
    (query_id, doc_id) of the must_not matches — no full-corpus pass beyond
    the term-filtered scans."""
    must_rows = analyze_queries([(q[0], q[1]) for q in queries], config)
    should_rows = analyze_queries([(q[0], q[2]) for q in queries], config)
    not_rows = analyze_queries([(q[0], q[3]) for q in queries], config)
    must_set = set(must_rows)
    score_rows = [(qid, t, "must") for qid, t in must_rows] + [
        (qid, t, "should")
        for qid, t in should_rows
        if (qid, t) not in must_set
    ]
    n_must: dict[int, int] = {q[0]: 0 for q in queries}
    for qid, _ in must_rows:
        n_must[qid] += 1
    n_should: dict[int, int] = {q[0]: 0 for q in queries}
    for qid, t, role in score_rows:
        if role == "should":
            n_should[qid] += 1
    # per-query effective minimum_should_match (0 when the query has no
    # should terms — a bool of pure musts is not failed by a global msm)
    msm: dict[int, int] = {}
    for qid in n_must:
        if n_should[qid] == 0:
            msm[qid] = 0
        elif minimum_should_match > 0:
            msm[qid] = minimum_should_match
        else:
            msm[qid] = 1 if n_must[qid] == 0 else 0

    empty = tiny_df(spark,
        [], "query_id int, rank int, doc_id long, score double"
    )
    if not score_rows:
        return empty
    score_terms = tiny_df(spark,
        score_rows, "query_id int, term string, role string"
    )
    qcounts = tiny_df(spark,
        [(qid, n, msm[qid]) for qid, n in n_must.items()],
        "query_id int, n_must int, msm int",
    )
    tdf = term_df.join(
        F.broadcast(score_terms.select("term").distinct()), "term"
    ).select("term", "df")
    scored = (
        term_stats.join(F.broadcast(score_terms), "term")
        .join(F.broadcast(tdf), "term")
        .withColumn(
            "tscore",
            F.when(F.col("role") == "must", must_boost).otherwise(should_boost)
            * idf_expr(n_docs)
            * F.col("tf") * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl)),
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("tscore").alias("score"),
            F.sum(
                F.when(F.col("role") == "must", 1).otherwise(0)
            ).alias("n_must_matched"),
            F.sum(
                F.when(F.col("role") == "should", 1).otherwise(0)
            ).alias("n_should_matched"),
        )
        .join(F.broadcast(qcounts), "query_id")
        .filter(
            (F.col("n_must_matched") == F.col("n_must"))
            & (F.col("n_should_matched") >= F.col("msm"))
        )
    )
    if not_rows:
        not_terms = tiny_df(spark, not_rows, "query_id int, term string")
        excl = (
            term_stats.join(F.broadcast(not_terms), "term")
            .select("query_id", "doc_id")
            .distinct()
        )
        scored = scored.join(excl, ["query_id", "doc_id"], "left_anti")
    return _rank_topk(scored, k)


def bm25_prefix_topk(
    spark: SparkSession,
    term_stats: DataFrame,
    term_df: DataFrame,
    prefixes: list[tuple[int, str]],
    n_docs: int,
    avgdl: float,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Prefix-expansion top-k: each (query_id, prefix) expands to all
    vocabulary terms with that prefix; docs rank by the BM25 sum over the
    expansion. The startswith filter reaches the scan (StringStartsWith
    pushdown) and the term-clustered layout prunes row groups.

    No broadcast hint on the expansion: a short prefix over a large
    vocabulary can expand past broadcast limits, so the join strategy is
    left to AQE (which broadcasts it when the runtime size allows)."""
    if not prefixes:
        return tiny_df(spark,
            [], "query_id int, rank int, doc_id long, score double"
        )
    expansions = None
    for qid, prefix in prefixes:
        part = (
            term_df.filter(F.col("term").startswith(prefix))
            .select(F.lit(qid).alias("query_id"), "term", "df")
        )
        expansions = part if expansions is None else expansions.unionByName(part)
    return _expansion_topk(term_stats, expansions, n_docs, avgdl, k, k1, b)


def _expansion_topk(term_stats, expansions, n_docs, avgdl, k, k1, b):
    """Score docs as the BM25 sum over an expansion table
    (query_id, term, df). Expansion size is vocabulary-bounded; the join
    strategy is left to AQE (broadcast when small). ``k=None`` skips the
    rank cut and returns the FULL scored set (query_id, doc_id, score) —
    the fielded dis-max blend's building block (a per-field cut before
    the blend would lose losing-field contributions at tie_breaker >
    0)."""
    scored = (
        term_stats.join(expansions, "term")
        .withColumn(
            "tscore",
            idf_expr(n_docs)
            * F.col("tf") * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl)),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("tscore").alias("score"))
    )
    if k is None:
        return scored
    return _rank_topk(scored, k)


def bm25_wildcard_topk(
    spark: SparkSession,
    term_stats: DataFrame,
    term_df: DataFrame,
    patterns: list[tuple[int, str]],
    n_docs: int,
    avgdl: float,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES wildcard query: ``*`` matches any run of characters, ``?`` one
    character; each pattern expands to the matching vocabulary terms and
    docs rank by the BM25 sum over the expansion.

    The expansion is a filter over the term DICTIONARY (one row per term) —
    tiny next to the posting data even at 10^9-term vocabularies; leading
    wildcards scan the dictionary column (as every search engine's do)
    while anchored patterns keep parquet min/max pruning."""
    import re as _re

    if not patterns:
        return tiny_df(spark,
            [], "query_id int, rank int, doc_id long, score double"
        )

    def to_regex(p: str) -> str:
        out = []
        for ch in p:
            if ch == "*":
                out.append(".*")
            elif ch == "?":
                out.append(".")
            else:
                out.append(_re.escape(ch))
        return "^" + "".join(out) + "$"

    expansions = None
    for qid, pat in patterns:
        part = (
            term_df.filter(F.col("term").rlike(to_regex(pat)))
            .select(F.lit(qid).alias("query_id"), "term", "df")
        )
        expansions = part if expansions is None else expansions.unionByName(part)
    return _expansion_topk(term_stats, expansions, n_docs, avgdl, k, k1, b)


def bm25_regexp_topk(
    spark: SparkSession,
    term_stats: DataFrame,
    term_df: DataFrame,
    patterns: list[tuple[int, str]],
    n_docs: int,
    avgdl: float,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES regexp query: the pattern (anchored, ES semantics — it must
    match the WHOLE term) expands to matching vocabulary terms; docs rank
    by the BM25 sum over the expansion. Same dictionary-scan shape as
    wildcard: vocabulary-, not posting-, sized."""
    if not patterns:
        return tiny_df(spark,
            [], "query_id int, rank int, doc_id long, score double"
        )
    expansions = None
    for qid, pat in patterns:
        part = (
            term_df.filter(F.col("term").rlike(f"^(?:{pat})$"))
            .select(F.lit(qid).alias("query_id"), "term", "df")
        )
        expansions = part if expansions is None else expansions.unionByName(part)
    return _expansion_topk(term_stats, expansions, n_docs, avgdl, k, k1, b)


def bm25_fuzzy_topk(
    spark: SparkSession,
    term_stats: DataFrame,
    term_df: DataFrame,
    queries: list[tuple[int, str]],
    n_docs: int,
    avgdl: float,
    max_edits: int = 1,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    transpositions: bool = False,
) -> DataFrame:
    """ES fuzzy query: a term expands to every vocabulary term within
    ``max_edits`` edits (JVM-side levenshtein over the term
    dictionary; production engines use FST automata — the dictionary scan
    is the Spark-native equivalent and is vocabulary-, not posting-,
    sized). Docs rank by the BM25 sum over the expansion.

    ``transpositions`` switches the metric to OSA (optimal string
    alignment — Lucene's fuzzy ``transpositions: true``, ES's DEFAULT:
    an adjacent swap costs 1 edit, not 2). OSA <= plain Levenshtein, so
    the JVM levenshtein at ``2 * max_edits`` stays the in-plan
    pre-filter (a transposition costs <= 2 plain edits) and the exact
    OSA test runs as an Arrow-batched kernel over the surviving
    dictionary slice only. At ``max_edits = 1`` OSA coincides with full
    Damerau-Levenshtein (no room for compound edits), which is what the
    gate's independent DuckDB ``damerau_levenshtein`` oracle relies on.
    Default stays ``False`` (plain Levenshtein) so pre-existing index
    oracles are unchanged; pass ``True`` for ES-default semantics."""
    if not queries:
        return tiny_df(spark,
            [], "query_id int, rank int, doc_id long, score double"
        )
    expansions = None
    for qid, term in queries:
        part = (
            term_df
            # cheap pre-filter: edit distance >= length difference
            .filter(
                (F.length("term") >= len(term) - max_edits)
                & (F.length("term") <= len(term) + max_edits)
            )
        )
        if transpositions:
            part = part.filter(
                F.levenshtein(F.col("term"), F.lit(term))
                <= 2 * max_edits
            ).filter(_osa_leq_udf(term, max_edits)(F.col("term")))
        else:
            part = part.filter(
                F.levenshtein(F.col("term"), F.lit(term)) <= max_edits
            )
        part = part.select(F.lit(qid).alias("query_id"), "term", "df")
        expansions = part if expansions is None else expansions.unionByName(part)
    return _expansion_topk(term_stats, expansions, n_docs, avgdl, k, k1, b)


def osa_distance_leq(s: str, t: str, k: int) -> bool:
    """OSA (restricted Damerau-Levenshtein) distance <= k, banded DP
    with early exit — each string position only examines the 2k+1
    diagonal band, so the test is O(len * k) per candidate."""
    n, m = len(s), len(t)
    if abs(n - m) > k:
        return False
    big = k + 1
    prev2: list[int] = []
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [big] * m
        lo, hi = max(1, i - k), min(m, i + k)
        for j in range(lo, hi + 1):
            cost = 0 if s[i - 1] == t[j - 1] else 1
            best = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost
            )
            if (
                i > 1 and j > 1
                and s[i - 1] == t[j - 2] and s[i - 2] == t[j - 1]
            ):
                best = min(best, prev2[j - 2] + 1)
            cur[j] = best
        if min(cur[max(0, lo - 1):hi + 1]) > k:
            return False
        prev2, prev = prev, cur
    return prev[m] <= k


def _osa_leq_udf(target: str, max_edits: int):
    # `from __future__ import annotations` stringifies hints, so the
    # pandas_udf type resolver needs `pd` importable from globals
    import pandas as pd

    globals().setdefault("pd", pd)

    @F.pandas_udf("boolean")
    def osa(terms: "pd.Series") -> "pd.Series":
        return terms.map(
            lambda s: osa_distance_leq(s, target, max_edits)
        )

    return osa


def bm25_filtered_topk(
    spark: SparkSession,
    term_stats: DataFrame,
    term_df: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    n_docs: int,
    avgdl: float,
    doc_meta: DataFrame,
    filter_expr: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """ES bool FILTER CONTEXT: a scored must (BM25 over the analyzed
    query) restricted by metadata predicates that contribute NO score —
    ``{"bool": {"must": [{"match": ...}], "filter": [{"range": ...},
    {"exists": ...}, {"term": ...}]}}``, the most common production
    query shape (tenant/date/status filters around every search).

    ``filter_expr`` is a SQL predicate over ``doc_meta`` columns (range
    / exists (IS NOT NULL) / term equality compose with AND/OR). The
    plan is the scale-right one: the predicate is applied to the
    metadata table BEFORE anything else, so Catalyst pushes it into the
    parquet scan (row-group pruning on min/max stats — a date filter
    over a date-partitioned 100 TB corpus prunes partitions outright),
    and the surviving doc_ids semi-join the scored set (no score
    perturbation, no row duplication, exactly filter-context caching
    semantics)."""
    from elasticsearch_analysis_combo_spark.query.bm25 import bm25_scored

    allowed = doc_meta.filter(F.expr(filter_expr)).select("doc_id")
    scored = bm25_scored(
        spark, term_stats, term_df, queries, config, n_docs, avgdl,
        k1=k1, b=b,
    ).join(allowed, "doc_id", "semi")
    return _rank_topk(scored, k)


def match_bool_prefix_topk(
    spark: SparkSession,
    term_stats: DataFrame,
    term_df: DataFrame,
    queries: list[tuple[int, str]],
    config: ComboConfig,
    n_docs: int,
    avgdl: float,
    k: int | None = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_expansions: int = 50,
) -> DataFrame:
    """ES ``match_bool_prefix`` (search-as-you-type's query side): every
    analyzed term except the LAST matches as a term query, the last as
    a prefix — all in a bool should, so docs rank by the BM25 sum over
    full terms plus the prefix's expansion. The expansion stays a
    DISTRIBUTED dictionary subquery capped at ``max_expansions`` per
    query (dictionary order, the ES tie rule) via a rank window —
    startswith pushdown + WindowGroupLimit keep it scan-bounded; no
    driver-side collect."""
    from pyspark.sql import Window as W

    from elasticsearch_analysis_combo_spark.analysis.combo import (
        analyze_text,
    )

    rows = []
    for qid, text in queries:
        # token ORDER matters here (the LAST token is the prefix), so
        # analyze directly instead of analyze_queries' sorted-distinct —
        # and split the prefix off BEFORE deduplicating, else a query
        # whose last token repeats an earlier one ("new york new")
        # would promote the wrong token to prefix duty
        toks = [t.term for t in analyze_text(text, config)]
        if not toks:
            continue
        prefix = toks[-1]
        full, seen = [], set()
        for term in toks[:-1]:
            if term not in seen:
                seen.add(term)
                full.append(term)
        rows.append((qid, full, prefix))
    if not rows:
        if k is None:
            return tiny_df(spark,
                [], "query_id int, doc_id long, score double"
            )
        return tiny_df(spark,
            [], "query_id int, rank int, doc_id long, score double"
        )
    # exact clauses: (query_id, term, df) straight from the dictionary
    exact_pairs = sorted(
        {(qid, t) for qid, full, _ in rows for t in full}
    )
    parts = []
    if exact_pairs:
        qt = tiny_df(spark, exact_pairs, "query_id int, term string")
        parts.append(term_df.join(F.broadcast(qt), "term").select(
            "query_id", "term", "df"
        ))
    # prefix clause per query: capped dictionary expansion
    for qid, _, prefix in rows:
        w = W.partitionBy(F.lit(qid)).orderBy(F.asc("term"))
        parts.append(
            term_df.filter(F.col("term").startswith(prefix))
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= max_expansions)
            .select(F.lit(qid).alias("query_id"), "term", "df")
        )
    expansions = parts[0]
    for p in parts[1:]:
        expansions = expansions.unionByName(p)
    # a term matched both exactly and via the prefix scores once (ES
    # dedups identical clauses in the bool)
    expansions = expansions.dropDuplicates(["query_id", "term"])
    return _expansion_topk(term_stats, expansions, n_docs, avgdl, k, k1, b)
