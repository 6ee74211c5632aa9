"""Boolean (must/should/must_not) and prefix query semantics against a
hand-checkable micro-corpus."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig
from elasticsearch_analysis_combo_spark.analysis.udfs import build_term_stats
from elasticsearch_analysis_combo_spark.query.boolean import (
    bm25_boolean_topk,
    bm25_prefix_topk,
)

CFG = ComboConfig(["whitespace"])

DOCS = [
    (1, "spark query engine"),
    (2, "spark merge engine"),
    (3, "query window table"),
    (4, "spark query window"),
    (5, "unrelated content here"),
]


@pytest.fixture(scope="module")
def stats(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, content string")
    s = build_term_stats(df, CFG).cache()
    s.count()
    return s


def _run_bool(spark, stats, queries, k=10):
    term_df = stats.groupBy("term").agg(F.count("*").alias("df"))
    row = (
        stats.select("doc_id", "dl").distinct()
        .agg(F.count("*").alias("n"), F.avg("dl").alias("a")).collect()[0]
    )
    out = bm25_boolean_topk(
        spark, stats, term_df, queries, CFG,
        int(row["n"]), float(row["a"]), k=k,
    )
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r["query_id"], []).append(r["doc_id"])
    return by_q


def test_must_not_excludes(spark, stats):
    by_q = _run_bool(spark, stats, [(0, "spark", "", "merge")])
    # docs with spark: 1,2,4; doc 2 has merge -> excluded
    assert sorted(by_q[0]) == [1, 4]


def test_pure_should_needs_one_match(spark, stats):
    by_q = _run_bool(spark, stats, [(0, "", "window table", "")])
    assert sorted(by_q[0]) == [3, 4]


def test_should_boosts_rank_not_filter(spark, stats):
    by_q = _run_bool(spark, stats, [(0, "spark", "query", "")])
    # all spark docs stay; those with query score higher
    assert set(by_q[0]) == {1, 2, 4}
    assert by_q[0][0] != 2 if by_q[0] else True


def test_must_and_must_not_same_term_is_empty(spark, stats):
    by_q = _run_bool(spark, stats, [(0, "spark", "", "spark")])
    assert by_q.get(0, []) == []


def test_pure_negative_returns_empty(spark, stats):
    by_q = _run_bool(spark, stats, [(0, "", "", "spark")])
    assert by_q.get(0, []) == []


def test_prefix_empty_and_missing(spark, stats):
    term_df = stats.groupBy("term").agg(F.count("*").alias("df"))
    out = bm25_prefix_topk(spark, stats, term_df, [], 5, 3.0)
    assert out.count() == 0
    out2 = bm25_prefix_topk(spark, stats, term_df, [(0, "zzz")], 5, 3.0)
    assert out2.count() == 0
    out3 = bm25_prefix_topk(spark, stats, term_df, [(0, "sp")], 5, 3.0)
    assert sorted(r["doc_id"] for r in out3.collect()) == [1, 2, 4]


def _run_bool_opts(spark, stats, queries, **kw):
    term_df = stats.groupBy("term").agg(F.count("*").alias("df"))
    row = (
        stats.select("doc_id", "dl").distinct()
        .agg(F.count("*").alias("n"), F.avg("dl").alias("a")).collect()[0]
    )
    out = bm25_boolean_topk(
        spark, stats, term_df, queries, CFG,
        int(row["n"]), float(row["a"]), k=10, **kw,
    )
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    return by_q


def test_minimum_should_match_filters(spark, stats):
    # should = "query window table": doc3 matches 3, doc4 matches 2,
    # doc1 matches 1 (query), doc2 none
    q = [(0, "", "query window table", "")]
    ids = lambda by: sorted(d for d, _ in by.get(0, []))
    assert ids(_run_bool_opts(spark, stats, q, minimum_should_match=1)) == [1, 3, 4]
    assert ids(_run_bool_opts(spark, stats, q, minimum_should_match=2)) == [3, 4]
    assert ids(_run_bool_opts(spark, stats, q, minimum_should_match=3)) == [3]
    # impossible msm -> empty
    assert ids(_run_bool_opts(spark, stats, q, minimum_should_match=4)) == []


def test_msm_with_must_clause(spark, stats):
    # must spark (docs 1,2,4) AND >=2 of should "query window table"
    q = [(0, "spark", "query window table", "")]
    got = _run_bool_opts(spark, stats, q, minimum_should_match=2)
    assert sorted(d for d, _ in got[0]) == [4]
    # msm on a query with NO should terms does not filter pure musts
    q2 = [(1, "spark", "", "")]
    got2 = _run_bool_opts(spark, stats, q2, minimum_should_match=2)
    assert sorted(d for d, _ in got2[1]) == [1, 2, 4]


def test_clause_boosts_scale_scores(spark, stats):
    q = [(0, "spark", "query", "")]
    base = _run_bool_opts(spark, stats, q)
    boosted = _run_bool_opts(spark, stats, q, must_boost=2.0, should_boost=0.5)
    base_s = dict(base[0])
    boos_s = dict(boosted[0])
    assert set(base_s) == set(boos_s)
    # doc 2 matches only the must term -> its score scales exactly 2x
    assert abs(boos_s[2] - 2.0 * base_s[2]) < 1e-9
    # docs matching should too scale by less than 2x (should part damped)
    assert boos_s[4] < 2.0 * base_s[4] - 1e-12


def test_msm_default_zero_is_backward_compatible(spark, stats):
    # default path: empty must => >=1 should (legacy behavior)
    by_q = _run_bool_opts(spark, stats, [(0, "", "window table", "")])
    assert sorted(d for d, _ in by_q[0]) == [3, 4]


def test_more_like_this(spark, stats):
    """MLT: seed's top tf*idf terms query as OR; seed excluded; docs
    sharing more seed terms rank higher."""
    from elasticsearch_analysis_combo_spark.query.morelikethis import (
        more_like_this,
    )

    term_df = stats.groupBy("term").agg(F.count("*").alias("df"))
    row = (
        stats.select("doc_id", "dl").distinct()
        .agg(F.count("*").alias("n"), F.avg("dl").alias("a")).collect()[0]
    )
    out = more_like_this(
        spark, stats, term_df, [1], int(row["n"]), float(row["a"]),
        min_doc_freq=2, k=10,
    ).collect()
    ids = [r["doc_id"] for r in out]
    assert 1 not in ids                      # seed excluded
    # doc 1 = "spark query engine"; doc 4 shares spark+query, doc 2
    # shares spark+engine, doc 3 shares query -> all present, doc 5 absent
    assert set(ids) == {2, 3, 4}
    assert out[0]["rank"] == 1

    # empty seeds -> empty frame
    empty = more_like_this(
        spark, stats, term_df, [], int(row["n"]), float(row["a"])
    )
    assert empty.count() == 0

    # unknown seed id -> no rows for that query
    unk = more_like_this(
        spark, stats, term_df, [999], int(row["n"]), float(row["a"])
    )
    assert unk.count() == 0


# ---------------------------------------------------------------------------
# bool filter context (round 4)


def test_filter_context_restricts_without_rescoring(spark, stats):
    from elasticsearch_analysis_combo_spark.query.bm25 import (
        bm25_exhaustive_topk,
    )
    from elasticsearch_analysis_combo_spark.query.boolean import (
        bm25_filtered_topk,
    )

    meta = spark.createDataFrame(
        [(1, 100, "a"), (2, 300, "a"), (3, 250, None), (4, 50, "b"),
         (5, 400, "a")],
        "doc_id long, n_chars int, tenant string",
    )
    term_df = stats.groupBy("term").agg(F.count("*").alias("df"))
    row = (
        stats.select("doc_id", "dl").distinct()
        .agg(F.count("*").alias("n"), F.avg("dl").alias("a")).collect()[0]
    )
    n, avgdl = int(row["n"]), float(row["a"])
    out = bm25_filtered_topk(
        spark, stats, term_df, [(0, "spark query")], CFG, n, avgdl,
        meta, "n_chars >= 100 AND tenant IS NOT NULL", k=10,
    ).collect()
    # docs 3 (null tenant) and 4 (n_chars < 100) are filtered out;
    # doc 5 passes the filter but matches no term
    assert {r["doc_id"] for r in out} == {1, 2}
    # filter context contributes NO score: surviving scores equal the
    # unfiltered exhaustive scores for the same docs
    base = {
        r["doc_id"]: round(r["score"], 6)
        for r in bm25_exhaustive_topk(
            spark, stats, term_df, [(0, "spark query")], CFG, n, avgdl,
            k=10,
        ).collect()
    }
    for r in out:
        assert abs(r["score"] - base[r["doc_id"]]) < 1e-6


def test_match_bool_prefix(spark, stats):
    from elasticsearch_analysis_combo_spark.query.boolean import (
        bm25_boolean_topk,
        match_bool_prefix_topk,
    )

    term_df = stats.groupBy("term").agg(F.count("*").alias("df"))
    row = (
        stats.select("doc_id", "dl").distinct()
        .agg(F.count("*").alias("n"), F.avg("dl").alias("a")).collect()[0]
    )
    n, avgdl = int(row["n"]), float(row["a"])
    # "spark quer" -> exact 'spark' + prefix 'quer' (expands to 'query')
    out = match_bool_prefix_topk(
        spark, stats, term_df, [(0, "spark quer")], CFG, n, avgdl, k=10
    ).collect()
    got = {r["doc_id"] for r in out}
    # docs with spark or any quer*-term: 1,2,4 have spark; 3 has query
    assert got == {1, 2, 3, 4}
    # equals the pure-should bool over the expanded terms
    ref = bm25_boolean_topk(
        spark, stats, term_df, [(0, "", "spark query", "")], CFG, n, avgdl,
        k=10,
    ).collect()
    assert {(r["doc_id"], round(r["score"], 9)) for r in out} == {
        (r["doc_id"], round(r["score"], 9)) for r in ref
    }
    # cap: max_expansions=0 would be invalid usage; cap=1 keeps the
    # alphabetically first quer*-expansion only
    out1 = match_bool_prefix_topk(
        spark, stats, term_df, [(0, "quer")], CFG, n, avgdl, k=10,
        max_expansions=1,
    ).collect()
    assert {r["doc_id"] for r in out1} == {1, 3, 4}


def test_match_bool_prefix_repeated_last_token(spark, stats):
    from elasticsearch_analysis_combo_spark.query.boolean import (
        match_bool_prefix_topk,
    )

    term_df = stats.groupBy("term").agg(F.count("*").alias("df"))
    row = (
        stats.select("doc_id", "dl").distinct()
        .agg(F.count("*").alias("n"), F.avg("dl").alias("a")).collect()[0]
    )
    n, avgdl = int(row["n"]), float(row["a"])
    # "spark engine spark": last token repeats the first — the PREFIX
    # must still be 'spark', with 'spark'/'engine' as the exact clauses
    out = match_bool_prefix_topk(
        spark, stats, term_df, [(0, "spark engine spark")], CFG, n, avgdl,
        k=10,
    ).collect()
    # identical term set as "spark engine" (spark* expands to spark only)
    ref = match_bool_prefix_topk(
        spark, stats, term_df, [(0, "engine spark")], CFG, n, avgdl, k=10
    ).collect()
    assert {(r["doc_id"], round(r["score"], 9)) for r in out} == {
        (r["doc_id"], round(r["score"], 9)) for r in ref
    }
