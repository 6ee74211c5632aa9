"""Round-4b surfaces: aggregation breadth (percentiles, weighted_avg,
filters, adjacency_matrix, top_hits, composite paging, matrix_stats),
compound queries (boosting, constant_score, terms_set, random_score),
and embedding-cosine near-duplicates."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig
from elasticsearch_analysis_combo_spark.analysis.udfs import build_term_stats
from elasticsearch_analysis_combo_spark.operators.similarity import (
    cosine_near_duplicates,
)
from elasticsearch_analysis_combo_spark.query.compound import (
    boosting_topk,
    constant_score_topk,
    random_score_topk,
    terms_set_topk,
)
from elasticsearch_analysis_combo_spark.query.facets import (
    adjacency_matrix_agg,
    composite_agg,
    filters_agg,
    matrix_stats_agg,
    percentiles_agg,
    top_hits_agg,
    weighted_avg_agg,
)

CFG = ComboConfig(["whitespace"])


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "spark merge fast", "src0", 10),
        (1, "spark spark slow", "src0", 21),
        (2, "merge value window", "src1", 32),
        (3, "window spark value", "src1", 43),
        (4, "value value value", "src1", 54),
        (5, "quiet empty doc", "src0", 65),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )


@pytest.fixture(scope="module")
def stats(spark, corpus):
    s = build_term_stats(corpus, CFG, content_col="text").cache()
    s.count()
    return s


@pytest.fixture(scope="module")
def term_df(stats):
    return stats.groupBy("term").agg(F.count("*").alias("df"))


# ---------------------------------------------------------------------------
# aggregations


def test_percentiles_interpolated(spark):
    rows = [("a", float(v)) for v in [1, 2, 3, 4]] + [("b", 10.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        (r["g"], r["percent"]): r["value"]
        for r in percentiles_agg(df, "v", [0.5, 0.25], group_col="g").collect()
    }
    # linear interpolation between closest ranks (percentile_cont)
    assert out[("a", 0.5)] == pytest.approx(2.5)
    assert out[("a", 0.25)] == pytest.approx(1.75)
    assert out[("b", 0.5)] == pytest.approx(10.0)


def test_percentiles_global(spark):
    df = spark.createDataFrame([(float(v),) for v in range(1, 101)], "v double")
    out = {r["percent"]: r["value"] for r in
           percentiles_agg(df, "v", [0.95]).collect()}
    assert out[0.95] == pytest.approx(95.05)


def test_weighted_avg(spark):
    df = spark.createDataFrame(
        [("a", 10.0, 1.0), ("a", 20.0, 3.0), ("b", 5.0, 2.0)],
        "g string, v double, w double",
    )
    out = {r["g"]: r["weighted_avg"] for r in
           weighted_avg_agg(df, "v", "w", group_col="g").collect()}
    assert out["a"] == pytest.approx((10 + 60) / 4.0)
    assert out["b"] == pytest.approx(5.0)


def test_filters_agg_counts_and_empty_bucket(spark, stats):
    out = {
        r["name"]: r["doc_count"]
        for r in filters_agg(
            spark, stats,
            {"sp": "spark", "val": "value window", "none": "zzz"},
            CFG,
        ).collect()
    }
    assert out == {"sp": 3, "val": 3, "none": 0}


def test_adjacency_matrix(spark, stats):
    out = {
        r["key"]: r["doc_count"]
        for r in adjacency_matrix_agg(
            spark, stats,
            {"sp": "spark", "val": "value", "quiet": "quiet"},
            CFG,
        ).collect()
    }
    # docs: sp={0,1,3}, val={2,3,4}, quiet={5}
    assert out["sp"] == 3 and out["val"] == 3 and out["quiet"] == 1
    assert out["sp&val"] == 1  # doc 3 only
    assert "quiet&sp" not in out and "quiet&val" not in out  # empty omitted


def test_top_hits_two_stage_matches_naive(spark, corpus):
    out = top_hits_agg(corpus, "source", "n_chars", k=2).collect()
    got = {(r["source"], r["hit_rank"]): r["doc_id"] for r in out}
    # src0 by n_chars desc: doc5 (65), doc1 (21); src1: doc4 (54), doc3 (43)
    assert got[("src0", 1)] == 5 and got[("src0", 2)] == 1
    assert got[("src1", 1)] == 4 and got[("src1", 2)] == 3


def test_top_hits_tiebreak_doc_id(spark):
    df = spark.createDataFrame(
        [(1, "g", 7), (2, "g", 7), (3, "g", 7)],
        "doc_id long, source string, n_chars long",
    )
    out = [r["doc_id"] for r in
           top_hits_agg(df, "source", "n_chars", k=2).orderBy("hit_rank").collect()]
    assert out == [1, 2]


def test_composite_pages_partition_full_order(spark, corpus):
    full = [
        (r["source"], r["doc_id"])
        for r in corpus.selectExpr("source", "doc_id")
        .groupBy("source", "doc_id").count()
        .orderBy("source", "doc_id").collect()
    ]
    pages, after = [], None
    while True:
        page = composite_agg(
            corpus, ["source", "doc_id"], size=2, after=after
        ).collect()
        if not page:
            break
        pages.extend((r["source"], r["doc_id"]) for r in page)
        after = (page[-1]["source"], page[-1]["doc_id"])
    assert pages == full  # pages concatenate to the exact full key order


def test_composite_after_key_arity_checked(spark, corpus):
    with pytest.raises(ValueError):
        composite_agg(corpus, ["source", "doc_id"], after=("x",))


def test_matrix_stats_matches_numpy(spark):
    rng = np.random.RandomState(0)
    a = rng.standard_normal(50)
    b = 2.0 * a + rng.standard_normal(50) * 0.1
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in zip(a, b)], "x double, y double"
    )
    rows = {(r["col_a"], r["col_b"]): r for r in
            matrix_stats_agg(df, ["x", "y"]).collect()}
    r = rows[("x", "y")]
    assert r["count"] == 50
    assert r["mean_a"] == pytest.approx(a.mean())
    assert r["covariance"] == pytest.approx(np.cov(a, b, bias=True)[0, 1])
    assert r["correlation"] == pytest.approx(np.corrcoef(a, b)[0, 1])
    assert rows[("x", "x")]["correlation"] == pytest.approx(1.0)
    assert rows[("x", "x")]["covariance"] == pytest.approx(a.var())


# ---------------------------------------------------------------------------
# compound queries


def _corpus_consts(stats):
    row = (
        stats.select("doc_id", "dl").distinct()
        .agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
    )
    return int(row["n"]), float(row["avgdl"])


def test_boosting_demotes_not_excludes(spark, stats, term_df):
    n, avgdl = _corpus_consts(stats)
    plain = boosting_topk(
        spark, stats, term_df, [(0, "spark", "")], CFG, n, avgdl, k=10,
    ).collect()
    boosted = boosting_topk(
        spark, stats, term_df, [(0, "spark", "slow")], CFG, n, avgdl,
        k=10, negative_boost=0.5,
    ).collect()
    p = {r["doc_id"]: r["score"] for r in plain}
    q = {r["doc_id"]: r["score"] for r in boosted}
    assert set(p) == set(q)  # demoted, never dropped
    assert q[1] == pytest.approx(p[1] * 0.5)  # doc 1 contains "slow"
    assert q[0] == pytest.approx(p[0])  # doc 0 untouched


def test_constant_score(spark, stats):
    out = constant_score_topk(spark, stats, [(0, "value")], CFG, k=10, boost=2.5)
    rows = out.collect()
    assert {r["doc_id"] for r in rows} == {2, 3, 4}
    assert all(r["score"] == 2.5 for r in rows)
    # _doc tiebreak: rank follows doc_id ascending
    assert [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])] == [2, 3, 4]


def test_terms_set_required_from_field(spark, stats, term_df, corpus):
    n, avgdl = _corpus_consts(stats)
    # required = 2 for every doc
    out = terms_set_topk(
        spark, stats, term_df, [(0, "spark merge window")], CFG,
        corpus, "2", n, avgdl, k=10,
    )
    # docs matching >=2 of {spark, merge, window}: 0 (spark, merge),
    # 2 (merge, window), 3 (window, spark)
    assert {r["doc_id"] for r in out.collect()} == {0, 2, 3}


def test_terms_set_required_clamped_to_n_terms(spark, stats, term_df, corpus):
    n, avgdl = _corpus_consts(stats)
    # required = 99 clamps to n_terms (1): plain one-term match
    out = terms_set_topk(
        spark, stats, term_df, [(0, "quiet")], CFG, corpus, "99",
        n, avgdl, k=10,
    )
    assert {r["doc_id"] for r in out.collect()} == {5}


def test_random_score_deterministic_and_bounded(spark, stats):
    a = random_score_topk(spark, stats, [(0, "value")], CFG, seed=7, k=10).collect()
    b = random_score_topk(spark, stats, [(0, "value")], CFG, seed=7, k=10).collect()
    c = random_score_topk(spark, stats, [(0, "value")], CFG, seed=8, k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]
    assert all(0.0 <= r["score"] < 1.0 for r in a)
    assert {r["doc_id"] for r in a} == {r["doc_id"] for r in c}  # same match set
    assert [r["doc_id"] for r in a] != [r["doc_id"] for r in c]  # reshuffled


def test_random_score_matches_portable_hash(spark, stats):
    import hashlib

    out = random_score_topk(spark, stats, [(0, "value")], CFG, seed=7, k=10)
    for r in out.collect():
        h = int(hashlib.md5(f"7#{r['doc_id']}".encode()).hexdigest()[:15], 16)
        assert r["score"] == pytest.approx(h / float(1 << 60))


# ---------------------------------------------------------------------------
# embedding near-dup


def test_cosine_near_duplicates_finds_planted_pair(spark):
    rng = np.random.RandomState(3)
    base = rng.standard_normal((30, 16))
    base[7] = base[3] + rng.standard_normal(16) * 0.01  # planted near-dup
    emb = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    out = cosine_near_duplicates(
        emb, threshold=0.95, n_planes=16, bands=8, seed=11
    ).collect()
    pairs = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in out}
    assert (3, 7) in pairs
    na, nb = base[3] / np.linalg.norm(base[3]), base[7] / np.linalg.norm(base[7])
    assert pairs[(3, 7)] == pytest.approx(float(na @ nb))
    # random 16-dim vectors don't reach 0.95 cosine
    assert all(k == (3, 7) for k in pairs)


def test_cosine_near_duplicates_threshold_cuts(spark):
    rng = np.random.RandomState(5)
    base = rng.standard_normal((10, 8))
    base[1] = base[0] * 2.0  # exact colinear pair, cosine 1
    emb = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    hi = cosine_near_duplicates(emb, threshold=0.999, n_planes=8, bands=8, seed=1)
    got = [(r["vec_a"], r["vec_b"]) for r in hi.collect()]
    assert got == [(0, 1)]
