"""Round-4h: ES nested query (map-only array<struct> algebra)."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.query.relations import nested_query


@pytest.fixture(scope="module")
def nested(spark):
    rows = [
        (1, [(1, 10.0, 100.0), (2, 50.0, 500.0), (3, 60.0, 300.0)]),
        (2, [(1, 70.0, 900.0)]),
        (3, [(1, 5.0, 50.0), (2, 8.0, 80.0)]),
        (4, []),
    ]
    return spark.createDataFrame(
        rows,
        "id long, items array<struct<ln:int, qty:double, price:double>>",
    )


def test_nested_match_and_score(spark, nested):
    got = {
        r["id"]: (r["n_nested"], r["score"])
        for r in nested_query(
            nested, "items", "x.qty >= 50", score_mode="max",
            score_expr="x.price",
        ).collect()
    }
    # doc 1: two matching items (qty 50, 60) -> max price 500
    # doc 2: one matching item -> 900; docs 3, 4: none
    assert got == {1: (2, 500.0), 2: (1, 900.0)}


def test_nested_min_children_and_modes(spark, nested):
    assert {
        r["id"] for r in nested_query(
            nested, "items", "x.qty >= 50", min_children=2
        ).collect()
    } == {1}
    by_mode = {}
    for mode in ("sum", "min", "avg"):
        r = nested_query(
            nested, "items", "x.qty >= 50", score_mode=mode,
            score_expr="x.price",
        ).filter("id = 1").collect()[0]
        by_mode[mode] = r["score"]
    assert by_mode == {"sum": 800.0, "min": 300.0, "avg": 400.0}


def test_nested_inner_hits_and_validation(spark, nested):
    r = nested_query(
        nested, "items", "x.qty >= 50", inner_hits=True
    ).filter("id = 1").collect()[0]
    assert [h["ln"] for h in r["items_hits"]] == [2, 3]
    # original array column untouched
    assert len(r["items"]) == 3
    with pytest.raises(ValueError):
        nested_query(nested, "items", "x.qty > 0", score_mode="median",
                     score_expr="x.price")
    with pytest.raises(ValueError):
        nested_query(nested, "items", "x.qty > 0", score_mode="sum")


def test_nested_is_map_only(spark, nested):
    plan = nested_query(
        nested, "items", "x.qty >= 50", score_mode="sum",
        score_expr="x.price",
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------- combined_fields

def test_combined_fields_blend(spark):
    import math

    from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig
    from elasticsearch_analysis_combo_spark.analysis.udfs import (
        build_term_stats,
    )
    from elasticsearch_analysis_combo_spark.query.multifield import (
        combined_fields_topk,
    )

    cfg = ComboConfig(["whitespace"])
    docs = spark.createDataFrame(
        [(0, "apple pie", "apple tart recipe"),
         (1, "banana", "apple banana split"),
         (2, "cherry", "cherry jam")],
        "doc_id long, title string, body string",
    )
    stats = {
        f: build_term_stats(docs, cfg, content_col=f)
        for f in ("title", "body")
    }
    weights = {"title": 2.0, "body": 1.0}
    got = {
        r["doc_id"]: r["score"]
        for r in combined_fields_topk(
            spark, stats, [(0, "apple")], cfg, weights=weights,
        ).collect()
    }
    # hand replay: wtf = 2*tf_title + 1*tf_body; wdl = 2*dl_t + dl_b
    k1, b = 1.2, 0.75
    wtf = {0: 2 * 1 + 1 * 1, 1: 1.0}
    wdl = {0: 2 * 2 + 3, 1: 2 * 1 + 3, 2: 2 * 1 + 2}
    n, avgdl = 3, sum(wdl.values()) / 3
    df = 2  # docs 0 and 1 contain "apple" in some field
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    for d in (0, 1):
        want = idf * wtf[d] * (k1 + 1) / (
            wtf[d] + k1 * (1 - b + b * wdl[d] / avgdl)
        )
        assert got[d] == pytest.approx(want, rel=1e-12)
    assert 2 not in got
    # one saturation over the blended tf: doc 0 (both fields) must beat
    # doc 1 (one field) but by LESS than 2x (saturation), unlike a
    # per-field sum which would double-count
    assert got[0] > got[1]


def test_combined_fields_engine_validation(spark, tmp_path):
    from elasticsearch_analysis_combo_spark.engine import (
        MultiFieldSearchEngine,
    )

    docs = spark.createDataFrame(
        [(0, "apple pie", "tart recipe")],
        "doc_id long, title string, body string",
    )
    from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig

    eng = MultiFieldSearchEngine(
        spark,
        {"title": ComboConfig(["whitespace"]),
         "body": ComboConfig(["keyword"])},
        str(tmp_path / "mf"),
    )
    eng.index(docs, field_cols={"title": "title", "body": "body"})
    with pytest.raises(ValueError):
        eng.combined_fields("apple")


# --------------------------------------------------------- significant_text

def test_significant_text_jlh(spark):
    from elasticsearch_analysis_combo_spark.query.facets import (
        significant_text_agg,
    )

    docs = spark.createDataFrame(
        [(0, "crash crash disk error"),   # match (crash): dup-token doc
         (1, "crash kernel panic"),
         (2, "crash disk full"),
         (3, "sunny day outside"),
         (4, "warm sunny day")],
        "doc_id long, text string",
    )
    got = {
        r["term"]: (r["fg_df"], r["bg_df"], r["score"])
        for r in significant_text_agg(
            docs, "array_contains(split(text, ' '), 'crash')",
            min_doc_count=2, exclude=["crash"],
        ).collect()
    }
    # per-doc dedup: doc 0's repeated "crash" counts once; "disk" is in
    # 2/3 matching docs, 2/5 overall
    assert "crash" not in got
    assert got["disk"][:2] == (2, 2)
    fg_pct, bg_pct = 2 / 3, 2 / 5
    assert got["disk"][2] == pytest.approx(
        round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6), abs=1e-6
    )
    # terms absent from the match set never rank
    assert "sunny" not in got


def test_significant_text_sampling_and_empty(spark):
    from elasticsearch_analysis_combo_spark.query.facets import (
        significant_text_agg,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta common") for i in range(20)]
        + [(100 + i, "common other") for i in range(20)],
        "doc_id long, text string",
    )
    full = significant_text_agg(
        docs, "array_contains(split(text, ' '), 'alpha')",
        min_doc_count=2,
    ).collect()
    assert [r["term"] for r in full][:2] == ["alpha", "beta"]
    sampled = significant_text_agg(
        docs, "array_contains(split(text, ' '), 'alpha')",
        min_doc_count=2, sample_fraction=0.5, seed=7,
    ).collect()
    assert {r["term"] for r in sampled} <= {"alpha", "beta", "common"}
    empty = significant_text_agg(
        docs, "array_contains(split(text, ' '), 'zzz')",
    )
    assert empty.count() == 0
