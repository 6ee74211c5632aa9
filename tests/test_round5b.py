"""Round-5b operators: terms agg ordered by sub-agg metric, histogram
extended_bounds / min_doc_count=0, significant_text filter_duplicate_text
+ background_filter."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.query.facets import (
    histogram_bounded_agg,
    significant_text_agg,
    terms_agg_ordered,
)


@pytest.fixture(scope="module")
def orders_like(spark):
    rows = [
        # (key, price): 'a' has many cheap rows, 'b' few expensive ones —
        # doc_count order and avg order must DISAGREE
        *[("a", 10.0 + i) for i in range(6)],
        ("b", 1000.0), ("b", 2000.0),
        ("c", 500.0), ("c", 600.0), ("c", 700.0),
    ]
    return spark.createDataFrame(rows, "key string, price double")


def test_terms_ordered_by_metric_disagrees_with_doc_count(orders_like):
    out = terms_agg_ordered(
        orders_like, "key", {"avg_price": "avg(price)"},
        order_by="avg_price", size=3,
    ).collect()
    assert [r["key"] for r in out] == ["b", "c", "a"]
    assert [r["rank"] for r in out] == [1, 2, 3]
    by_count = terms_agg_ordered(
        orders_like, "key", {"avg_price": "avg(price)"},
        order_by="doc_count", size=3,
    ).collect()
    assert [r["key"] for r in by_count] == ["a", "c", "b"]


def test_terms_ordered_key_order_and_ascending(orders_like):
    out = terms_agg_ordered(
        orders_like, "key", {"mx": "max(price)"}, order_by="_key",
        size=2, ascending=True,
    ).collect()
    assert [r["key"] for r in out] == ["a", "b"]
    asc = terms_agg_ordered(
        orders_like, "key", {"mx": "max(price)"}, order_by="mx",
        size=3, ascending=True,
    ).collect()
    assert [r["key"] for r in asc] == ["a", "c", "b"]


def test_terms_ordered_min_doc_count(orders_like):
    out = terms_agg_ordered(
        orders_like, "key", {"avg_price": "avg(price)"},
        order_by="avg_price", size=10, min_doc_count=3,
    ).collect()
    assert {r["key"] for r in out} == {"a", "c"}


def test_histogram_extended_bounds_emits_empty_buckets(spark):
    rows = [("g", 5.0), ("g", 17.0), ("g", 18.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = histogram_bounded_agg(
        df, "v", 10.0, extended_bounds=(-20.0, 40.0), min_doc_count=0,
        group_col="grp",
    ).collect()
    got = {(r["bucket"], r["doc_count"]) for r in out}
    # axis -2..4: data span 0..1 widened to bounds floor(-20/10)=-2,
    # floor(40/10)=4; empties at -20,-10,20,30,40
    assert got == {
        (-20.0, 0), (-10.0, 0), (0.0, 1), (10.0, 2), (20.0, 0),
        (30.0, 0), (40.0, 0),
    }


def test_histogram_bounds_narrower_than_data_and_min_doc_count(spark):
    df = spark.createDataFrame(
        [(float(v),) for v in (-25, 5, 35)], "v double"
    )
    # bounds INSIDE the data span: axis must still cover the data
    out = histogram_bounded_agg(
        df, "v", 10.0, extended_bounds=(0.0, 10.0), min_doc_count=0,
    ).collect()
    buckets = sorted(r["bucket"] for r in out)
    assert buckets[0] == -30.0 and buckets[-1] == 30.0
    assert len(buckets) == 7
    # min_doc_count=1 degrades to the plain histogram (empties dropped)
    dense = histogram_bounded_agg(
        df, "v", 10.0, extended_bounds=(0.0, 100.0), min_doc_count=1,
    ).collect()
    assert sorted(r["bucket"] for r in dense) == [-30.0, 0.0, 30.0]


def test_histogram_nulls_excluded(spark):
    df = spark.createDataFrame([(1.0,), (None,), (11.0,)], "v double")
    out = histogram_bounded_agg(df, "v", 10.0).collect()
    assert sum(r["doc_count"] for r in out) == 2


@pytest.fixture(scope="module")
def sig_docs(spark):
    rows = []
    # every text unique (u<i> tail) so the base corpus has NO
    # pre-existing duplicates — the dup-filter test injects its own
    for i in range(8):
        rows.append((i, "hit rare shared tok%d u%d" % (i % 2, i), "en"))
    for i in range(8, 40):
        rows.append(
            (i, "shared other filler u%d" % i, "en" if i < 24 else "de")
        )
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_sig_text_filter_duplicate_text(spark, sig_docs):
    pred = "array_contains(split(text, ' '), 'hit')"
    base = significant_text_agg(
        sig_docs, pred, size=5, min_doc_count=2, exclude=["hit"]
    ).collect()
    # duplicate EVERY doc: without the knob all dfs double; with it the
    # min-id copy survives and stats are identical to the clean corpus
    dup = sig_docs.unionByName(
        sig_docs.withColumn("doc_id", F.col("doc_id") + F.lit(1000))
    )
    filtered = significant_text_agg(
        dup, pred, size=5, min_doc_count=2, exclude=["hit"],
        filter_duplicate_text=True,
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, filtered))
    # without the knob every df doubles (size=50: the u<i> one-doc
    # tokens now clear min_doc_count=2 and crowd a small top-k)
    unfiltered = significant_text_agg(
        dup, pred, size=50, min_doc_count=2, exclude=["hit"]
    ).collect()
    fg = {r["term"]: r["fg_df"] for r in base}
    fg_dup = {r["term"]: r["fg_df"] for r in unfiltered}
    assert all(fg_dup[t] == 2 * fg[t] for t in fg)


def test_sig_text_background_filter(spark, sig_docs):
    pred = "array_contains(split(text, ' '), 'hit')"
    out = significant_text_agg(
        sig_docs, pred, size=10, min_doc_count=2, exclude=["hit"],
        background_filter="lang = 'en'",
    ).collect()
    rows = {r["term"]: r for r in out}
    # 'shared' bg_df counts only the 24 en docs (8 hit + 16 filler-en)
    assert rows["shared"]["bg_df"] == 24
    # fg stays unfiltered: all 8 hit docs
    assert rows["shared"]["fg_df"] == 8
    # JLH against the narrower background: n_bg = 24
    r = rows["shared"]
    fg_pct, bg_pct = r["fg_df"] / 8.0, r["bg_df"] / 24.0
    assert abs(r["score"] - (fg_pct - bg_pct) * (fg_pct / bg_pct)) < 1e-9
