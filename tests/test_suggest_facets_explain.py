"""Term/phrase suggester, regexp query, _explain decomposition, facets."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig
from elasticsearch_analysis_combo_spark.analysis.udfs import build_term_stats
from elasticsearch_analysis_combo_spark.query.bm25 import (
    bm25_exhaustive_topk,
    bm25_explain,
)
from elasticsearch_analysis_combo_spark.query.boolean import bm25_regexp_topk
from elasticsearch_analysis_combo_spark.query.facets import (
    search_facet_histogram,
    search_facet_terms,
)
from elasticsearch_analysis_combo_spark.query.suggest import (
    phrase_suggest,
    term_suggest,
)

CFG = ComboConfig(["whitespace"])


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "merge sort fast", "en", 100),
        (1, "merge merge slow sort", "en", 220),
        (2, "marge barge value", "de", 150),
        (3, "sort value fast fast", "en", 430),
        (4, "value value value", "fr", 90),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )


@pytest.fixture(scope="module")
def stats(spark, corpus):
    s = build_term_stats(corpus, CFG, content_col="text").cache()
    s.count()
    return s


@pytest.fixture(scope="module")
def term_df(stats):
    return stats.groupBy("term").agg(F.count("*").alias("df"))


def test_term_suggest_ranks_distance_then_df(spark, term_df):
    # input "merg": merge d=1 (df 2), marge d=2 (df 1)  -> distance wins
    out = term_suggest(spark, term_df, [(0, "merg")], max_edits=2, k=5)
    rows = [(r["rank"], r["suggestion"], r["distance"]) for r in
            out.orderBy("rank").collect()]
    assert rows[0] == (1, "merge", 1)
    assert ("marge" in [s for _, s, _ in rows])


def test_term_suggest_df_breaks_distance_ties(spark, term_df):
    # "valse": value d=2 (df 3); no other v-term  — then try "sost":
    # sort d=2 (df 3) vs slow d=3 (excluded)
    out = term_suggest(spark, term_df, [(0, "sost")], max_edits=2, k=5)
    rows = out.orderBy("rank").collect()
    assert rows[0]["suggestion"] == "sort"


def test_term_suggest_excludes_exact_unless_asked(spark, term_df):
    out = term_suggest(spark, term_df, [(0, "merge")], max_edits=1, k=5)
    assert "merge" not in [r["suggestion"] for r in out.collect()]
    out2 = term_suggest(
        spark, term_df, [(0, "merge")], max_edits=1, k=5, include_exact=True
    )
    got = {(r["suggestion"], r["distance"]) for r in out2.collect()}
    assert ("merge", 0) in got


def test_phrase_suggest_fixes_only_unknown_tokens(spark, term_df):
    out = phrase_suggest(
        spark, term_df, [(0, "merge sost fast"), (1, "value sort")],
        max_edits=2,
    )
    got = {r["query_id"]: (r["suggestion"], r["n_corrections"])
           for r in out.collect()}
    assert got[0] == ("merge sort fast", 1)
    assert got[1] == ("value sort", 0)


def test_regexp_expansion_scores_match_exhaustive(spark, stats, term_df):
    """'m.rge' expands to {merge, marge}; scoring a 2-term OR query of
    exactly those terms must give identical results."""
    n_docs = stats.select("doc_id").distinct().count()
    avgdl = (
        stats.select("doc_id", "dl").distinct().agg(F.avg("dl")).collect()[0][0]
    )
    rx = bm25_regexp_topk(
        spark, stats, term_df, [(0, "m.rge")], n_docs, avgdl, k=10
    )
    eq = bm25_exhaustive_topk(
        spark, stats, term_df, [(0, "merge marge")], CFG, n_docs, avgdl, k=10
    )
    r1 = [(r["doc_id"], round(r["score"], 9)) for r in rx.orderBy("rank").collect()]
    r2 = [(r["doc_id"], round(r["score"], 9)) for r in eq.orderBy("rank").collect()]
    assert r1 == r2


def test_explain_totals_match_exhaustive_scores(spark, stats, term_df):
    n_docs = stats.select("doc_id").distinct().count()
    avgdl = (
        stats.select("doc_id", "dl").distinct().agg(F.avg("dl")).collect()[0][0]
    )
    queries = [(0, "merge value")]
    exp = bm25_explain(
        spark, stats, term_df, queries, CFG, n_docs, avgdl
    )
    totals = {
        r["doc_id"]: round(r["total_score"], 9)
        for r in exp.select("doc_id", "total_score").distinct().collect()
    }
    top = bm25_exhaustive_topk(
        spark, stats, term_df, queries, CFG, n_docs, avgdl, k=100
    )
    for r in top.collect():
        assert totals[r["doc_id"]] == round(r["score"], 9)
    # contribution column really decomposes: one (doc, term) row per match
    row = exp.filter((F.col("doc_id") == 1) & (F.col("term") == "merge")).collect()[0]
    assert row["tf"] == 2
    assert row["df"] == 2


def test_facet_terms_counts_full_match_set(spark, stats, corpus):
    out = search_facet_terms(
        spark, stats, [(0, "value")], CFG, corpus, "lang", size=10
    )
    got = {(r["value"]): (r["rank"], r["doc_count"]) for r in out.collect()}
    # docs containing "value": 2 (de), 3 (en), 4 (fr) -> counts 1/1/1,
    # rank ties break by value ascending: de, en, fr
    assert got == {"de": (1, 1), "en": (2, 1), "fr": (3, 1)}


def test_significant_terms_foreground_lift(spark):
    """A term that co-occurs with the query term far above its background
    rate must outrank uniformly-spread terms; the query's own terms are
    excluded."""
    from elasticsearch_analysis_combo_spark.query.facets import (
        significant_terms,
    )

    rows = []
    # 10 docs with "anchor sig" (sig rides along), 40 docs with "noise",
    # "common" appears everywhere (no lift)
    for d in range(10):
        rows.append((d, "anchor sig common"))
    for d in range(10, 50):
        rows.append((d, "noise common"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = build_term_stats(df, CFG, content_col="text")
    out = significant_terms(
        spark, stats, [(0, "anchor")], CFG, n_docs=50, size=5,
        min_doc_count=2,
    ).collect()
    terms = [r["term"] for r in out]
    assert terms[0] == "sig"
    assert "anchor" not in terms  # query term excluded
    row = out[0]
    assert row["fg_df"] == 10 and row["bg_df"] == 10
    # "common" has zero lift: (fg% - bg%) == 0
    common = [r for r in out if r["term"] == "common"]
    assert not common or abs(common[0]["score"]) < 1e-9


def test_collapse_one_hit_per_group(spark, stats, corpus, term_df):
    """collapse keeps only the best-scoring doc per field value, chosen
    over the FULL scored set (not the uncollapsed top-k)."""
    from elasticsearch_analysis_combo_spark.query.facets import collapse_topk

    n_docs = 5
    avgdl = stats.select("doc_id", "dl").distinct().agg(
        F.avg("dl")
    ).collect()[0][0]
    out = collapse_topk(
        spark, stats, term_df, [(0, "value")], CFG, corpus, "lang",
        n_docs, avgdl, k=10,
    ).collect()
    # docs with "value": 2 (de), 3 (en), 4 (fr) — one lang each, all kept
    langs = [r["collapse_value"] for r in out]
    assert sorted(langs) == ["de", "en", "fr"]
    assert len(langs) == len(set(langs))
    # "merge": docs 0 and 1 both en — only the better one survives
    out2 = collapse_topk(
        spark, stats, term_df, [(0, "merge")], CFG, corpus, "lang",
        n_docs, avgdl, k=10,
    ).collect()
    en = [r for r in out2 if r["collapse_value"] == "en"]
    assert len(en) == 1 and en[0]["doc_id"] == 1  # tf=2 beats tf=1


def test_facet_histogram_buckets(spark, stats, corpus):
    out = search_facet_histogram(
        spark, stats, [(0, "sort")], CFG, corpus, "n_chars", interval=100.0
    )
    got = {r["bucket"]: r["doc_count"] for r in out.collect()}
    # docs with "sort": 0 (100), 1 (220), 3 (430)
    assert got == {100.0: 1, 200.0: 1, 400.0: 1}


def test_facet_range_open_ends_overlap_and_empty(spark, stats, corpus):
    from elasticsearch_analysis_combo_spark.query.facets import (
        search_facet_range,
    )

    out = search_facet_range(
        spark, stats, [(0, "sort")], CFG, corpus, "n_chars",
        ranges=[(None, 200.0), (100.0, 500.0), (900.0, None)],
    )
    got = {r["bucket"]: r["doc_count"] for r in out.collect()}
    # docs with "sort": n_chars 100, 220, 430.
    # [*,200): {100}; [100,500): all three (overlap allowed); [900,*): empty
    assert got == {0: 1, 1: 3, 2: 0}


def test_date_histogram_calendar_buckets(spark):
    from elasticsearch_analysis_combo_spark.query.facets import (
        date_histogram_agg,
    )

    rows = [
        ("a", "2024-01-01 03:10:00"),
        ("a", "2024-01-01 17:45:00"),
        ("a", "2024-01-02 00:00:01"),
        ("b", "2024-01-01 09:00:00"),
    ]
    df = spark.createDataFrame(rows, "g string, ts string")
    out = date_histogram_agg(df, "ts", interval="day", group_col="g")
    got = {(r["g"], r["bucket"]): r["doc_count"] for r in out.collect()}
    assert got == {
        ("a", "2024-01-01 00:00:00"): 2,
        ("a", "2024-01-02 00:00:00"): 1,
        ("b", "2024-01-01 00:00:00"): 1,
    }
    with pytest.raises(ValueError):
        date_histogram_agg(df, "ts", interval="fortnight")


def test_cardinality_exact_at_small_n(spark):
    from elasticsearch_analysis_combo_spark.query.facets import (
        cardinality_agg,
    )

    rows = [(i % 8, "g%d" % (i % 2)) for i in range(500)]
    df = spark.createDataFrame(rows, "v long, g string")
    got = {
        r["g"]: r["cardinality"] for r in
        cardinality_agg(df, "v", group_col="g").collect()
    }
    assert got == {"g0": 4, "g1": 4}  # evens 0,2,4,6; odds 1,3,5,7
    assert cardinality_agg(df, "v").collect()[0]["cardinality"] == 8


def test_stats_agg_extended(spark):
    import math

    from elasticsearch_analysis_combo_spark.query.facets import stats_agg

    vals = [1.0, 2.0, 3.0, 4.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = stats_agg(df, "v", extended=True).collect()[0]
    assert r["count"] == 4 and r["min"] == 1.0 and r["max"] == 4.0
    assert r["avg"] == pytest.approx(2.5)
    assert r["sum"] == pytest.approx(10.0)
    mean = 2.5
    var = sum((v - mean) ** 2 for v in vals) / 4
    assert r["variance"] == pytest.approx(var)
    assert r["std_deviation"] == pytest.approx(math.sqrt(var))
    assert r["sum_of_squares"] == pytest.approx(sum(v * v for v in vals))
