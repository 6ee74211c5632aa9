"""percolate_dsl: the ES percolator with real query DSL bodies,
compiled to one boolean column per registered query (map-only)."""

import pytest

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig


CFG = ComboConfig(["whitespace"])


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark joins the big table", "en", 25),
        (2, "the table joins spark", "en", 21),
        (3, "slow scan of a big table", "de", 24),
        (4, "spark", "en", 5),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, content string, lang string, n_chars int"
    )


def _matches(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["doc_id"])
    return out


def test_match_or_and_msm(spark, docs):
    from elasticsearch_analysis_combo_spark.query.percolate import (
        percolate_dsl,
    )

    got = _matches(percolate_dsl(spark, docs, [
        (0, {"match": {"content": "spark scan"}}),                # OR
        (1, {"match": {"content": {"query": "spark table",
                                   "operator": "and"}}}),
        (2, {"match": {"content": {"query": "spark table scan",
                                   "minimum_should_match": 2}}}),
    ], CFG, content_col="content"))
    assert got[0] == {1, 2, 3, 4}
    assert got[1] == {1, 2}
    assert got[2] == {1, 2, 3}


def test_match_phrase_adjacency(spark, docs):
    from elasticsearch_analysis_combo_spark.query.percolate import (
        percolate_dsl,
    )

    got = _matches(percolate_dsl(spark, docs, [
        (0, {"match_phrase": {"content": "big table"}}),
        # terms present in doc 2 but never adjacent in this order
        (1, {"match_phrase": {"content": "spark table"}}),
        (2, {"match_phrase": {"content": "spark"}}),
        # phrase longer than the whole doc 4 (guards sequence(1, k<1))
        (3, {"match_phrase": {"content": "spark joins the big table"}}),
    ], CFG, content_col="content"))
    assert got[0] == {1, 3}
    assert 1 not in got
    assert got[2] == {1, 2, 4}
    assert got[3] == {1}


def test_bool_and_metadata(spark, docs):
    from elasticsearch_analysis_combo_spark.query.percolate import (
        percolate_dsl,
    )

    got = _matches(percolate_dsl(spark, docs, [
        (0, {"bool": {
            "must": [{"match": {"content": "table"}}],
            "filter": [{"range": {"n_chars": {"gte": 22}}}],
            "must_not": [{"match": {"content": "slow"}}],
        }}),
        (1, {"bool": {
            "should": [{"match": {"content": "spark"}},
                       {"match": {"content": "scan"}},
                       {"term": {"lang": "de"}}],
            "minimum_should_match": 2,
        }}),
        (2, {"term": {"lang": "de"}}),
    ], CFG, content_col="content"))
    assert got[0] == {1}
    assert got[1] == {3}          # scan + lang de; spark docs have 1 hit
    assert got[2] == {3}


def test_parity_with_classic_percolate(spark, docs):
    from elasticsearch_analysis_combo_spark.query.percolate import (
        percolate,
        percolate_dsl,
    )

    classic = percolate(
        spark, docs, [(0, "spark table", 2)], CFG, content_col="content"
    )
    dsl = percolate_dsl(spark, docs, [
        (0, {"match": {"content": {"query": "spark table",
                                   "minimum_should_match": 2}}}),
    ], CFG, content_col="content")
    assert {r["doc_id"] for r in classic.collect()} == {
        r["doc_id"] for r in dsl.collect()
    }


def test_validation(spark, docs):
    from elasticsearch_analysis_combo_spark.query.percolate import (
        percolate_dsl,
    )

    with pytest.raises(ValueError, match="analyzed column"):
        percolate_dsl(spark, docs, [(0, {"match": {"lang": "en"}})],
                      CFG, content_col="content")
    with pytest.raises(ValueError, match="slop 0"):
        percolate_dsl(spark, docs, [
            (0, {"match_phrase": {"content": {"query": "a b", "slop": 2}}}),
        ], CFG, content_col="content")
    with pytest.raises(ValueError, match="matches every document"):
        percolate_dsl(spark, docs, [
            (0, {"bool": {"should": [{"match": {"content": "x"}}],
                          "minimum_should_match": 0}}),
        ], CFG, content_col="content")
    with pytest.raises(ValueError, match="empty bool"):
        percolate_dsl(spark, docs, [(0, {"bool": {}})], CFG,
                      content_col="content")
    assert percolate_dsl(spark, docs, [], CFG).count() == 0
