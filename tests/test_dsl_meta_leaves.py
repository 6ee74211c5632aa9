"""Round-5g DSL leaves: geo / terms_set / nested filter-context
compilation + evaluation, and rank_feature / distance_feature scoring
clauses (per-doc SQL score expressions through the should_consts /
score_exprs machinery). Evaluation cross-checks the compiled SQL
against the standalone evaluators (query/geo.py) and hand-computed
memberships/scores."""

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig
from elasticsearch_analysis_combo_spark.analysis.udfs import build_term_stats
from elasticsearch_analysis_combo_spark.query.dsl import (
    compile_dsl,
    compile_filter,
    dsl_topk,
)
from elasticsearch_analysis_combo_spark.query.geo import (
    geo_bounding_box,
    geo_distance,
    geo_polygon,
)

CFG = ComboConfig(["whitespace"])


# ------------------------------------------------------------ compile unit

def test_geo_leaf_compile_and_errors():
    box = compile_filter({"geo_bounding_box": {"pin": {
        "top_left": {"lat": 2.0, "lon": -1.0},
        "bottom_right": {"lat": -2.0, "lon": 1.0}}}})
    assert box == (
        "(pin_lat >= -2.0 AND pin_lat <= 2.0"
        " AND pin_lon >= -1.0 AND pin_lon <= 1.0)"
    )
    with pytest.raises(ValueError):  # inverted box
        compile_filter({"geo_bounding_box": {"pin": {
            "top_left": {"lat": -2.0, "lon": -1.0},
            "bottom_right": {"lat": 2.0, "lon": 1.0}}}})
    with pytest.raises(ValueError):  # dateline-crossing
        compile_filter({"geo_bounding_box": {"pin": {
            "top_left": {"lat": 2.0, "lon": 170.0},
            "bottom_right": {"lat": -2.0, "lon": -170.0}}}})
    d = compile_filter({"geo_distance": {
        "distance": "100km", "pin": {"lat": 0.0, "lon": 0.0}}})
    assert "asin(sqrt(" in d and "pin_lat >= " in d  # box conjunct present
    # explicit column overrides
    d2 = compile_filter({"geo_distance": {
        "distance": 100, "pin": {"lat": 0.0, "lon": 0.0},
        "lat_field": "la", "lon_field": "lo"}})
    assert "la >= " in d2 and "lo >= " in d2
    with pytest.raises(ValueError):
        compile_filter({"geo_distance": {
            "distance": "-5km", "pin": {"lat": 0.0, "lon": 0.0}}})
    with pytest.raises(ValueError):  # < 3 vertices
        compile_filter({"geo_polygon": {"pin": {"points": [
            {"lat": 0.0, "lon": 0.0}, {"lat": 1.0, "lon": 1.0}]}}})


def test_terms_set_and_nested_compile():
    assert compile_filter({"terms_set": {"tags": {
        "terms": ["a", "b"], "minimum_should_match": 2}}}) == (
        "(size(array_intersect(tags, array('a', 'b'))) >= 2)"
    )
    assert compile_filter({"terms_set": {"tags": {
        "terms": ["a"], "minimum_should_match_field": "req"}}}) == (
        "(size(array_intersect(tags, array('a'))) >= req)"
    )
    assert compile_filter({"terms_set": {"tags": {
        "terms": [], "minimum_should_match": 1}}}) == "FALSE"
    got = compile_filter({"nested": {"path": "cs", "query": {"bool": {
        "must": [{"term": {"cs.author": "kim"}}],
        "must_not": [{"range": {"stars": {"lt": 2}}}],
    }}}})
    assert got == (
        "exists(cs, _x -> (_x.author = 'kim' AND NOT ((_x.stars < 2))))"
    )
    with pytest.raises(ValueError):  # text query inside nested filter
        compile_filter({"nested": {"path": "cs",
                                   "query": {"match": {"t": "x"}}}})
    # ES bool membership defaults inside nested: shoulds optional next
    # to a must unless msm >= 1 forces them
    assert compile_filter({"nested": {"path": "cs", "query": {"bool": {
        "must": [{"term": {"cs.a": 1}}],
        "should": [{"term": {"cs.b": 2}}]}}}}) == (
        "exists(cs, _x -> (_x.a = 1))"
    )
    assert compile_filter({"nested": {"path": "cs", "query": {"bool": {
        "must": [{"term": {"cs.a": 1}}],
        "should": [{"term": {"cs.b": 2}}],
        "minimum_should_match": 1}}}}) == (
        "exists(cs, _x -> (_x.a = 1 AND (_x.b = 2)))"
    )
    with pytest.raises(ValueError):  # script msm unsupported -> raise
        compile_filter({"terms_set": {"t": {
            "terms": ["a"],
            "minimum_should_match_script": {"source": "x"}}}})


def test_feature_leaf_compile_and_errors():
    cq = compile_dsl({"rank_feature": {
        "field": "pop", "saturation": {"pivot": 10.0}, "boost": 2.0}})
    assert cq.filter_sql == "pop IS NOT NULL"
    assert cq.score_exprs == [
        "(2.0 * (CAST(pop AS DOUBLE) / (CAST(pop AS DOUBLE) + 10.0)))"
    ]
    assert not cq.should_consts and not cq.parsed.clauses
    with pytest.raises(ValueError):  # no index-statistics pivot default
        compile_dsl({"rank_feature": {"field": "pop"}})
    with pytest.raises(ValueError):
        compile_dsl({"rank_feature": {"field": "pop",
                                      "saturation": {"pivot": -1.0}}})
    with pytest.raises(ValueError):
        compile_dsl({"distance_feature": {"field": "pop", "origin": 0.0,
                                          "pivot": 0.0}})
    # roles: must -> filter + unconditional expr; should -> (pred, expr)
    roles = compile_dsl({"bool": {
        "must": [{"distance_feature": {"field": "ts", "origin": 5.0,
                                       "pivot": 2.0}}],
        "should": [{"rank_feature": {"field": "pop",
                                     "log": {"scaling_factor": 1.0}}}],
    }})
    assert roles.filter_sql == "ts IS NOT NULL"
    assert len(roles.score_exprs) == 1 and "abs(" in roles.score_exprs[0]
    assert roles.should_consts == [
        ("pop IS NOT NULL", "(1.0 * ln(1.0 + CAST(pop AS DOUBLE)))")
    ]


# --------------------------------------------------------------- evaluation

@pytest.fixture(scope="module")
def meta(spark):
    rows = [
        # doc_id, lat, lon, pop, tags, comments [(author, stars)]
        (0, 0.0, 0.0, 10, ["a", "b"], [("kim", 5), ("lee", 1)]),
        (1, 0.5, 0.5, None, ["a"], [("kim", 1)]),
        (2, 5.0, 5.0, 40, ["b", "c"], [("lee", 4)]),
        (3, -0.5, 0.2, 7, ["a", "b", "c"], [("kim", 3), ("kim", 9)]),
        (4, 45.0, 90.0, 100, [], []),
        (5, 0.9, -0.9, 1, ["c"], [("lee", 5), ("kim", 2)]),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id long, loc_lat double, loc_lon double, pop int, "
        "tags array<string>, "
        "comments array<struct<author: string, stars: int>>",
    )


def _member_ids(meta, node):
    return sorted(
        r.doc_id
        for r in meta.filter(F.expr(compile_filter(node))).collect()
    )


def test_geo_leaves_match_standalone_evaluators(meta):
    # distance: compiled predicate == query/geo.py::geo_distance rows
    node = {"geo_distance": {"distance": "200km",
                             "loc": {"lat": 0.0, "lon": 0.0}}}
    want = sorted(
        r.doc_id
        for r in geo_distance(meta, "loc_lat", "loc_lon",
                              0.0, 0.0, 200.0).collect()
    )
    assert _member_ids(meta, node) == want and want  # non-empty
    # bbox
    node = {"geo_bounding_box": {"loc": {
        "top_left": {"lat": 1.0, "lon": -1.0},
        "bottom_right": {"lat": -1.0, "lon": 1.0}}}}
    want = sorted(
        r.doc_id
        for r in geo_bounding_box(meta, "loc_lat", "loc_lon",
                                  1.0, -1.0, -1.0, 1.0).collect()
    )
    assert _member_ids(meta, node) == want and want
    # polygon (non-convex quad, no horizontal edge)
    pts = [(-1.0, -2.0), (2.0, 0.0), (-0.4, 2.0), (1.5, 0.1)]
    node = {"geo_polygon": {"loc": {"points": [
        {"lat": la, "lon": lo} for la, lo in pts]}}}
    want = sorted(
        r.doc_id
        for r in geo_polygon(meta, "loc_lat", "loc_lon", pts).collect()
    )
    assert _member_ids(meta, node) == want


def test_terms_set_and_nested_evaluation(meta):
    got = _member_ids(meta, {"terms_set": {"tags": {
        "terms": ["a", "b", "z"], "minimum_should_match": 2}}})
    assert got == [0, 3]  # docs holding >= 2 of {a, b, z}
    got = _member_ids(meta, {"nested": {"path": "comments", "query": {
        "bool": {"must": [{"term": {"comments.author": "kim"}},
                          {"range": {"comments.stars": {"gte": 3}}}]},
    }}})
    # one ELEMENT must satisfy both: doc 0 (kim,5), doc 3 (kim,9);
    # doc 5's kim has 2 stars, its 5-star comment is lee's
    assert got == [0, 3]


@pytest.fixture(scope="module")
def index(spark, meta):
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha gamma"), (2, "beta gamma"),
         (3, "alpha beta gamma"), (4, "gamma delta"), (5, "alpha delta")],
        "doc_id long, content string",
    )
    stats = build_term_stats(docs, CFG).cache()
    stats.count()
    term_df = stats.groupBy("term").agg(F.count("*").alias("df"))
    avgdl = stats.select("doc_id", "dl").distinct().agg(
        F.avg("dl")
    ).collect()[0][0]
    return stats, term_df, 6, avgdl


def _topk(spark, index, meta, node, k=10):
    stats, term_df, n_docs, avgdl = index
    return {
        r.doc_id: round(r.score, 9)
        for r in dsl_topk(spark, stats, term_df, None, [(0, node)], CFG,
                          n_docs, avgdl, doc_meta=meta, k=k).collect()
    }


def test_lone_feature_query_scores(spark, index, meta):
    got = _topk(spark, index, meta, {"rank_feature": {
        "field": "pop", "saturation": {"pivot": 10.0}, "boost": 2.0}})
    # membership = docs with pop (1 is null); score = 2 * p/(p+10)
    want = {d: round(2.0 * p / (p + 10.0), 9)
            for d, p in [(0, 10), (2, 40), (3, 7), (4, 100), (5, 1)]}
    assert got == want
    got = _topk(spark, index, meta, {"distance_feature": {
        "field": "pop", "origin": 10.0, "pivot": 5.0}})
    want = {d: round(5.0 / (5.0 + abs(p - 10.0)), 9)
            for d, p in [(0, 10), (2, 40), (3, 7), (4, 100), (5, 1)]}
    assert got == want


def test_feature_should_next_to_text(spark, index, meta):
    base = _topk(spark, index, meta, {"match": {"content": "alpha"}})
    got = _topk(spark, index, meta, {"bool": {
        "must": [{"match": {"content": "alpha"}}],
        "should": [{"rank_feature": {"field": "pop",
                                     "saturation": {"pivot": 10.0},
                                     "boost": 2.0}}],
    }})
    pops = {0: 10, 2: 40, 3: 7, 4: 100, 5: 1}  # doc 1 null
    want = {
        d: round(s + (2.0 * pops[d] / (pops[d] + 10.0) if d in pops else 0.0),
                 9)
        for d, s in base.items()
    }
    assert got == want and 1 in got  # null-pop doc keeps its text score


def test_feature_must_restricts_membership(spark, index, meta):
    got = _topk(spark, index, meta, {"bool": {
        "must": [{"match": {"content": "alpha"}},
                 {"rank_feature": {"field": "pop",
                                   "log": {"scaling_factor": 1.0},
                                   "boost": 0.5}}],
    }})
    base = _topk(spark, index, meta, {"match": {"content": "alpha"}})
    # doc 1 (null pop) drops out; others gain 0.5 * ln(1 + pop)
    pops = {0: 10, 3: 7, 5: 1}
    want = {d: round(s + 0.5 * math.log(1.0 + pops[d]), 9)
            for d, s in base.items() if d in pops}
    assert got == want and 1 not in got
