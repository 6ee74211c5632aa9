"""Round-5k: filter/nested/reverse_nested buckets in the aggs
compiler, terms_set as a scoring feature leaf, temperature-scaled
mixture allocation (UniMax-style water-filling)."""

import pytest
from pyspark.sql import functions as F


def _long(rows):
    return {(r["agg"], r["key"], r["metric"]): r["value"] for r in rows}


@pytest.fixture(scope="module")
def nested_df(spark):
    data = [
        (1, "A", 100.0, [("x", 10.0), ("x", 20.0)]),
        (2, "B", 50.0, [("x", 5.0), ("y", 7.0)]),
        (3, "A", 10.0, []),
    ]
    return spark.createDataFrame(
        data,
        "doc_id long, grp string, val double, "
        "items array<struct<tag string, price double>>",
    )


def test_filter_bucket(spark, nested_df):
    from elasticsearch_analysis_combo_spark.query.aggcompiler import (
        dsl_search_aggs,
    )

    out = dsl_search_aggs(nested_df, {"aggs": {
        "f": {"filter": {"term": {"grp": "A"}},
              "aggs": {"sv": {"sum": {"field": "val"}},
                       "byg": {"terms": {"field": "grp", "size": 5}}}},
    }})
    got = _long(out.collect())
    assert got[("f", "", "doc_count")] == 2.0
    assert got[("f", "", "sv")] == 110.0
    assert got[("f>byg", "A", "doc_count")] == 2.0
    assert ("f>byg", "B", "doc_count") not in got


def test_filter_bucket_sql_string(spark, nested_df):
    from elasticsearch_analysis_combo_spark.query.aggcompiler import (
        dsl_search_aggs,
    )

    out = dsl_search_aggs(nested_df, {"aggs": {
        "f": {"filter": "val >= 50.0", "aggs": {}},
    }})
    got = _long(out.collect())
    assert got[("f", "", "doc_count")] == 2.0


def test_nested_bucket_metrics(spark, nested_df):
    from elasticsearch_analysis_combo_spark.query.aggcompiler import (
        dsl_search_aggs,
    )

    out = dsl_search_aggs(nested_df, {"aggs": {
        "n": {"nested": {"path": "items"},
              "aggs": {"avgp": {"avg": {"field": "items.price"}}}},
    }})
    got = _long(out.collect())
    # doc_count = NESTED docs (2 + 2 + 0), exactly ES
    assert got[("n", "", "doc_count")] == 4.0
    assert got[("n", "", "avgp")] == pytest.approx(42.0 / 4)


def test_nested_terms_reverse_nested(spark, nested_df):
    from elasticsearch_analysis_combo_spark.query.aggcompiler import (
        dsl_search_aggs,
    )

    out = dsl_search_aggs(nested_df, {"aggs": {
        "n": {"nested": {"path": "items"}, "aggs": {
            "bytag": {"terms": {"field": "items.tag", "size": 5},
                      "aggs": {"rn": {
                          "reverse_nested": {"id_field": "doc_id"},
                          "aggs": {"sv": {"sum": {"field": "val"}}},
                      }}},
        }},
    }})
    got = _long(out.collect())
    # nested>terms doc_count counts SUB docs; reverse_nested counts
    # each PARENT once however many of its sub-docs carry the tag
    assert got[("n>bytag", "x", "doc_count")] == 3.0
    assert got[("n>bytag", "y", "doc_count")] == 1.0
    assert got[("n>bytag>rn", "x", "doc_count")] == 2.0
    assert got[("n>bytag>rn", "x", "sv")] == 150.0
    assert got[("n>bytag>rn", "y", "doc_count")] == 1.0
    assert got[("n>bytag>rn", "y", "sv")] == 50.0


def test_nested_validation(spark, nested_df):
    from elasticsearch_analysis_combo_spark.query.aggcompiler import (
        dsl_search_aggs,
    )

    with pytest.raises(ValueError, match="not a column"):
        dsl_search_aggs(nested_df, {"aggs": {
            "n": {"nested": {"path": "nope"}, "aggs": {}},
        }}).collect()
    with pytest.raises(ValueError, match="partial un-nest"):
        dsl_search_aggs(nested_df, {"aggs": {
            "n": {"nested": {"path": "items"}, "aggs": {
                "r": {"reverse_nested": {"path": "items"}, "aggs": {}},
            }},
        }}).collect()


def test_terms_set_scoring_compile():
    from elasticsearch_analysis_combo_spark.query.dsl import compile_dsl

    cq = compile_dsl({"terms_set": {"tags": {
        "terms": ["a", "b"], "minimum_should_match": 1, "boost": 2.0,
    }}})
    assert cq.filter_sql == (
        "(size(array_intersect(tags, array('a', 'b'))) >= 1)"
    )
    assert cq.score_exprs == [
        "(2.0 * CAST(size(array_intersect(tags, array('a', 'b'))) "
        "AS DOUBLE))"
    ]
    # bool roles: must -> filter + unconditional expr; should ->
    # (pred, expr) indicator; must_not -> negated predicate
    roles = compile_dsl({"bool": {
        "should": [{"terms_set": {"tags": {
            "terms": ["a"], "minimum_should_match": 1}}}],
        "must_not": [{"terms_set": {"tags": {
            "terms": ["z"], "minimum_should_match": 1}}}],
    }})
    assert len(roles.should_consts) == 1
    pred, expr = roles.should_consts[0]
    assert "array_intersect" in pred and "CAST" in expr
    assert roles.filter_sql.startswith("NOT (")


def test_terms_set_scoring_evaluation(spark):
    from elasticsearch_analysis_combo_spark.query.dsl import compile_dsl

    df = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["a"]), (3, ["z"])],
        "doc_id long, tags array<string>",
    )
    cq = compile_dsl({"terms_set": {"tags": {
        "terms": ["a", "b"], "minimum_should_match": 1, "boost": 2.0,
    }}})
    got = {
        r["doc_id"]: r["s"]
        for r in df.filter(F.expr(cq.filter_sql))
        .select("doc_id", F.expr(cq.score_exprs[0]).alias("s"))
        .collect()
    }
    assert got == {1: 4.0, 2: 2.0}  # 2 matched terms x 2.0 / 1 x 2.0


def _water_fill(ns, tau, epochs, budget):
    ws = {s: n ** (1.0 / tau) for s, n in ns.items()}
    caps = {s: n * epochs for s, n in ns.items()}
    order = sorted(ns, key=lambda s: (caps[s] / ws[s], s))
    for i in range(len(order)):
        capped, rest = order[:i], order[i:]
        t = (budget - sum(caps[s] for s in capped)) / sum(
            ws[s] for s in rest
        )
        if t <= caps[rest[0]] / ws[rest[0]]:
            out = {s: caps[s] for s in capped}
            out.update({s: min(caps[s], ws[s] * t) for s in rest})
            return {s: max(v, 0.0) for s, v in out.items()}
    return dict(caps)


@pytest.mark.parametrize("tau,epochs,budget", [
    (1.0, 100.0, 500.0),     # proportional, caps never bind
    (2.0, 1.0, 600.0),       # temperature flattening + one cap binds
    (100.0, 1.0, 600.0),     # near-uniform: small source caps
    (1.0, 1.0, 5000.0),      # budget >= sum(caps): all capped
])
def test_temperature_allocation(spark, tau, epochs, budget):
    from elasticsearch_analysis_combo_spark.operators.sampling import (
        temperature_allocation,
    )

    ns = {"s1": 100.0, "s2": 900.0, "s3": 400.0}
    rows = [(f"{s}_{i}", s, n / 4.0) for s, n in ns.items()
            for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id string, src string, tok double")
    got = {
        r["src"]: r["budget"]
        for r in temperature_allocation(
            df, "src", "tok", budget, temperature=tau, max_epochs=epochs
        ).collect()
    }
    want = _water_fill(ns, tau, epochs, budget)
    assert set(got) == set(want)
    for s in want:
        assert got[s] == pytest.approx(want[s]), (s, got, want)
    # allocation exhausts the budget when it fits under the caps
    if budget <= sum(n * epochs for n in ns.values()):
        assert sum(got.values()) == pytest.approx(budget)


def test_temperature_budgets_feed_sampler(spark):
    from elasticsearch_analysis_combo_spark.operators.sampling import (
        sample_to_token_budget,
        temperature_budgets,
    )

    rows = [(f"{s}_{i}", s, 10.0) for s in ("a", "b") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id string, src string, tok double")
    budgets = temperature_budgets(df, "src", "tok", 100.0,
                                  temperature=1.0, max_epochs=1.0)
    assert budgets == {"a": 50, "b": 50}
    kept = sample_to_token_budget(df, "src", budgets, "tok")
    per = {r["src"]: r["n"] for r in
           kept.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert per == {"a": 5, "b": 5}  # 50 tokens / 10 per doc


def test_temperature_validation(spark):
    from elasticsearch_analysis_combo_spark.operators.sampling import (
        temperature_allocation,
    )

    df = spark.createDataFrame([("d", "s", 1.0)],
                               "doc_id string, src string, tok double")
    with pytest.raises(ValueError, match="temperature"):
        temperature_allocation(df, "src", "tok", 10.0, temperature=0.0)
    with pytest.raises(ValueError, match="max_epochs"):
        temperature_allocation(df, "src", "tok", 10.0, max_epochs=-1.0)


def test_missing_bucket_subaggs(spark):
    # missing is the pre-existing keyed bucket (key "_missing"); pin
    # that metric AND sub-bucket recursion work under it
    from elasticsearch_analysis_combo_spark.query.aggcompiler import (
        dsl_search_aggs,
    )

    df = spark.createDataFrame(
        [(1, None, 10.0), (2, "a", 20.0), (3, None, 30.0), (4, "b", 5.0)],
        "doc_id long, tag string, val double",
    )
    out = dsl_search_aggs(df, {"aggs": {
        "m": {"missing": {"field": "tag"},
              "aggs": {"sv": {"sum": {"field": "val"}},
                       "byv": {"histogram": {"field": "val",
                                             "interval": 25.0}}}},
    }})
    got = _long(out.collect())
    assert got[("m", "_missing", "doc_count")] == 2.0
    assert got[("m", "_missing", "sv")] == 40.0
    assert got[("m>byv", "_missing|0.0000", "doc_count")] == 1.0
    assert got[("m>byv", "_missing|25.0000", "doc_count")] == 1.0
