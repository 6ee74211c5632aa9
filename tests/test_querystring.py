"""simple_query_string parser + evaluation semantics."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig
from elasticsearch_analysis_combo_spark.analysis.udfs import build_term_stats
from elasticsearch_analysis_combo_spark.operators.postings import (
    build_segments,
    merge_segments,
)
from elasticsearch_analysis_combo_spark.query.querystring import (
    parse_simple_query_string,
    simple_query_string_topk,
)

CFG = ComboConfig(["whitespace"])


def test_parser_roles_and_kinds():
    pq = parse_simple_query_string('+alpha -beta "gamma delta" eps* -"x y"')
    got = [(c.kind, c.role, c.text) for c in pq.clauses]
    assert got == [
        ("term", "must", "alpha"),
        ("term", "must_not", "beta"),
        ("phrase", "should", "gamma delta"),
        ("prefix", "should", "eps"),
        ("phrase", "must_not", "x y"),
    ]


def test_parser_default_operator_and():
    pq = parse_simple_query_string("alpha beta", default_operator="and")
    assert [(c.role) for c in pq.clauses] == ["must", "must"]
    with pytest.raises(ValueError):
        parse_simple_query_string("x", default_operator="nope")


@pytest.fixture(scope="module")
def fixture(spark):
    rows = [
        (0, "alpha beta gamma"),
        (1, "alpha gamma"),
        (2, "beta gamma delta"),
        (3, "alpha beta slowpoke"),
        (4, "gamma delta epsilon"),
        (5, "beta alpha"),  # reversed phrase
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    stats = build_term_stats(df, CFG).cache()
    stats.count()
    term_df = stats.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = 6
    avgdl = stats.select("doc_id", "dl").distinct().agg(
        F.avg("dl")
    ).collect()[0][0]
    segs = build_segments(stats, avgdl=avgdl, salt_shards=2, block_size=16,
                          with_positions=True)
    post = merge_segments(segs, avgdl=avgdl, block_size=16,
                          with_positions=True).cache()
    return stats, term_df, post, n_docs, avgdl


def _docs_of(spark, fixture, text, default_operator="or"):
    stats, term_df, post, n_docs, avgdl = fixture
    out = simple_query_string_topk(
        spark, stats, term_df, post, [(0, text)], CFG, n_docs, avgdl,
        default_operator=default_operator, k=10,
    )
    return {r["doc_id"] for r in out.collect()}


def test_must_and_not(spark, fixture):
    assert _docs_of(spark, fixture, "+alpha -slowpoke") == {0, 1, 5}
    # default OR: any of the terms
    assert _docs_of(spark, fixture, "alpha delta") == {0, 1, 2, 3, 4, 5}
    # default AND: all terms
    assert _docs_of(spark, fixture, "alpha gamma",
                    default_operator="and") == {0, 1}


def test_phrase_filter_and_exclusion(spark, fixture):
    # phrase requires adjacency in order: doc 5 is "beta alpha"
    assert _docs_of(spark, fixture, '+"alpha beta"') == {0, 3}
    assert _docs_of(spark, fixture, '-"alpha beta" alpha') == {1, 5}
    # plain phrase (should role) still filters nothing out but scores:
    # docs matching any scoring term appear, phrase only filters when must
    got = _docs_of(spark, fixture, '"alpha beta"')
    assert got == {0, 3}  # should-phrase with no other clause: must-like


def test_prefix_clause(spark, fixture):
    assert _docs_of(spark, fixture, "+slow*") == {3}
    assert _docs_of(spark, fixture, "eps*") == {4}


def test_must_prefix_with_terms(spark, fixture):
    # must-prefix filters, extra should widens scoring but not match set
    assert _docs_of(spark, fixture, "+delt* alpha") == {2, 4}


def test_empty_must_clause_dropped(spark):
    """A must clause that analyzes to zero terms (stopword under a
    stop-stripping analyzer) is dropped, not a veto on the whole query."""
    cfg = ComboConfig(["standard"])  # lowercase + English stopword strip
    rows = [(0, "alpha beta"), (1, "beta gamma")]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    stats = build_term_stats(df, cfg).cache()
    term_df = stats.groupBy("term").agg(F.count("*").alias("df"))
    out = simple_query_string_topk(
        spark, stats, term_df, None, [(0, "+the +alpha")], cfg,
        n_docs=2, avgdl=2.0, k=10,
    )
    assert {r["doc_id"] for r in out.collect()} == {0}
    # all-stopword must phrase is dropped the same way
    out2 = simple_query_string_topk(
        spark, stats, term_df, None, [(0, '+"the of" +alpha')], cfg,
        n_docs=2, avgdl=2.0, k=10,
    )
    assert {r["doc_id"] for r in out2.collect()} == {0}


def test_query_id_range_guard(spark, fixture):
    stats, term_df, post, n_docs, avgdl = fixture
    with pytest.raises(ValueError):
        simple_query_string_topk(
            spark, stats, term_df, post, [(1 << 22, "alpha")], CFG,
            n_docs, avgdl,
        )
