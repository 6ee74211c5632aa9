"""Percolator: documents matched against registered term queries."""

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig
from elasticsearch_analysis_combo_spark.engine import ComboSearchEngine
from elasticsearch_analysis_combo_spark.query.percolate import percolate

CFG = ComboConfig(["whitespace"])


def _matches(out):
    return {(r["doc_id"], r["query_id"]): r["n_matched"] for r in out.collect()}


def test_percolate_msm_and_exclusion(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),
            (1, "alpha delta"),
            (2, "beta gamma spam"),
            (3, "epsilon"),
        ],
        "doc_id long, content string",
    )
    registered = [
        (10, "alpha", 1, ""),                 # any-of single term
        (11, "alpha beta gamma", 2, ""),      # 2-of-3
        (12, "beta gamma", 0, ""),            # ALL
        (13, "beta gamma", 1, "spam"),        # exclusion
        (14, "", 1, ""),                      # empty positive -> dropped
    ]
    got = _matches(percolate(spark, docs, registered, CFG))
    assert got == {
        (0, 10): 1, (1, 10): 1,
        (0, 11): 3, (2, 11): 2,
        (0, 12): 2, (2, 12): 2,
        (0, 13): 2,  # doc 2 has spam -> excluded
    }


def test_percolate_engine_facade_uses_config(spark, tmp_path):
    """The facade percolates with the engine's analyzer: a standard
    (stop-stripping, lowercasing) config matches case-insensitively."""
    eng = ComboSearchEngine(
        spark, ComboConfig(["standard"]), str(tmp_path / "ix")
    )
    docs = spark.createDataFrame(
        [(0, "ALPHA the beta")], "doc_id long, content string"
    )
    got = _matches(eng.percolate(docs, [(1, "alpha", 1)]))
    assert got == {(0, 1): 1}
