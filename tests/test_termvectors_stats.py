"""_termvectors readback and _stats index statistics."""

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig
from elasticsearch_analysis_combo_spark.engine import ComboSearchEngine

CFG = ComboConfig(["whitespace"])


def test_search_after_pagination(spark, tmp_path):
    """Page 2 via the (score, doc_id) cursor equals ranks k+1..2k of the
    full ranking; pages are disjoint and ordered."""
    rows = [(d, " ".join(["common"] + ["pad"] * (d % 5))) for d in range(30)]
    corpus = spark.createDataFrame(rows, "doc_id long, content string")
    eng = ComboSearchEngine(spark, CFG, str(tmp_path / "pidx"), salt_shards=2)
    eng.index(corpus)
    full = eng.search("common", k=20, partitioned=False).collect()
    page1 = eng.search_after("common", k=10).collect()
    last = page1[-1]
    page2 = eng.search_after(
        "common", after=(last["score"], last["doc_id"]), k=10
    ).collect()
    got = [r["doc_id"] for r in page1] + [r["doc_id"] for r in page2]
    assert got == [r["doc_id"] for r in full]
    assert len(set(got)) == 20


def test_termvectors_and_stats(spark, tmp_path):
    rows = [
        (0, "alpha beta alpha"),
        (1, "beta gamma"),
        (2, "delta"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, content string")
    eng = ComboSearchEngine(spark, CFG, str(tmp_path / "idx"), salt_shards=2)
    eng.index(corpus)

    tv = eng.termvectors(0).collect()
    got = sorted((r["term"], r["tf"], r["pos"]) for r in tv)
    # positions are the tokenizer's absolute positions (1-based here)
    assert got == [("alpha", 2, 1), ("alpha", 2, 3), ("beta", 1, 2)]
    both = eng.termvectors([0, 1]).select("doc_id").distinct().collect()
    assert {r["doc_id"] for r in both} == {0, 1}
    assert eng.termvectors([]).count() == 0

    st = eng.stats()
    assert st["n_docs"] == 3
    assert st["vocabulary_size"] == 4
    assert st["posting_rows"] >= 4
    assert st["posting_blocks"] >= st["posting_rows"] > 0
    assert st["posting_bytes"] > 0
    assert abs(st["avgdl"] - 2.0) < 1e-9
