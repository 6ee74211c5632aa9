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


def test_sort_search_after_pages_partition_full_order(spark):
    """Arbitrary-key sort + search_after: consecutive pages partition
    the full (key desc, doc_id) order, ties crossed page boundaries
    correctly, mixed-direction keys work, and cursor-less queries get
    page 1."""
    from elasticsearch_analysis_combo_spark.query.bm25 import (
        sort_search_after,
    )

    rows = []
    for qid in (0, 1):
        for d in range(25):
            rows.append((qid, d, (d * 7) % 5, float(d % 3)))  # heavy ties
    hits = spark.createDataFrame(
        rows, "query_id int, doc_id long, grp long, v double"
    )
    keys = [("grp", "desc"), ("v", "asc")]
    full = sort_search_after(hits, keys, None, k=100).collect()
    order = {}
    for r in full:
        order.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["grp"], r["v"])
        )
    pages = {0: [], 1: []}
    cursors = {}
    for page in range(3):
        out = sort_search_after(hits, keys, cursors or None, k=10).collect()
        cursors = {}
        for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
            pages[r["query_id"]].append((r["doc_id"], r["grp"], r["v"]))
            if r["rank"] == 10:
                cursors[r["query_id"]] = (r["grp"], r["v"], r["doc_id"])
    for qid in (0, 1):
        expected = [(d, g, v) for _, d, g, v in sorted(order[qid])]
        assert pages[qid] == expected  # 25 rows = 10 + 10 + 5, no skips

    # cursor length mismatch raises
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sort_search_after(hits, keys, {0: (1, 2)}, k=10).collect()
    with _pytest.raises(ValueError):
        sort_search_after(hits, [("grp", "down")], None, k=10)
