"""Facade API + ngram/edge-ngram/shingle analyzers."""

import pytest

from elasticsearch_analysis_combo_spark.analysis.combo import (
    ComboConfig,
    analyze_text,
)
from elasticsearch_analysis_combo_spark.engine import ComboSearchEngine
from elasticsearch_analysis_combo_spark.sources.corpus import generate_corpus, ingest


def test_ngram_analyzer():
    toks = analyze_text("abcd", ComboConfig(["ngram"]))
    assert [(t.term, t.start, t.end) for t in toks] == [
        ("ab", 0, 2), ("abc", 0, 3), ("bc", 1, 3), ("bcd", 1, 4), ("cd", 2, 4)
    ]


def test_edge_ngram_analyzer():
    toks = analyze_text("Foo ba", ComboConfig(["edge_ngram"]))
    assert [(t.term, t.pos) for t in toks] == [
        ("f", 1), ("fo", 1), ("foo", 1), ("b", 2), ("ba", 2)
    ]


def test_shingle_analyzer():
    toks = analyze_text("a quick brown fox", ComboConfig(["shingle"]))
    assert [t.term for t in toks] == ["a quick", "quick brown", "brown fox"]
    assert [(t.start, t.end) for t in toks] == [(0, 7), (2, 13), (8, 17)]


def test_combo_with_edge_ngram_dedup():
    # autocomplete combo: original words + their prefixes, same-position
    # dedup removes the full-word double
    cfg = ComboConfig(["lowercase", "edge_ngram"], deduplication=True)
    toks = analyze_text("Foo", cfg)
    assert [(t.term, t.pos) for t in toks] == [("f", 1), ("fo", 1), ("foo", 1)]


def test_engine_facade(spark, tmp_path):
    corpus = ingest(generate_corpus(spark, 80))
    cfg = ComboConfig(["whitespace", "identifier"], deduplication=True)
    eng = ComboSearchEngine(spark, cfg, str(tmp_path / "idx"), salt_shards=2)
    eng.index(corpus)
    hits = eng.search("merge index", k=5).collect()
    assert 0 < len(hits) <= 5
    assert hits[0]["rank"] == 1
    # reopen from disk (fresh facade) and get identical results
    eng2 = ComboSearchEngine(spark, cfg, str(tmp_path / "idx"))
    hits2 = eng2.search("merge index", k=5).collect()
    assert {(r["doc_id"], round(r["score"], 9)) for r in hits} == {
        (r["doc_id"], round(r["score"], 9)) for r in hits2
    }
    ph = eng2.phrase("the if").collect()
    assert isinstance(ph, list)  # runs end-to-end (phrase may or may not occur)
    toks = eng2.analyze_text("getFooBar test")
    assert ("foo" in [t.term for t in toks])


def test_pattern_analyzer():
    from elasticsearch_analysis_combo_spark.analysis.tokenizers import (
        make_pattern_tokenizer,
        register_analyzer,
    )

    toks = analyze_text("foo-BAR_baz  42", ComboConfig(["pattern"]))
    assert [(t.term, t.start, t.end, t.pos) for t in toks] == [
        ("foo", 0, 3, 1), ("bar_baz", 4, 11, 2), ("42", 13, 15, 3)
    ]
    # custom pattern + stopwords registered by name, used in a combo
    register_analyzer(
        "csv", make_pattern_tokenizer(r",\s*", stopwords=frozenset({"na"}))
    )
    toks = analyze_text("a, NA, b", ComboConfig(["csv"]))
    assert [(t.term, t.pos) for t in toks] == [("a", 1), ("b", 3)]  # gap at 2


def test_cjk_analyzer():
    toks = analyze_text("中文分词 test", ComboConfig(["cjk"]))
    assert [(t.term, t.pos) for t in toks] == [
        ("中文", 1), ("文分", 2), ("分词", 3), ("test", 4)
    ]
    assert [(t.start, t.end) for t in toks[:3]] == [(0, 2), (1, 3), (2, 4)]
    # lang dispatch routes zh through cjk
    toks = analyze_text("中文 abc", ComboConfig(["lang"]), lang="zh")
    assert toks[0].term == "中文"


def test_search_fetch(spark, tmp_path):
    corpus = ingest(generate_corpus(spark, 60))
    cfg = ComboConfig(["whitespace"])
    eng = ComboSearchEngine(spark, cfg, str(tmp_path / "idx2"), salt_shards=2)
    eng.index(corpus)
    hits = eng.search("merge the", k=3, fetch_from=corpus,
                      fetch_cols=["repo", "path"]).collect()
    assert 0 < len(hits) <= 3
    assert {"query_id", "rank", "doc_id", "score", "repo", "path"} == set(hits[0].asDict())
    assert all(r["repo"].startswith("org") for r in hits)
