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


def test_engine_round4_surfaces(spark, tmp_path):
    from pyspark.sql import functions as F

    corpus = ingest(generate_corpus(spark, 60)).cache()
    cfg = ComboConfig(["whitespace"], deduplication=True)
    eng = ComboSearchEngine(spark, cfg, str(tmp_path / "idx4"), salt_shards=2)
    eng.index(corpus)
    meta = corpus.select(
        "doc_id", F.length("content").alias("n_chars")
    ).cache()

    so = eng.span_or("the if").collect()
    assert so and all(r["n_matches"] >= 1 for r in so)
    sf = eng.span_first("the", end=2).collect()
    assert isinstance(sf, list)
    sn = eng.span_not("if", "the", post=1).collect()
    assert isinstance(sn, list)
    # span_multi: term-only clauses reproduce plain span_near exactly;
    # a prefix clause can only widen the doc set
    ref = eng.span_near("the if", slop=4, in_order=False).collect()
    sm_t = eng.span_multi(
        [("term", "the"), ("term", "if")], slop=4, in_order=False
    ).collect()
    assert {(r["doc_id"], r["n_matches"]) for r in sm_t} == {
        (r["doc_id"], r["n_matches"]) for r in ref
    }
    sm_p = eng.span_multi(
        [("prefix", "the"), ("term", "if")], slop=4, in_order=False,
        max_expansions=50,
    ).collect()
    assert {r["doc_id"] for r in sm_p} >= {r["doc_id"] for r in ref}

    filt = eng.search_filtered("the if", meta, "n_chars >= 50", k=5)
    rows = filt.collect()
    ok_ids = {r["doc_id"] for r in meta.filter("n_chars >= 50").collect()}
    assert all(r["doc_id"] in ok_ids for r in rows)

    rf = eng.rank_feature(
        "the if", meta, "n_chars", pivot=100.0, boost=2.0, k=5
    ).collect()
    assert rf and rf[0]["rank"] == 1
    df_ = eng.distance_feature(
        "the if", meta, "n_chars", origin=100.0, pivot=50.0, k=5
    ).collect()
    assert df_ and df_[0]["rank"] == 1

    hl = eng.highlight("the if", corpus, k=3).collect()
    assert all("<em>" in r["fragment"] for r in hl)


def test_count_field_caps_and_aliases(spark, tmp_path):
    from pyspark.sql import functions as F

    corpus = ingest(generate_corpus(spark, 80))
    cfg = ComboConfig(["whitespace"], deduplication=True)
    eng = ComboSearchEngine(spark, cfg, str(tmp_path / "idx2"), salt_shards=2)
    eng.index(corpus)
    meta = corpus.select(
        "doc_id", F.length("content").alias("n_chars"),
        F.pmod("doc_id", F.lit(2)).alias("tenant"),
    )

    # _count: match_all == n_docs; OR-match counts distinct docs; the
    # filter intersects
    assert eng.count() == 80
    n_q = eng.count("the class")
    assert 0 < n_q <= 80
    n_f = eng.count("the class", doc_meta=meta,
                    filter_dsl={"term": {"tenant": 0}})
    assert 0 < n_f <= n_q
    assert eng.count(None, meta, {"term": {"tenant": 0}}) == meta.filter(
        "tenant = 0").count()
    with pytest.raises(ValueError):
        eng.count("x", filter_dsl={"term": {"tenant": 0}})

    # field_caps maps Spark types to ES-ish capabilities
    caps = eng.field_caps(meta)
    assert caps["content"]["type"] == "text"
    assert caps["content"]["aggregatable"] is False
    assert caps["tenant"]["type"] == "long"
    assert caps["n_chars"]["aggregatable"] is True

    # aliases: filtered alias injects pre-rank filter context and
    # persists across facade reopen
    eng.add_alias("all")
    eng.add_alias("tenant0", {"term": {"tenant": 0}})
    with pytest.raises(ValueError):
        eng.add_alias("bad", {"nope": {}})
    eng2 = ComboSearchEngine(spark, cfg, str(tmp_path / "idx2"))
    assert set(eng2.aliases()) == {"all", "tenant0"}
    # k > n_docs so both sides return their COMPLETE match sets (at a
    # small k the filtered alias legitimately surfaces docs outside the
    # unfiltered top-k — that's what pre-rank filtering is for)
    full = eng2.search_alias("all", "the class", k=200).collect()
    t0 = eng2.search_alias("tenant0", "the class", doc_meta=meta,
                           k=200).collect()
    assert {r["doc_id"] for r in t0} <= {r["doc_id"] for r in full}
    assert all(r["doc_id"] % 2 == 0 for r in t0)
    with pytest.raises(KeyError):
        eng2.search_alias("missing", "x")
    eng2.remove_alias("tenant0")
    assert set(eng2.aliases()) == {"all"}


def test_engine_fuzzy_transpositions_and_retriever(spark, tmp_path):
    from pyspark.sql import functions as F

    rows = [(i, "table scan fast" if i % 2 else "other words here")
            for i in range(20)]
    corpus = spark.createDataFrame(
        rows, "doc_id long, content string"
    ).withColumn("content_sha256", F.sha2("content", 256))
    cfg = ComboConfig(["whitespace"])
    eng = ComboSearchEngine(spark, cfg, str(tmp_path / "idx3"), salt_shards=2)
    eng.index(corpus)
    # swap typo: plain misses, OSA hits
    assert eng.search_fuzzy("tbale", max_edits=1).count() == 0
    osa = eng.search_fuzzy("tbale", max_edits=1, transpositions=True)
    assert osa.count() > 0
    # retriever facade: standard leg end-to-end
    out = eng.retriever(
        {"standard": {"query": {"match": {"content": "table"}}}},
        doc_meta=corpus.select("doc_id"), k=5,
    ).collect()
    assert len(out) == 5 and out[0]["rank"] == 1
