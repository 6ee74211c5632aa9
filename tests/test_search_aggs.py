"""Engine facade search_aggs: the full ES _search body — DSL hits plus
aggregations over the exact FULL match set (never just the top-k)."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig
from elasticsearch_analysis_combo_spark.engine import ComboSearchEngine


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    docs = [
        (1, "spark merges the index segments", "en", 10),
        (2, "the index holds spark postings", "en", 20),
        (3, "nothing relevant here at all", "de", 30),
        (4, "spark spark spark everywhere always", "en", 40),
        (5, "segments compact under merge pressure", "de", 50),
    ]
    corpus = spark.createDataFrame(
        docs, "doc_id long, content string, lang string, n_chars long"
    )
    cfg = ComboConfig(["whitespace"])
    e = ComboSearchEngine(
        spark, cfg,
        str(tmp_path_factory.mktemp("aggs") / "idx"), salt_shards=2,
    )
    e.index(corpus)
    e._doc_meta = corpus.select("doc_id", "lang", "n_chars")
    return e


def _rows(df):
    return {
        (r["agg"], r["key"], r["metric"]): r["value"] for r in df.collect()
    }


def test_hits_and_full_match_set_aggs(eng):
    body = {
        "query": {"match": {"content": "spark index"}},
        "size": 2,
        "aggs": {"by_lang": {"terms": {"field": "lang", "size": 5},
                             "aggs": {"c": {"sum": {"field": "n_chars"}}}}},
    }
    hits, aggs = eng.search_aggs(body, eng._doc_meta)
    h = hits.collect()
    assert len(h) == 2 and h[0]["rank"] == 1
    out = _rows(aggs)
    # match set = docs with spark OR index = {1,2,4} — MORE than the
    # 2 hits returned: aggs must cover the full set
    assert out[("by_lang", "en", "doc_count")] == 3.0
    assert out[("by_lang", "en", "c")] == 70.0
    assert ("by_lang", "de", "doc_count") not in out


def test_bool_membership_filter_and_must_not(eng):
    body = {
        "query": {"bool": {
            "must": [{"match": {"content": "spark merge"}}],
            "filter": [{"range": {"n_chars": {"gte": 20}}}],
            "must_not": [{"term": {"lang": {"value": "de"}}}],
        }},
        "size": 0,
        "aggs": {"t": {"terms": {"field": "lang", "size": 5}}},
    }
    hits, aggs = eng.search_aggs(body, eng._doc_meta)
    assert hits is None  # size 0 = aggs-only, ES semantics
    out = _rows(aggs)
    # spark|merge|merges docs: {1,2,4,5}; n_chars>=20 drops 1; de drops 5
    assert out == {("t", "en", "doc_count"): 2.0}


def test_pure_should_union_membership(eng):
    body = {
        "query": {"bool": {"should": [
            {"term": {"lang": {"value": "de"}}},
            {"match": {"content": "postings"}},
        ]}},
        "size": 0,
        "aggs": {"n": {"value_count": {"field": "doc_id"}}},
    }
    _, aggs = eng.search_aggs(body, eng._doc_meta)
    out = _rows(aggs)
    # de docs {3,5} union postings {2}
    assert out[("n", "", "n")] == 3.0


def test_post_filter_cuts_hits_not_aggs(eng):
    body = {
        "query": {"match": {"content": "spark index"}},
        "post_filter": {"term": {"lang": {"value": "en"}}},
        "size": 10,
        "aggs": {"t": {"terms": {"field": "lang", "size": 5}}},
    }
    hits, aggs = eng.search_aggs(body, eng._doc_meta)
    hit_ids = {r["doc_id"] for r in hits.collect()}
    # match set {1,2,4} is all-en here, so craft the cut the other way:
    body2 = dict(body, post_filter={"range": {"n_chars": {"gte": 20}}})
    hits2, aggs2 = eng.search_aggs(body2, eng._doc_meta)
    assert {r["doc_id"] for r in hits2.collect()} == hit_ids - {1}
    # aggs identical with and without the post_filter (ES semantics)
    assert _rows(aggs) == _rows(aggs2)
    # post_filter must not change surviving docs' scores
    s1 = {r["doc_id"]: round(r["score"], 9) for r in hits.collect()}
    s2 = {r["doc_id"]: round(r["score"], 9) for r in hits2.collect()}
    assert all(s1[d] == s2[d] for d in s2)


def test_runtime_mapping_feeds_query_and_aggs(eng):
    body = {
        "runtime_mappings": {"len_band": {
            "script": "CASE WHEN n_chars >= 30 THEN 'long' "
                      "ELSE 'short' END"}},
        "query": {"bool": {
            "must": [{"match": {"content": "spark segments"}}],
            "filter": [{"term": {"len_band": {"value": "long"}}}],
        }},
        "size": 0,
        "aggs": {"b": {"terms": {"field": "len_band", "size": 5}}},
    }
    _, aggs = eng.search_aggs(body, eng._doc_meta)
    out = _rows(aggs)
    # match {1,2,4,5} ∩ len_band=long {3,4,5} = {4,5}
    assert out == {("b", "long", "doc_count"): 2.0}


def test_aggs_only_no_query(eng):
    _, aggs = eng.search_aggs(
        {"aggs": {"m": {"max": {"field": "n_chars"}}}}, eng._doc_meta
    )
    out = _rows(aggs)
    assert out[("m", "", "m")] == 50.0
    assert out[("m", "", "doc_count")] == 5.0


def test_validate_query(eng):
    ok, err = eng.validate_query({"match": {"content": "spark"}})
    assert ok and err is None
    ok, err = eng.validate_query({"not_a_query": {}})
    assert not ok and "not_a_query" in err


def test_highlight_section_on_hits(eng, spark):
    docs = spark.createDataFrame(
        [(1, "spark merges the index segments"),
         (2, "the index holds spark postings"),
         (3, "nothing relevant here at all"),
         (4, "spark spark spark everywhere always"),
         (5, "segments compact under merge pressure")],
        "doc_id long, content string",
    )
    body = {
        "query": {"match": {"content": "postings"}},
        "size": 5,
        "highlight": {"fields": {"content": {}}, "fragment_size": 20},
        "aggs": {"n": {"value_count": {"field": "doc_id"}}},
    }
    hits, _ = eng.search_aggs(body, eng._doc_meta, docs=docs)
    rows = {r["doc_id"]: r for r in hits.collect()}
    # fragment_size 20 -> 10 chars of context each side
    assert rows[2]["highlight"] == ["lds spark <em>postings</em>"]


def test_sort_and_search_after_body(eng):
    body = {
        "query": {"match": {"content": "spark segments"}},
        "sort": [{"n_chars": "desc"}],
        "size": 2,
        "aggs": {"n": {"value_count": {"field": "doc_id"}}},
    }
    hits, aggs = eng.search_aggs(body, eng._doc_meta)
    page1 = [(r["doc_id"], r["n_chars"]) for r in hits.collect()]
    # match set {1,2,4,5} sorted by n_chars desc: 5(50), 4(40), 2(20), 1(10)
    assert page1 == [(5, 50), (4, 40)]
    # cursor = last row's sort values (n_chars, doc_id tiebreak)
    body2 = dict(body, search_after=[40, 4])
    hits2, _ = eng.search_aggs(body2, eng._doc_meta)
    assert [(r["doc_id"], r["n_chars"]) for r in hits2.collect()] == \
        [(2, 20), (1, 10)]
    # aggs still cover the whole match set, not the page
    assert _rows(aggs)[("n", "", "n")] == 4.0
    # post_filter applies to the sorted hits too
    body3 = dict(body, post_filter={"term": {"lang": {"value": "de"}}})
    hits3, _ = eng.search_aggs(body3, eng._doc_meta)
    assert [r["doc_id"] for r in hits3.collect()] == [5]


def test_msearch(eng):
    bodies = [
        {"query": {"match": {"content": "postings"}}, "size": 3},
        {"size": 0, "aggs": {"m": {"max": {"field": "n_chars"}}}},
    ]
    (h1, a1), (h2, a2) = eng.msearch(bodies, eng._doc_meta)
    assert [r["doc_id"] for r in h1.collect()] == [2]
    assert h2 is None
    assert _rows(a2)[("m", "", "m")] == 50.0
