"""Round-5m: the remaining ES ``_search`` body sections — ``suggest``,
``track_total_hits``, ``_source``/``fields`` projection, ``explain``,
and sliced (parallel-export) sort walks."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig
from elasticsearch_analysis_combo_spark.engine import ComboSearchEngine
from elasticsearch_analysis_combo_spark.query.body import (
    resolve_field_patterns,
)


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
        str(tmp_path_factory.mktemp("r5m") / "idx"), salt_shards=2,
    )
    e.index(corpus)
    e._doc_meta = corpus.select("doc_id", "lang", "n_chars")
    return e


# --- suggest body section ---------------------------------------------------

def test_suggest_body_term_phrase_completion(eng):
    out = eng.suggest_body({
        "fix": {"text": "sprak", "term": {"max_edits": 2, "size": 3}},
        "tail": {"prefix": "seg", "completion": {"size": 5}},
        "did": {"text": "sprak merge", "phrase": {"max_edits": 2}},
    }).collect()
    by_name = {}
    for r in out:
        by_name.setdefault(r["name"], []).append(r)
    # term: "sprak" -> "spark" is the closest vocabulary term
    fix = sorted(by_name["fix"], key=lambda r: r["rank"])
    assert fix[0]["suggestion"] == "spark" and fix[0]["kind"] == "term"
    assert fix[0]["distance"] == 2 and fix[0]["df"] == 3
    # completion: prefix "seg" -> "segments" (df 2)
    tail = by_name["tail"]
    assert [r["suggestion"] for r in tail] == ["segments"]
    assert tail[0]["df"] == 2 and tail[0]["distance"] is None
    # phrase: greedy repair keeps known token, corrects the typo
    did, = by_name["did"]
    assert did["suggestion"] == "spark merge"
    assert did["n_corrections"] == 1 and did["rank"] == 1


def test_suggest_body_batches_same_options(eng):
    out = eng.suggest_body({
        "a": {"text": "sprak", "term": {"size": 1}},
        "b": {"text": "postngs", "term": {"size": 1}},
    }).collect()
    got = {r["name"]: r["suggestion"] for r in out}
    assert got == {"a": "spark", "b": "postings"}


def test_suggest_body_errors(eng):
    with pytest.raises(ValueError, match="exactly one"):
        eng.suggest_body({"x": {"text": "q"}})
    with pytest.raises(ValueError, match="missing 'prefix'"):
        eng.suggest_body({"x": {"text": "q", "completion": {}}})
    assert eng.suggest_body({}).count() == 0


# --- track_total_hits -------------------------------------------------------

def test_track_total_hits_exact_and_capped(eng):
    body = {"query": {"match": {"content": "spark index"}}, "size": 2,
            "track_total_hits": True}
    hits, _ = eng.search_aggs(body, eng._doc_meta)
    rows = hits.collect()
    assert len(rows) == 2
    # match set = {1, 2, 4}
    assert all(r["total_hits"] == 3 and r["total_relation"] == "eq"
               for r in rows)
    body["track_total_hits"] = 2
    hits2, _ = eng.search_aggs(body, eng._doc_meta)
    r = hits2.collect()[0]
    assert r["total_hits"] == 2 and r["total_relation"] == "gte"


def test_total_hits_respects_post_filter(eng):
    body = {"query": {"match": {"content": "segments merge"}}, "size": 5,
            "post_filter": {"term": {"lang": "de"}},
            "track_total_hits": True}
    hits, _ = eng.search_aggs(body, eng._doc_meta)
    rows = hits.collect()
    # match set = {1, 5}; post_filter lang=de keeps doc 5 only, and ES
    # totals reflect the post-filtered hit stream
    assert [r["doc_id"] for r in rows] == [5]
    assert rows[0]["total_hits"] == 1 and rows[0]["total_relation"] == "eq"


# --- _source / fields projection --------------------------------------------

def test_source_fields_projection(eng):
    body = {"query": {"match": {"content": "spark"}}, "size": 3,
            "_source": ["lang"], "fields": ["n_*"]}
    hits, _ = eng.search_aggs(body, eng._doc_meta)
    rows = {r["doc_id"]: r for r in hits.collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[4]["lang"] == "en" and rows[4]["n_chars"] == 40
    with pytest.raises(ValueError, match="unknown field"):
        eng.search_aggs(
            {"query": {"match": {"content": "spark"}},
             "_source": ["nope"]}, eng._doc_meta)


def test_fields_sees_runtime_mappings(eng):
    body = {"query": {"match": {"content": "spark"}}, "size": 3,
            "runtime_mappings": {"dbl": {"script": "n_chars * 2"}},
            "fields": ["dbl"]}
    hits, _ = eng.search_aggs(body, eng._doc_meta)
    rows = {r["doc_id"]: r["dbl"] for r in hits.collect()}
    assert rows[1] == 20 and rows[4] == 80


def test_resolve_field_patterns_unit():
    cols = ["doc_id", "lang", "n_chars", "n_tokens"]
    assert resolve_field_patterns(["n_*"], cols) == ["n_chars", "n_tokens"]
    assert resolve_field_patterns("lang", cols) == ["lang"]
    # doc_id excluded, duplicates collapse, schema order kept
    assert resolve_field_patterns(
        ["n_tokens", "doc_id", "n_*"], cols) == ["n_chars", "n_tokens"]
    with pytest.raises(ValueError, match="matches nothing"):
        resolve_field_patterns(["zz*"], cols)


# --- explain ----------------------------------------------------------------

def test_explain_decomposition_sums_to_score(eng):
    body = {"query": {"match": {"content": "spark index"}}, "size": 3,
            "explain": True}
    hits, _ = eng.search_aggs(body, eng._doc_meta)
    rows = hits.collect()
    assert rows
    for r in rows:
        total = sum(t["contribution"] for t in r["explanation"])
        assert total == pytest.approx(r["score"], rel=1e-9)
        terms = [t["term"] for t in r["explanation"]]
        assert terms == sorted(terms)
    with pytest.raises(ValueError, match="bare match"):
        eng.search_aggs(
            {"query": {"term": {"lang": "en"}}, "explain": True},
            eng._doc_meta)


# --- slice ------------------------------------------------------------------

def test_slice_partitions_the_sort_walk(eng):
    base = {"query": {"match": {"content": "spark index segments"}},
            "sort": [{"n_chars": "desc"}], "size": 10}
    full = [r["doc_id"] for r in
            eng.search_aggs(base, eng._doc_meta)[0].collect()]
    parts = []
    for i in range(3):
        b = dict(base)
        b["slice"] = {"id": i, "max": 3}
        parts.append([r["doc_id"] for r in
                      eng.search_aggs(b, eng._doc_meta)[0].collect()])
    flat = [d for p in parts for d in p]
    assert sorted(flat) == sorted(full)          # disjoint + complete
    assert len(set(flat)) == len(flat)
    with pytest.raises(ValueError, match="slice requires a sort"):
        eng.search_aggs(
            {"query": {"match": {"content": "spark"}},
             "slice": {"id": 0, "max": 2}}, eng._doc_meta)


def test_slice_predicate_validation():
    from elasticsearch_analysis_combo_spark.query.body import (
        slice_predicate,
    )

    with pytest.raises(ValueError, match="slice id"):
        slice_predicate({"id": 3, "max": 3})
    with pytest.raises(ValueError, match="max must be"):
        slice_predicate({"id": 0, "max": 1})


# --- url_filter (C4/RefinedWeb URL curation stage) --------------------------

def test_url_filter_signals_and_keep(spark):
    from elasticsearch_analysis_combo_spark.operators.pipeline import (
        url_filter,
    )

    rows = [
        (1, "https://ok.example.org/a/b"),
        (2, "http://spam.example.com/casino/play"),   # domain + keyword
        (3, "https://ads.blocked.net/x"),             # subdomain inherits
        (4, "https://deep.host/a/b/c/d/e"),           # depth 5 > max 4
        (5, "not a url"),                             # no scheme, no host
        (6, "https://ok2.org"),                       # no path -> depth 0
        (7, "HTTPS://CAPS.ORG/Q?x=1#f"),              # case-fold + query cut
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r for r in url_filter(
        df, blocked_domains=["example.com", "blocked.net"],
        max_path_depth=4,
    ).collect()}
    assert out[1]["keep"] and out[1]["domain"] == "ok.example.org"
    assert out[2]["blocked_domain"] and out[2]["blocked_keyword"]
    assert not out[2]["keep"]
    assert out[3]["blocked_domain"] and not out[3]["keep"]
    assert out[4]["path_depth"] == 5 and not out[4]["keep"]
    # "not a url" parses a pseudo-host from its first token but has no
    # scheme -> dropped by require_scheme
    assert not out[5]["keep"]
    assert out[6]["keep"] and out[6]["path_depth"] == 0
    assert out[7]["domain"] == "caps.org" and out[7]["path_depth"] == 1
    assert out[7]["keep"]
    # scheme not required -> host-less strings still drop, scheme-less keep
    out2 = {r["doc_id"]: r for r in url_filter(
        df, blocked_domains=["example.com"], require_scheme=False,
        max_path_depth=4,
    ).collect()}
    assert out2[5]["keep"]  # pseudo-host "not" parses; nothing blocks it
    assert not out2[2]["keep"]


# --- aggs compiler: scripted_metric + variable_width_histogram --------------

def test_scripted_metric_compiler(spark):
    from elasticsearch_analysis_combo_spark.query.aggcompiler import (
        dsl_search_aggs,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0)], "g string, v double"
    )
    out = dsl_search_aggs(df, {"aggs": {
        "sm": {"scripted_metric": {
            "map_script": "v * 2 + 1", "reduce_script": "sum"}},
        "per_g": {"terms": {"field": "g", "size": 5},
                  "aggs": {"mx": {"scripted_metric": {
                      "map_script": "v + 100",
                      "reduce_script": "max"}}}},
    }})
    rows = {(r["agg"], r["key"], r["metric"]): r["value"]
            for r in out.collect()}
    assert rows[("sm", "", "sm")] == (3.0 + 5.0 + 21.0)
    assert rows[("per_g", "a", "mx")] == 102.0
    assert rows[("per_g", "b", "mx")] == 110.0
    with pytest.raises(ValueError, match="reduce_script"):
        dsl_search_aggs(df, {"aggs": {"x": {"scripted_metric": {
            "map_script": "v", "reduce_script": "median"}}}}).collect()


def test_variable_width_histogram_compiler(spark):
    from elasticsearch_analysis_combo_spark.query.aggcompiler import (
        dsl_search_aggs,
    )

    df = spark.createDataFrame(
        [(float(v), v * 10) for v in (1, 2, 3, 10, 11, 50)],
        "x double, w long",
    )
    out = dsl_search_aggs(df, {"aggs": {
        "vw": {"variable_width_histogram": {"field": "x", "buckets": 3},
               "aggs": {"sw": {"sum": {"field": "w"}}}},
    }})
    rows = {(r["key"], r["metric"]): r["value"] for r in out.collect()}
    # gaps: 7 (3->10) and 39 (11->50) split -> [1,2,3] [10,11] [50]
    assert rows[("0", "doc_count")] == 3.0
    assert rows[("0", "min")] == 1.0 and rows[("0", "max")] == 3.0
    assert rows[("0", "centroid")] == 2.0 and rows[("0", "sw")] == 60.0
    assert rows[("1", "doc_count")] == 2.0 and rows[("1", "min")] == 10.0
    assert rows[("2", "doc_count")] == 1.0 and rows[("2", "max")] == 50.0
    with pytest.raises(ValueError, match="reserves sub-agg names"):
        dsl_search_aggs(df, {"aggs": {
            "vw": {"variable_width_histogram": {"field": "x"},
                   "aggs": {"min": {"sum": {"field": "w"}}}},
        }}).collect()


# --- hybrid body: query + knn (+ rank.rrf), knn similarity ------------------

@pytest.fixture(scope="module")
def emb5(spark):
    def onehot(i):
        v = [0.0, 0.0, 0.0]
        v[i] = 1.0
        return v

    rows = [(1, onehot(0)), (2, onehot(1)), (3, onehot(0)),
            (4, onehot(2)), (5, onehot(0))]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_hybrid_sum_combination(eng, emb5):
    body = {"query": {"match": {"content": "spark"}},
            "knn": {"field": "embedding",
                    "query_vector": [1.0, 0.0, 0.0], "k": 3}}
    out = {r["doc_id"]: r for r in
           eng.hybrid(body, emb5, doc_meta=eng._doc_meta, k=10).collect()}
    bm = {r["doc_id"]: round(r["score"], 6)
          for r in eng.search("spark", k=10).collect()}
    # knn leg: docs 1, 3, 5 at cosine 1.0; bm leg: docs 1, 2, 4
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1]["score"] == pytest.approx(bm[1] + 1.0)
    assert out[3]["score"] == pytest.approx(1.0)
    assert out[2]["score"] == pytest.approx(bm[2])
    ranks = [out[d]["rank"] for d in sorted(out)]
    assert sorted(ranks) == [1, 2, 3, 4, 5]


def test_hybrid_rrf_combination(eng, emb5):
    body = {"query": {"match": {"content": "spark"}},
            "knn": {"field": "embedding",
                    "query_vector": [1.0, 0.0, 0.0], "k": 3},
            "rank": {"rrf": {"rank_constant": 60,
                             "rank_window_size": 5}}}
    out = {r["doc_id"]: r for r in
           eng.hybrid(body, emb5, doc_meta=eng._doc_meta, k=10).collect()}
    # doc 4 (one-hot e2) only matches the bm leg; doc 1 is in both
    assert out[1]["rank"] == 1
    bm_ranks = {r["doc_id"]: r["rank"]
                for r in eng.search("spark", k=10).collect()}
    expect = 1.0 / (60 + bm_ranks[1]) + 1.0 / (60 + 1)
    assert out[1]["score"] == pytest.approx(expect)


def test_knn_similarity_floor(eng, emb5):
    from elasticsearch_analysis_combo_spark.query.dsl import knn_search

    res = knn_search(emb5, {"field": "embedding",
                            "query_vector": [1.0, 0.0, 0.0], "k": 5,
                            "similarity": 0.5})
    assert sorted(r["vec_id"] for r in res.collect()) == [1, 3, 5]
    res2 = knn_search(emb5, {"field": "embedding",
                             "query_vector": [1.0, 0.0, 0.0], "k": 5,
                             "similarity": 1.1})
    assert res2.count() == 0


def test_search_aggs_knn_route(eng, emb5):
    body = {"knn": {"field": "embedding",
                    "query_vector": [0.0, 1.0, 0.0], "k": 2},
            "_source": ["lang"]}
    hits, aggs = eng.search_aggs(body, eng._doc_meta, emb=emb5)
    rows = sorted(hits.collect(), key=lambda r: r["rank"])
    # doc 2 (e1, cosine 1.0) leads; zero-cosine docs fill the window
    assert rows[0]["doc_id"] == 2 and len(rows) == 2
    assert rows[0]["lang"] == "en"
    assert aggs.count() == 0
    with pytest.raises(ValueError, match="aggs with a knn section"):
        eng.search_aggs(
            {"knn": {"field": "embedding", "query_vector": [1.0, 0, 0],
                     "k": 2},
             "aggs": {"l": {"terms": {"field": "lang", "size": 3}}}},
            eng._doc_meta, emb=emb5)
    with pytest.raises(ValueError, match="requires emb"):
        eng.search_aggs(
            {"knn": {"field": "embedding", "query_vector": [1.0, 0, 0],
                     "k": 2}}, eng._doc_meta)


# --- CCNet perplexity bucketing ---------------------------------------------

def test_perplexity_buckets(spark):
    from elasticsearch_analysis_combo_spark.operators.text_quality import (
        ngram_lm_perplexity,
        perplexity_buckets,
    )

    rows = [(i, "en", float(i)) for i in range(1, 10)] + \
           [(100 + i, "de", float(10 * i)) for i in range(1, 4)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, ppl double")
    out = {r["doc_id"]: r["bucket"] for r in perplexity_buckets(
        df, ppl_col="ppl").collect()}
    # en 1..9: thresholds at exact 1/3, 2/3 quantiles -> 3/3/3 split
    assert [out[i] for i in range(1, 10)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3)
    # de 10,20,30: interpolated thresholds ~16.7/23.3
    assert out[101] == "head" and out[102] == "middle"
    assert out[103] == "tail"
    with pytest.raises(ValueError, match="cuts"):
        perplexity_buckets(df, ppl_col="ppl", cuts=(0.7, 0.3))
    # composes with the real CCNet scorer
    docs = spark.createDataFrame(
        [(1, "en", "a b a b a b"), (2, "en", "a b c d e f"),
         (3, "en", "z z q q x x"), (4, "en", "a b a b c c")],
        "doc_id long, lang string, text string")
    ppl = ngram_lm_perplexity(docs).join(
        docs.select("doc_id", "lang"), "doc_id")
    tiers = perplexity_buckets(ppl)
    got = {r["doc_id"]: r["bucket"] for r in tiers.collect()}
    assert len(got) == 4 and set(got.values()) <= {"head", "middle", "tail"}


def test_search_aggs_suggest_section_raises(eng):
    with pytest.raises(ValueError, match="suggest_body"):
        eng.search_aggs(
            {"query": {"match": {"content": "spark"}},
             "suggest": {"s": {"text": "sprak", "term": {}}}},
            eng._doc_meta)


def test_msearch_mixed_text_and_knn_bodies(eng, emb5):
    outs = eng.msearch(
        [{"query": {"match": {"content": "spark"}}, "size": 2},
         {"knn": {"field": "embedding", "query_vector": [1.0, 0.0, 0.0],
                  "k": 2}}],
        eng._doc_meta, emb=emb5)
    assert len(outs) == 2
    assert outs[0][0].count() == 2
    knn_hits = sorted(outs[1][0].collect(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in knn_hits] == [1, 3]


def test_indices_boost_multiplies_before_merge(spark):
    from elasticsearch_analysis_combo_spark.analysis.udfs import (
        build_term_stats,
    )
    from elasticsearch_analysis_combo_spark.query.bm25 import (
        multi_index_topk,
    )

    def mk(rows):
        d = spark.createDataFrame(rows, "doc_id long, content string")
        stats = build_term_stats(d, ComboConfig(["whitespace"]))
        tdf = stats.groupBy("term").agg(F.count("*").alias("df"))
        n = d.count()
        avgdl = stats.groupBy("doc_id").agg(
            F.first("dl").alias("dl")).agg(F.avg("dl")).collect()[0][0]
        return stats, tdf, n, float(avgdl)

    idx = {"a": mk([(1, "spark index"), (2, "other words")]),
           "b": mk([(10, "spark spark"), (11, "spark here")])}
    plain = multi_index_topk(spark, idx, [(0, "spark")],
                             ComboConfig(["whitespace"]), k=10)
    boosted = multi_index_topk(spark, idx, [(0, "spark")],
                               ComboConfig(["whitespace"]), k=10,
                               indices_boost={"a": 10.0})
    p = {(r["index"], r["doc_id"]): r["score"] for r in plain.collect()}
    b = {(r["index"], r["doc_id"]): r["score"] for r in boosted.collect()}
    for key in p:
        want = p[key] * 10.0 if key[0] == "a" else p[key]
        assert b[key] == pytest.approx(want)
    # boosted index-a hit now leads the merged ranking
    top = sorted(boosted.collect(), key=lambda r: r["rank"])[0]
    assert top["index"] == "a"
    with pytest.raises(ValueError, match="unknown indices"):
        multi_index_topk(spark, idx, [(0, "spark")],
                         ComboConfig(["whitespace"]),
                         indices_boost={"zz": 2.0})


def test_update_by_query_rewrites_matching_docs(spark, tmp_path):
    corpus = spark.createDataFrame(
        [(1, "alpha spark rows"), (2, "alpha other rows"),
         (3, "gamma spark only")],
        "doc_id long, content string")
    eng2 = ComboSearchEngine(
        spark, ComboConfig(["whitespace"]),
        str(tmp_path / "ubq_idx"), salt_shards=2)
    eng2.index(corpus)
    # rewrite every doc matching BOTH alpha AND spark
    n = eng2.update_by_query(
        corpus, "replace(content, 'spark', 'flink')",
        query="alpha spark")
    assert n == 1
    eng2.compact()
    assert eng2.count("flink") == 1
    assert eng2.count("spark") == 1      # doc 3 untouched
    # filter_sql path + no-match query returns 0
    assert eng2.update_by_query(
        corpus, "content", query="zzznothing") == 0
    n2 = eng2.update_by_query(
        corpus, "concat(content, ' extra')", filter_sql="doc_id = 2")
    assert n2 == 1
    eng2.compact()
    assert eng2.count("extra") == 1


def test_dfs_query_then_fetch_equals_merged_index(spark):
    from elasticsearch_analysis_combo_spark.analysis.udfs import (
        build_term_stats,
    )
    from elasticsearch_analysis_combo_spark.query.bm25 import (
        bm25_exhaustive_topk,
        multi_index_topk,
    )

    cfg = ComboConfig(["whitespace"])
    a_rows = [(1, "spark index rows"), (2, "other plain words")]
    b_rows = [(10, "spark spark index"), (11, "spark appears here"),
              (12, "unrelated content entirely")]

    def mk(rows):
        d = spark.createDataFrame(rows, "doc_id long, content string")
        stats = build_term_stats(d, cfg)
        tdf = stats.groupBy("term").agg(F.count("*").alias("df"))
        n = d.count()
        avgdl = stats.groupBy("doc_id").agg(
            F.first("dl").alias("dl")).agg(F.avg("dl")).collect()[0][0]
        return stats, tdf, n, float(avgdl)

    idx = {"a": mk(a_rows), "b": mk(b_rows)}
    merged_stats, merged_tdf, mn, mavg = mk(a_rows + b_rows)

    dfs = multi_index_topk(spark, idx, [(0, "spark index")], cfg,
                           k=10, dfs=True)
    single = bm25_exhaustive_topk(
        spark, merged_stats, merged_tdf, [(0, "spark index")], cfg,
        mn, mavg, k=10)
    got = {r["doc_id"]: round(r["score"], 9) for r in dfs.collect()}
    want = {r["doc_id"]: round(r["score"], 9) for r in single.collect()}
    # DFS global stats make the sharded search score-identical to ONE
    # merged index — ES's dfs_query_then_fetch contract
    assert got == want
    # and per-index (query_then_fetch) scores DIFFER from the merged
    qtf = multi_index_topk(spark, idx, [(0, "spark index")], cfg, k=10)
    got_qtf = {r["doc_id"]: round(r["score"], 9) for r in qtf.collect()}
    assert got_qtf != want
