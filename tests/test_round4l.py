"""Round-4l operator vectors: sharded terms agg with ES error bounds,
ip_range agg, search_template rendering, per-key corpus caps."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.query.dsl import (
    render_search_template,
)


class TestTermsAggSharded:
    def test_counts_exact_when_shard_size_covers(self, spark):
        from elasticsearch_analysis_combo_spark.query.facets import (
            terms_agg_sharded,
        )

        rows = [(i, f"v{i % 4}") for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, v string")
        out = terms_agg_sharded(df, "v", size=10, shard_size=10,
                                n_shards=4).collect()
        got = {r["value"]: (r["doc_count"],
                            r["doc_count_error_upper_bound"])
               for r in out}
        # shard_size 10 >= 4 distinct values per shard -> exact, zero error
        assert {k: v[0] for k, v in got.items()} == {
            "v0": 25, "v1": 25, "v2": 25, "v3": 25,
        }
        assert all(err == 0 for _, err in got.values())

    def test_error_bound_accounts_for_truncated_shards(self, spark):
        from elasticsearch_analysis_combo_spark.query.facets import (
            terms_agg_sharded,
        )

        # many singleton values force per-shard truncation; the dominant
        # value must surface with a NONZERO bound only if some shard
        # dropped it (it can't be dropped: it's every shard's top-1),
        # while rare values carry bounds from shards that omitted them
        rows = [(i, "big") for i in range(200)]
        rows += [(1000 + i, f"rare{i}") for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, v string")
        out = terms_agg_sharded(df, "v", size=5, shard_size=3,
                                n_shards=4).collect()
        by_val = {r["value"]: r for r in out}
        assert by_val["big"]["doc_count"] == 200
        assert by_val["big"]["doc_count_error_upper_bound"] == 0
        rare = [r for r in out if r["value"] != "big"]
        assert all(r["doc_count_error_upper_bound"] > 0 for r in rare)

    def test_deterministic(self, spark):
        from elasticsearch_analysis_combo_spark.query.facets import (
            terms_agg_sharded,
        )

        rows = [(i, f"v{i % 7}") for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id long, v string")
        a = sorted(map(tuple, terms_agg_sharded(df, "v", 5).collect()))
        b = sorted(map(tuple, terms_agg_sharded(df, "v", 5).collect()))
        assert a == b


class TestIpRange:
    def test_es_docs_shape(self, spark):
        from elasticsearch_analysis_combo_spark.query.facets import (
            ip_range_agg,
        )

        df = spark.createDataFrame(
            [("10.0.0.5",), ("10.0.0.127",), ("10.0.0.200",),
             ("192.168.1.1",)],
            "ip string",
        )
        out = ip_range_agg(df, "ip", [
            (None, "10.0.0.128"),          # open start
            ("10.0.0.128", "192.168.0.0"),
            ("10.0.0.0", None),            # open end, OVERLAPS others
            ("172.16.0.0", "172.17.0.0"),  # empty bucket kept
        ]).orderBy("bucket_idx").collect()
        assert [(r["key"], r["doc_count"]) for r in out] == [
            ("*-10.0.0.128", 2),
            ("10.0.0.128-192.168.0.0", 1),
            ("10.0.0.0-*", 4),
            ("172.16.0.0-172.17.0.0", 0),
        ]

    def test_boundary_is_half_open(self, spark):
        from elasticsearch_analysis_combo_spark.query.facets import (
            ip_range_agg,
        )

        df = spark.createDataFrame([("10.0.0.128",)], "ip string")
        out = ip_range_agg(df, "ip", [
            (None, "10.0.0.128"), ("10.0.0.128", None),
        ]).collect()
        assert [r["doc_count"] for r in out] == [0, 1]


class TestSearchTemplate:
    def test_whole_value_and_splice(self):
        t = {"bool": {
            "must": [{"match": {"content": "{{q}}"}}],
            "filter": [{"terms": {"lang": "{{langs}}"}},
                       {"range": {"n_chars": {"gte": "{{min_chars}}"}}}],
        }}
        got = render_search_template(t, {
            "q": "alpha beta", "langs": ["en", "de"], "min_chars": 100,
        })
        assert got["bool"]["must"][0]["match"]["content"] == "alpha beta"
        assert got["bool"]["filter"][0]["terms"]["lang"] == ["en", "de"]
        assert got["bool"]["filter"][1]["range"]["n_chars"]["gte"] == 100
        # splice inside a longer string
        s = render_search_template(
            {"prefix": {"content": "{{p}}x"}}, {"p": "ab"})
        assert s["prefix"]["content"] == "abx"

    def test_missing_param_and_sections_raise(self):
        with pytest.raises(ValueError):
            render_search_template({"match": {"c": "{{nope}}"}}, {})
        with pytest.raises(ValueError):
            render_search_template(
                {"match": {"c": "{{#sec}}x{{/sec}}"}}, {"sec": 1})

    def test_params_not_mutated_by_reuse(self):
        t = {"terms": {"lang": "{{langs}}"}}
        params = {"langs": ["en"]}
        a = render_search_template(t, params)
        a["terms"]["lang"].append("de")
        b = render_search_template(t, params)
        assert b["terms"]["lang"] == ["en"]


class TestCapPerKey:
    def test_cap_and_determinism(self, spark):
        from elasticsearch_analysis_combo_spark.operators.sampling import (
            cap_per_key,
        )

        rows = [(i, f"host{i % 3}") for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, host string")
        a = cap_per_key(df, "host", 4)
        assert a.groupBy("host").count().agg(
            F.max("count")).collect()[0][0] == 4
        assert a.count() == 12
        ids_a = sorted(r["doc_id"] for r in a.collect())
        ids_b = sorted(
            r["doc_id"]
            for r in cap_per_key(
                df.repartition(7), "host", 4
            ).collect()
        )
        # same survivors regardless of partitioning
        assert ids_a == ids_b

    def test_under_cap_passthrough_and_validation(self, spark):
        from elasticsearch_analysis_combo_spark.operators.sampling import (
            cap_per_key,
        )

        df = spark.createDataFrame(
            [(1, "h"), (2, "h")], "doc_id long, host string"
        )
        assert cap_per_key(df, "host", 10).count() == 2
        with pytest.raises(ValueError):
            cap_per_key(df, "host", 0)


class TestChunkPassages:
    def test_coverage_and_overlap(self, spark):
        from elasticsearch_analysis_combo_spark.operators.pipeline import (
            chunk_passages,
        )

        toks = [f"t{i}" for i in range(11)]
        df = spark.createDataFrame(
            [(1, " ".join(toks)), (2, "a b c"), (3, "")],
            "doc_id long, text string",
        )
        out = chunk_passages(df, size=4, overlap=1)
        rows = sorted(
            ((r["doc_id"], r["chunk_id"], r["start_tok"],
              r["n_tokens"], r["text"]) for r in out.collect())
        )
        # doc 1: stride 3 -> starts 0,3,6,9; final is the remainder
        d1 = [r for r in rows if r[0] == 1]
        assert [(r[2], r[3]) for r in d1] == [(0, 4), (3, 4), (6, 4), (9, 2)]
        assert d1[0][4] == "t0 t1 t2 t3"
        assert d1[1][4] == "t3 t4 t5 t6"  # overlap of 1 token
        assert d1[3][4] == "t9 t10"
        # short doc -> one chunk; empty doc -> none
        assert [(r[2], r[3]) for r in rows if r[0] == 2] == [(0, 3)]
        assert not [r for r in rows if r[0] == 3]
        # every token appears in some chunk (coverage)
        covered = set()
        for _, _, s, n, _ in d1:
            covered.update(range(s, s + n))
        assert covered == set(range(11))

    def test_validation(self, spark):
        from elasticsearch_analysis_combo_spark.operators.pipeline import (
            chunk_passages,
        )

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        import pytest as _pt
        with _pt.raises(ValueError):
            chunk_passages(df, size=4, overlap=4)


class TestChangePoint:
    def test_level_shift(self, spark):
        from elasticsearch_analysis_combo_spark.query.facets import (
            change_point_agg,
        )

        rows = [(k, 1.0) for k in range(1, 5)] + [
            (k, 5.0) for k in range(5, 8)
        ]
        df = spark.createDataFrame(rows, "k int, v double")
        out = change_point_agg(df, "k", "v").collect()
        assert len(out) == 1
        r = out[0]
        # CUSUM peaks at the last pre-shift key; shift = 5 - 1
        assert r["change_point"] == 4
        assert r["shift"] == pytest.approx(4.0)
        assert r["cusum_score"] > 0

    def test_grouped(self, spark):
        from elasticsearch_analysis_combo_spark.query.facets import (
            change_point_agg,
        )

        rows = [("a", k, 0.0 if k < 6 else 10.0) for k in range(1, 11)]
        rows += [("b", k, float(k % 2)) for k in range(1, 11)]
        df = spark.createDataFrame(rows, "g string, k int, v double")
        out = {r["g"]: r for r in change_point_agg(
            df, "k", "v", group_col="g").collect()}
        assert out["a"]["change_point"] == 5
        assert out["a"]["shift"] == pytest.approx(10.0)
        # the alternating series has no real shift: tiny score vs a's
        assert out["b"]["cusum_score"] < out["a"]["cusum_score"] / 5


class TestCollapseInnerHits:
    def test_groups_and_inner_ranks(self, spark):
        from elasticsearch_analysis_combo_spark.analysis.combo import (
            ComboConfig,
        )
        from elasticsearch_analysis_combo_spark.analysis.udfs import (
            build_term_stats,
        )
        from elasticsearch_analysis_combo_spark.query.facets import (
            collapse_inner_hits_topk,
            collapse_topk,
        )
        from pyspark.sql import functions as F

        cfg = ComboConfig(["whitespace"])
        rows = [
            (0, "cold cold cold", "en"), (1, "cold cold", "en"),
            (2, "cold", "en"), (3, "cold cold cold cold", "de"),
            (4, "cold", "de"), (5, "warm", "en"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        stats = build_term_stats(
            df.select("doc_id", F.col("text").alias("content")), cfg
        ).cache()
        tdf = stats.groupBy("term").agg(F.count("*").alias("df"))
        avgdl = stats.select("doc_id", "dl").distinct().agg(
            F.avg("dl")).collect()[0][0]
        meta = df.select("doc_id", "lang")
        args = (spark, stats, tdf, [(0, "cold")], cfg, meta, "lang",
                6, float(avgdl))
        inner = collapse_inner_hits_topk(*args, k=5, inner_size=2).collect()
        plain = collapse_topk(*args, k=5).collect()
        # inner_rank==1 rows ARE the plain collapse result
        lead = {(r["query_id"], r["collapse_value"], r["doc_id"])
                for r in inner if r["inner_rank"] == 1}
        assert lead == {(r["query_id"], r["collapse_value"], r["doc_id"])
                        for r in plain}
        # at most inner_size per group, ranks consecutive
        from collections import Counter
        per_group = Counter(r["collapse_value"] for r in inner)
        assert all(v <= 2 for v in per_group.values())
        en = sorted(r["inner_rank"] for r in inner
                    if r["collapse_value"] == "en")
        assert en == [1, 2]


class TestFuzzyTranspositions:
    def test_osa_distance_vectors(self):
        from elasticsearch_analysis_combo_spark.query.boolean import (
            osa_distance_leq,
        )

        assert osa_distance_leq("table", "tbale", 1)   # one swap
        assert not osa_distance_leq("table", "tbale", 0)
        assert osa_distance_leq("abc", "abc", 0)
        assert osa_distance_leq("abc", "abd", 1)
        assert not osa_distance_leq("abcd", "dcba", 2)
        # OSA forbids edits inside a transposed pair: CA -> ABC is 3
        # (full Damerau-Levenshtein would say 2)
        assert not osa_distance_leq("ca", "abc", 2)
        assert osa_distance_leq("ca", "abc", 3)

    def test_fuzzy_transpositions_end_to_end(self, spark):
        from elasticsearch_analysis_combo_spark.analysis.combo import (
            ComboConfig,
        )
        from elasticsearch_analysis_combo_spark.analysis.udfs import (
            build_term_stats,
        )
        from elasticsearch_analysis_combo_spark.query.boolean import (
            bm25_fuzzy_topk,
        )

        cfg = ComboConfig(["whitespace"])
        df = spark.createDataFrame(
            [(0, "table scan"), (1, "table table"), (2, "other words")],
            "doc_id long, content string",
        )
        stats = build_term_stats(df, cfg).cache()
        tdf = stats.groupBy("term").agg(F.count("*").alias("df"))
        avgdl = stats.select("doc_id", "dl").distinct().agg(
            F.avg("dl")).collect()[0][0]
        args = (spark, stats, tdf, [(0, "tbale")], 3, float(avgdl))
        # plain Levenshtein misses the swap (distance 2)
        plain = bm25_fuzzy_topk(*args, max_edits=1).collect()
        assert plain == []
        osa = bm25_fuzzy_topk(
            *args, max_edits=1, transpositions=True
        ).collect()
        assert {r["doc_id"] for r in osa} == {0, 1}


class TestFrequentItemSets:
    def test_apriori_pruning_and_counts(self, spark):
        from elasticsearch_analysis_combo_spark.query.facets import (
            frequent_item_sets_agg,
        )

        rows = [
            (0, ["a", "b", "x"]), (1, ["a", "b"]), (2, ["a", "b", "c"]),
            (3, ["a", "c"]), (4, ["b", "c", "y"]),
            (5, ["a", "a", "b"]),  # duplicate item counts ONCE per doc
        ]
        df = spark.createDataFrame(rows, "doc_id long, items array<string>")
        out = frequent_item_sets_agg(
            df, "items", min_support_docs=3, size=10
        ).collect()
        got = {(r["set_size"], tuple(r["items"])): r["doc_count"]
               for r in out}
        assert got[(1, ("a",))] == 5
        assert got[(1, ("b",))] == 5
        assert got[(1, ("c",))] == 3
        assert got[(2, ("a", "b"))] == 4
        # a-c co-occurs only twice -> pruned; x/y below single support
        assert (2, ("a", "c")) not in got
        assert (1, ("x",)) not in got

    def test_validation(self, spark):
        from elasticsearch_analysis_combo_spark.query.facets import (
            frequent_item_sets_agg,
        )

        df = spark.createDataFrame(
            [(0, ["a"])], "doc_id long, items array<string>"
        )
        import pytest as _pt
        with _pt.raises(ValueError):
            frequent_item_sets_agg(df, "items", max_set_size=3)
        with _pt.raises(ValueError):
            frequent_item_sets_agg(df, "items", max_items_per_doc=1)

    def test_doc_cap_identity_when_loose(self, spark):
        """A cap >= every doc's frequent-item count changes nothing."""
        from elasticsearch_analysis_combo_spark.query.facets import (
            frequent_item_sets_agg,
        )

        rows = [
            (0, ["a", "b", "x"]), (1, ["a", "b"]), (2, ["a", "b", "c"]),
            (3, ["a", "c"]), (4, ["b", "c", "y"]), (5, ["a", "a", "b"]),
        ]
        df = spark.createDataFrame(rows, "doc_id long, items array<string>")

        def rows_of(out):
            return sorted(
                (r["set_size"], tuple(r["items"]), r["doc_count"])
                for r in out.collect()
            )

        exact = rows_of(frequent_item_sets_agg(
            df, "items", min_support_docs=3, size=10
        ))
        capped = rows_of(frequent_item_sets_agg(
            df, "items", min_support_docs=3, size=10, max_items_per_doc=10
        ))
        assert capped == exact

    def test_doc_cap_deterministic_top_by_support(self, spark):
        """The cap keeps each doc's top-n by GLOBAL support, ties by
        item asc — so the kept pairs are predictable."""
        from elasticsearch_analysis_combo_spark.query.facets import (
            frequent_item_sets_agg,
        )

        # support: a=4, b=3, c=3 -> doc 0's top-2 = (a, b); pair (a,c)
        # and (b,c) lose doc 0's contribution under cap=2
        rows = [
            (0, ["a", "b", "c"]), (1, ["a", "b", "c"]), (2, ["a", "b", "c"]),
            (3, ["a"]),
        ]
        df = spark.createDataFrame(rows, "doc_id long, items array<string>")
        out = frequent_item_sets_agg(
            df, "items", min_support_docs=3, size=10, max_items_per_doc=2
        ).collect()
        got = {(r["set_size"], tuple(r["items"])): r["doc_count"]
               for r in out}
        assert got[(2, ("a", "b"))] == 3
        assert (2, ("a", "c")) not in got  # capped out of every doc
        assert (2, ("b", "c")) not in got

    def test_doc_cap_bounds_pathological_doc(self, spark):
        """Torture: one doc carrying 10k frequent items must finish —
        uncapped it would emit 5e7 pair rows into one skew cell; the
        cap bounds it at n^2/2 per doc."""
        from elasticsearch_analysis_combo_spark.query.facets import (
            frequent_item_sets_agg,
        )

        big = [f"t{i:05d}" for i in range(10_000)]
        rows = [(d, big) for d in range(3)]  # all 10k items frequent
        df = spark.createDataFrame(rows, "doc_id long, items array<string>")
        out = frequent_item_sets_agg(
            df, "items", min_support_docs=3, size=5, max_items_per_doc=8
        ).collect()
        got = {(r["set_size"], tuple(r["items"])): r["doc_count"]
               for r in out}
        # every kept pair is among the lexicographically-first 8 items
        # (equal support -> item asc tie-break) and counts all 3 docs
        assert got[(2, ("t00000", "t00001"))] == 3
        assert all(
            items[-1] <= "t00007" for (sz, items) in got if sz == 2
        )


class TestTokenBudgetSampling:
    def test_budget_met_and_deterministic(self, spark):
        from elasticsearch_analysis_combo_spark.operators.sampling import (
            sample_to_token_budget,
        )

        rows = [(i, "a" if i < 20 else "b", 10) for i in range(40)]
        df = spark.createDataFrame(
            rows, "doc_id long, src string, n_tok int"
        )
        out = sample_to_token_budget(
            df, "src", {"a": 55, "b": 200}, "n_tok"
        )
        got = {r["src"]: [] for r in out.collect()}
        for r in out.collect():
            got[r["src"]].append(r["doc_id"])
        # a: docs of 10 tokens -> 6th doc CROSSES 55 and is included
        assert len(got["a"]) == 6
        assert sum(10 for _ in got["a"]) >= 55
        # b: budget 200 == exactly 20 docs
        assert len(got["b"]) == 20
        # partitioning invariance
        again = sample_to_token_budget(
            df.repartition(7), "src", {"a": 55, "b": 200}, "n_tok"
        )
        assert sorted(r["doc_id"] for r in again.collect()) == sorted(
            r["doc_id"] for r in out.collect()
        )

    def test_missing_stratum_dropped_and_validation(self, spark):
        from elasticsearch_analysis_combo_spark.operators.sampling import (
            sample_to_token_budget,
        )

        df = spark.createDataFrame(
            [(1, "x", 5)], "doc_id long, src string, n_tok int"
        )
        assert sample_to_token_budget(df, "src", {"y": 10}, "n_tok"
                                      ).count() == 0
        import pytest as _pt
        with _pt.raises(ValueError):
            sample_to_token_budget(df, "src", {"x": -1}, "n_tok")
