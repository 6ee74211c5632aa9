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
