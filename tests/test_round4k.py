"""Round-4k operator vectors: significant_terms heuristics,
sampler/random_sampler aggs, geohash_grid, multi-index search."""

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_analysis_combo_spark.analysis.combo import ComboConfig
from elasticsearch_analysis_combo_spark.analysis.udfs import build_term_stats

CFG = ComboConfig(["whitespace"])


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # 4 docs match 'q'; 'hot' rides with q in 3 of them, 'cold'
        # appears once in-set and 3 times out-of-set
        (0, "q hot aaa", "en"),
        (1, "q hot bbb", "en"),
        (2, "q hot cold", "de"),
        (3, "q aaa bbb", "de"),
        (4, "cold aaa bbb", "en"),
        (5, "cold bbb ccc", "en"),
        (6, "cold ccc aaa", "de"),
        (7, "ddd ccc bbb", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    stats = build_term_stats(
        df.select("doc_id", F.col("text").alias("content")), CFG
    ).cache()
    stats.count()
    return df, stats


class TestSigHeuristics:
    def _scores(self, spark, stats, heuristic):
        from elasticsearch_analysis_combo_spark.query.facets import (
            significant_terms,
        )

        out = significant_terms(
            spark, stats, [(0, "q")], CFG, n_docs=8, size=10,
            min_doc_count=1, heuristic=heuristic,
        )
        return {r["term"]: r for r in out.collect()}

    def test_chi_square_hand_vector(self, spark, corpus):
        _, stats = corpus
        got = self._scores(spark, stats, "chi_square")
        # 'hot': a=3 b=0 c=1 d=4, N=8 -> chi2 = 8*(12-0)^2/(3*5*4*4) = 4.8
        assert got["hot"]["score"] == pytest.approx(4.8)
        # 'cold': a=1 b=3 c=3 d=1 -> in-set rate 0.25 < out rate 0.75
        # -> NEGATIVE (include_negatives semantics)
        assert got["cold"]["score"] < 0

    def test_mutual_information_signed_and_gnd_bounded(self, spark, corpus):
        _, stats = corpus
        mi = self._scores(spark, stats, "mutual_information")
        assert mi["hot"]["score"] > 0 > mi["cold"]["score"]
        # hand value for 'hot': sum over cells of p*log2(p/(px*py))
        n, a, b, c, d = 8.0, 3.0, 0.0, 1.0, 4.0
        want = 0.0
        for nxy, px, py in [(a, a + b, a + c), (b, a + b, b + d),
                            (c, c + d, a + c), (d, c + d, b + d)]:
            if nxy > 0:
                want += (nxy / n) * math.log2(
                    (nxy / n) / ((px / n) * (py / n)))
        assert mi["hot"]["score"] == pytest.approx(want)
        gnd = self._scores(spark, stats, "gnd")
        for r in gnd.values():
            assert 0.0 < r["score"] <= 1.0
        # perfectly co-occurring term maximizes the similarity ranking
        assert gnd["hot"]["rank"] == 1

    def test_unknown_heuristic_raises(self, spark, corpus):
        _, stats = corpus
        with pytest.raises(ValueError):
            self._scores(spark, stats, "nope")


class TestSamplers:
    def test_sampler_caps_and_aggregates(self, spark, corpus):
        from elasticsearch_analysis_combo_spark.query.facets import (
            sampler_agg,
        )

        df, _ = corpus
        hits = spark.createDataFrame(
            [(0, i, 10.0 - i) for i in range(8)],
            "query_id int, doc_id long, score double",
        )
        out = sampler_agg(
            hits, df.select("doc_id", "lang"), "lang", shard_size=3
        ).collect()
        # best 3 hits are docs 0,1,2 -> en,en,de
        got = {r["lang"]: r["doc_count"] for r in out}
        assert got == {"en": 2, "de": 1}

    def test_random_sampler_rescales_and_is_deterministic(
        self, spark, corpus
    ):
        from elasticsearch_analysis_combo_spark.query.facets import (
            random_sampler_agg,
        )

        df, _ = corpus
        meta = df.select("doc_id", "lang", F.length("text").alias("n"))
        a = random_sampler_agg(meta, 0.5, "lang", "n", seed=3).collect()
        b = random_sampler_agg(meta, 0.5, "lang", "n", seed=3).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        # doc_count is count/p; with p=1.0 it equals the exact count
        full = {
            r["lang"]: r["doc_count"]
            for r in random_sampler_agg(
                meta, 1.0, "lang", "n", seed=3
            ).collect()
        }
        assert full == {"en": 5.0, "de": 3.0}


class TestGeohash:
    def test_wikipedia_vector(self, spark):
        from elasticsearch_analysis_combo_spark.query.geo import (
            geohash_grid_agg,
        )

        pts = spark.createDataFrame(
            [(57.64911, 10.40744)], "lat double, lon double"
        )
        out = geohash_grid_agg(pts, "lat", "lon", precision=11).collect()
        assert out[0]["geohash"] == "u4pruydqqvj"
        assert out[0]["doc_count"] == 1

    def test_grouping_and_centroid(self, spark):
        from elasticsearch_analysis_combo_spark.query.geo import (
            geohash_grid_agg,
        )

        pts = spark.createDataFrame(
            [(10.0, 10.0), (10.001, 10.001), (-40.0, 120.0)],
            "lat double, lon double",
        )
        out = {r["geohash"]: r for r in geohash_grid_agg(
            pts, "lat", "lon", precision=3
        ).collect()}
        assert len(out) == 2
        near = [r for r in out.values() if r["doc_count"] == 2][0]
        assert near["centroid_lat"] == pytest.approx(10.0005)

    def test_precision_validation(self, spark):
        from elasticsearch_analysis_combo_spark.query.geo import (
            geohash_grid_agg,
        )

        pts = spark.createDataFrame([(0.0, 0.0)], "lat double, lon double")
        with pytest.raises(ValueError):
            geohash_grid_agg(pts, "lat", "lon", precision=0)


class TestMultiIndex:
    def test_per_index_stats_and_merge(self, spark, corpus):
        from elasticsearch_analysis_combo_spark.query.bm25 import (
            bm25_exhaustive_topk,
            multi_index_topk,
        )

        _, stats = corpus
        indices = {}
        for name, pred in [("even", 0), ("odd", 1)]:
            sub = stats.filter(F.pmod("doc_id", F.lit(2)) == pred)
            n = sub.select("doc_id").distinct().count()
            avgdl = sub.select("doc_id", "dl").distinct().agg(
                F.avg("dl")).collect()[0][0]
            tdf = sub.groupBy("term").agg(F.count("*").alias("df"))
            indices[name] = (sub, tdf, n, float(avgdl))
        merged = multi_index_topk(
            spark, indices, [(0, "cold")], CFG, k=10
        ).collect()
        # every per-index hit must appear with ITS index's score
        for name, (sub, tdf, n, avgdl) in indices.items():
            solo = bm25_exhaustive_topk(
                spark, sub, tdf, [(0, "cold")], CFG, n, avgdl, k=10
            ).collect()
            want = {r["doc_id"]: r["score"] for r in solo}
            got = {
                r["doc_id"]: r["score"] for r in merged
                if r["index"] == name
            }
            assert got.keys() == want.keys()
            for did in want:
                assert got[did] == pytest.approx(want[did])
        # merged rank is (rounded score desc, index, doc_id), 1..n
        ranks = sorted(r["rank"] for r in merged)
        assert ranks == list(range(1, len(merged) + 1))
