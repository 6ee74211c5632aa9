"""date_range / variable_width_histogram / categorize_text aggregations."""

from elasticsearch_analysis_combo_spark.query.facets import (
    categorize_text_agg,
    date_range_agg,
    variable_width_histogram_agg,
)


class TestDateRange:
    def test_buckets_inclusive_exclusive(self, spark):
        rows = spark.createDataFrame(
            [("2024-01-01 00:00:00",), ("2024-01-15 12:00:00",),
             ("2024-02-01 00:00:00",)],
            "ts string",
        )
        out = date_range_agg(rows, "ts", [
            (None, "2024-01-15 12:00:00"),          # open start, to EXCL
            ("2024-01-15 12:00:00", "2024-02-02 00:00:00"),  # from INCL
            ("2024-03-01 00:00:00", None),          # empty bucket
        ]).orderBy("bucket").collect()
        assert [(r.bucket, r.doc_count) for r in out] == [
            (0, 1), (1, 2), (2, 0),
        ]
        assert out[0].from_ts is None and out[2].to_ts is None

    def test_overlapping_and_grouped(self, spark):
        rows = spark.createDataFrame(
            [("a", "2024-01-02 00:00:00"), ("a", "2024-01-05 00:00:00"),
             ("b", "2024-01-02 00:00:00")],
            "g string, ts string",
        )
        out = date_range_agg(rows, "ts", [
            (None, "2024-01-10 00:00:00"),
            ("2024-01-01 00:00:00", "2024-01-03 00:00:00"),
        ], group_col="g").collect()
        got = {(r.g, r.bucket): r.doc_count for r in out}
        # overlap: docs count in every bucket they fall in; empty emitted
        assert got == {("a", 0): 2, ("a", 1): 1, ("b", 0): 1, ("b", 1): 1}


class TestVariableWidthHistogram:
    def test_splits_at_largest_gaps(self, spark):
        # three obvious clusters: {1,2,3}, {50,51}, {100}
        rows = spark.createDataFrame(
            [(v,) for v in [1.0, 2.0, 3.0, 50.0, 51.0, 100.0, 2.0]],
            "v double",
        )
        out = variable_width_histogram_agg(rows, "v", buckets=3) \
            .orderBy("bucket").collect()
        assert [(r.bucket, r.min, r.max, r.doc_count) for r in out] == [
            (0, 1.0, 3.0, 4), (1, 50.0, 51.0, 2), (2, 100.0, 100.0, 1),
        ]
        assert abs(out[0].centroid - 2.0) < 1e-9

    def test_more_buckets_than_distinct_values(self, spark):
        rows = spark.createDataFrame([(1.0,), (5.0,), (1.0,)], "v double")
        out = variable_width_histogram_agg(rows, "v", buckets=10) \
            .orderBy("bucket").collect()
        assert [(r.bucket, r.min, r.doc_count) for r in out] == [
            (0, 1.0, 2), (1, 5.0, 1),
        ]

    def test_single_bucket(self, spark):
        rows = spark.createDataFrame([(1.0,), (9.0,)], "v double")
        out = variable_width_histogram_agg(rows, "v", buckets=1).collect()
        assert [(r.bucket, r.min, r.max, r.doc_count) for r in out] == [
            (0, 1.0, 9.0, 2),
        ]

    def test_gap_tie_breaks_on_lower_value(self, spark):
        # gaps 2-1=1, 4-2=2, 6-4=2: tie between boundaries 4 and 6 is
        # broken toward 4 -> clusters {1,2} {4,6}
        rows = spark.createDataFrame(
            [(1.0,), (2.0,), (4.0,), (6.0,)], "v double"
        )
        out = variable_width_histogram_agg(rows, "v", buckets=2) \
            .orderBy("bucket").collect()
        assert [(r.bucket, r.min, r.max) for r in out] == [
            (0, 1.0, 2.0), (1, 4.0, 6.0),
        ]


class TestCategorizeText:
    def test_digit_tokens_drop_out(self, spark):
        rows = spark.createDataFrame(
            [("ERROR job 1234 failed after 30 ms",),
             ("error job 99 failed after 7 ms",),
             ("user login ok",)],
            "msg string",
        )
        out = categorize_text_agg(rows, "msg").collect()
        got = {r.category: (r.doc_count, r.example) for r in out}
        assert got["error job failed after ms"] == (
            2, "ERROR job 1234 failed after 30 ms"
        )
        assert got["user login ok"] == (1, "user login ok")

    def test_max_tokens_caps_signature(self, spark):
        rows = spark.createDataFrame(
            [("a b c d e",), ("a b c x y",)], "msg string"
        )
        out = categorize_text_agg(rows, "msg", max_tokens=3).collect()
        assert [(r.category, r.doc_count) for r in out] == [("a b c", 2)]

    def test_grouped(self, spark):
        rows = spark.createDataFrame(
            [("svc1", "boot ok"), ("svc2", "boot ok")],
            "svc string, msg string",
        )
        out = categorize_text_agg(rows, "msg", group_col="svc").collect()
        assert sorted((r.svc, r.category, r.doc_count) for r in out) == [
            ("svc1", "boot ok", 1), ("svc2", "boot ok", 1),
        ]
