"""Round-5 scale fixes: bucketed token-budget prefix sum.

VERDICT r4 #1: sample_to_token_budget must not run one window cumsum
per stratum (single task holds a whole 100 TB source). The fix is a
two-phase bucketed prefix sum; these tests pin that the bucketed form
is ROW-IDENTICAL to the single-window definition (which the DuckDB
oracle replays) at several bucket counts, including non-powers of two.
"""

import pytest


def _mk(spark, n=500, strata=("en", "de", "zh", "fr")):
    rows = [
        (i, strata[i % len(strata)], 1 + (i * 7919) % 40)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, src string, n_tok int"
    )


BUDGETS = {"en": 900, "de": 350, "zh": 10**9}


class TestBucketedTokenBudget:
    @pytest.mark.parametrize("n_buckets", [2, 7, 64])
    def test_bucketed_identical_to_single_window(self, spark, n_buckets):
        from elasticsearch_analysis_combo_spark.operators.sampling import (
            sample_to_token_budget,
        )

        df = _mk(spark)
        single = sorted(
            r["doc_id"]
            for r in sample_to_token_budget(
                df, "src", BUDGETS, "n_tok", n_buckets=1
            ).collect()
        )
        bucketed = sorted(
            r["doc_id"]
            for r in sample_to_token_budget(
                df, "src", BUDGETS, "n_tok", n_buckets=n_buckets
            ).collect()
        )
        assert bucketed == single
        assert len(single) > 0

    def test_budgets_met_never_undershot(self, spark):
        from elasticsearch_analysis_combo_spark.operators.sampling import (
            sample_to_token_budget,
        )

        df = _mk(spark)
        out = sample_to_token_budget(df, "src", BUDGETS, "n_tok")
        sums = {
            r["src"]: r["s"]
            for r in out.groupBy("src").agg(
                __import__("pyspark.sql.functions", fromlist=["sum"])
                .sum("n_tok")
                .alias("s")
            ).collect()
        }
        # finite budgets are met (crossing doc included)
        assert sums["en"] >= BUDGETS["en"]
        assert sums["de"] >= BUDGETS["de"]
        # unbudgeted stratum fully dropped
        assert "fr" not in sums

    def test_no_per_stratum_window_in_plan(self, spark):
        """The cumsum window must partition by (stratum, bucket), never
        by the stratum alone — the r4 scale-killer shape."""
        from elasticsearch_analysis_combo_spark.operators.sampling import (
            sample_to_token_budget,
        )

        df = _mk(spark)
        plan = sample_to_token_budget(
            df, "src", BUDGETS, "n_tok"
        )._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "Window" not in line or "windowspecdefinition" not in line:
                continue
            if "_bk" in line:
                continue  # phase-2 cumsum: (src, _bk) partitions — OK
            # the only stratum-only window allowed is the base-offset
            # pass over the tiny (strata x buckets) aggregate
            assert "_sub" in line, f"stratum-only window on rows: {line}"
