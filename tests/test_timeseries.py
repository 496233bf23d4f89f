"""Unit tests for time-series regularization (operators/timeseries.py):
spine bounds, gap insertion, zero-fill vs ffill vs leave-NULL columns,
ffill-through-observed-NULL semantics, and plan shape."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from etlutil_spark.operators.timeseries import forward_fill, gap_fill, time_spine


@pytest.fixture()
def sparse(spark):
    return spark.createDataFrame(
        [
            ("a", date(2024, 1, 1), 10, 1.0),
            ("a", date(2024, 1, 4), 5, None),   # observed NULL metric
            ("a", date(2024, 1, 6), 7, 3.0),
            ("b", date(2024, 2, 10), 1, 9.0),
        ],
        "k string, d date, n int, v double",
    )


class TestTimeSpine:
    def test_per_key_bounds(self, sparse):
        sp = time_spine(sparse, "k", "d")
        days = {r.k: set() for r in sp.collect()}
        for r in sp.collect():
            days[r.k].add(r.d)
        assert days["a"] == {date(2024, 1, i) for i in range(1, 7)}
        assert days["b"] == {date(2024, 2, 10)}  # single observation: 1 row

    def test_no_cross_join(self, sparse):
        plan = time_spine(sparse, "k", "d")._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan  # spine is generated, never joined


class TestGapFill:
    def test_zero_fill_and_ffill(self, sparse):
        out = gap_fill(
            sparse, "k", "d", zero_fill={"n": 0}, ffill_cols=["v"]
        )
        a = {r.d: r for r in out.collect() if r.k == "a"}
        assert len(a) == 6
        assert a[date(2024, 1, 2)].n == 0  # gap row zero-filled
        assert a[date(2024, 1, 2)].v == 1.0  # gap row carried forward
        assert a[date(2024, 1, 4)].n == 5  # observed row untouched
        # ffill fills THROUGH an observed NULL (documented semantics)
        assert a[date(2024, 1, 4)].v == 1.0
        assert a[date(2024, 1, 6)].v == 3.0

    def test_unfilled_column_stays_null(self, sparse):
        out = gap_fill(sparse, "k", "d", zero_fill={"n": 0})
        a = {r.d: r for r in out.collect() if r.k == "a"}
        assert a[date(2024, 1, 3)].v is None

    def test_leading_gap_has_no_carry(self, spark):
        df = spark.createDataFrame(
            [("a", date(2024, 1, 1), None), ("a", date(2024, 1, 3), 5.0)],
            "k string, d date, v double",
        )
        out = gap_fill(df, "k", "d", ffill_cols=["v"])
        rows = {r.d: r.v for r in out.collect()}
        assert rows[date(2024, 1, 1)] is None  # nothing earlier to carry
        assert rows[date(2024, 1, 2)] is None
        assert rows[date(2024, 1, 3)] == 5.0


class TestForwardFill:
    def test_multi_column_single_shuffle(self, sparse):
        out = forward_fill(sparse, "k", "d", ["n", "v"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1


class TestHistogram:
    """operators/profile.py:histogram (lives here to avoid a new session
    module for one class — it shares the regular-grid theme)."""

    def test_dense_bins_and_clamp(self, spark):
        from etlutil_spark.operators.profile import histogram

        df = spark.createDataFrame(
            [(0.0,), (4.9,), (5.0,), (10.0,)], "x double"
        )
        out = {r.bin: r for r in histogram(df, "x", n_bins=2, lo=0.0, hi=10.0).collect()}
        assert len(out) == 2
        assert out[0].n == 2  # 0.0, 4.9
        assert out[1].n == 2  # 5.0 lands in bin 1; 10.0 == hi clamps into last bin
        assert (out[0].bin_lo, out[0].bin_hi) == (0.0, 5.0)

    def test_auto_bounds_and_empty_bins(self, spark):
        from etlutil_spark.operators.profile import histogram

        df = spark.createDataFrame([(0.0,), (100.0,)], "x double")
        rows = histogram(df, "x", n_bins=4).collect()
        assert [r.n for r in sorted(rows, key=lambda r: r.bin)] == [1, 0, 0, 1]

    def test_bad_bounds_raise(self, spark):
        from etlutil_spark.operators.profile import histogram

        df = spark.createDataFrame([(1.0,)], "x double")
        import pytest as _pt
        with _pt.raises(ValueError, match="bounds"):
            histogram(df, "x", n_bins=3, lo=5.0, hi=5.0)


class TestGroupZscores:
    def test_standardization_and_degenerate_groups(self, spark):
        from etlutil_spark.operators.profile import group_zscores

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 7.0), ("c", 4.0), ("c", 4.0)],
            "g string, v double",
        )
        out = group_zscores(df, "g", "v").collect()
        a = sorted(r.zscore for r in out if r.g == "a")
        # mean 2, population std sqrt(2/3)
        import math

        std = math.sqrt(2.0 / 3.0)
        assert a == pytest.approx([-1 / std, 0.0, 1 / std])
        assert all(r.zscore is None for r in out if r.g == "b")  # single row
        assert all(r.zscore is None for r in out if r.g == "c")  # zero variance

    def test_moments_join_is_broadcast(self, spark):
        from etlutil_spark.operators.profile import group_zscores

        df = spark.createDataFrame([("a", float(i)) for i in range(10)], "g string, v double")
        plan = group_zscores(df, "g", "v")._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestTrailingBaselineAnomaly:
    def _run(self, spark, rows, **kw):
        from datetime import datetime, timedelta

        from etlutil_spark.operators.timeseries import trailing_baseline_anomaly

        base = datetime(2024, 1, 10, 0, 0, 0)
        data = [("t", base + timedelta(hours=h), i) for h, n in rows for i in range(n)]
        df = spark.createDataFrame(data, "g string, ts timestamp, i int")
        out = trailing_baseline_anomaly(df, "ts", ["g"], **kw)
        return {r["bucket"].hour + (r["bucket"].day - 10) * 24: r for r in out.collect()}

    def test_spike_over_trailing_average(self, spark):
        rows = [(h, 10) for h in range(8)] + [(8, 50)]
        out = self._run(spark, rows, min_baseline_buckets=6)
        assert out[8]["baseline"] == 10.0 and out[8]["is_spike"] == 1
        assert out[7]["is_spike"] == 0

    def test_cold_start_suppressed(self, spark):
        rows = [(0, 10), (1, 100)]
        out = self._run(spark, rows, min_baseline_buckets=6)
        assert out[1]["baseline"] is None and out[1]["is_spike"] == 0

    def test_gaps_age_out_of_range_frame(self, spark):
        """Six busy hours, a 30-hour silence, then a tiny hour: a ROWS
        frame would flag nothing (stale big counts still 'recent'); the
        RANGE frame has an empty baseline -> cold-start NULL."""
        rows = [(h, 50) for h in range(6)] + [(36, 1)]
        out = self._run(spark, rows, min_baseline_buckets=2)
        assert out[36]["baseline"] is None and out[36]["is_spike"] == 0

    def test_baseline_averages_active_buckets_only(self, spark):
        # hours 0..3 active, hour 4 missing, hour 5 checked: avg over 4 active
        rows = [(0, 8), (1, 12), (2, 8), (3, 12), (5, 21)]
        out = self._run(spark, rows, min_baseline_buckets=2)
        assert out[5]["baseline"] == 10.0 and out[5]["is_spike"] == 1


class TestDecayWeight:
    def test_future_rows_clamp_to_one(self, spark):
        from etlutil_spark.operators.timeseries import decay_weight

        df = spark.createDataFrame(
            [
                ("past", "2023-10-03"),     # 90d before ref -> 0.5
                ("ref", "2024-01-01"),      # age 0 -> 1.0
                ("future", "2024-06-01"),   # 152d after ref
                ("undated", None),          # NULL ts -> NULL both paths
            ],
            "tag string, ts string",
        ).select("tag", F.to_timestamp("ts").alias("ts"))
        raw = {
            r["tag"]: r["w"]
            for r in df.select(
                "tag", decay_weight("ts", "2024-01-01").alias("w")
            ).collect()
        }
        clamped = {
            r["tag"]: r["w"]
            for r in df.select(
                "tag",
                decay_weight("ts", "2024-01-01", clamp_future=True).alias("w"),
            ).collect()
        }
        # unclamped: future straggler dominates (2^(152/90) ~ 3.22)
        assert raw["past"] == pytest.approx(0.5)
        assert raw["ref"] == 1.0
        assert raw["future"] > 3.0
        # clamped: past weights identical, future pinned to exactly 1.0
        assert clamped["past"] == raw["past"]
        assert clamped["ref"] == 1.0
        assert clamped["future"] == 1.0
        # NULL ts must stay NULL on BOTH paths — greatest(NULL, 0) would
        # silently give undated rows full weight 1.0 under the clamp
        assert raw["undated"] is None
        assert clamped["undated"] is None


class TestGapFillPinOptOut:
    """r12 advice item 1: gap_fill's input pin is now caller-controlled.
    pin_input=False must return identical rows (for large or
    already-materialized inputs where pinning costs more than it saves)."""

    def test_pin_input_false_identical(self, spark):
        df = spark.createDataFrame(
            [("a", "2024-01-01", 1.0), ("a", "2024-01-04", 4.0),
             ("b", "2024-01-02", 2.0)],
            "k string, d string, v double",
        ).selectExpr("k", "CAST(d AS DATE) AS d", "v")
        a = sorted(map(str, gap_fill(df, "k", "d", zero_fill={"v": 0.0}).collect()))
        b = sorted(map(str, gap_fill(
            df, "k", "d", zero_fill={"v": 0.0}, pin_input=False
        ).collect()))
        assert a == b and len(a) == 5
