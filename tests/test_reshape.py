"""Reshape operator tests (operators/reshape.py): correctness of the
when-filtered pivot and melt round-trip, plus the plan contracts
(pivot = ONE shuffle without a discovery scan; unpivot = zero shuffle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etlutil_spark.operators.reshape import pivot_agg, unpivot


@pytest.fixture()
def long_df(spark):
    return spark.createDataFrame(
        [
            ("d1", "a", 1.0),
            ("d1", "a", 2.0),
            ("d1", "b", 5.0),
            ("d2", "b", 7.0),
        ],
        "grp string, kind string, v double",
    )


def sum_of(cond):
    return F.sum(F.when(cond, F.col("v")))


def count_of(cond):
    return F.count(F.when(cond, 1))


class TestPivot:
    def test_values_and_absent_combos(self, long_df):
        out = pivot_agg(long_df, "grp", "kind", ["a", "b", "c"], sum_of)
        rows = {r.grp: r for r in out.collect()}
        assert rows["d1"].a == 3.0 and rows["d1"].b == 5.0
        assert rows["d2"].a is None  # absent combo: SUM -> NULL (SQL FILTER)
        assert rows["d1"].c is None  # value never present still gets a column
        assert out.columns == ["grp", "a", "b", "c"]

    def test_count_absent_is_zero(self, long_df):
        out = pivot_agg(long_df, "grp", "kind", ["a", "b"], count_of, prefix="n_")
        assert out.columns == ["grp", "n_a", "n_b"]
        assert {r.grp: r.n_a for r in out.collect()} == {"d1": 2, "d2": 0}

    def test_single_shuffle_no_discovery_scan(self, long_df):
        """The reason pivot_agg exists instead of df.pivot(): native pivot
        plans TWO exchanges (and a discovery job without a value list);
        the when-filtered form is one groupBy."""
        out = pivot_agg(long_df, "grp", "kind", ["a", "b"], sum_of)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1


class TestUnpivot:
    def test_melt_values(self, long_df):
        wide = pivot_agg(long_df, "grp", "kind", ["a", "b"], sum_of)
        back = unpivot(wide, "grp", ["a", "b"], var_col="kind", value_col="v")
        got = {(r.grp, r.kind): r.v for r in back.collect()}
        assert got[("d1", "a")] == 3.0 and got[("d2", "b")] == 7.0
        assert got[("d2", "a")] is None

    def test_zero_shuffle(self, spark):
        df = spark.createDataFrame([(1, 2.0, 3.0)], "id int, x double, y double")
        out = unpivot(df, "id", ["x", "y"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
