"""Rollup maintenance tests (operators/rollup.py): the merge-equals-
rescan invariant, spec validation, and composition with the KMV sketch
for mergeable approximate distinct."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etlutil_spark.operators.rollup import merge_stats, partial_stats


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from etlutil_spark.sources.testdata import load_table

    return load_table(spark, "events", sf_dir)


def spec():
    # built lazily: Column construction needs an active SparkContext
    return {
        "n": ("count", F.lit(1)),
        "total": ("sum", F.col("value").cast("decimal(38,6)")),
        "lo": ("min", F.col("value")),
        "hi": ("max", F.col("value")),
    }


OPS = {"n": "count", "total": "sum", "lo": "min", "hi": "max"}


class TestRollup:
    def test_merge_equals_rescan(self, events):
        ev = events.withColumn("d", F.to_date("ts"))
        daily = partial_stats(ev, ["d", "event_type"], spec())
        merged = merge_stats(daily, "event_type", OPS)
        direct = partial_stats(ev, "event_type", spec())
        key = lambda r: r.event_type
        assert sorted(map(tuple, merged.collect()), key=lambda t: t[0]) == sorted(
            map(tuple, direct.collect()), key=lambda t: t[0]
        )

    def test_merge_is_associative_over_regrouping(self, events):
        """day -> week -> total must equal day -> total."""
        ev = events.withColumn("d", F.to_date("ts"))
        daily = partial_stats(ev, ["d", "event_type"], spec())
        weekly = merge_stats(
            daily.withColumn("w", F.date_trunc("week", "d")),
            ["w", "event_type"],
            OPS,
        )
        via_week = merge_stats(weekly, "event_type", OPS)
        direct = merge_stats(daily, "event_type", OPS)
        assert sorted(map(tuple, via_week.collect())) == sorted(
            map(tuple, direct.collect())
        )

    def test_rejects_non_mergeable(self, events):
        with pytest.raises(ValueError, match="non-mergeable"):
            partial_stats(events, "event_type", {"a": ("avg", F.col("value"))})
        with pytest.raises(ValueError, match="non-mergeable"):
            merge_stats(events, "event_type", {"value": "stddev"})

    def test_composes_with_kmv_for_distinct(self, events):
        """Partial KMV sketches per day merge to the whole-table estimate —
        the mergeable stand-in for COUNT(DISTINCT) in rollup tables."""
        from etlutil_spark.operators.sketch import (
            kmv_estimate,
            kmv_merge,
            kmv_sketch,
        )

        ev = events.withColumn("d", F.to_date("ts"))
        days = [r.d for r in ev.select("d").distinct().collect()]
        half = sorted(days)[: len(days) // 2]
        a = kmv_sketch(ev.where(F.col("d").isin(half)), "event_type", "event_id", k=32)
        b = kmv_sketch(ev.where(~F.col("d").isin(half)), "event_type", "event_id", k=32)
        merged = kmv_estimate(kmv_merge(a, b, "event_type", k=32), "event_type", k=32)
        direct = kmv_estimate(
            kmv_sketch(ev, "event_type", "event_id", k=32), "event_type", k=32
        )
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )
