"""Unit + property tests for the KMV distinct-count sketch
(operators/sketch.py): accuracy bound, exact-mode small groups, merge
closure, and the two-exchange plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etlutil_spark.operators.sketch import (
    kmv_distinct,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from etlutil_spark.sources.testdata import load_table

    return load_table(spark, "events", sf_dir)


class TestKmv:
    def test_exact_below_k(self, events):
        """Fewer distinct values than k -> the estimate IS the exact count."""
        est = {
            r.event_type: r.approx_distinct
            for r in kmv_distinct(events, "event_type", "user_id", k=256).collect()
        }
        exact = {
            r.event_type: r.n
            for r in events.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        assert est == exact

    def test_estimate_accuracy(self, events):
        """~200 distinct event_ids per type at sf0.001, k=64 -> SE ~ 13%;
        assert within 3 sigma (deterministic: the hash is fixed)."""
        est = {
            r.event_type: r.approx_distinct
            for r in kmv_distinct(events, "event_type", "event_id", k=64).collect()
        }
        exact = {
            r.event_type: r.n
            for r in events.groupBy("event_type")
            .agg(F.countDistinct("event_id").alias("n"))
            .collect()
        }
        for t, n in exact.items():
            assert n > 64, "fixture must exercise the estimate branch"
            assert abs(est[t] - n) / n < 0.4, (t, est[t], n)

    def test_merge_closure(self, events):
        """bottom_k(A ∪ B) == bottom_k(bottom_k(A) ∪ bottom_k(B)): merging
        per-partition sketches gives EXACTLY the whole-table estimate."""
        a = events.where(F.col("event_id") % 2 == 0)
        b = events.where(F.col("event_id") % 2 == 1)
        sk_a = kmv_sketch(a, "event_type", "event_id", k=64)
        sk_b = kmv_sketch(b, "event_type", "event_id", k=64)
        merged = kmv_estimate(
            kmv_merge(sk_a, sk_b, "event_type", k=64), "event_type", k=64
        )
        direct = kmv_distinct(events, "event_type", "event_id", k=64)
        m = {r.event_type: r.approx_distinct for r in merged.collect()}
        d = {r.event_type: r.approx_distinct for r in direct.collect()}
        assert m == d

    def test_sketch_bounded(self, events):
        sk = kmv_sketch(events, "event_type", "event_id", k=16)
        per_group = sk.groupBy("event_type").count().collect()
        assert all(r["count"] <= 16 for r in per_group)

    def test_k_validation(self, events):
        with pytest.raises(ValueError, match="k must be"):
            kmv_sketch(events, "event_type", "event_id", k=1)

    def test_two_exchange_plan(self, events):
        """distinct shuffles (group, hash); window + final agg share the
        group-column exchange — no third shuffle."""
        out = kmv_distinct(events, "event_type", "event_id", k=64)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 2
