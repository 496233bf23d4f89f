"""Unit tests for the temporal operators: as-of join (operators/asof.py)
and SCD2 interval construction (operators/scd2.py).

These cover the semantics the registered oracle queries can't reach:
forward direction, tolerance edge cases, NULL right-payload columns (the
forward-fill trap the struct carrier exists for), tie handling, and
multi-column state runs.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from etlutil_spark.operators.asof import asof_join
from etlutil_spark.operators.scd2 import scd2_apply, scd2_intervals


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            ("A", ts("2024-01-01 10:00:00"), 100),
            ("A", ts("2024-01-01 10:05:00"), 101),
            ("B", ts("2024-01-01 10:00:30"), 200),
            ("C", ts("2024-01-01 09:00:00"), 300),
        ],
        "sym string, t timestamp, trade_id int",
    )


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", ts("2024-01-01 09:59:00"), 10.0),
            ("A", ts("2024-01-01 10:00:00"), 11.0),  # tie with first trade
            ("A", ts("2024-01-01 10:04:00"), None),  # NULL payload mid-stream
            ("B", ts("2024-01-01 10:02:00"), 20.0),  # after B's only trade
        ],
        "sym string, qt timestamp, px double",
    )


class TestAsofJoin:
    def test_backward_basic(self, trades, quotes):
        out = asof_join(
            trades, quotes, on="sym", left_time="t", right_time="qt",
            matched_time_col="qt",
        )
        rows = {r.trade_id: r for r in out.collect()}
        assert len(rows) == 4
        # exact-tie quote (10:00:00) matches the 10:00:00 trade
        assert rows[100].qt == ts("2024-01-01 10:00:00")
        assert rows[100].px == 11.0
        # B's quote is later than B's trade -> no match, left row kept
        assert rows[200].qt is None and rows[200].px is None
        # C has no quotes at all
        assert rows[300].qt is None

    def test_null_payload_not_skipped(self, trades, quotes):
        """A right row whose payload is NULL must still win over an older
        non-NULL row (the classic last(ignorenulls) forward-fill bug)."""
        out = asof_join(
            trades, quotes, on="sym", left_time="t", right_time="qt",
            matched_time_col="qt",
        )
        r = {x.trade_id: x for x in out.collect()}[101]
        assert r.qt == ts("2024-01-01 10:04:00")
        assert r.px is None

    def test_forward(self, trades, quotes):
        out = asof_join(
            trades, quotes, on="sym", left_time="t", right_time="qt",
            direction="forward", matched_time_col="qt",
        )
        rows = {r.trade_id: r for r in out.collect()}
        assert rows[100].qt == ts("2024-01-01 10:00:00")  # tie matches forward too
        assert rows[101].qt is None  # no quote at/after 10:05
        assert rows[200].qt == ts("2024-01-01 10:02:00")
        assert rows[300].qt is None

    def test_tolerance(self, trades, quotes):
        out = asof_join(
            trades, quotes, on="sym", left_time="t", right_time="qt",
            tolerance_seconds=30, matched_time_col="qt",
        )
        rows = {r.trade_id: r for r in out.collect()}
        assert len(rows) == 4  # tolerance nulls payloads, never drops rows
        assert rows[100].qt == ts("2024-01-01 10:00:00")  # 0s stale: kept
        # trade 101 at 10:05, nearest quote at 10:04 -> 60s stale -> nulled
        assert rows[101].qt is None and rows[101].px is None

    def test_tolerance_exact(self, spark):
        left = spark.createDataFrame(
            [(1, ts("2024-01-01 00:01:00"))], "id int, t timestamp"
        )
        right = spark.createDataFrame(
            [(1, ts("2024-01-01 00:00:00"), 5.0)], "id int, qt timestamp, v double"
        )
        at_limit = asof_join(
            left, right, on="id", left_time="t", right_time="qt",
            tolerance_seconds=60, matched_time_col="qt",
        ).collect()[0]
        assert at_limit.v == 5.0  # staleness == tolerance is kept (<=)
        over = asof_join(
            left, right, on="id", left_time="t", right_time="qt",
            tolerance_seconds=59, matched_time_col="qt",
        ).collect()[0]
        assert over.v is None and over.qt is None

    def test_multi_key(self, spark):
        left = spark.createDataFrame(
            [("x", 1, ts("2024-01-01 01:00:00"))], "k1 string, k2 int, t timestamp"
        )
        right = spark.createDataFrame(
            [
                ("x", 1, ts("2024-01-01 00:30:00"), "good"),
                ("x", 2, ts("2024-01-01 00:59:00"), "wrong-k2"),
            ],
            "k1 string, k2 int, rt timestamp, tag string",
        )
        out = asof_join(
            left, right, on=["k1", "k2"], left_time="t", right_time="rt"
        ).collect()
        assert out[0].tag == "good"

    def test_left_columns_preserved(self, trades, quotes):
        out = asof_join(trades, quotes, on="sym", left_time="t", right_time="qt")
        assert out.columns == ["sym", "t", "trade_id", "matched_time", "px"]
        assert out.count() == trades.count()

    def test_null_left_time_matches_nothing(self, spark, quotes):
        # DuckDB ASOF / merge_asof semantics: NULL probe time matches no
        # row but the left row is kept. Under the forward ordering
        # (_t DESC NULLS LAST) an unguarded plan hands the NULL-time left
        # row the EARLIEST right payload.
        trades = spark.createDataFrame(
            [("A", None, 900)], "sym string, t timestamp, trade_id int"
        )
        for direction in ("backward", "forward"):
            out = asof_join(
                trades, quotes, on="sym", left_time="t", right_time="qt",
                direction=direction, matched_time_col="mt",
            )
            rows = out.collect()
            assert len(rows) == 1
            assert rows[0].mt is None and rows[0].px is None

    def test_null_right_time_never_matches(self, spark, trades):
        # a NULL-time right row sorts NULLS FIRST under the backward
        # ordering and would otherwise be carried as a "match" into left
        # rows with no real predecessor (here: C at 09:00, before every
        # real quote)
        quotes = spark.createDataFrame(
            [("C", None, 99.0), ("C", ts("2024-01-01 10:00:00"), 50.0)],
            "sym string, qt timestamp, px double",
        )
        out = asof_join(
            trades, quotes, on="sym", left_time="t", right_time="qt",
            matched_time_col="mt",
        )
        c = [r for r in out.collect() if r.trade_id == 300][0]
        assert c.mt is None and c.px is None

    def test_bad_direction_raises(self, trades, quotes):
        with pytest.raises(ValueError, match="direction"):
            asof_join(
                trades, quotes, on="sym", left_time="t", right_time="qt",
                direction="nearest",
            )

    def test_missing_key_raises(self, trades, quotes):
        with pytest.raises(ValueError, match="join key"):
            asof_join(trades, quotes, on="nope", left_time="t", right_time="qt")

    def test_single_shuffle_plan(self, trades, quotes):
        """The union-marker plan must cost exactly one exchange — that is
        its reason to exist vs a range join."""
        out = asof_join(trades, quotes, on="sym", left_time="t", right_time="qt")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1
        assert "BroadcastNestedLoop" not in plan


class TestScd2:
    @pytest.fixture()
    def log(self, spark):
        return spark.createDataFrame(
            [
                (1, ts("2024-01-01 00:00:00"), "bronze", "eu"),
                (1, ts("2024-02-01 00:00:00"), "bronze", "eu"),  # no change
                (1, ts("2024-03-01 00:00:00"), "silver", "eu"),  # tier change
                (1, ts("2024-04-01 00:00:00"), "silver", "us"),  # region change
                (2, ts("2024-01-15 00:00:00"), "gold", "eu"),
                (3, ts("2024-01-01 00:00:00"), None, "eu"),      # NULL state
                (3, ts("2024-02-01 00:00:00"), None, "eu"),      # same NULL
                (3, ts("2024-03-01 00:00:00"), "bronze", "eu"),
            ],
            "uid int, at timestamp, tier string, region string",
        )

    def test_runs_collapse(self, log):
        iv = scd2_intervals(log, "uid", "at", ["tier", "region"])
        rows = sorted(iv.collect(), key=lambda r: (r.uid, r.valid_from))
        u1 = [r for r in rows if r.uid == 1]
        assert len(u1) == 3  # bronze/eu run collapsed
        assert u1[0].valid_from == ts("2024-01-01 00:00:00")
        assert u1[0].valid_to == ts("2024-03-01 00:00:00")  # half-open
        assert u1[0].is_current == 0
        assert u1[2].valid_to is None and u1[2].is_current == 1

    def test_null_state_runs(self, log):
        """NULL-safe struct compare: consecutive NULL states are one run;
        NULL -> non-NULL is a change."""
        iv = scd2_intervals(log, "uid", "at", ["tier", "region"])
        u3 = sorted(
            [r for r in iv.collect() if r.uid == 3], key=lambda r: r.valid_from
        )
        assert len(u3) == 2
        assert u3[0].tier is None
        assert u3[0].valid_to == ts("2024-03-01 00:00:00")
        assert u3[1].tier == "bronze" and u3[1].is_current == 1

    def test_single_key_single_state(self, spark):
        df = spark.createDataFrame(
            [(1, ts("2024-01-01 00:00:00"), "a")], "k int, at timestamp, s string"
        )
        iv = scd2_intervals(df, "k", "at", "s").collect()
        assert len(iv) == 1
        assert iv[0].is_current == 1 and iv[0].valid_to is None

    def test_tie_break(self, spark):
        df = spark.createDataFrame(
            [
                (1, ts("2024-01-01 00:00:00"), 1, "a"),
                (1, ts("2024-01-01 00:00:00"), 2, "b"),  # same ts, later seq
            ],
            "k int, at timestamp, seq int, s string",
        )
        iv = sorted(
            scd2_intervals(df, "k", "at", "s", tie_break="seq").collect(),
            key=lambda r: (r.valid_from, r.s),
        )
        assert [r.s for r in iv] == ["a", "b"]
        assert iv[0].valid_to == ts("2024-01-01 00:00:00")  # zero-length run
        assert iv[1].is_current == 1

    def test_single_shuffle_plan(self, log):
        iv = scd2_intervals(log, "uid", "at", ["tier", "region"])
        plan = iv._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1


class TestScd2Apply:
    @pytest.fixture()
    def dim(self, spark):
        log = spark.createDataFrame(
            [
                (1, ts("2024-01-01 00:00:00"), "bronze"),
                (1, ts("2024-02-01 00:00:00"), "silver"),
                (2, ts("2024-01-01 00:00:00"), "gold"),
            ],
            "uid int, at timestamp, tier string",
        )
        return scd2_intervals(log, "uid", "at", "tier")

    def test_new_state_closes_open_run(self, spark, dim):
        batch = spark.createDataFrame(
            [(1, ts("2024-03-01 00:00:00"), "gold")], "uid int, at timestamp, tier string"
        )
        out = scd2_apply(dim, batch, "uid", "at", "tier")
        u1 = sorted(
            [r for r in out.collect() if r.uid == 1], key=lambda r: r.valid_from
        )
        assert [(r.tier, r.is_current) for r in u1] == [
            ("bronze", 0), ("silver", 0), ("gold", 1)
        ]
        assert u1[1].valid_to == ts("2024-03-01 00:00:00")

    def test_same_state_extends_run(self, spark, dim):
        """A batch observation repeating the open run's state must collapse
        into it — no zero-length interval, valid_from unchanged."""
        batch = spark.createDataFrame(
            [(1, ts("2024-03-01 00:00:00"), "silver")],
            "uid int, at timestamp, tier string",
        )
        out = scd2_apply(dim, batch, "uid", "at", "tier")
        u1 = sorted(
            [r for r in out.collect() if r.uid == 1], key=lambda r: r.valid_from
        )
        assert len(u1) == 2
        assert u1[1].tier == "silver"
        assert u1[1].valid_from == ts("2024-02-01 00:00:00")
        assert u1[1].is_current == 1

    def test_untouched_keys_pass_through(self, spark, dim):
        batch = spark.createDataFrame(
            [(1, ts("2024-03-01 00:00:00"), "gold")], "uid int, at timestamp, tier string"
        )
        out = scd2_apply(dim, batch, "uid", "at", "tier")
        u2 = [r for r in out.collect() if r.uid == 2]
        assert len(u2) == 1
        assert (u2[0].tier, u2[0].is_current, u2[0].valid_to) == ("gold", 1, None)

    def test_new_key_inserted(self, spark, dim):
        batch = spark.createDataFrame(
            [(9, ts("2024-05-01 00:00:00"), "bronze")],
            "uid int, at timestamp, tier string",
        )
        out = scd2_apply(dim, batch, "uid", "at", "tier")
        u9 = [r for r in out.collect() if r.uid == 9]
        assert len(u9) == 1 and u9[0].is_current == 1

    def test_strict_rejects_out_of_order(self, spark, dim):
        late = spark.createDataFrame(
            [(1, ts("2024-01-15 00:00:00"), "gold")],  # before silver's start
            "uid int, at timestamp, tier string",
        )
        with pytest.raises(ValueError, match="out-of-order"):
            scd2_apply(dim, late, "uid", "at", "tier", strict=True)

    def test_equals_full_recompute(self, spark):
        full_log = spark.createDataFrame(
            [
                (1, ts("2024-01-01 00:00:00"), "a"),
                (1, ts("2024-02-01 00:00:00"), "b"),
                (1, ts("2024-03-01 00:00:00"), "b"),
                (1, ts("2024-04-01 00:00:00"), "c"),
                (2, ts("2024-02-15 00:00:00"), "x"),
                (3, ts("2024-03-20 00:00:00"), "y"),
            ],
            "uid int, at timestamp, s string",
        )
        cut = ts("2024-03-01 00:00:00")
        dim = scd2_intervals(full_log.where(F.col("at") < F.lit(cut)), "uid", "at", "s")
        batch = full_log.where(F.col("at") >= F.lit(cut))
        inc = scd2_apply(dim, batch, "uid", "at", "s", strict=True)
        full = scd2_intervals(full_log, "uid", "at", "s")
        # columns: uid, s, valid_from, valid_to, is_current
        key = lambda t: (t[0], t[2])
        assert sorted(map(tuple, inc.collect()), key=key) == \
               sorted(map(tuple, full.collect()), key=key)


class TestAsofVsPandas:
    """Independent second oracle: pandas.merge_asof on seeded random data
    (the DuckDB oracle already covers the registered query; this covers
    both directions + tolerance on data with unmatched keys and ties)."""

    @pytest.fixture(scope="class")
    def frames(self):
        import random

        rng = random.Random(7)
        base = 1_700_000_000
        left = [
            (f"k{rng.randrange(6)}", base + rng.randrange(0, 100_000), i)
            for i in range(300)
        ]
        # unique (key, ts) on the right — the operator's determinism contract
        seen = set()
        right = []
        for j in range(200):
            k, t = f"k{rng.randrange(8)}", base + rng.randrange(0, 100_000)
            if (k, t) not in seen:
                seen.add((k, t))
                right.append((k, t, float(j)))
        return left, right

    @pytest.mark.parametrize("direction", ["backward", "forward"])
    @pytest.mark.parametrize("tolerance", [None, 5_000])
    def test_matches_merge_asof(self, spark, frames, direction, tolerance):
        import pandas as pd

        left, right = frames
        ldf = spark.createDataFrame(
            [(k, ts(f"1970-01-01 00:00:00").fromtimestamp(t), i) for k, t, i in left],
            "k string, t timestamp, lid int",
        )
        rdf = spark.createDataFrame(
            [(k, ts(f"1970-01-01 00:00:00").fromtimestamp(t), v) for k, t, v in right],
            "k string, rt timestamp, rv double",
        )
        got = asof_join(
            ldf, rdf, on="k", left_time="t", right_time="rt",
            direction=direction, tolerance_seconds=tolerance,
            matched_time_col="mt",
        ).toPandas()

        lp = pd.DataFrame(left, columns=["k", "t", "lid"])
        rp = pd.DataFrame(right, columns=["k", "mt", "rv"])
        lp["t"] = pd.to_datetime(lp["t"], unit="s")
        rp["mt"] = pd.to_datetime(rp["mt"], unit="s")
        exp = pd.merge_asof(
            lp.sort_values(["t", "lid"]),
            rp.sort_values("mt"),
            left_on="t", right_on="mt", by="k",
            direction=direction,
            tolerance=None if tolerance is None else pd.Timedelta(seconds=tolerance),
        )
        g = got.sort_values("lid").reset_index(drop=True)
        e = exp.sort_values("lid").reset_index(drop=True)
        assert len(g) == len(e) == len(left)
        for col in ("mt", "rv"):
            ge, ee = g[col].tolist(), e[col].tolist()
            for i, (x, y) in enumerate(zip(ge, ee)):
                x_null = x is None or (isinstance(x, float) and x != x) or str(x) == "NaT"
                y_null = y is None or (isinstance(y, float) and y != y) or str(y) == "NaT"
                assert x_null == y_null, (col, i, x, y)
                if not x_null:
                    assert x == y, (col, i, x, y)


class TestScd2CdcDeletes:
    """scd2_cdc_intervals / scd2_apply_cdc (r9): delete tombstones
    close runs, re-inserts re-open, incremental == full on any split."""

    ROWS = [
        (1, 10, "a", "U"), (1, 20, "b", "U"), (1, 30, None, "D"), (1, 40, "b", "U"),
        (2, 10, "x", "U"), (2, 25, None, "D"),
        (3, 15, "z", "U"),
        (4, 5, None, "D"), (4, 8, None, "D"), (4, 12, "q", "U"),
        # key 5: delete-then-reinsert of the SAME state, touched again
        # later — the interior gap [20,30) must survive incremental apply
        # (r9 advice: run-starts-only rebuild resurrected it as [10,50)a).
        (5, 10, "a", "U"), (5, 20, None, "D"), (5, 30, "a", "U"), (5, 50, "c", "U"),
    ]

    def _log(self, spark):
        return spark.createDataFrame(
            self.ROWS, "k long, ts long, st string, op string"
        )

    def test_null_op_raises_named_error(self, spark):
        """Regression: a NULL op fails BOTH the != delete_op and the
        == delete_op predicates (each evaluates to NULL), so the
        observation silently vanished from the rebuilt history; it must
        raise a named error instead."""
        import pytest as _pytest

        from etlutil_spark.operators.scd2 import scd2_cdc_intervals

        log = spark.createDataFrame(
            [(1, 10, "a", "U"), (1, 20, "b", None)],
            "k long, ts long, st string, op string",
        )
        with _pytest.raises(Exception, match="NULL in op column"):
            scd2_cdc_intervals(log, "k", "ts", "st").collect()

    def test_delete_closes_and_reinsert_reopens(self, spark):
        from etlutil_spark.operators.scd2 import scd2_cdc_intervals

        iv = {
            (r["k"], r["st"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in scd2_cdc_intervals(self._log(spark), "k", "ts", "st").collect()
        }
        assert iv == {
            (1, "a", 10, 20, 0),
            (1, "b", 20, 30, 0),   # closed by the delete at 30
            (1, "b", 40, None, 1), # SAME state re-opens as a NEW run
            (2, "x", 10, 25, 0),   # key 2 fully deleted: no current row
            (3, "z", 15, None, 1),
            (4, "q", 12, None, 1), # leading deletes collapse and vanish
            (5, "a", 10, 20, 0),
            (5, "a", 30, 50, 0),   # gap [20,30) stays deleted
            (5, "c", 50, None, 1),
        }

    def test_incremental_equals_full_any_split(self, spark):
        from pyspark.sql import functions as F

        from etlutil_spark.operators.scd2 import (
            scd2_apply_cdc,
            scd2_cdc_intervals,
        )

        log = self._log(spark)
        full = {tuple(r) for r in scd2_cdc_intervals(log, "k", "ts", "st").collect()}
        # cut=30 and cut=45 split key 5 AFTER its delete+reinsert, so the
        # batch touches a key whose history already holds an interior gap
        for cut in (12, 20, 30, 45):
            dim = scd2_cdc_intervals(log.where(F.col("ts") <= cut), "k", "ts", "st")
            out = scd2_apply_cdc(
                dim, log.where(F.col("ts") > cut), "k", "ts", "st", strict=True
            )
            assert {tuple(r) for r in out.collect()} == full, cut

    def test_strict_rejects_out_of_order_behind_tombstone(self, spark):
        import pytest as _pytest
        from pyspark.sql import functions as F

        from etlutil_spark.operators.scd2 import (
            scd2_apply_cdc,
            scd2_cdc_intervals,
        )

        log = self._log(spark)
        dim = scd2_cdc_intervals(log.where(F.col("k") == 2), "k", "ts", "st")
        late = spark.createDataFrame(
            [(2, 20, "y", "U")], "k long, ts long, st string, op string"
        )  # predates key 2's tombstone at 25
        with _pytest.raises(ValueError, match="out-of-order"):
            scd2_apply_cdc(dim, late, "k", "ts", "st", strict=True)


class TestScd2ApplyComposedInvariant:
    """Re-prove the scd2_apply_incremental 'strict probe off' relaxation
    (r12's only semantics-adjacent change; r12 verdict item 7): the
    query's composition — ONE literal splits a (key, ts)-unique compacted
    log into dim (< split) and batch (>= split) — guarantees the
    in-order contract BY CONSTRUCTION, and the probe retained in
    scd2_apply still fails loudly the moment an upstream violation
    sneaks in."""

    def _composed(self, spark, split):
        """Mirror scd2_apply_incremental's exact construction at the
        driver's correctness SF (sf0.01 — the 'larger SF' re-proof)."""
        from etlutil_spark.operators.compact import latest_by_key
        from etlutil_spark.sources.testdata import load_table

        o = load_table(spark, "orders", "/root/testdata/sf0.01")
        log = latest_by_key(
            o.select("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority"),
            ["o_custkey", "o_orderdate"],
            "o_orderkey",
        ).select("o_custkey", "o_orderdate", "o_orderpriority")
        cut = F.lit(split).cast("timestamp")
        dim = scd2_intervals(
            log.where(F.col("o_orderdate") < cut),
            "o_custkey", "o_orderdate", "o_orderpriority",
        )
        batch = log.where(F.col("o_orderdate") >= cut)
        return log, dim, batch

    @pytest.mark.parametrize(
        "split",
        [
            "1993-01-01 00:00:00",  # early: most keys straddle or are post-only
            "1997-01-01 00:00:00",  # the query's own split
            "1998-06-01 00:00:00",  # late: many keys entirely pre-split
        ],
    )
    def test_probe_never_fires_and_equals_full_recompute(self, spark, split):
        # strict=True: if the by-construction argument were wrong at ANY
        # split point, the probe would raise here
        log, dim, batch = self._composed(spark, split)
        inc = scd2_apply(
            dim, batch, "o_custkey", "o_orderdate", "o_orderpriority",
            strict=True,
        )
        full = scd2_intervals(
            log, "o_custkey", "o_orderdate", "o_orderpriority"
        )
        assert sorted(map(tuple, inc.collect())) == sorted(
            map(tuple, full.collect())
        ), split

    def test_poisoned_upstream_fails_loudly(self, spark):
        # violate the invariant upstream: one batch row predates its
        # key's open run (possible only if the split were NOT a single
        # literal over one log). The composed path with the retained
        # probe must fail loudly, never silently rebuild wrong runs.
        _, dim, batch = self._composed(spark, "1997-01-01 00:00:00")
        victim = dim.where(F.col("is_current") == 1).limit(1).collect()[0]
        poison = spark.createDataFrame(
            [(victim["o_custkey"],)], "o_custkey bigint"
        ).select(
            "o_custkey",
            (F.lit(victim["valid_from"]) - F.expr("INTERVAL 1 DAY")).alias(
                "o_orderdate"
            ),
            F.lit("9-POISON").alias("o_orderpriority"),
        )
        with pytest.raises(ValueError, match="out-of-order"):
            scd2_apply(
                dim,
                batch.unionByName(poison),
                "o_custkey", "o_orderdate", "o_orderpriority",
                strict=True,
            )
