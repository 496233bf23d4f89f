"""Gap-based sessionization — the stateful-window workload, batch form.

The reference's closest primitive is chunked DateRange bucketing
(``/root/reference/etlutil/date.py:560-600``); sessionization is its
data-driven generalization: a new session starts when the gap to the
previous event of the same key exceeds ``gap``. Implemented with window
functions (lag -> boundary flag -> running sum), which Spark executes as
ONE shuffle on the session key + a per-partition sort — the same cost
profile as any per-key ordered scan, with no Python in the loop.

The streaming twin is ``F.session_window`` with a watermark
(streaming/events.py hosts the windowed variants); keeping the batch
definition in window-function form means the batch result is exactly
reproducible by a SQL oracle (lag/sum are ANSI), which session_window's
merge semantics are not guaranteed to be across engines.

At 100 TB: the only shuffle is partitionBy(key); skewed keys (one user =
half the events) are the risk. ``session_stats(salted=True)`` implements
the mitigation: partition by (key, day) so no single task ever holds more
than one key-day of events, then stitch sessions that straddle midnight
with a second, tiny gap-merge pass over the per-day SESSION rows (orders
of magnitude fewer rows than events — the skew is gone before the
per-key window runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_session_id(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    gap_minutes: int = 30,
    session_col: str = "session_seq",
) -> DataFrame:
    """Add a per-key session sequence number (1-based, ordered by time).

    A row opens a new session when it is the key's first event or follows
    the previous one by more than ``gap_minutes``."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col))
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap_s = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
    is_new = F.when(
        prev_ts.isNull() | (gap_s > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(key_col).orderBy(F.col(ts_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(is_new).over(run))


def debounce(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    *,
    gap_seconds: int,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Burst collapse: keep only the FIRST row of each burst per key — a
    burst being a run of rows each within ``gap_seconds`` of the
    previous one (the batch twin of a streaming debounce; collapses
    double-clicks, retry storms, sensor chatter before counting).

    Ordering inside a key is (ts, *order_cols) — pass a unique column
    (event id) so ties are deterministic across engines and reruns.
    Rows with a NULL ``ts_col`` sort engine-specifically (Spark NULLS
    FIRST vs SQL NULLS LAST) — filter them out upstream if the source
    can produce them. One window shuffle on the keys; the filter is
    map-side after it."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap_s = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
    return df.withColumn(
        "_first", prev_ts.isNull() | (gap_s > gap_seconds)
    ).where(F.col("_first")).drop("_first")


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    gap_minutes: int = 30,
    salted: bool = False,
) -> DataFrame:
    """Collapse events into one row per (key, session): bounds, size,
    duration seconds. Two stages, one shuffle total (the groupBy reuses
    the window's hash partitioning on the key).

    ``salted=True`` produces the IDENTICAL result via the skew-safe plan
    (:func:`session_stats_salted`): use it when one key can hold a
    partition-breaking share of events."""
    if salted:
        return session_stats_salted(df, key_col, ts_col, gap_minutes=gap_minutes)
    s = with_session_id(df, key_col, ts_col, gap_minutes=gap_minutes)
    return s.groupBy(key_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        (F.max(F.unix_timestamp(F.col(ts_col))) - F.min(F.unix_timestamp(F.col(ts_col)))).alias(
            "duration_s"
        ),
    )


def session_stats_salted(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    gap_minutes: int = 30,
) -> DataFrame:
    """Skew-safe sessionization: day-bucket salt + boundary stitching.

    Phase 1 partitions by (key, DAY) — no task ever sorts more than one
    key-day of events, so a single hot key (one user = half the corpus)
    can no longer break the per-key window. Sessions that straddle
    midnight come out split; phase 2 re-runs the SAME gap rule over the
    per-day session rows (start vs previous end) and merges the splits.
    Phase 2's window partitions by key alone, but its input is session
    rows — bounded by ~(86400/gap) rows per key-day regardless of event
    volume, so the skew cannot reappear there.

    Exactly equivalent to the unsalted form: a day boundary only splits a
    session whose adjacent events are <= gap apart, and exactly those
    splits are re-merged by the identical gap predicate in phase 2.
    Output schema and numbering match :func:`session_stats`. The
    equivalence assumes non-NULL timestamps (a NULL ts lands in its own
    NULL day bucket here but sorts first inside the single key partition
    unsalted — filter NULL ts upstream, as with :func:`debounce`)."""
    day = F.to_date(F.col(ts_col)).alias("_day")
    w = Window.partitionBy(key_col, "_day").orderBy(F.col(ts_col))
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap_s = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
    is_new = F.when(
        prev_ts.isNull() | (gap_s > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    run = (
        Window.partitionBy(key_col, "_day")
        .orderBy(F.col(ts_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    day_sessions = (
        df.select(key_col, F.col(ts_col), day)
        .withColumn("_seq", F.sum(is_new).over(run))
        .groupBy(key_col, "_day", "_seq")
        .agg(
            F.min(ts_col).alias("_start"),
            F.max(ts_col).alias("_end"),
            F.count("*").alias("_n"),
        )
    )
    # phase 2: gap-merge over session rows (tiny), same rule on start vs
    # previous session's end
    w2 = Window.partitionBy(key_col).orderBy(F.col("_start"))
    prev_end = F.lag(F.col("_end")).over(w2)
    stitch_new = F.when(
        prev_end.isNull()
        | (F.unix_timestamp(F.col("_start")) - F.unix_timestamp(prev_end) > gap_minutes * 60),
        F.lit(1),
    ).otherwise(F.lit(0))
    run2 = (
        Window.partitionBy(key_col)
        .orderBy(F.col("_start"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        day_sessions.withColumn("session_seq", F.sum(stitch_new).over(run2))
        .groupBy(key_col, "session_seq")
        .agg(
            F.min("_start").alias("session_start"),
            F.max("_end").alias("session_end"),
            F.sum("_n").alias("n_events"),
            (
                F.max(F.unix_timestamp(F.col("_end"))) - F.min(F.unix_timestamp(F.col("_start")))
            ).alias("duration_s"),
        )
    )
