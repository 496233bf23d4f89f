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
half the events) are the risk — mitigate by salting the key with a
coarse time bucket (day) when a single key's events exceed a partition,
then stitching adjacent sessions across bucket edges.
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
    gap_s = F.col(ts_col).cast("long") - prev_ts.cast("long")
    is_new = F.when(
        prev_ts.isNull() | (gap_s > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(key_col).orderBy(F.col(ts_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(is_new).over(run))


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    gap_minutes: int = 30,
) -> DataFrame:
    """Collapse events into one row per (key, session): bounds, size,
    duration seconds. Two stages, one shuffle total (the groupBy reuses
    the window's hash partitioning on the key)."""
    s = with_session_id(df, key_col, ts_col, gap_minutes=gap_minutes)
    return s.groupBy(key_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        (F.max(F.col(ts_col).cast("long")) - F.min(F.col(ts_col).cast("long"))).alias(
            "duration_s"
        ),
    )
