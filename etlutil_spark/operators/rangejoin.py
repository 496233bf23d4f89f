"""Interval joins that scale: bucketize, equi-join, refine.

``DateRange.overlaps`` (``/root/reference/etlutil/date.py:664-666``) is the
reference's interval primitive; its data-parallel lift is the
interval-overlap join. A naive BETWEEN/overlap theta-join has no equi keys,
so Spark would pick BroadcastNestedLoopJoin (fine when one side is tiny,
quadratic disaster otherwise). The scalable form maps each interval to the
set of fixed-width calendar buckets it covers, equi-joins on the bucket,
refines with the exact predicate, and keeps each qualifying pair exactly
once by accepting it only in the pair's FIRST COMMON bucket (``bucket ==
greatest(first_bucket_l, first_bucket_r)`` — both sides cover that bucket
whenever the intervals overlap), so no post-join ``distinct`` shuffle is
needed and legitimately duplicate input rows keep their theta-join
multiplicity:

    cost ~ O(|L|*span_L + |R|*span_R) explode + ONE hash-shuffle join on
    bucket, instead of O(|L|*|R|) comparisons.

Pick ``bucket_days`` near the typical interval span: too small explodes
rows, too large groups unrelated intervals into the same bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_seq(start: Column, end: Column, bucket_days: int) -> Column:
    """Sequence of bucket ordinals (days-since-epoch // bucket_days) an
    inclusive [start, end] date interval covers."""
    lo = F.floor(F.unix_date(start) / bucket_days)
    hi = F.floor(F.unix_date(end) / bucket_days)
    return F.sequence(lo, hi)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_days: int = 7,
    how: str = "inner",
) -> DataFrame:
    """Join rows whose inclusive date intervals overlap
    (``l.start <= r.end AND r.start <= l.end`` — the reference's overlap
    algebra), via bucketed equi-join. Column name collisions between the
    two inputs must be resolved by the caller (select/alias first).

    Each qualifying pair is emitted exactly once: the join accepts a pair
    only in its first common bucket (``greatest`` of the two intervals'
    first buckets — covered by both sides whenever they overlap), which
    preserves theta-join multiplicity for duplicate input rows where a
    post-join ``distinct`` would collapse them, and costs one shuffle
    less."""
    if how != "inner":
        raise ValueError("bucketed overlap join supports inner joins")
    lb = left.withColumn(
        "_bucket", F.explode(_bucket_seq(F.col(left_start), F.col(left_end), bucket_days))
    ).withColumn("_lo_l", F.floor(F.unix_date(F.col(left_start)) / bucket_days))
    rb = right.withColumn(
        "_bucket", F.explode(_bucket_seq(F.col(right_start), F.col(right_end), bucket_days))
    ).withColumn("_lo_r", F.floor(F.unix_date(F.col(right_start)) / bucket_days))
    return (
        lb.join(rb, "_bucket")
        .where(
            (F.col(left_start) <= F.col(right_end))
            & (F.col(right_start) <= F.col(left_end))
            & (F.col("_bucket") == F.greatest(F.col("_lo_l"), F.col("_lo_r")))
        )
        .drop("_bucket", "_lo_l", "_lo_r")
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_days: int = 7,
) -> DataFrame:
    """Join point rows to the inclusive [start, end] intervals containing
    them — the degenerate (and most common) interval join. Same bucketize/
    refine shape; points need no explode (a point covers one bucket), and
    no distinct (a point meets an interval in exactly one bucket)."""
    pb = points.withColumn(
        "_bucket", F.floor(F.unix_date(F.to_date(F.col(point_col))) / bucket_days)
    )
    ib = intervals.withColumn(
        "_bucket", F.explode(_bucket_seq(F.col(start_col), F.col(end_col), bucket_days))
    )
    return (
        pb.join(ib, "_bucket")
        .where(F.to_date(F.col(point_col)).between(F.col(start_col), F.col(end_col)))
        .drop("_bucket")
    )


def interval_concurrency(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-key PEAK concurrency of half-open intervals [start, end) by
    sweep line: each interval emits (+1 at start, -1 at end) map-side; a
    running sum ordered by (time, delta) — closes before opens at the
    same instant, the half-open convention — traces the concurrency
    curve, and the per-key max is the peak. Output: key, peak_concurrent,
    peak_at (earliest instant the peak is reached).

    Plan shape: the 2x event fan-out is a map-side explode; the only
    shuffle is the per-key sort window. Keys are assumed bounded-
    cardinality groups (priority, segment, tenant); for a GLOBAL sweep at
    100 TB, range-partition by time and carry partition-boundary offsets
    (the exact_ntile two-pass pattern) instead of one giant key."""
    events = df.select(
        F.col(key_col).alias("k"),
        F.explode(
            F.array(
                F.struct(F.col(start_col).alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col(end_col).alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("e"),
    ).select("k", F.col("e.t").alias("t"), F.col("e.delta").alias("delta"))
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t").asc(), F.col("delta").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = events.withColumn("concurrent", F.sum("delta").over(w))
    return (
        curve.groupBy("k")
        .agg(
            F.max("concurrent").alias("peak_concurrent"),
            F.min_by("t", F.struct(F.negate(F.col("concurrent")), F.col("t"))).alias(
                "peak_at"
            ),
        )
        .select(
            F.col("k").alias(key_col),
            F.col("peak_concurrent").cast("bigint").alias("peak_concurrent"),
            "peak_at",
        )
    )
