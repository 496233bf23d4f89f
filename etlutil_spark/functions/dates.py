"""Column-level date functions — the reference's date layer on columns.

Every helper returns a Column expression (JVM-side, codegen-friendly) or, for
:func:`date_spine`, a DataFrame built from ``F.sequence`` + ``explode`` — the
idiomatic Spark calendar-dimension pattern. No Python UDFs anywhere.

Reference parity targets are cited per function (files under
``/root/reference/etlutil/``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etlutil_spark.functions.daterange import DatePart, DateLike, DateRange, to_date_iso_str

_PART_TO_INTERVAL = {
    "DAY": ("day", 1),
    "WEEK": ("day", 7),
    "MONTH": ("month", 1),
    "QUARTER": ("month", 3),
    "YEAR": ("year", 1),
}


def to_date_col(col: Column | str) -> Column:
    """DateLike column (string/date/timestamp) -> DateType (date.py:30-37)."""
    return F.to_date(col)


def to_iso_str(col: Column | str) -> Column:
    """Date-like column -> 'YYYY-MM-DD' string (date.py:40-42)."""
    return F.date_format(col, "yyyy-MM-dd")


def year_month(col: Column | str) -> Column:
    """Date-like column -> 'YYYY-MM' string (date.py:45-67)."""
    return F.date_format(col, "yyyy-MM")


def date_spine(
    spark: SparkSession,
    date_start: DateLike,
    date_end: DateLike,
    interval: int = 1,
    date_part: DatePart = "DAY",
    *,
    col_name: str = "d",
) -> DataFrame:
    """GENERATE_DATE_ARRAY as a one-column DataFrame (date.py:70-155).

    ``F.sequence`` supports negative steps and month intervals natively, so
    the whole spine is a single constant-folded expression — no driver loop,
    no shuffle. interval 0 or a wrong-direction range yields an empty frame.
    """
    if date_part not in _PART_TO_INTERVAL:
        raise ValueError("date_part must be DAY, WEEK, MONTH, QUARTER, or YEAR")
    start, end = to_date_iso_str(date_start), to_date_iso_str(date_end)
    if interval == 0 or (interval > 0 and start > end) or (interval < 0 and start < end):
        return spark.range(0).select(F.lit(None).cast("date").alias(col_name)).limit(0)
    unit, mult = _PART_TO_INTERVAL[date_part]
    step = interval * mult
    seq = F.sequence(
        F.lit(start).cast("date"),
        F.lit(end).cast("date"),
        F.expr(f"interval {step} {unit}"),
    )
    return spark.range(1).select(F.explode(seq).alias(col_name))


def epoch_to_timestamp(col: Column | str) -> Column:
    """Unix seconds (int/str) -> TimestampType (data_structures.py:1136-1173)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_seconds(c.cast("long"))


def epoch_to_iso(col: Column | str, fmt: str = "yyyy-MM-dd'T'HH:mm:ss") -> Column:
    """Unix seconds -> formatted string; session TZ pinned to UTC."""
    return F.date_format(epoch_to_timestamp(col), fmt)


def in_range(col: Column | str, dr: DateRange) -> Column:
    """Inclusive date-range predicate: date(col) BETWEEN start AND end.

    For date/string-date columns. For timestamps prefer :func:`ts_in_range`,
    which keeps the raw column comparable so parquet min/max pruning applies.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(c).between(F.lit(dr.date_start), F.lit(dr.date_end))


def ts_in_range(col: Column | str, dr: DateRange) -> Column:
    """Half-open timestamp predicate ts >= start AND ts < end+1d (date.py:429).

    Written against the raw timestamp column (no function wrapping) so the
    comparison pushes down to parquet row-group statistics.
    """
    c = F.col(col) if isinstance(col, str) else col
    start, end_next = dr.to_timestamps().values()
    return (c >= F.lit(start.rstrip("Z")).cast("timestamp")) & (
        c < F.lit(end_next.rstrip("Z")).cast("timestamp")
    )


def week_start(col: Column | str) -> Column:
    """Monday of the week of col (reference weeks are Mon-Sun, date.py:213-215)."""
    return F.date_trunc("week", col).cast("date")


def month_start(col: Column | str) -> Column:
    return F.trunc(col, "month")


def quarter_start(col: Column | str) -> Column:
    return F.trunc(col, "quarter")


def month_bucket_8_8_8_rest(col: Column | str) -> Column:
    """Day-of-month bucket 1..4 for chunks 1-8 / 9-16 / 17-24 / 25-end
    (DateRange.split_month_8_8_8_rest on data, date.py:714-753)."""
    dom = F.dayofmonth(col)
    return (
        F.when(dom <= 8, F.lit(1))
        .when(dom <= 16, F.lit(2))
        .when(dom <= 24, F.lit(3))
        .otherwise(F.lit(4))
    )


def range_bucket_join(
    df: DataFrame,
    date_col: str,
    ranges: list[DateRange],
    *,
    start_name: str = "bucket_start",
    end_name: str = "bucket_end",
) -> DataFrame:
    """Tag rows with the DateRange bucket they fall into (inclusive bounds).

    The bucket list is driver-side (DateRanges.* output) and tiny. When the
    ranges are disjoint (the normal DateRanges output) each row lands in at
    most one bucket, so the tag compiles to a flat when-chain — a pure
    map inside whole-stage codegen, no join operator at all. Overlapping
    ranges need the row duplicated per bucket, which falls back to a
    broadcast range join. Rows outside every bucket are dropped.
    """
    d = F.to_date(F.col(date_col))

    ordered = sorted(ranges, key=lambda r: r.date_start)
    disjoint = all(
        a.date_end < b.date_start for a, b in zip(ordered, ordered[1:])
    )
    if disjoint:
        start_expr: Column | None = None
        end_expr: Column | None = None
        for r in ranges:
            cond = d.between(F.lit(r.date_start).cast("date"), F.lit(r.date_end).cast("date"))
            s = F.lit(r.date_start).cast("date")
            e = F.lit(r.date_end).cast("date")
            start_expr = F.when(cond, s) if start_expr is None else start_expr.when(cond, s)
            end_expr = F.when(cond, e) if end_expr is None else end_expr.when(cond, e)
        return (
            df.withColumn(start_name, start_expr)
            .withColumn(end_name, end_expr)
            .where(F.col(start_name).isNotNull())
        )

    spark = df.sparkSession
    buckets = spark.createDataFrame(
        [(r.date_start, r.date_end) for r in ranges],
        schema=f"{start_name} string, {end_name} string",
    ).select(
        F.col(start_name).cast("date").alias(start_name),
        F.col(end_name).cast("date").alias(end_name),
    )
    return df.join(
        F.broadcast(buckets),
        (d >= F.col(start_name)) & (d <= F.col(end_name)),
        "inner",
    )
