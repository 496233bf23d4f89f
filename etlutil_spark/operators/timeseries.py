"""Time-series regularization: per-key spines, gap filling, forward fill.

The reference's `DateRanges` family generates calendar spines driver-side
to parameterize backfills (reference ``date.py:807-956``); these operators
are the data-parallel completion of that idea — make an *irregular* keyed
series regular so window math (moving averages, deltas, joins on time)
is well-defined.

Plan shapes (the scale story):

  - ``time_spine``: per-key ``sequence(min, max, step)`` + explode — the
    spine is GENERATED inside each key's aggregate row, so there is no
    cross join of keys x calendar anywhere, and spine size is exactly the
    output size.
  - ``gap_fill``: spine left-joins the observed rows on (key, ts); both
    sides arrive partitioned by key from the same upstream shuffle.
  - ``forward_fill``: one window per key ordered by time, carrying the
    last non-null observation via ``last(ignorenulls)`` — same
    single-shuffle cost as sessionization. NULL-vs-missing caveat: ffill
    treats an observed NULL as "nothing to carry" (it fills THROUGH it);
    an observed NULL that must stay NULL needs the struct-carrier trick
    (see operators/asof.py) — deliberate, documented difference.

Grid contract: observation timestamps must already lie ON the step grid
(e.g. daily rows for a 1-day step) or the join silently misses them —
truncate/bucket first (``F.date_trunc``). This mirrors SQL gap-fill
idioms and keeps the operator a pure equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from etlutil_spark.operators.util import pin
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def time_spine(
    df: DataFrame,
    key_cols: str | list[str],
    ts_col: str,
    *,
    step: str = "interval 1 day",
) -> DataFrame:
    """One row per (key, grid point) from each key's min to max timestamp.

    ``step`` is any Spark interval literal (``"interval 1 day"``,
    ``"interval 15 minutes"``). Month-stepped spines are computed as
    start + k*step by Spark's sequence (no end-of-month compounding).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    bounds = df.groupBy(*keys).agg(
        F.min(ts_col).alias("_mn"), F.max(ts_col).alias("_mx")
    )
    return bounds.select(
        *keys,
        F.explode(
            F.sequence(F.col("_mn"), F.col("_mx"), F.expr(step))
        ).alias(ts_col),
    )


def gap_fill(
    df: DataFrame,
    key_cols: str | list[str],
    ts_col: str,
    *,
    step: str = "interval 1 day",
    zero_fill: dict[str, float] | None = None,
    ffill_cols: list[str] | None = None,
    pin_input: bool = True,
) -> DataFrame:
    """Regularize a keyed series: insert missing grid rows, then fill.

    ``zero_fill`` maps column -> constant for gap rows (counts -> 0);
    ``ffill_cols`` carry the last observation forward instead. Columns in
    neither stay NULL on gap rows. Observed rows pass through unchanged
    (zero_fill only replaces NULLs, and on-grid observed values are
    non-null by construction for counts/sums).

    ``pin_input`` (default True) materializes the input once for its two
    consumers (the spine's per-key min/max aggregate and the join side) —
    right for the typical case where the input's lineage is an
    aggregation over a raw fact table. A caller whose series is LARGE or
    already materialized (a parquet read, a cached frame) should pass
    ``pin_input=False``: pinning would copy the whole frame to pin
    storage and sever pushdown into the source for no saved work.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if pin_input:
        df = df.transform(pin)
    spine = time_spine(df, keys, ts_col, step=step)
    out = spine.join(df, [*keys, ts_col], "left")
    if zero_fill:
        out = out.withColumns(
            {c: F.coalesce(F.col(c), F.lit(v)) for c, v in zero_fill.items()}
        )
    if ffill_cols:
        out = forward_fill(out, keys, ts_col, ffill_cols)
    return out


def forward_fill(
    df: DataFrame,
    key_cols: str | list[str],
    ts_col: str,
    value_cols: str | list[str],
) -> DataFrame:
    """Carry each key's last non-null value forward in time order.

    All filled columns share ONE window over the same (key, time) sort —
    a single shuffle regardless of how many columns are filled.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    vals = [value_cols] if isinstance(value_cols, str) else list(value_cols)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumns(
        {c: F.last(F.col(c), ignorenulls=True).over(w) for c in vals}
    )


def trailing_window(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    days: int = 7,
) -> DataFrame:
    """Append trailing time-based aggregates to every row: the sum and
    count of ``value_col`` over the PRECEDING ``days`` (inclusive of the
    current instant) within the same key.

    This is the RANGE-frame sibling of the ROWS-frame moving average
    (customer_order_moving_avg): ROWS frames count records, RANGE frames
    count TIME — the right semantics for activity features ("7-day spend
    before this event") where per-key event density varies. The frame is
    anchored on exact integer epoch MICROseconds, so two engines agree on
    membership bit-for-bit even for sub-second gaps; rows with equal
    (key, ts) are frame peers, making the result tiebreak-independent.

    One shuffle (the per-key window); the sum runs as DECIMAL inside the
    frame, so the appended columns are partition-order-independent.
    Columns added: ``trail_sum`` (double, rounded 6), ``trail_n``."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-days * 86_400_000_000, 0)
    )
    return df.withColumns(
        {
            "trail_sum": F.round(
                # 38,6 not 18,6: an 18-digit cast silently NULLs values
                # >= 1e12 (sum then skips them) under non-ANSI mode
                F.sum(F.col(value_col).cast("decimal(38,6)")).over(w).cast("double"),
                6,
            ),
            "trail_n": F.count(value_col).over(w),
        }
    )


def decay_weight(
    ts_col: str,
    ref_date: str,
    *,
    half_life_days: float = 90.0,
    clamp_future: bool = False,
):
    """Exponential recency weight ``0.5 ** (age_days / half_life)`` — the
    standard time-decay factor for recency-weighted training mixtures and
    rolling relevance scores.

    Age is an exact integer day difference, so the only cross-engine FP
    hazard is ``pow`` itself (last-ulp, like ``ln``); the weight is
    rounded to 9 decimals to absorb it, which both pins the value across
    engines and keeps downstream DECIMAL-quantized sums
    partition-order-independent. Pure column expression — composes
    map-side with any aggregate.

    Rows with ts AFTER ref_date get weights > 1 (0.5^negative) — by
    design the caller either filters to ts <= ref_date (the catalog
    query does) or passes ``clamp_future=True``, which clamps the age
    at 0 days so every future-dated row gets weight exactly 1.0. Use
    the clamp whenever the input can contain late-arriving or
    mis-stamped future rows: without it a single far-future straggler
    gets weight ``2^(days/half_life)`` and can dominate a
    recency-weighted mixture.

    NULL timestamps propagate to a NULL weight on BOTH paths. The clamp
    is a conditional (``when(age < 0, 0)``), not ``greatest(age, 0)``:
    greatest() skips NULL operands, so a NULL age — exactly the defect
    the clamp targets in dirty data — would silently become age 0 and
    give undated rows full weight 1.0 in a recency mixture.

    >>> decay_weight("ts", "2024-01-01", clamp_future=True)
    # row at 2024-06-01 -> weight 1.0 (not 2^(152/90) ~ 3.2)
    # row with NULL ts -> NULL weight (same as clamp_future=False)
    """
    age = F.datediff(F.to_date(F.lit(ref_date)), F.to_date(ts_col))
    if clamp_future:
        # NULL condition falls through to otherwise(age) = NULL
        age = F.when(age < F.lit(0), F.lit(0)).otherwise(age)
    return F.round(F.pow(F.lit(0.5), age / F.lit(float(half_life_days))), 9)


def trailing_baseline_anomaly(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str],
    *,
    bucket_seconds: int = 3600,
    trailing_buckets: int = 24,
    factor: float = 2.0,
    min_baseline_buckets: int = 6,
) -> DataFrame:
    """Rate-spike detection on a bucketed event series: per group and
    time bucket, compare the event count against the average of the
    trailing ``trailing_buckets`` buckets (current bucket excluded) and
    flag buckets above ``factor`` times that baseline.

    The RANGE frame runs over epoch seconds of the bucket start, so
    EMPTY buckets correctly age out of the baseline (a ROWS frame would
    silently stretch the lookback across gaps — after a quiet night,
    yesterday's counts would still count as "recent"). Missing buckets
    contribute nothing rather than zero: the baseline is the average
    over ACTIVE buckets, the conventional traffic-anomaly choice (a
    zero-filled baseline needs gap_fill + time_spine upstream, which
    composes with this operator unchanged).

    Determinism: counts are exact ints; the baseline is SUM(bigint) /
    COUNT — one IEEE division on exact operands — so the flagged set is
    engine- and layout-stable. Buckets with fewer than
    ``min_baseline_buckets`` active trailing buckets get a NULL baseline
    and never flag (cold-start suppression).

    Cost: one keyed count aggregate collapses the raw events to
    |groups| x |buckets| rows; the window then runs over that collapsed
    series — at 100 TB the window input is metadata-sized, so the
    per-group sort inside it is trivial."""
    if trailing_buckets < 1 or bucket_seconds < 1:
        raise ValueError("trailing_buckets and bucket_seconds must be >= 1")
    # timestamp_seconds(floor-div), NOT from_unixtime: the epoch ->
    # session-tz string -> timestamp round trip merges DST-ambiguous
    # hours under non-UTC sessions, and a bare bigint cast truncates
    # toward zero (one bucket late) for pre-1970 timestamps
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("bigint")
        * bucket_seconds
    )
    counts = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(*group_cols, bucket.alias("bucket"))
        .agg(F.count("*").alias("n_events"))
    )
    return trailing_baseline_over_counts(
        counts,
        group_cols,
        bucket_seconds=bucket_seconds,
        trailing_buckets=trailing_buckets,
        factor=factor,
        min_baseline_buckets=min_baseline_buckets,
    )


def trailing_baseline_over_counts(
    counts: DataFrame,
    group_cols: list[str],
    *,
    bucket_col: str = "bucket",
    n_col: str = "n_events",
    bucket_seconds: int = 3600,
    trailing_buckets: int = 24,
    factor: float = 2.0,
    min_baseline_buckets: int = 6,
) -> DataFrame:
    """The window half of trailing_baseline_anomaly, over an ALREADY
    bucketed (group, bucket, count) series — the production streaming
    mode: a watermarked tumbling-window stream (streaming/events.py
    windowed_counts) maintains the hourly rollup incrementally, and this
    runs over the accumulated store on whatever cadence alerting needs.
    Identical math to the raw-events wrapper, so stream-maintained and
    batch-recomputed series flag the same buckets (tested)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.unix_timestamp(bucket_col))
        .rangeBetween(-trailing_buckets * bucket_seconds, -bucket_seconds)
    )
    base_sum = F.sum(n_col).over(w)
    base_n = F.count(n_col).over(w)
    baseline = F.when(
        base_n >= min_baseline_buckets, base_sum.cast("double") / base_n.cast("double")
    )
    return counts.select(
        *group_cols,
        F.col(bucket_col).alias("bucket"),
        F.col(n_col).alias("n_events"),
        F.round(baseline, 6).alias("baseline"),
        F.when(
            baseline.isNotNull(),
            (F.col(n_col).cast("double") > F.lit(float(factor)) * baseline).cast("int"),
        )
        .otherwise(F.lit(0))
        .alias("is_spike"),
    )
