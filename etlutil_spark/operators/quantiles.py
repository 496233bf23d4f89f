"""Distributed exact equal-count bucketing (ntile without the funnel).

``ntile(n) OVER (ORDER BY ...)`` — the reference-free SQL idiom for exact
quantile buckets — plans as a window over ONE partition: every row
funnels through a single task, which is the canonical scale-killer shape.
This module computes the IDENTICAL bucket assignment with textbook
parallel ranking:

  1. ``repartitionByRange`` on the total order — sorting spreads over all
     partitions;
  2. per-range-partition ``row_number`` (window partitioned by
     ``spark_partition_id``: bounded partitions, no global funnel);
  3. per-partition counts (one tiny row per partition) collected, turned
     into rank offsets, broadcast back;
  4. global rank = offset + local rank, then ntile's closed-form bucket
     rule: with N rows and n buckets, the first ``N mod n`` buckets get
     ``N div n + 1`` rows, the rest ``N div n``.

Bit-identical to ntile whenever ``order_cols`` is a unique total order
(add a key column as tiebreak — same requirement ntile itself has for
deterministic output). The lazy ``localCheckpoint`` pins the range
partitioner's sampled boundaries so the count job and the rank job see
identical partition ids.

Property-tested against F.ntile itself (tests/test_properties.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from etlutil_spark.operators.util import pin
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_ntile(
    df: DataFrame,
    n_buckets: int,
    order_cols: list[str],
    *,
    bucket_col: str = "bucket",
    n_partitions: int | None = None,
) -> DataFrame:
    """Add ``bucket_col`` (int, 1-based) = ntile(n_buckets) over the total
    order given by ``order_cols``, computed without a single-partition
    sort. ``order_cols`` must be a unique total order for deterministic
    (and ntile-identical) assignment.

    Reliability note: correctness depends on ``localCheckpoint(eager=
    False)`` pinning the range partitioner's *sampled* boundaries so the
    count job and the rank job see identical partitions. Local
    checkpoints are not fault-tolerant — losing an executor between the
    two jobs ABORTS the query (checkpointed blocks are unrecoverable;
    Spark raises rather than silently recomputing with resampled, and
    therefore different, boundaries). That is the correct failure mode
    but a reliability gap for very long production runs: there, swap in
    ``df.persist(StorageLevel.DISK_ONLY)`` + ``sc.setCheckpointDir`` /
    ``checkpoint()`` to reliable storage at the cost of a write. The
    per-partition-count ``collect()`` is one extra driver round-trip of
    O(n_partitions) scalars per call — the trade that removes the
    Exchange SinglePartition funnel a global ``F.ntile`` would need."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    _reject_reserved(df, ("_pid", "_lr", "_off"))
    spark = df.sparkSession
    n_parts = n_partitions or max(spark.sparkContext.defaultParallelism, n_buckets)
    # checkpoint the INPUT lazily too: repartitionByRange's boundary
    # sampling is a FULL extra computation of the input plan (the range
    # sketch visits every partition), so an expensive input (an
    # aggregate, or a previous exact_ntile axis in a chained RFM score)
    # otherwise runs twice per call — once for the sample job, once when
    # the ranged checkpoint materializes. Pinning the input first means
    # one computation; the sample and the shuffle then read cached
    # blocks. The extra block storage is bounded by the input (typically
    # a per-key aggregate), mirroring the ranged checkpoint that already
    # exists below.
    df = df.transform(pin)
    ranged = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .transform(pin)
    )
    part_counts = sorted(
        (r["_pid"], r["cnt"])
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in part_counts:
        offsets.append((pid, acc))
        acc += cnt
    if not offsets:  # empty input: preserve schema + empty result
        return ranged.drop("_pid").withColumn(bucket_col, F.lit(None).cast("int"))
    total = acc
    base, rem = divmod(total, n_buckets)
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")
    lw = Window.partitionBy("_pid").orderBy(*order_cols)
    ranked = ranged.withColumn("_lr", F.row_number().over(lw)).join(
        F.broadcast(off_df), "_pid"
    )
    rank = F.col("_off") + F.col("_lr")
    return (
        ranked.withColumn(bucket_col, _ntile_bucket(rank, base, rem))
        .drop("_pid", "_lr", "_off")
    )


def _ntile_bucket(rank: Column, base: int, rem: int) -> Column:
    """Closed-form ntile bucket for 1-based ``rank`` given bucket sizes
    (``rem`` buckets of ``base+1`` rows, then buckets of ``base`` rows).
    `x - x % d` makes each numerator an exact multiple of its divisor;
    the quotient still evaluates as double division, which is exact for
    exact-multiple operands up to 2^53 rows — beyond that (never at any
    realistic partition count) bucket edges could round."""
    big_span = rem * (base + 1)  # rows covered by the (base+1)-sized buckets
    in_big = (rank - 1 - ((rank - 1) % (base + 1))) / (base + 1)
    r2 = rank - big_span - 1
    in_small = rem + (r2 - (r2 % max(base, 1))) / max(base, 1)
    return (F.when(rank <= big_span, in_big).otherwise(in_small)).cast("int") + 1


def _reject_reserved(df: DataFrame, names: tuple[str, ...]) -> None:
    """These operators stage scratch columns (partition id, local
    rank/sum/max, broadcast offsets) with withColumn and drop them at
    the end — a caller column with one of those names would be silently
    overwritten and then dropped. Refuse loudly instead."""
    clash = [c for c in df.columns if c in names]
    if clash:
        raise ValueError(
            f"input columns {clash} collide with reserved scratch names {names}"
        )



def exact_cumsum(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    *,
    cumsum_col: str = "cumsum",
    n_partitions: int | None = None,
) -> DataFrame:
    """Add ``cumsum_col`` = the globally-ordered running SUM of
    ``value_col`` over the total order given by ``order_cols`` — the
    ``SUM(x) OVER (ORDER BY ...)`` shape (Pareto/ABC curves, cumulative
    shares) — WITHOUT the single-partition window that form plans as.
    Same parallel-ranking recipe as exact_ntile: range-repartition on
    the order, per-partition running sum, per-partition TOTALS (one tiny
    row each) collected and turned into exact prefix offsets broadcast
    back. Exact whenever ``value_col`` is integral or DECIMAL (the
    offsets are exact sums of exact sums; Python int/Decimal arithmetic
    on the driver is arbitrary-precision). ``order_cols`` must be a
    unique total order for deterministic output — the same requirement
    the window form has."""
    _reject_reserved(df, ("_pid", "_local", "_off", "_has"))
    spark = df.sparkSession
    n_parts = n_partitions or max(spark.sparkContext.defaultParallelism, 1)
    # input checkpoint: same rationale as exact_ntile — the range
    # sampling pass is a full extra computation of the input plan
    df = df.transform(pin)
    ranged = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .transform(pin)
    )
    sums = ranged.groupBy("_pid").agg(F.sum(value_col).alias("_s"))
    sum_type = sums.schema["_s"].dataType
    part_sums = sorted((r["_pid"], r["_s"]) for r in sums.collect())
    if not part_sums:  # empty input: preserve schema + empty result
        return ranged.drop("_pid").withColumn(
            cumsum_col, F.lit(None).cast(sum_type)
        )
    from decimal import Decimal

    from pyspark.sql import types as T

    # offsets are exact driver-side arithmetic; coerce the running zero to
    # the sum's Python type so createDataFrame's type check accepts it
    # (float input gets float offsets: accepted, but only approximately
    # order-independent — the docstring's exactness claim is int/DECIMAL).
    # _has tracks whether any EARLIER partition contributed a non-null
    # value: a row whose local prefix is all-NULL must surface the prior
    # partitions' sum (window-form semantics), or NULL when nothing at
    # all precedes it — an _off of 0 alone can't distinguish the two.
    if isinstance(sum_type, T.DecimalType):
        zero = Decimal(0)
    elif isinstance(sum_type, (T.DoubleType, T.FloatType)):
        zero = 0.0
    else:
        zero = 0
    offsets, running, has_prior = [], zero, False
    for pid, s in part_sums:
        offsets.append((pid, running, has_prior))
        if s is not None:
            running = running + s
            has_prior = True

    off_schema = T.StructType(
        [
            T.StructField("_pid", T.IntegerType(), False),
            T.StructField("_off", sum_type, False),
            T.StructField("_has", T.BooleanType(), False),
        ]
    )
    off_df = spark.createDataFrame(offsets, off_schema)
    lw = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.withColumn("_local", F.sum(value_col).over(lw))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(
            cumsum_col,
            F.when(F.col("_local").isNotNull(), F.col("_local") + F.col("_off"))
            .when(F.col("_has"), F.col("_off"))
            .otherwise(F.lit(None))
            .cast(sum_type),
        )
        .drop("_pid", "_local", "_off", "_has")
    )


def exact_running_max(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    *,
    out_col: str = "running_max",
    n_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = the globally-ordered running MAX of
    ``value_col`` over the total order given by ``order_cols`` — the
    ``MAX(x) OVER (ORDER BY ...)`` shape (high-water marks, event-time
    watermark simulation) — without the single-partition window. Same
    parallel-prefix recipe as exact_cumsum, with max in place of sum:
    per-partition running max locally, per-partition MAXES collected,
    each partition's prefix (the max over all EARLIER partitions)
    broadcast back, global = greatest(local, prefix). The first
    partition's prefix is NULL; ``greatest`` ignores it."""
    _reject_reserved(df, ("_pid", "_local", "_pre"))
    spark = df.sparkSession
    n_parts = n_partitions or max(spark.sparkContext.defaultParallelism, 1)
    ranged = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .transform(pin)
    )
    maxes = ranged.groupBy("_pid").agg(F.max(value_col).alias("_m"))
    max_type = maxes.schema["_m"].dataType
    part_maxes = sorted((r["_pid"], r["_m"]) for r in maxes.collect())
    if not part_maxes:
        return ranged.drop("_pid").withColumn(out_col, F.lit(None).cast(max_type))
    from pyspark.sql import types as T

    import math

    def _spark_gt(a, b) -> bool:
        """Spark's total order on doubles puts NaN ABOVE everything;
        Python's `nan > x` is False — mirror Spark here or a NaN
        partition max would be dropped from the cross-partition prefix."""
        if isinstance(b, float) and math.isnan(b):
            return False
        if isinstance(a, float) and math.isnan(a):
            return True
        return a > b

    offsets, prefix = [], None
    for pid, m in part_maxes:
        offsets.append((pid, prefix))
        if m is not None and (prefix is None or _spark_gt(m, prefix)):
            prefix = m
    off_df = spark.createDataFrame(
        offsets,
        T.StructType(
            [
                T.StructField("_pid", T.IntegerType(), False),
                T.StructField("_pre", max_type, True),
            ]
        ),
    )
    lw = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.withColumn("_local", F.max(value_col).over(lw))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, F.greatest("_local", "_pre"))
        .drop("_pid", "_local", "_pre")
    )


def exact_grouped_ntile(
    df: DataFrame,
    n_buckets: int,
    group_cols: list[str],
    order_cols: list[str],
    *,
    bucket_col: str = "bucket",
    n_partitions: int | None = None,
    max_offset_rows: int = 1 << 18,
) -> DataFrame:
    """Add ``bucket_col`` = ``ntile(n_buckets) OVER (PARTITION BY
    group_cols ORDER BY order_cols)`` — per-STRATUM exact quantile
    buckets (per-source score quartiles, per-language length deciles)
    — without the per-group window whose partitions are as large as the
    biggest stratum (a handful of corpus-sized window partitions is the
    same funnel shape as one, just sliced; at 100 TB a single source can
    be tens of TB).

    Recipe generalizes exact_ntile: range-repartition on the COMPOSITE
    key (group, order) so each group occupies a contiguous partition
    span while staying spread over many partitions; per-partition local
    ranks windowed by (partition, group) — bounded partitions, no
    global funnel; per-(partition, group) counts collected (range
    contiguity bounds that at n_partitions + n_groups tiny rows),
    turned into per-group rank offsets and group totals, broadcast
    back; ntile's closed-form bucket rule applied with the row's own
    group total. Bit-identical to the window form whenever
    ``group_cols + order_cols`` is a unique total order (the same
    determinism requirement ntile itself has). Intended for BOUNDED
    group counts (sources, languages, tenants — the strata of a
    curation corpus); the driver round-trip is O(n_partitions +
    n_groups) scalars. NULL group keys form one group, as in SQL
    PARTITION BY."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    from etlutil_spark.operators.quantiles_grouped import _grouped_rank_frame

    joined, empty = _grouped_rank_frame(
        df, group_cols, order_cols, n_partitions, max_offset_rows
    )
    if empty:
        return joined.withColumn(bucket_col, F.lit(None).cast("int"))
    rank = F.col("_off") + F.col("_lr")
    n_col = F.col("_n")
    base = F.expr(f"_n div {n_buckets}")
    rem = n_col % n_buckets
    big_span = rem * (base + 1)
    in_big = (rank - 1 - ((rank - 1) % (base + 1))) / (base + 1)
    base_safe = F.greatest(base, F.lit(1))
    r2 = rank - big_span - 1
    in_small = rem + (r2 - (r2 % base_safe)) / base_safe
    bucket = (
        F.when(rank <= big_span, in_big).otherwise(in_small).cast("int") + 1
    )
    return joined.withColumn(bucket_col, bucket).drop("_lr", "_off", "_n")
