"""Per-group exact ranking without per-group windows.

``row_number()/ntile(n) OVER (PARTITION BY group ORDER BY ...)`` plans as
one window partition PER GROUP — for the few-large strata of a curation
corpus (sources, languages, tenants) each partition is as large as its
stratum, which at 100 TB is the same single-funnel shape as a global
window, just sliced a handful of ways. This module generalizes the
``exact_ntile`` recipe (quantiles.py) to grouped form:

  1. ``repartitionByRange`` on the COMPOSITE key (group, order) — each
     group occupies a contiguous partition span while staying spread
     over many partitions;
  2. per-partition local ranks windowed by (partition id, group) —
     bounded partitions, no funnel;
  3. per-(partition, group) counts collected — range contiguity bounds
     this at O(n_partitions + n_groups) tiny rows — and turned into
     per-group rank offsets + group totals, broadcast back;
  4. global per-group rank = offset + local rank; ntile's closed-form
     bucket rule applied with the row's own group total.

Bit-identical to the window forms whenever ``group_cols + order_cols``
is a unique total order (the same determinism requirement the windows
themselves have). NULL group keys form one group, as in SQL PARTITION
BY (the offset join is eqNullSafe). Intended for BOUNDED group counts;
property-tested against F.row_number/F.ntile in tests/test_properties.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from etlutil_spark.operators.util import pin
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etlutil_spark.operators.quantiles import _reject_reserved


def _grouped_rank_frame(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    n_partitions: int | None,
    max_offset_rows: int = 1 << 18,
):
    """Shared stage: returns (frame, empty) where frame carries scratch
    columns ``_lr`` (local rank), ``_off`` (per-group rank offset for
    this partition) and ``_n`` (group total), or (schema-preserving
    empty frame, True) on empty input.

    CONTRACT: the group count must be BOUNDED (sources, languages,
    tenants — the strata of a curation corpus). The offset table this
    stage collects is O(n_partitions + n_groups) rows; called with a
    high-cardinality group (per-user, per-doc) it would silently become
    a driver-side funnel, so the collect is circuit-broken at
    ``max_offset_rows`` (the semdedup ``max_cell_share`` discipline:
    fail loudly before the pathological shape runs, never degrade
    silently). Raise the bound explicitly only when partitions x groups
    is genuinely that large AND the driver has the memory for it."""
    spark = df.sparkSession
    n_parts = n_partitions or max(spark.sparkContext.defaultParallelism, 1)
    scratch = ("_pid", "_lr", "_off", "_n", "_opid") + tuple(
        f"_g{i}" for i in range(len(group_cols))
    )
    _reject_reserved(df, scratch)
    keys = list(group_cols) + list(order_cols)
    ranged = (
        df.repartitionByRange(n_parts, *keys)
        .withColumn("_pid", F.spark_partition_id())
        .transform(pin)
    )
    # take(bound+1), not collect(): the driver never materializes more
    # than the circuit-breaker bound + 1 rows even on a bad call
    counts = (
        ranged.groupBy("_pid", *group_cols)
        .agg(F.count("*").alias("cnt"))
        .take(max_offset_rows + 1)
    )
    if len(counts) > max_offset_rows:
        raise ValueError(
            "exact_grouped_rank/ntile: the (partition x group) offset "
            f"table exceeds max_offset_rows={max_offset_rows} — the group "
            "keys look high-cardinality (per-user/per-doc?), which would "
            "funnel through the driver. This operator's contract is "
            "BOUNDED group counts (sources/languages/tenants); use a "
            "different formulation for high-cardinality groups, or raise "
            "max_offset_rows explicitly if partitions x groups is "
            "genuinely this large."
        )
    if not counts:  # empty input: preserve schema + empty result
        return ranged.drop("_pid"), True
    by_group: dict[tuple, list] = {}
    for r in counts:
        g = tuple(r[c] for c in group_cols)
        by_group.setdefault(g, []).append((r["_pid"], r["cnt"]))
    rows = []
    for g, parts in by_group.items():
        acc = 0
        parts.sort()
        for pid, cnt in parts:
            rows.append((*g, pid, acc))
            acc += cnt
        total = acc
        rows_g = rows[-len(parts):]
        rows[-len(parts):] = [(*t, total) for t in rows_g]
    from pyspark.sql import types as T

    off_schema = T.StructType(
        [
            T.StructField(f"_g{i}", df.schema[c].dataType, True)
            for i, c in enumerate(group_cols)
        ]
        + [
            T.StructField("_opid", T.IntegerType(), False),
            T.StructField("_off", T.LongType(), False),
            T.StructField("_n", T.LongType(), False),
        ]
    )
    off_df = spark.createDataFrame(rows, off_schema)
    lw = Window.partitionBy("_pid", *group_cols).orderBy(*order_cols)
    # eqNullSafe on the group keys: SQL PARTITION BY treats NULL as one
    # group, so the offset join must too (a plain equi-join drops it)
    cond = F.col("_pid") == F.col("_opid")
    for i, c in enumerate(group_cols):
        cond = cond & F.col(c).eqNullSafe(F.col(f"_g{i}"))
    joined = (
        ranged.withColumn("_lr", F.row_number().over(lw))
        .join(F.broadcast(off_df), cond)
        .drop("_pid", "_opid", *[f"_g{i}" for i in range(len(group_cols))])
    )
    return joined, False


def exact_grouped_rank(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    *,
    rank_col: str = "rank",
    n_col: str | None = None,
    n_partitions: int | None = None,
    max_offset_rows: int = 1 << 18,
) -> DataFrame:
    """Add ``rank_col`` = ``row_number() OVER (PARTITION BY group_cols
    ORDER BY order_cols)`` (and optionally ``n_col`` = the group's row
    count, the ``COUNT(*) OVER (PARTITION BY group_cols)`` twin) without
    per-group window partitions — the input to per-stratum rank
    statistics (concentration curves, top-share cuts, grouped medians)
    at corpus scale. Group counts must be BOUNDED; see
    :func:`_grouped_rank_frame` for the ``max_offset_rows`` circuit
    breaker that enforces it."""
    frame, empty = _grouped_rank_frame(
        df, group_cols, order_cols, n_partitions, max_offset_rows
    )
    if empty:
        out = frame.withColumn(rank_col, F.lit(None).cast("long"))
        if n_col:
            out = out.withColumn(n_col, F.lit(None).cast("long"))
        return out
    out = frame.withColumn(rank_col, F.col("_off") + F.col("_lr"))
    if n_col:
        out = out.withColumn(n_col, F.col("_n"))
    return out.drop("_lr", "_off", "_n")
