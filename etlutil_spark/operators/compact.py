"""Keyed compaction & per-group top-k — the ingestion-side reductions.

``latest_by_key`` is log compaction: collapse an append-only stream of
record versions (CDC feed, api re-pulls, backfill overlaps) to the newest
version per key. ``top_k_per_group`` is bounded heavy-hitters: the k most
frequent values per group.

Both are single-shuffle window/agg plans. Determinism is part of the
contract (same input -> same survivors, any cluster layout): every
ordering carries an explicit total tie-break, where a naive
``dropDuplicates``/unordered rank would pick partition-order winners.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_by_key(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    *,
    tie_break: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """One row per key: the greatest (default) ``order_col`` wins; exact
    ties fall to the greatest ``tie_break`` so the survivor is total-order
    deterministic. One shuffle on the keys.

    At scale this is the standard pre-merge compaction before writing a
    snapshot table; because it is a window (not an aggregate), the FULL
    surviving row comes through without re-joining."""
    ordering: list[Column] = [
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    ]
    if tie_break:
        ordering.append(F.col(tie_break).desc() if descending else F.col(tie_break).asc())
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int,
    *,
    count_col: str = "n",
    rank_col: str = "rnk",
) -> DataFrame:
    """The ``k`` most frequent ``value_col`` values per group, with counts
    and 1-based rank (ties broken by value ascending — deterministic).

    Two-stage: count per (group, value) — map-side partial combine does
    the heavy lifting — then a per-group top-k window over the (small)
    distinct-value rows. The window input is |groups| x |distinct values|,
    not the raw row count, so the second shuffle is tiny at any scale."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    counts = df.groupBy(*group_cols, value_col).agg(F.count("*").alias(count_col))
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(count_col).desc(), F.col(value_col).asc()
    )
    return (
        counts.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )
