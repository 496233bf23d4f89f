"""SCD Type-2 interval construction from a change log.

Classic warehouse ETL shape: given an append-only log of observed states
per key (CDC stream, snapshot diffs, event log), produce one row per
*state run* with its validity window:

    key, state..., valid_from, valid_to, is_current

where ``valid_to`` is the next run's ``valid_from`` (half-open interval,
NULL on the current run). Consecutive log rows with an unchanged state
collapse into one interval — the compression that makes SCD2 tables small
relative to their logs.

Plan: two windows over the SAME (key, order) partitioning — a lag to flag
state changes, a lead (after filtering to change rows) for the interval
end. Catalyst reuses the single sort+shuffle for both windows, so the whole
operator is ONE shuffle of the log regardless of how many state columns are
tracked — at 100 TB the cost is the shuffle, not the window arithmetic.

Ties: rows are ordered by (ts, tie_break...); pass tie-break columns
whenever one key can log twice at one timestamp, otherwise run-collapse is
plan-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_intervals(
    df: DataFrame,
    key_cols: str | list[str],
    ts_col: str,
    state_cols: str | list[str],
    *,
    tie_break: str | list[str] | None = None,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Collapse a state log into SCD2 validity intervals.

    Returns one row per (key, state run): key columns, state columns,
    ``valid_from`` (run's first observation), ``valid_to`` (next run's
    start, NULL for the open run), ``is_current`` (1 on the open run).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    states = [state_cols] if isinstance(state_cols, str) else list(state_cols)
    ties = (
        []
        if tie_break is None
        else [tie_break] if isinstance(tie_break, str) else list(tie_break)
    )
    order = [F.col(ts_col).asc()] + [F.col(t).asc() for t in ties]
    w = Window.partitionBy(*keys).orderBy(*order)

    # struct compare handles multi-column state + NULLs in one expression
    # (NULL-safe: a NULL state differs from a non-NULL one, equals itself)
    state = F.struct(*[F.col(s) for s in states])
    changed = F.lag(state).over(w).isNull() | ~F.lag(state).over(w).eqNullSafe(state)

    runs = df.withColumn("_chg", changed).where(F.col("_chg"))
    # same partitioning/order as w: the lead window reuses the sort
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        runs.withColumn(valid_from_col, F.col(ts_col))
        .withColumn(valid_to_col, F.lead(valid_from_col).over(w2))
        .withColumn(
            current_col,
            F.when(F.col(valid_to_col).isNull(), F.lit(1)).otherwise(F.lit(0)),
        )
        .select(*keys, *states, valid_from_col, valid_to_col, current_col)
    )
