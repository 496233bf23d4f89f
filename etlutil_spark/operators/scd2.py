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
    # (NULL-safe: a NULL state differs from a non-NULL one, equals itself).
    # No explicit first-row test needed: lag() is NULL only on each key's
    # first row, and NULL.eqNullSafe(struct) is false -> changed
    state = F.struct(*[F.col(s) for s in states])
    changed = ~F.lag(state).over(w).eqNullSafe(state)

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


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_cols: str | list[str],
    ts_col: str,
    state_cols: str | list[str],
    *,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
    strict: bool = False,
) -> DataFrame:
    """Apply a change batch to an existing SCD2 dimension incrementally.

    The MERGE half of the SCD2 workflow: given ``dim`` (output of
    :func:`scd2_intervals`) and a new batch of observations, rebuild
    intervals for the touched keys only and pass every other dimension row
    through untouched. At 100 TB this is the whole point — a daily CDC
    batch touches a sliver of the key space, so the rebuild shuffle is
    sized by the batch, not the dimension: the touched/untouched split is
    a broadcast semi/anti join on the batch's distinct keys.

    Correctness contract (the reason this can be incremental at all): the
    dimension stores only run STARTS, so changes must be in-order per key
    — every change at or after that key's latest ``valid_from``. An
    out-of-order change that lands between two collapsed observations of
    an old run would need the discarded observations to re-derive runs;
    ``strict=True`` runs one small aggregate over the touched keys and
    raises if any change predates its key's open run. Like
    :func:`scd2_intervals` with ties, (key, ts) must be unique across
    dim-starts and changes combined.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    states = [state_cols] if isinstance(state_cols, str) else list(state_cols)

    affected = F.broadcast(changes.select(*keys).distinct())
    touched = dim.join(affected, keys, "left_semi")
    untouched = dim.join(affected, keys, "left_anti")

    if strict:
        latest = touched.groupBy(*keys).agg(
            F.max(valid_from_col).alias("_latest_from")
        )
        n_bad = (
            changes.join(latest, keys)
            .where(F.col(ts_col) < F.col("_latest_from"))
            .limit(1)
            .count()
        )
        if n_bad:
            raise ValueError(
                "scd2_apply: change batch contains out-of-order rows (before "
                "a key's latest valid_from); rebuild from the full log instead"
            )

    log_from_dim = touched.select(
        *keys, F.col(valid_from_col).alias(ts_col), *states
    )
    log = log_from_dim.unionByName(changes.select(*keys, ts_col, *states))
    rebuilt = scd2_intervals(
        log, keys, ts_col, states,
        valid_from_col=valid_from_col, valid_to_col=valid_to_col,
        current_col=current_col,
    )
    return untouched.select(
        *keys, *states, valid_from_col, valid_to_col, current_col
    ).unionByName(rebuilt)
