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

from etlutil_spark.operators.util import pin
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

    # the distinct batch-key set feeds BOTH the semi and the anti join;
    # pinned so the distinct aggregate runs once, not once per leg (the
    # set is batch-sized — the checkpoint is as cheap as the broadcast)
    affected = F.broadcast(
        changes.select(*keys).distinct().transform(pin)
    )
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


def _as_list(v: str | list[str]) -> list[str]:
    return [v] if isinstance(v, str) else list(v)


def scd2_cdc_intervals(
    log: DataFrame,
    key_cols: str | list[str],
    ts_col: str,
    state_cols: str | list[str],
    *,
    op_col: str = "op",
    delete_op: str = "D",
    tie_break: str | list[str] | None = None,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """SCD2 intervals from a CDC log WITH DELETE TOMBSTONES: rows where
    ``op_col == delete_op`` close the key's open run at their timestamp
    and open nothing — a later upsert re-opens the key. A key whose last
    event is a delete ends with every interval closed and NO current
    row (the "customer left" truth an upsert-only dimension cannot
    represent).

    Mechanics: a delete is modeled as a state change to an internal
    tombstone state (``_del = 1``, real state columns NULLed), run
    collapse happens over the EXTENDED state, and tombstone runs are
    dropped after the lead() has already used their timestamps as the
    preceding run's ``valid_to``. Consecutive deletes collapse like any
    unchanged run; delete-then-reinsert of the SAME state starts a new
    run (the tombstone between them breaks the run), which is exactly
    the history a CDC consumer expects. Same single-shuffle plan as
    :func:`scd2_intervals` — the tombstone column rides the existing
    state struct."""
    keys = _as_list(key_cols)
    states = _as_list(state_cols)
    # a NULL op would fail BOTH branch predicates below (NULL != 'D' and
    # NULL == 'D' are each NULL) and the observation would silently
    # vanish from the rebuilt history — fail loudly instead
    op_checked = F.when(
        F.col(op_col).isNull(),
        F.raise_error(
            F.lit(
                f"scd2_cdc_intervals: NULL in op column '{op_col}' — "
                "coalesce snapshot-load rows to an explicit op code first"
            )
        ),
    ).otherwise(F.col(op_col))
    # ONE conditional projection instead of two filtered branches + union
    # (which re-derived the log pass per branch): every row is either an
    # upsert (states kept, _del=0) or a tombstone (states NULLed, _del=1)
    # — the branch predicates were disjoint and exhaustive, so the single
    # pass emits the identical row set. op_checked still raises on NULL.
    is_del = op_checked == F.lit(delete_op)
    ext = log.select(
        *keys, ts_col,
        *(tie_break and _as_list(tie_break) or []),
        *[
            F.when(~is_del, F.col(s)).otherwise(
                F.lit(None).cast(log.schema[s].dataType)
            ).alias(s)
            for s in states
        ],
        F.when(is_del, F.lit(1)).otherwise(F.lit(0)).alias("_del"),
    )
    iv = scd2_intervals(
        ext, keys, ts_col, states + ["_del"],
        tie_break=tie_break, valid_from_col=valid_from_col,
        valid_to_col=valid_to_col, current_col=current_col,
    )
    return iv.where(F.col("_del") == 0).drop("_del")


def scd2_apply_cdc(
    dim: DataFrame,
    changes: DataFrame,
    key_cols: str | list[str],
    ts_col: str,
    state_cols: str | list[str],
    *,
    op_col: str = "op",
    delete_op: str = "D",
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
    strict: bool = False,
) -> DataFrame:
    """Incrementally apply a CDC batch (upserts AND delete tombstones)
    to an SCD2 dimension — the MERGE a lakehouse CDC sink actually
    needs; :func:`scd2_apply` covers the upsert-only case. Same
    touched/untouched split (broadcast semi/anti on the batch's keys,
    rebuild sized by the batch, not the dimension), with one extra
    reconstruction rule: every COVERAGE GAP in a touched key's existing
    intervals marks a past delete, so a tombstone event is synthesized
    at each ``valid_to`` that the next run's ``valid_from`` does not
    immediately continue (including the trailing case — a fully-closed
    key with no next run was deleted outright). Without the interior-gap
    tombstones, rebuilding from run starts alone would resurrect a
    deleted period whenever a batch touches a key again after a
    delete-then-reinsert: dim [10,20)a,[30,∞)a + batch U@50:c must stay
    [10,20)a,[30,50)a,[50,∞)c — not collapse to [10,50)a.

    Invariant (pinned in tests/test_temporal_ops.py):
    incremental apply over any batch split == :func:`scd2_cdc_intervals`
    over the concatenated log. ``strict=True`` raises when a change
    predates its key's latest event (run start OR tombstone)."""
    keys = _as_list(key_cols)
    states = _as_list(state_cols)

    # pinned for the same two-consumer reason as scd2_apply
    affected = F.broadcast(
        changes.select(*keys).distinct().transform(pin)
    )
    touched = dim.join(affected, keys, "left_semi")
    untouched = dim.join(affected, keys, "left_anti")

    if strict:
        latest = touched.groupBy(*keys).agg(
            F.max(
                F.greatest(
                    F.col(valid_from_col),
                    F.coalesce(F.col(valid_to_col), F.col(valid_from_col)),
                )
            ).alias("_latest_ev")
        )
        n_bad = (
            changes.join(latest, keys)
            .where(F.col(ts_col) < F.col("_latest_ev"))
            .limit(1)
            .count()
        )
        if n_bad:
            raise ValueError(
                "scd2_apply_cdc: change batch contains out-of-order rows "
                "(before a key's latest run start or tombstone); rebuild "
                "from the full log instead"
            )

    log_dim = touched.select(
        *keys, F.col(valid_from_col).alias(ts_col), *states
    ).withColumn(op_col, F.lit("U"))
    # Tombstone at every coverage gap: valid_to with no next run starting
    # exactly there (interior delete-then-reinsert) or no next run at all
    # (trailing delete). The window runs over the touched sliver only, so
    # its shuffle is batch-sized like the rebuild itself.
    w_gap = Window.partitionBy(*keys).orderBy(F.col(valid_from_col).asc())
    tomb = (
        touched.withColumn(
            "_next_from", F.lead(valid_from_col).over(w_gap)
        )
        .where(
            F.col(valid_to_col).isNotNull()
            & (
                F.col("_next_from").isNull()
                | (F.col(valid_to_col) < F.col("_next_from"))
            )
        )
        .select(
            *keys, F.col(valid_to_col).alias(ts_col),
            *[
                F.lit(None).cast(dim.schema[s].dataType).alias(s)
                for s in states
            ],
        )
        .withColumn(op_col, F.lit(delete_op))
    )
    log = log_dim.unionByName(tomb).unionByName(
        changes.select(*keys, ts_col, *states, op_col)
    )
    rebuilt = scd2_cdc_intervals(
        log, keys, ts_col, states,
        op_col=op_col, delete_op=delete_op,
        valid_from_col=valid_from_col, valid_to_col=valid_to_col,
        current_col=current_col,
    )
    return untouched.select(
        *keys, *states, valid_from_col, valid_to_col, current_col
    ).unionByName(rebuilt)
