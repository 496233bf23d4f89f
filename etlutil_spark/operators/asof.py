"""As-of (point-in-time) join — the time-series lookup Spark has no
built-in operator for.

For every left row, attach the single right row with the greatest
``right_time <= left_time`` (direction="backward", the default) or the
smallest ``right_time >= left_time`` (direction="forward") within the same
key group — the semantics of pandas ``merge_asof`` / DuckDB ``ASOF JOIN``.

Implementation is the union-marker plan, NOT a range join:

  1. union left and right rows into one stream tagged with a side marker,
  2. one shuffle+sort per key on (time, side) — right rows sort before
     left rows at equal timestamps so "at-or-before" includes exact ties,
  3. a running ``last(right_payload, ignorenulls=True)`` window carries the
     most recent right payload forward onto each left row,
  4. filter back to left rows.

Why this shape at 100 TB: the obvious alternatives are a non-equi range
join (BroadcastNestedLoop — quadratic, never acceptable) or a per-key
dense self-join (quadratic in key group size). The union-marker plan costs
exactly ONE shuffle and ONE sort over left+right combined — the same cost
as sessionization — and is insensitive to how many right rows precede each
left row. Hot keys concentrate in single partitions (same caveat as any
keyed window); mitigate with the usual time-bucket salting if one key
dominates.

The right payload rides inside a STRUCT: the struct is non-null exactly on
right rows, so ``last(ignorenulls)`` never skips over a right row whose
payload columns are legitimately NULL (the classic forward-fill bug).

Determinism contract: right must be unique per (key, right_time) — collapse
duplicates first (e.g. ``operators/compact.latest_by_key`` or a
``max_by`` aggregate); with ties the carried row is plan-dependent.

NULL-time semantics match DuckDB ASOF / pandas merge_asof: a NULL right
time never matches (those rows are dropped from the union), and a NULL
left time matches nothing (left row kept, payload NULL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    *,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
    matched_time_col: str = "matched_time",
) -> DataFrame:
    """Point-in-time join: left columns + the matched right row's columns.

    Right payload columns are every right column except the keys and
    ``right_time``; the matched right timestamp is exposed as
    ``matched_time_col``. Unmatched left rows keep NULL payloads (left-join
    semantics). ``tolerance_seconds`` nulls out matches farther than the
    given staleness from the left timestamp (payload AND matched time), it
    does not drop left rows.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    for k in keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"join key {k!r} must exist on both sides")
    payload = [c for c in right.columns if c not in keys and c != right_time]
    # the output is left.columns + matched_time_col + payload: any name
    # collision would emit a duplicate-named column that only explodes
    # downstream (AMBIGUOUS_REFERENCE) — fail here, at the call site
    clashes = (set(payload) | {matched_time_col}) & set(left.columns)
    if matched_time_col in payload:
        clashes.add(matched_time_col)
    if clashes:
        raise ValueError(
            f"output name collision(s) {sorted(clashes)}: rename/drop the "
            "right payload columns or pick a different matched_time_col"
        )

    rpay = F.struct(
        F.col(right_time).alias(matched_time_col),
        *[F.col(c) for c in payload],
    )
    rpay_type = right.select(rpay.alias("p")).schema[0].dataType
    lpay = F.struct(*[F.col(c) for c in left.columns])
    lpay_type = left.select(lpay.alias("p")).schema[0].dataType

    l_u = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).cast("timestamp").alias("_t"),
        F.lit(1).alias("_side"),
        lpay.alias("_lpay"),
        F.lit(None).cast(rpay_type).alias("_rpay"),
    )
    r_u = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).cast("timestamp").alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lpay_type).alias("_lpay"),
        rpay.alias("_rpay"),
    )
    # NULL right times can never satisfy right_time <= / >= left_time
    # (DuckDB ASOF / pandas merge_asof semantics): without this filter a
    # NULL-_t right row sorts NULLS FIRST under the backward ordering and
    # last(ignorenulls) would CARRY it as a "match" into every left row
    # that has no real predecessor.
    u = l_u.unionByName(r_u.where(F.col("_t").isNotNull()))

    t_order = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(t_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched: Column = F.last("_rpay", ignorenulls=True).over(w)

    # window BEFORE the side filter: the carried _rpay lives on right rows,
    # which must still be in the frame when last(ignorenulls) runs.
    # A NULL left time matches NOTHING on either direction: under the
    # forward ordering (_t DESC, NULLS LAST) a NULL-_t left row sorts
    # after every right row and would otherwise inherit the EARLIEST
    # right payload — the silent-wrong-answer the guard exists for.
    out = u.withColumn(
        "_m", F.when(F.col("_t").isNotNull(), matched)
    ).where(F.col("_side") == 1)
    if tolerance_seconds is not None:
        staleness = (
            F.unix_timestamp("_t") - F.unix_timestamp(F.col(f"_m.{matched_time_col}"))
            if direction == "backward"
            else F.unix_timestamp(F.col(f"_m.{matched_time_col}"))
            - F.unix_timestamp("_t")
        )
        out = out.withColumn(
            "_m", F.when(staleness <= tolerance_seconds, F.col("_m"))
        )
    return out.select(
        *[F.col(f"_lpay.{c}").alias(c) for c in left.columns],
        F.col(f"_m.{matched_time_col}").alias(matched_time_col),
        *[F.col(f"_m.{c}").alias(c) for c in payload],
    )
