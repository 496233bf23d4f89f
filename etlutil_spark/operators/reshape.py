"""Reshape operators: pivot (long -> wide) and unpivot/melt (wide -> long).

The reference prepares records FOR warehouses that pivot downstream; the
Spark engine supplies the reshape itself. Two deliberate design points:

  - ``pivot_agg`` does NOT use Spark's ``.pivot()``. The native path has
    two costs that matter at 100 TB: without an explicit value list it
    runs a hidden distinct job to discover values (an extra full scan,
    nondeterministic column order), and even WITH values it plans two
    exchanges (partial agg on (group, pivot), re-agg on group). Compiling
    the pivot as ``when``-filtered aggregates inside ONE ``groupBy`` —
    exactly SQL's ``agg(x) FILTER (WHERE pivot = v)`` — costs a single
    exchange with map-side partials and gives SQL-standard absent-combo
    semantics (COUNT -> 0, SUM -> NULL), which the oracle agrees with.
  - ``unpivot`` uses Spark's native melt; output value type is the
    caller's problem (columns must share a common type after upcast),
    which matches SQL UNPIVOT.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pivot_agg(
    df: DataFrame,
    group_cols: str | list[str],
    pivot_col: str,
    values: list,
    agg_of: Callable[[Column], Column],
    *,
    prefix: str = "",
) -> DataFrame:
    """Wide table: one column per pivot value, one row per group.

    ``agg_of`` receives the membership condition for one pivot value and
    returns the aggregate for that column, e.g.::

        pivot_agg(ev, "d", "event_type", ["click", "view"],
                  lambda cond: F.count(F.when(cond, 1)))          # counts
        pivot_agg(o, "yr", "status", ["F", "O"],
                  lambda cond: F.sum(F.when(cond, F.col("price")))) # sums

    The ``when`` gate makes the aggregate see NULL outside its slice, so
    COUNT yields 0 and SUM yields NULL for absent combos — the same answer
    as SQL ``FILTER (WHERE ...)``."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    aggs = [
        agg_of(F.col(pivot_col) == F.lit(v)).alias(f"{prefix}{v}") for v in values
    ]
    return df.groupBy(*groups).agg(*aggs)


def unpivot(
    df: DataFrame,
    id_cols: str | list[str],
    value_cols: list[str],
    *,
    var_col: str = "variable",
    value_col: str = "value",
) -> DataFrame:
    """Melt: one output row per (id, value column). Pure projection +
    generator — zero shuffle, fully pushdown-transparent."""
    ids = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    return df.unpivot(ids, value_cols, var_col, value_col)
