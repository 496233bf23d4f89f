"""Table profiling — per-column stats in one aggregation pass.

The data-quality sibling of the reference's ``walk`` introspection
(SURVEY §2.1 #2): where walk shows one record's shape, profile_table shows
the whole table's: row count, null count, exact distinct count, min/max per
column. One job, one final row, unpivoted driver-side into a
column-per-row frame.

At 100 TB: multiple exact COUNT(DISTINCT) in one pass makes Spark plan an
Expand (one duplicated input row per distinct aggregate) — acceptable for
scheduled profiling; swap ``approx=True`` for HyperLogLog sketches
(approx_count_distinct) when cardinality estimates are enough, which turns
the whole profile into a single streaming aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    approx: bool = False,
) -> DataFrame:
    """One row per profiled column:
    (column, n_rows, n_nulls, n_distinct, min_value, max_value) —
    min/max computed on the native type, then rendered as strings."""
    cols = columns or df.columns
    aggs = [F.count("*").alias("_n_rows")]
    distinct = (
        (lambda c: F.approx_count_distinct(c)) if approx else (lambda c: F.countDistinct(c))
    )
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            distinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(
        F.col("_n_rows").alias("n_rows"), F.explode(entries).alias("e")
    ).select(
        "e.column",
        "n_rows",
        "e.n_nulls",
        "e.n_distinct",
        "e.min_value",
        "e.max_value",
    )
