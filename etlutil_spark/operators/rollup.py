"""Incremental rollup maintenance: mergeable partial statistics.

The 100 TB aggregation pattern the reference's chunked-backfill loops
gesture at (reference ``date.py:907-956``): aggregate each arriving
partition ONCE into a small partial-stats table, then answer any coarser
rollup by merging partials — history is never rescanned. Correctness
rests on the algebra of the allowed ops:

    count -> sum of partial counts      sum -> sum of partial sums
    min   -> min of partial mins        max -> max of partial maxes

(avg/stddev/median are NOT mergeable from (op, value) pairs — derive avg
as merged sum / merged count; approx-distinct composes via the KMV
sketch, operators/sketch.py, whose bottom-k union is exactly mergeable.)

The metric spec is explicit — {out_name: (op, column)} — and validated,
for the same reason operators/skew.py's salted_agg takes a whitelist:
inferring merge behavior from aliases is a silent-wrong-answer footgun.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PARTIAL_OPS = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}
_MERGE_OPS = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}

MetricSpec = dict[str, tuple[str, "Column | str"]]


def _validate(ops: dict[str, str]) -> None:
    bad = {n: op for n, op in ops.items() if op not in _PARTIAL_OPS}
    if bad:
        raise ValueError(
            f"non-mergeable ops {bad}; allowed: {sorted(_PARTIAL_OPS)} "
            "(derive avg from sum/count after merging; use the KMV sketch "
            "for approximate distinct)"
        )


def partial_stats(
    df: DataFrame, group_cols: str | list[str], metrics: MetricSpec
) -> DataFrame:
    """Fine-grain partial aggregate: one row per group, one column per
    metric. This is the table you persist per arriving partition."""
    _validate({n: op for n, (op, _) in metrics.items()})
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    aggs = [
        _PARTIAL_OPS[op](col).alias(name) for name, (op, col) in metrics.items()
    ]
    return df.groupBy(*groups).agg(*aggs)


def merge_stats(
    partials: DataFrame, group_cols: str | list[str], ops: dict[str, str]
) -> DataFrame:
    """Roll partials up to coarser groups. ``ops`` maps each metric column
    to its ORIGINAL op (the merge op is derived; passing the original op
    keeps one spec shared between both stages)."""
    _validate(ops)
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    aggs = [_MERGE_OPS[op](name).alias(name) for name, op in ops.items()]
    return partials.groupBy(*groups).agg(*aggs)
