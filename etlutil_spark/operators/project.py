"""move_unknown_keys_to_extra lifted to DataFrames.

Reference: ``/root/reference/etlutil/data_structures.py:655-824``.

Whitelist projection: keep allowed columns, sweep the rest into one
``extra_collected`` column. For lossless heterogeneous storage the extras go
into a JSON string (``F.to_json(F.struct(...))`` — the reference's own
strategy for columnar sinks); ``extra_as="struct"`` keeps a typed struct.

``moved_keys`` is computed from the schema — pure metadata, no job runs.
The reference's key-collision machinery (``__int`` suffixes,
data_structures.py:827-906) is obsolete here: column names are already
strings (SURVEY §7.4).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Literal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def select_with_extras(
    df: DataFrame,
    allowed_keys: Sequence[str],
    *,
    extra_key: str = "extra_collected",
    always_add_extra: bool = False,
    preserve_order: bool = False,
    fill_missing: bool = False,
    extra_as: Literal["json", "struct"] = "json",
) -> tuple[DataFrame, list[str]]:
    """Project to the whitelist; sweep the rest into ``extra_key``.

    Returns ``(projected_df, moved_keys)``; moved_keys sorted for stability.
    ``fill_missing`` adds absent whitelist columns as NULL strings (the
    reference fabricates a stable schema for warehouse loads this way,
    data_structures.py:676-678). Output column order is lexicographic by
    default, whitelist order under ``preserve_order`` (reference default
    sorts, data_structures.py:817-822); ``extra_key`` always comes last.
    """
    allowed = list(dict.fromkeys(allowed_keys))
    existing = set(df.columns)
    moved = sorted(c for c in df.columns if c not in allowed)
    kept = [c for c in allowed if c in existing]
    missing = [c for c in allowed if c not in existing] if fill_missing else []

    ordered = kept + missing if preserve_order else sorted(kept + missing)

    select_list = []
    for c in ordered:
        if c in existing:
            select_list.append(F.col(c))
        else:
            select_list.append(F.lit(None).cast("string").alias(c))

    if moved or always_add_extra:
        if moved:
            extras = F.struct(*[F.col(c) for c in moved])
            extra_col = F.to_json(extras) if extra_as == "json" else extras
        else:
            extra_col = F.lit(None).cast("string")
        select_list.append(extra_col.alias(extra_key))

    return df.select(*select_list), moved
