"""convert_to_json_string lifted to DataFrames.

Reference: ``/root/reference/etlutil/data_structures.py:1764-1826``.

Stringify columns for columnar export: NULL stays NULL (``to_json`` and
``cast`` are both null-preserving — the reference's BQ NULL contract),
string columns are left untouched (idempotence by construction — checked
from the schema, not the data), complex types go through ``F.to_json``,
scalars through ``cast("string")``.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def to_json_string(
    df: DataFrame,
    keys: Iterable[str] | None = None,
) -> DataFrame:
    """Stringify selected (default: all) columns; output schema is all-string
    for the chosen keys, other columns pass through unchanged."""
    chosen = set(keys) if keys is not None else set(df.columns)
    unknown = chosen - set(df.columns)
    if unknown:
        raise KeyError(f"unknown columns: {sorted(unknown)}")

    updates = {}
    for field in df.schema.fields:
        if field.name not in chosen:
            continue
        if isinstance(field.dataType, T.StringType):
            continue  # idempotent: never double-encode (reference :1788-1793)
        if isinstance(field.dataType, (T.StructType, T.ArrayType, T.MapType)):
            updates[field.name] = F.to_json(F.col(field.name))
        else:
            updates[field.name] = F.col(field.name).cast("string")
    return df.withColumns(updates) if updates else df
