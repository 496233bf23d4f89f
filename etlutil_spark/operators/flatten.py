"""flatten_dict lifted to DataFrames.

Reference: ``/root/reference/etlutil/data_structures.py:1477-1577``.

Struct columns collapse into ``parent__child`` top-level columns (BQ-safe
``__`` separator). Arrays pass through untouched, matching the reference
(lists are never flattened, data_structures.py:1489-1491).

This is a pure projection generated driver-side from ``df.schema`` — zero
shuffle; Catalyst collapses it into the scan, and with nested-schema pruning
on, a flatten that selects 3 leaves of a 200-field struct reads only those 3
leaves from parquet. That property is what makes this safe on 100 TB wide
tables.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_struct(
    df: DataFrame,
    *,
    sep: str = "__",
    keys_to_flat: Iterable[str] | None = None,
    keys_to_skip: Iterable[str] = (),
    max_depth: int | None = None,
    keep_original: bool = False,
) -> DataFrame:
    """Collapse struct columns into flat ``a__b`` columns.

    Args:
        sep: join separator (default BQ-safe ``__``).
        keys_to_flat: if given, only struct fields with these names (matched
            at any level) are flattened; others stay nested.
        keys_to_skip: never flatten these names; skip wins over the whitelist
            (data_structures.py:1499-1501).
        max_depth: levels of collapse; 0 = no-op copy; None = unlimited.
        keep_original: also keep the nested struct column under its original
            name, emitted after its flattened leaves (last-write-wins order,
            data_structures.py:1521-1523).
    """
    if max_depth is not None and max_depth < 0:
        raise ValueError("max_depth must be >= 0")
    flat_allow = set(keys_to_flat) if keys_to_flat is not None else None
    skip = set(keys_to_skip)

    def should_flatten(name: str, dtype: T.DataType, depth: int) -> bool:
        if not isinstance(dtype, T.StructType):
            return False
        if name in skip:
            return False
        if flat_allow is not None and name not in flat_allow:
            return False
        if max_depth is not None and depth >= max_depth:
            return False
        return True

    def emit(
        col: Column, path: str, key: str, dtype: T.DataType, depth: int
    ) -> list[tuple[str, Column]]:
        # eligibility is decided on the BARE field name ("matched at any
        # level", data_structures.py:1497-1501) while the emitted column
        # name is the joined path — an earlier revision tested the path
        # ("a__b") against the whitelist/blacklist, so nested entries
        # never matched
        out: list[tuple[str, Column]] = []
        if should_flatten(key, dtype, depth):
            assert isinstance(dtype, T.StructType)
            for f in dtype.fields:
                out.extend(
                    emit(
                        col.getField(f.name),
                        f"{path}{sep}{f.name}",
                        f.name,
                        f.dataType,
                        depth + 1,
                    )
                )
            if keep_original:
                out.append((path, col))
        else:
            out.append((path, col))
        return out

    # dict semantics for name collisions (a flattened path meeting a
    # pre-existing literal ``a__b`` column): LAST write wins, first
    # writer's position kept — exactly the reference's dict update
    # behavior (tests/test_data_structures.py:1186-1189); emitting both
    # would produce a duplicate-named, unselectable column
    entries: dict[str, Column] = {}
    for field in df.schema.fields:
        for name, col in emit(
            F.col(field.name), field.name, field.name, field.dataType, 0
        ):
            entries[name] = col
    return df.select(*[c.alias(n) for n, c in entries.items()])
