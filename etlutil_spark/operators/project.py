"""move_unknown_keys_to_extra lifted to DataFrames.

Reference: ``/root/reference/etlutil/data_structures.py:655-824``.

Whitelist projection: keep allowed columns, sweep the rest into one
``extra_collected`` column. For lossless heterogeneous storage the extras go
into a JSON string (``F.to_json(F.struct(...))`` — the reference's own
strategy for columnar sinks); ``extra_as="struct"`` keeps a typed struct.

``moved_keys`` is computed from the schema — pure metadata, no job runs.
The reference's non-string-key collision machinery (``__int`` suffixes,
data_structures.py:827-906) is obsolete here: column names are already
strings (SURVEY §7.4). Its EXTRA-KEY collision rules do transfer and are
implemented (data_structures.py:755-778, edge-tested at
tests/test_data_structures_edges.py:342-371):

  1. a column named exactly ``extra_key`` is renamed to the first free
     name in the sequence ``{extra_key}_original``, ``..._original2``...;
  2. every column whose name starts with ``{extra_key}_original`` is
     pinned to the top level regardless of the whitelist — never swept
     into the extras (and never counted in ``moved_keys``).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Literal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _free_name(base: str, taken: set[str]) -> str:
    """Reference's cascade: base, base_original, base_original2, ..."""
    if base not in taken:
        return base
    counter = 1
    while True:
        suffix = "_original" if counter == 1 else f"_original{counter}"
        candidate = f"{base}{suffix}"
        if candidate not in taken:
            return candidate
        counter += 1


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
    data_structures.py:676-678). Output column order matches the
    reference exactly: the default is one lexicographic sort over every
    top-level name INCLUDING ``extra_key`` (data_structures.py:817-822);
    ``preserve_order`` emits whitelist order (present and filled keys
    interleaved), renamed collision keys next, ``extra_key`` last.
    """
    allowed = list(dict.fromkeys(allowed_keys))
    existing = set(df.columns)

    # (source column | None for fill_missing, output name) pairs that stay
    # top-level; extra-key collision rules documented in the module docstring
    renames: dict[str, str] = {}
    if extra_key in existing:
        renames[extra_key] = _free_name(
            f"{extra_key}_original", (existing - {extra_key}) | set(allowed)
        )
    for c in sorted(existing):
        if c != extra_key and c.startswith(f"{extra_key}_original"):
            renames.setdefault(c, c)

    moved = sorted(
        c for c in df.columns if c not in allowed and c not in renames
    )
    # whitelist order interleaves present and filled keys (the reference
    # fills into kept_items then walks allowed_ordered, so a missing key
    # appears in its WHITELIST position, not appended after)
    pairs: list[tuple[object, str]] = [
        (c if c in existing else None, c)
        for c in allowed
        if c in existing or fill_missing
    ] + sorted(renames.items(), key=lambda kv: kv[1])

    _extra_marker = object()  # sentinel: never equal to a real column name
    extra_pair: tuple[object, str] | None = None
    if moved or always_add_extra:
        extra_pair = (_extra_marker, extra_key)

    if preserve_order:
        # whitelist order first, renamed keys next, extra_key LAST
        if extra_pair is not None:
            pairs = pairs + [extra_pair]
    else:
        # reference default: ONE lexicographic order over every top-level
        # name INCLUDING extra_key (data_structures.py:817-822 sorts
        # kept_items after the extra insertion — its own docstring example
        # shows extra_collected first; an earlier revision pinned it last)
        if extra_pair is not None:
            pairs = pairs + [extra_pair]
        pairs = sorted(pairs, key=lambda kv: kv[1])

    if moved:
        extras = F.struct(*[F.col(c) for c in moved])
        extra_col = F.to_json(extras) if extra_as == "json" else extras
    else:
        extra_col = F.lit(None).cast("string")

    select_list = []
    for src, out in pairs:
        if src is _extra_marker:
            select_list.append(extra_col.alias(out))
        elif src is not None:
            select_list.append(F.col(src).alias(out))
        else:
            select_list.append(F.lit(None).cast("string").alias(out))

    return df.select(*select_list), moved
