"""normalize_date_fields lifted to DataFrames.

Reference: ``/root/reference/etlutil/data_structures.py:1580-1761``.

Each rule carries exactly one matcher (suffix/prefix/equals — str or list —
or regex), a ``convert`` type from the :mod:`casts` family and a ``target``
prefix. Matching happens driver-side over ``df.columns`` (pure metadata);
the output is a single projection, so the whole operator costs nothing
beyond the cast expressions themselves.

Rename semantics (matched against the reference):
  - new name = ``f"{target}_{base}"`` where base = the column name with the
    matched part stripped (``strip_match=False`` keeps the full name);
    empty base falls back to the full name.
  - first matching rule wins; unmatched columns pass through.
  - ``keep_original=True`` keeps the original column; the renamed one is
    emitted after it (reference writes new key after original).
  - ``recursive=True`` descends into STRUCT columns/fields (the reference
    descends nested dicts, NOT list items — data_structures.py:1671-1680),
    renaming and converting matched fields inside the rebuilt struct.
  - rename collisions resolve with dict semantics (last write wins, first
    writer's position kept) at every nesting level, mirroring the
    reference's ``result[new_k] = new_v`` behavior.
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Mapping
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etlutil_spark.operators.casts import (
    DEFAULT_DATETIME_FORMATS,
    ConvertType,
    _strict_wrap,
    cast_expr,
)

Matcher = Callable[[str], tuple[str, str] | None]


def _compile_rule(rule: Mapping[str, Any]) -> Matcher:
    present = [m for m in ("suffix", "prefix", "equals", "regex") if m in rule]
    if len(present) != 1:
        raise ValueError(
            f"rule must have exactly one of suffix/prefix/equals/regex, got {present}"
        )
    if "convert" not in rule or "target" not in rule:
        raise ValueError("rule requires 'convert' and 'target'")

    kind = present[0]
    raw = rule[kind]
    convert = rule["convert"]
    convert = convert.value if isinstance(convert, ConvertType) else convert
    target = rule["target"]
    strip = rule.get("strip_match", True)

    if kind == "regex":
        pattern = re.compile(raw)

        def match(name: str) -> tuple[str, str] | None:
            m = pattern.search(name)
            if not m:
                return None
            base = (name[: m.start()] + name[m.end():]) if strip else name
            return f"{target}_{base or name}", convert

        return match

    patterns = [raw] if isinstance(raw, str) else list(raw)

    def match(name: str) -> tuple[str, str] | None:
        for p in patterns:
            if kind == "suffix" and name.endswith(p):
                base = name[: -len(p)] if (strip and p) else name
            elif kind == "prefix" and name.startswith(p):
                base = name[len(p):] if strip else name
            elif kind == "equals" and name == p:
                base = "" if strip else name
            else:
                continue
            return f"{target}_{base or name}", convert
        return None

    return match


def normalize_date_fields(
    df: DataFrame,
    rules: Iterable[Mapping[str, Any]],
    *,
    recursive: bool = False,
    strict: bool = False,
    keep_original: bool = False,
    datetime_formats: tuple[str, ...] = DEFAULT_DATETIME_FORMATS,
) -> DataFrame:
    """Rename + convert date/timestamp columns in one projection.

    Still a single projection with ``recursive=True``: nested structs are
    rebuilt as expressions, so the operator's cost stays the cast
    expressions themselves (no shuffle, full codegen)."""
    compiled = [_compile_rule(r) for r in rules]

    def apply_rules(
        name: str,
        value: Column,
        dtype: T.DataType,
        entries: dict[str, Column],
    ) -> None:
        # `entries` is insertion-ordered; assigning an existing key updates
        # in place — exactly the reference dict's last-write-wins collision
        # behavior (data_structures.py:1671-1680)
        outcome = next(
            (res for m in compiled if (res := m(name)) is not None), None
        )
        if outcome is None:
            entries[name] = value
            return
        new_name, convert = outcome
        if (
            isinstance(dtype, (T.StructType, T.ArrayType, T.MapType))
            and convert != "str"
        ):
            # reference: _convert_value on a dict/list raises TypeError
            # internally — lenient mode RENAMES but keeps the value,
            # strict mode surfaces the error (data_structures.py:1085-1090).
            # Building the cast expression here would instead throw an
            # invalid-cast AnalysisException even in lenient mode.
            if strict:
                raise TypeError(
                    f"strict convert failed for column {name!r} -> "
                    f"{convert}: container type {dtype.simpleString()}"
                )
            expr = value
        else:
            expr = cast_expr(
                value, convert,
                datetime_formats=datetime_formats,
                source_type=dtype,
            )
            if strict:
                expr = _strict_wrap(value, expr, name, convert)
        if keep_original and new_name != name:
            entries[name] = value
        entries[new_name] = expr

    def rewrite_struct(value: Column, dtype: T.StructType) -> Column:
        entries: dict[str, Column] = {}
        for f in dtype.fields:
            child = value.getField(f.name)
            if recursive and isinstance(f.dataType, T.StructType):
                child = rewrite_struct(child, f.dataType)
            apply_rules(f.name, child, f.dataType, entries)
        return F.struct(*[c.alias(n) for n, c in entries.items()])

    entries: dict[str, Column] = {}
    for field in df.schema.fields:
        value = F.col(field.name)
        if recursive and isinstance(field.dataType, T.StructType):
            value = rewrite_struct(value, field.dataType)
        apply_rules(field.name, value, field.dataType, entries)
    return df.select(*[c.alias(n) for n, c in entries.items()])
