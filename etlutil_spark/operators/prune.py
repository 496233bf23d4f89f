"""prune_data lifted to DataFrames.

Reference: ``/root/reference/etlutil/data_structures.py:33-240`` (the most
complex kernel: recursive key/value removal with depth gates and
empty-dropping that never touches 0/False).

Spark lift, as a driver-side recursive schema rewrite:

  - key removal        -> drop top-level columns / rebuild structs without
                          the field / rebuild array-of-struct elements /
                          filter MAP entries whose key matches (literal
                          name lists only — a callable key spec runs
                          driver-side over schema names and cannot reach
                          data-level map keys without a per-row UDF).
  - value removal      -> array elements are FILTERED out (true removal);
                          scalar & struct-field values are NULLED out (a
                          typed column cannot lose a cell); map entries go
                          through ``map_filter``.
  - remove_empty       -> NULL, "", empty array/map/struct are nulled;
                          0 and false are NOT empty (reference :51, :98).
  - a struct whose every field is key-removed drops from the SCHEMA
    entirely (with or without remove_empty): a zero-field struct type has
    no useful columnar representation, so the dict-world distinction
    between {} and absent collapses here — schema-level deviation,
    SURVEY §7.4.
  - max_depth          -> container levels, None = unlimited, 0 = top level
                          only; two gates like the reference: filtering is
                          allowed at depth <= max_depth, recursion only at
                          depth < max_depth (reference :137-138).
  - no-op short-circuit: nothing to do -> the input DataFrame unchanged
                          (reference :88-89).

Key predicates: pass an iterable of names or a Python callable
``str -> bool`` (evaluated driver-side against the schema — metadata only).
Value predicates: pass an iterable of literals or a callable
``Column -> Column`` boolean expression (runs JVM-side).

The output is a single projection: zero shuffle, scan-collapsed, and with
nested-schema pruning enabled the dropped subtrees are never read at all.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KeySpec = Iterable[str] | Callable[[str], bool] | None
ValueSpec = Iterable[Any] | Callable[[Column], Column] | None


def _key_pred(spec: KeySpec) -> Callable[[str], bool]:
    if spec is None:
        return lambda _: False
    if callable(spec):
        return spec
    names = set(spec)
    return lambda k: k in names


def _value_pred(spec: ValueSpec) -> Callable[[Column, T.DataType], Column] | None:
    """Compile value-removal spec to a (col, dtype) -> bool Column factory.

    Literal comparisons are type-gated like Python equality in the
    reference: ``1 == "error"`` is simply False, never a cast error — so a
    literal only participates when its Python type is compatible with the
    column's Spark type (str~string, bool~boolean, int/float~numeric)."""
    if spec is None:
        return None
    if callable(spec):
        return lambda c, _dtype: spec(c)
    values = list(spec)
    if not values:
        return None

    def compatible(v: Any, dtype: T.DataType) -> bool:
        # Python's bool IS an int (False == 0, True == 1), so the
        # reference's `==` matching crosses the bool/number line both
        # ways: values_to_remove=[0] removes False and [False] removes 0
        if isinstance(v, bool):
            return isinstance(dtype, (T.BooleanType, T.NumericType))
        if isinstance(v, (int, float)):
            return isinstance(dtype, (T.NumericType, T.BooleanType))
        if isinstance(v, str):
            return isinstance(dtype, T.StringType)
        if isinstance(v, bytes):
            return isinstance(dtype, T.BinaryType)
        return False

    def pred(c: Column, dtype: T.DataType) -> Column:
        applicable = [v for v in values if compatible(v, dtype)]
        if not applicable:
            return F.lit(False)
        out = F.lit(False)
        for v in applicable:
            if isinstance(dtype, T.BooleanType) and not isinstance(v, bool):
                # numeric literal vs boolean column: compare through the
                # 0/1 projection Python equality uses
                out = out | c.cast("int").eqNullSafe(F.lit(v))
            elif isinstance(dtype, T.NumericType) and isinstance(v, bool):
                out = out | c.eqNullSafe(F.lit(int(v)))
            else:
                out = out | c.eqNullSafe(F.lit(v))
        return out

    return pred


def _is_empty_expr(
    col: Column,
    dtype: T.DataType,
    depth: int = 0,
    recurse_ok=lambda _d: True,
) -> Column:
    """Emptiness per the reference's is_empty (:91-115): NULL, "", empty
    containers; never 0/False.

    A struct is "empty" when every field is empty — the typed analog of
    the reference's bottom-up cascade (empty children get REMOVED, so the
    processed dict reads len()==0). That analog only holds where the
    depth gates let processing reach the children: a dict at the
    recursion limit keeps its children raw, has len() > 0, and is NEVER
    empty in the reference — so past ``recurse_ok(depth)`` a struct's
    emptiness is its own NULL, nothing deeper (found by differential
    fuzzing at max_depth)."""
    if isinstance(dtype, T.StringType):
        return col.isNull() | (col == "")
    if isinstance(dtype, (T.ArrayType, T.MapType)):
        return col.isNull() | (F.size(col) <= 0)
    if isinstance(dtype, T.StructType):
        if not recurse_ok(depth):
            return col.isNull()
        inner = [
            ~_is_empty_expr(
                col.getField(f.name), f.dataType, depth + 1, recurse_ok
            )
            for f in dtype.fields
        ]
        any_nonempty = inner[0] if inner else F.lit(False)
        for e in inner[1:]:
            any_nonempty = any_nonempty | e
        return col.isNull() | ~any_nonempty
    return col.isNull()


def prune_columns(
    df: DataFrame,
    keys_to_remove: KeySpec = None,
    values_to_remove: ValueSpec = None,
    remove_empty: bool = False,
    *,
    max_depth: int | None = None,
) -> DataFrame:
    if max_depth is not None and max_depth < 0:
        raise ValueError("max_depth must be >= 0")
    drop_key = _key_pred(keys_to_remove)
    val_pred = _value_pred(values_to_remove)
    # Literal key names also filter MAP entries (a dict child is just a
    # Mapping to the reference, so keys_to_remove strips matching map
    # keys at the data level). A CALLABLE key spec runs driver-side over
    # schema names only — map keys are data, and pushing a Python
    # predicate into the scan would be a row-at-a-time UDF; documented
    # typed-engine limitation.
    key_names: list[str] | None = None
    if keys_to_remove is not None and not callable(keys_to_remove):
        key_names = sorted(set(keys_to_remove))

    if keys_to_remove is None and val_pred is None and not remove_empty:
        return df  # no-op short-circuit (reference :88-89)

    def can_filter(depth: int) -> bool:
        return max_depth is None or depth <= max_depth

    def can_recurse(depth: int) -> bool:
        return max_depth is None or depth < max_depth

    def would_drop(dtype: T.DataType, depth: int) -> bool:
        """True when the rewrite would leave this value with no fields.

        Spark has no empty-struct value, so where the reference keeps ``{}``
        after removing every key of a dict, the DataFrame lift drops the
        field (schema-level decision, data-independent). An array whose
        element type empties is dropped with it."""
        if isinstance(dtype, T.StructType) and can_recurse(depth):
            for f in dtype.fields:
                if can_filter(depth + 1) and drop_key(f.name):
                    continue
                if not would_drop(f.dataType, depth + 1):
                    return False
            return True
        if (
            isinstance(dtype, T.ArrayType)
            and can_recurse(depth)
            and isinstance(dtype.elementType, (T.StructType, T.ArrayType, T.MapType))
        ):
            return would_drop(dtype.elementType, depth + 1)
        return False

    def pruned_type(dtype: T.DataType, depth: int) -> T.DataType:
        """The dtype rewrite() produces — emptiness checks must run against
        THIS, not the original dtype, or they reference dropped fields."""
        if isinstance(dtype, T.StructType) and can_recurse(depth):
            fields = []
            for f in dtype.fields:
                if can_filter(depth + 1) and drop_key(f.name):
                    continue
                if would_drop(f.dataType, depth + 1):
                    continue
                fields.append(T.StructField(f.name, pruned_type(f.dataType, depth + 1)))
            return T.StructType(fields)
        if isinstance(dtype, T.ArrayType) and can_recurse(depth) and isinstance(
            dtype.elementType, (T.StructType, T.ArrayType, T.MapType)
        ):
            return T.ArrayType(
                pruned_type(dtype.elementType, depth + 1), dtype.containsNull
            )
        if (
            isinstance(dtype, T.MapType)
            and can_recurse(depth + 1)
            and isinstance(
                dtype.valueType, (T.StructType, T.ArrayType, T.MapType)
            )
            and not would_drop(dtype.valueType, depth + 1)
        ):
            return T.MapType(
                dtype.keyType,
                pruned_type(dtype.valueType, depth + 1),
                dtype.valueContainsNull,
            )
        return dtype

    def rewrite(col: Column, dtype: T.DataType, depth: int) -> Column:
        """Rewrite the VALUE of a field (key decisions happen in the parent;
        callers must not pass a dtype for which would_drop is True)."""
        if isinstance(dtype, T.StructType) and can_recurse(depth):
            fields = []
            for f in dtype.fields:
                if can_filter(depth + 1) and drop_key(f.name):
                    continue
                if would_drop(f.dataType, depth + 1):
                    continue
                child = rewrite(col.getField(f.name), f.dataType, depth + 1)
                child = maybe_null_out(child, pruned_type(f.dataType, depth + 1), depth + 1)
                fields.append(child.alias(f.name))
            rebuilt = F.struct(*fields)
            return F.when(col.isNull(), F.lit(None)).otherwise(rebuilt)
        if isinstance(dtype, T.ArrayType):
            elem_t = dtype.elementType
            out = col
            if can_recurse(depth) and isinstance(elem_t, (T.StructType, T.ArrayType, T.MapType)):
                out = F.transform(out, lambda x: rewrite(x, elem_t, depth + 1))
            if can_filter(depth + 1):
                if val_pred is not None and not isinstance(elem_t, (T.StructType, T.MapType)):
                    out = F.filter(out, lambda x: ~F.coalesce(val_pred(x, elem_t), F.lit(False)))
                if remove_empty:
                    new_elem_t = pruned_type(elem_t, depth + 1)
                    out = F.filter(
                        out,
                        lambda x: ~_is_empty_expr(
                            x, new_elem_t, depth + 1, can_recurse
                        ),
                    )
            return out
        if isinstance(dtype, T.MapType) and can_filter(depth + 1):
            out = col
            vt = dtype.valueType
            # key removal reaches map ENTRIES (the reference treats a dict
            # child as any other Mapping and filters its keys); string
            # keys only — non-string key types can't match str names
            # under Python equality anyway
            if key_names and isinstance(dtype.keyType, T.StringType):
                out = F.map_filter(
                    out, lambda k, v: ~k.isin(*key_names)
                )
            # recurse into container-typed values (reference recursion
            # enters dict children normally); a value type that would
            # lose every field is left unrewritten — the empty-struct
            # schema deviation, same as the struct-drop rule above
            if (
                can_recurse(depth + 1)
                and isinstance(vt, (T.StructType, T.ArrayType, T.MapType))
                and not would_drop(vt, depth + 1)
            ):
                out = F.transform_values(
                    out, lambda k, v: rewrite(v, vt, depth + 1)
                )
                vt_after = pruned_type(vt, depth + 1)
            else:
                vt_after = vt
            if val_pred is not None:
                out = F.map_filter(out, lambda k, v: ~F.coalesce(val_pred(v, vt), F.lit(False)))
            if remove_empty:
                out = F.map_filter(
                    out,
                    lambda k, v: ~_is_empty_expr(
                        v, vt_after, depth + 1, can_recurse
                    ),
                )
            return out
        return col

    def maybe_null_out(col: Column, dtype: T.DataType, depth: int) -> Column:
        """Value-level removal for non-container positions: null out."""
        if not can_filter(depth):
            return col
        conds: list[Column] = []
        if val_pred is not None and not isinstance(
            dtype, (T.StructType, T.ArrayType, T.MapType)
        ):
            conds.append(F.coalesce(val_pred(col, dtype), F.lit(False)))
        if remove_empty:
            conds.append(_is_empty_expr(col, dtype, depth, can_recurse))
        if not conds:
            return col
        cond = conds[0]
        for c in conds[1:]:
            cond = cond | c
        return F.when(cond, F.lit(None)).otherwise(col)

    select_list: list[Column] = []
    for field in df.schema.fields:
        if can_filter(0) and drop_key(field.name):
            continue
        if would_drop(field.dataType, 0):
            continue
        out = rewrite(F.col(field.name), field.dataType, 0)
        out = maybe_null_out(out, pruned_type(field.dataType, 0), 0)
        select_list.append(out.alias(field.name))
    return df.select(*select_list)
