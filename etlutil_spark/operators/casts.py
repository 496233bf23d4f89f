"""convert_dict_types lifted to DataFrames.

Reference: ``/root/reference/etlutil/data_structures.py:936-1180``
(``ConvertType`` enum + ``convert_dict_types`` + ``_convert_value``).

Per-key type rules become one ``df.withColumns`` projection of cast
expressions — a zero-shuffle map that Catalyst collapses into the scan.

Parity choices (documented deviations are inherent to a typed engine):
  - ``"3.14" -> 3``: int casts go via double then truncate toward zero,
    matching the reference's ``int(float(v))`` (data_structures.py:1097-1098).
  - bool follows the reference's type dispatch (data_structures.py:
    1110-1116): STRING columns are true iff the value is one of
    true/1/yes/on (case-insensitive) — "7" is false, never numeric-
    coerced; NUMERIC columns are value != 0; BOOLEAN passes through.
  - ``str`` of a boolean yields SQL casing ``"true"``/``"false"`` where the
    reference's Python ``str()`` yields ``"True"``/``"False"`` — the one
    intentional repr-level deviation (columnar engines standardize on SQL
    literals; documented rather than emulated).
  - lenient mode (default): failed casts yield NULL. The reference keeps the
    original *value*; a typed column cannot hold both — callers who need the
    original can pass ``keep_original=True`` to retain ``<col>__raw``.
  - strict mode: any row that fails to cast raises at execution time
    (distributed check via conditional raise_error, same contract as the
    reference's strict=True).
  - epoch conversions assume UTC (session TZ is pinned; the reference used
    local time, see SURVEY §7.4).
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# single-letter fields accept BOTH padded and unpadded components
# ("2024-1-5 9:05:07" and "2024-01-05 09:05:07"), matching Python
# strptime's %m/%d/%H behavior in the reference's default format list
DEFAULT_DATETIME_FORMATS = (
    "yyyy-M-d H:m:s",
    "yyyy-M-d'T'H:m:s",
    "yyyy-M-d",
)


class ConvertType(Enum):
    INT = "int"
    FLOAT = "float"
    BOOL = "bool"
    DATE = "date"
    DATETIME = "datetime"
    TIMESTAMP = "timestamp"
    TIMESTAMP_TO_ISO = "timestamp_to_iso"
    TIMESTAMP_TO_ISO_DATE = "timestamp_to_iso_date"
    TIMESTAMP_TO_ISO_YYYY_MM = "timestamp_to_iso_YYYY-MM"
    TIMESTAMP_TO_ISO_YYYY = "timestamp_to_iso_YYYY"
    STR = "str"


_TRUE_WORDS = ("true", "1", "yes", "on")


def cast_expr(
    col: Column,
    target: str | ConvertType,
    *,
    datetime_formats: tuple[str, ...] = DEFAULT_DATETIME_FORMATS,
    empty_string_to_none: bool = False,
    source_type: T.DataType | None = None,
) -> Column:
    """Build the conversion expression for one column (lenient: NULL on fail).

    ``source_type`` drives the reference's type-dispatched rules where the
    VALUE's Python type picked the branch (a typed column's dtype is the
    faithful analog). Today only ``bool`` dispatches on it; omitting it
    applies the string rule."""
    t = target.value if isinstance(target, ConvertType) else target
    c = col
    if empty_string_to_none:
        c = F.when(c.cast("string") == "", F.lit(None)).otherwise(c)
    else:
        # reference leaves "" untouched; for string targets that is already
        # the case, for numeric targets "" -> NULL is the only typed option
        pass

    if t == "int":
        return c.try_cast("double").try_cast("bigint")
    if t == "float":
        return c.try_cast("double")
    if t == "bool":
        # reference dispatches on the VALUE's type (data_structures.py:
        # 1110-1116): a STRING is true iff it is one of the four words —
        # "7" or "3.5" is False, never numeric-coerced; a NUMBER is
        # value != 0. The column dtype is the typed-engine analog of that
        # dispatch (an earlier revision numeric-coerced unrecognized
        # strings, silently flipping "2" to True).
        if isinstance(source_type, T.BooleanType):
            return c
        if isinstance(source_type, T.NumericType):
            return F.when(c.isNull(), F.lit(None).cast("boolean")).otherwise(
                c != 0
            )
        s = F.lower(c.cast("string"))
        return (
            # "" stays untouched in the reference (a string the typed
            # column cannot hold) — NULL, not False, like the numeric
            # targets' ""-handling
            F.when(s.isNull() | (s == ""), F.lit(None).cast("boolean"))
            .otherwise(s.isin(*_TRUE_WORDS))
        )
    if t == "date":
        return c.try_cast("date")
    if t == "datetime":
        parsed = [F.try_to_timestamp(c.cast("string"), F.lit(f)) for f in datetime_formats]
        return F.coalesce(*parsed) if len(parsed) > 1 else parsed[0]
    if t == "timestamp":
        # fractional epochs keep sub-second precision, matching the
        # reference's datetime.fromtimestamp(float(v)) (an earlier
        # revision truncated through a bigint cast)
        return F.timestamp_seconds(c.try_cast("double"))
    if t.startswith("timestamp_to_iso"):
        ts = F.timestamp_seconds(c.try_cast("double"))
        if t == "timestamp_to_iso":
            # datetime.isoformat() appends ".ffffff" ONLY when the
            # fractional second is nonzero — mirror that exactly
            base = F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")
            frac = F.date_format(ts, "SSSSSS")
            return F.when(
                frac == "000000", base
            ).otherwise(F.concat(base, F.lit("."), frac))
        fmt = {
            "timestamp_to_iso_date": "yyyy-MM-dd",
            "timestamp_to_iso_YYYY-MM": "yyyy-MM",
            "timestamp_to_iso_YYYY": "yyyy",
        }[t]
        return F.date_format(ts, fmt)
    if t == "str":
        return c.cast("string")
    raise ValueError(f"unknown convert type {t!r}")


def _strict_wrap(orig: Column, converted: Column, col_name: str, t: str) -> Column:
    # distributed strict gate: original non-null but conversion null -> error
    failed = orig.isNotNull() & (orig.cast("string") != "") & converted.isNull()
    msg = F.concat(
        F.lit(f"strict convert failed for column {col_name!r} -> {t}: "),
        orig.cast("string"),
    )
    return F.when(failed, F.raise_error(msg)).otherwise(converted)


def convert_types(
    df: DataFrame,
    type_schema: dict[str, str | ConvertType],
    *,
    recursive: bool = False,
    strict: bool = False,
    empty_string_to_none: bool = False,
    datetime_formats: tuple[str, ...] = DEFAULT_DATETIME_FORMATS,
    keep_original: bool = False,
) -> DataFrame:
    """Apply per-column conversions; unmatched columns pass through.

    ``recursive=True`` also rewrites matching field names inside struct
    columns and arrays of structs (the reference's recursive descent,
    data_structures.py:1018-1029).
    """
    updates: dict[str, Column] = {}
    originals: dict[str, Column] = {}

    for field in df.schema.fields:
        name = field.name
        if name in type_schema:
            expr = cast_expr(
                F.col(name),
                type_schema[name],
                datetime_formats=datetime_formats,
                empty_string_to_none=empty_string_to_none,
                source_type=field.dataType,
            )
            if strict:
                expr = _strict_wrap(F.col(name), expr, name,
                                    str(type_schema[name]))
            updates[name] = expr
            if keep_original:
                originals[f"{name}__raw"] = F.col(name)
        elif recursive and isinstance(field.dataType, (T.StructType, T.ArrayType)):
            rewritten = _rewrite_nested(
                F.col(name), field.dataType, type_schema,
                datetime_formats, empty_string_to_none,
            )
            if rewritten is not None:
                updates[name] = rewritten

    out = df.withColumns(updates) if updates else df
    if originals:
        out = out.withColumns(originals)
    return out


def _rewrite_nested(
    col: Column,
    dtype: T.DataType,
    type_schema: dict[str, str | ConvertType],
    datetime_formats: tuple[str, ...],
    empty_string_to_none: bool,
) -> Column | None:
    """Rebuild a struct/array column with schema-matched fields converted.

    Returns None when nothing inside matches (avoids a useless rewrite that
    would widen the projection)."""
    if not _struct_has_match(dtype, type_schema):
        return None
    return _rewrite_nested_value(col, dtype, type_schema, datetime_formats, empty_string_to_none)


def _struct_has_match(dtype: T.DataType, type_schema: dict[str, str | ConvertType]) -> bool:
    if isinstance(dtype, T.ArrayType):
        return _struct_has_match(dtype.elementType, type_schema)
    if isinstance(dtype, T.StructType):
        return any(
            f.name in type_schema or _struct_has_match(f.dataType, type_schema)
            for f in dtype.fields
        )
    return False


def _rewrite_nested_value(
    value: Column,
    dtype: T.DataType,
    type_schema: dict[str, str | ConvertType],
    datetime_formats: tuple[str, ...],
    empty_string_to_none: bool,
) -> Column:
    if isinstance(dtype, T.ArrayType):
        return F.transform(
            value,
            lambda x: _rewrite_nested_value(
                x, dtype.elementType, type_schema, datetime_formats, empty_string_to_none
            ),
        )
    if isinstance(dtype, T.StructType):
        fields = []
        for f in dtype.fields:
            child = value.getField(f.name)
            if f.name in type_schema:
                child = cast_expr(
                    child, type_schema[f.name],
                    datetime_formats=datetime_formats,
                    empty_string_to_none=empty_string_to_none,
                    source_type=f.dataType,
                )
            elif isinstance(f.dataType, (T.StructType, T.ArrayType)):
                child = _rewrite_nested_value(
                    child, f.dataType, type_schema, datetime_formats, empty_string_to_none
                )
            fields.append(child.alias(f.name))
        return F.struct(*fields)
    return value
