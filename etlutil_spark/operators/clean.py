"""clean_dict (PII scrubbing) lifted to DataFrames.

Reference: ``/root/reference/etlutil/data_structures.py:1204-1474``.

Targets columns/nested fields by name at any depth (structs and arrays of
structs) with five modes:

  replace           literal marker string (default "replaced (etl)")
  hash              SHA-256 hex of the string value (F.sha2 — JVM built-in)
  farm_fingerprint  64-bit fingerprint. Native analog is F.xxhash64; the
                    reference uses FarmHash64 (data_structures.py:1348-1353)
                    whose bit-exact parity would need a pandas_udf over a
                    farmhash lib — xxhash64 is the documented default.
  empty             NULL
  delete            drop the field (schema-level removal). With skip
                    rules for the key, deletion is row-dependent in the
                    reference (skipped/empty values survive) — the typed
                    analog switches to EMPTY semantics: NULL the deleted
                    values, keep skipped/empty originals. Without skip
                    rules the column drops entirely; the reference's
                    ""/None survival under delete collapses with it
                    (schema-level deviation, same class as empty-struct
                    drops).

Hashing a CONTAINER-typed value hashes Spark's string cast of it, not
Python's ``repr`` bytes (data_structures.py:1336-1341) — same 64-hex
shape, different digests. Byte-level repr parity would need a per-row
Python UDF; documented deviation.

Per-key skip rules are value allowlists compiled to Column predicates
(bare str = suffix match, reference :1397-1403). NULL/"" values under
targeted keys are never cleaned (reference :1259, :1325-1333). Global
``truncate_strings`` applies to every string leaf INCLUDING replacement
markers (reference behavior).

Everything is one projection — no shuffle, full codegen.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping
from enum import Enum
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etlutil_spark.functions.hashing import fingerprint64, md5_bigint, sha256_hex

DEFAULT_REPLACEMENT = "replaced (etl)"
DEFAULT_TRUNCATION_SUFFIX = "… truncated (etl)"


class CleanMode(str, Enum):
    REPLACE = "replace"
    HASH = "hash"
    FARM_FINGERPRINT = "farm_fingerprint"
    # portable 60-bit md5 fingerprint (functions/hashing.py:md5_bigint):
    # identical formula runs in any SQL engine, so this mode is
    # oracle-checkable where farm_fingerprint (xxhash64) is Spark-only
    FINGERPRINT_PORTABLE = "fingerprint_portable"
    EMPTY = "empty"
    DELETE = "delete"


def _normalize_rules(entry: Any) -> list[Any]:
    """Reference entry normalization (data_structures.py:1366-1378): a
    whole-entry None is ignored, a SCALAR spec (str / mapping / callable)
    is one rule — NOT iterated (a bare "@corp.com" must not decay into
    per-character suffix rules) — and a sequence is a list of specs with
    None members dropped."""
    if entry is None:
        return []
    if isinstance(entry, str) or isinstance(entry, Mapping) or callable(entry):
        return [entry]
    return [r for r in entry if r is not None]


def _skip_predicate(
    rules: Iterable[Any], col: Column, dtype: T.DataType
) -> Column | None:
    """Compile skip rules to an OR of Column predicates.

    Accepts BOTH the reference's SkipRuleConfig form ({"match": "suffix",
    "value": ...}, {"match": "regex", "pattern": ...}, {"match":
    "callable", "func": ...} — data_structures.py:1387-1463) and this
    module's original shorthand ({"suffix": ...} etc.); a bare str is a
    suffix rule. The reference's string-form predicates require
    ``isinstance(value, str)`` — non-string values never match — so
    suffix/prefix/regex rules yield False on non-string columns instead
    of matching a string-cast (142 must not match suffix "42"). equals
    compares the RAW column (Python ``==`` semantics). callable -> the
    Spark lift of the reference's Python-callable rules: it receives the
    COLUMN (string-cast) and must return a boolean Column expression,
    e.g. ``lambda c: F.length(c) < 5``. Expression-valued, so it stays
    JVM-side — a row-at-a-time Python predicate has no place in a
    100 TB projection.
    """
    preds: list[Column] = []
    is_str_col = isinstance(dtype, T.StringType)
    s = col.cast("string")

    def _callable_pred(fn: Any) -> Column:
        out = fn(s)
        if not isinstance(out, Column):
            raise TypeError(
                "callable skip rule must return a pyspark Column "
                f"predicate, got {type(out).__name__}"
            )
        return out

    def _equals_form(value: Any) -> Column:
        # Python == is type-gated (5 == "5" is False, but False == 0 is
        # True) — mirror prune's compatibility rules instead of letting
        # Spark coerce a string column to the literal's type
        if value is None:
            return col.isNull()
        if isinstance(value, bool):
            ok = isinstance(dtype, (T.BooleanType, T.NumericType))
        elif isinstance(value, (int, float)):
            ok = isinstance(dtype, (T.NumericType, T.BooleanType))
        elif isinstance(value, str):
            ok = is_str_col
        else:
            ok = False
        if not ok:
            return F.lit(False)
        if isinstance(dtype, T.BooleanType) and not isinstance(value, bool):
            return col.cast("int").eqNullSafe(F.lit(value))
        if isinstance(dtype, T.NumericType) and isinstance(value, bool):
            return col.eqNullSafe(F.lit(int(value)))
        return col.eqNullSafe(F.lit(value))

    def _string_form(kind: str, value: Any) -> Column:
        if not isinstance(value, str):
            raise TypeError(f"{kind} skip rule requires a string value")
        if not is_str_col:
            return F.lit(False)  # reference: non-str values never match
        if kind == "suffix":
            return s.endswith(value)
        if kind == "prefix":
            return s.startswith(value)
        return s.rlike(value)  # regex, re.search semantics

    for rule in rules:
        if isinstance(rule, str):
            preds.append(_string_form("suffix", rule))
        elif callable(rule) and not isinstance(rule, Mapping):
            preds.append(_callable_pred(rule))
        elif isinstance(rule, Mapping):
            if "match" in rule:  # reference SkipRuleConfig form
                match = rule["match"]
                if match in ("suffix", "prefix"):
                    preds.append(_string_form(match, rule.get("value")))
                elif match == "regex":
                    preds.append(_string_form("regex", rule.get("pattern")))
                elif match == "equals":
                    preds.append(_equals_form(rule.get("value")))
                elif match == "callable":
                    fn = rule.get("func")
                    if not callable(fn):
                        raise TypeError(
                            "callable skip rule requires callable 'func'"
                        )
                    preds.append(_callable_pred(fn))
                else:
                    raise ValueError(
                        f"Unsupported skip rule match type: {match!r}"
                    )
            elif "suffix" in rule:
                preds.append(_string_form("suffix", rule["suffix"]))
            elif "prefix" in rule:
                preds.append(_string_form("prefix", rule["prefix"]))
            elif "equals" in rule:
                preds.append(_equals_form(rule["equals"]))
            elif "regex" in rule:
                preds.append(_string_form("regex", rule["regex"]))
            else:
                raise ValueError(f"bad skip rule: {rule!r}")
        else:
            raise TypeError(f"unsupported skip rule type: {type(rule)}")
    if not preds:
        return None
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def clean_columns(
    df: DataFrame,
    *,
    keys_to_clean: Iterable[str],
    clean_mode: CleanMode | str,
    skip_rules: Mapping[str, Iterable[Any]] | None = None,
    truncate_strings: int | None = None,
    replacement_marker: str = DEFAULT_REPLACEMENT,
    truncation_suffix: str = DEFAULT_TRUNCATION_SUFFIX,
) -> DataFrame:
    mode = CleanMode(clean_mode)
    targets = set(keys_to_clean)
    skips = dict(skip_rules or {})

    def cleaned_value(
        col: Column, name: str, dtype: T.DataType, mode: CleanMode
    ) -> Column:
        if mode is CleanMode.REPLACE:
            new = F.lit(replacement_marker)
        elif mode is CleanMode.HASH:
            new = sha256_hex(col)
        elif mode is CleanMode.FARM_FINGERPRINT:
            new = fingerprint64(col)
        elif mode is CleanMode.FINGERPRINT_PORTABLE:
            new = md5_bigint(col)
        elif mode is CleanMode.EMPTY:
            new = F.lit(None).cast(dtype if not isinstance(dtype, T.StringType) else "string")
        else:  # pragma: no cover - DELETE handled structurally
            raise AssertionError
        # NULL / empty values under a targeted key are never cleaned; for
        # container types "empty" is the zero-length container, matching
        # the reference's _value_is_empty (data_structures.py:1325-1333)
        # — its string-cast ("[]", "{}") is not "" so the string test
        # alone would clean an empty array the reference leaves alone
        if isinstance(dtype, (T.ArrayType, T.MapType)):
            is_empty = col.isNull() | (F.size(col) == 0)
        else:
            is_empty = col.isNull() | (col.cast("string") == "")
        guarded = F.when(is_empty, col.cast(_result_type(dtype, mode))).otherwise(new)
        pred = _skip_predicate(
            _normalize_rules(skips.get(name)), col, dtype
        )
        if pred is not None:
            guarded = F.when(pred, col.cast(_result_type(dtype, mode))).otherwise(guarded)
        return guarded

    def _result_type(dtype: T.DataType, mode: CleanMode) -> str:
        if mode in (CleanMode.FARM_FINGERPRINT, CleanMode.FINGERPRINT_PORTABLE):
            return "bigint"
        if mode is CleanMode.EMPTY:
            return dtype.simpleString()
        return "string"

    def truncate(col: Column) -> Column:
        if truncate_strings is None:
            return col
        return F.when(
            F.length(col) > truncate_strings,
            F.concat(F.substring(col, 1, truncate_strings), F.lit(truncation_suffix)),
        ).otherwise(col)

    def rewrite(col: Column, name: str, dtype: T.DataType) -> Column | None:
        """Returns the rewritten column or None when DELETE removes it."""
        if name in targets:
            eff_mode = mode
            if mode is CleanMode.DELETE:
                if not _normalize_rules(skips.get(name)):
                    # total deletion: drop the field from the schema (the
                    # dict-world "key absent" vs "key present but empty"
                    # distinction collapses here — reference keeps ""/None
                    # under delete; documented schema-level deviation)
                    return None
                # skip rules make deletion ROW-DEPENDENT (the reference
                # keeps skipped and empty values under delete,
                # data_structures.py:1295-1300) — a typed column cannot
                # vanish per row, so the analog is EMPTY semantics: NULL
                # the deleted values, keep skipped/empty originals
                eff_mode = CleanMode.EMPTY
            out = cleaned_value(col, name, dtype, eff_mode)
            if eff_mode in (CleanMode.REPLACE, CleanMode.HASH) or (
                # EMPTY keeps the original string on the skip/empty paths;
                # the reference truncates EVERY surviving string
                # (process_container runs on skipped values too)
                eff_mode is CleanMode.EMPTY
                and isinstance(dtype, T.StringType)
            ):
                out = truncate(out)  # truncation also hits replacements
            return out
        if isinstance(dtype, T.StructType):
            fields = []
            for f in dtype.fields:
                child = rewrite(col.getField(f.name), f.name, f.dataType)
                if child is not None:
                    fields.append(child.alias(f.name))
            return F.struct(*fields) if fields else F.lit(None)
        if isinstance(dtype, T.ArrayType) and (
            isinstance(dtype.elementType, (T.StructType, T.ArrayType))
            # arrays of strings truncate element-wise: the reference's
            # process_container recurses into lists and truncates every
            # string it finds (data_structures.py:1273-1282)
            or (
                isinstance(dtype.elementType, T.StringType)
                and truncate_strings is not None
            )
        ):

            def rebuild(x: Column) -> Column:
                out = rewrite(x, "", dtype.elementType)
                return out if out is not None else F.lit(None)

            return F.transform(col, rebuild)
        if isinstance(dtype, T.StringType) and truncate_strings is not None:
            return truncate(col)
        return col

    select_list: list[Column] = []
    for field in df.schema.fields:
        out = rewrite(F.col(field.name), field.name, field.dataType)
        if out is not None:
            select_list.append(out.alias(field.name))
    return df.select(*select_list)
