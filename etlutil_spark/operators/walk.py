"""walk lifted to Spark: structure introspection utilities.

Reference: ``/root/reference/etlutil/data_structures.py:243-652``. The
reference's ASCII tree over one record is near-isomorphic to Spark's
``printSchema``; the Spark lift is metadata-first:

  - :func:`schema_tree`  — ASCII tree of the schema with ├─/└─ connectors,
    depth limiting, and optional types/nullability (driver-side, no job).
  - :func:`sample_tree`  — the tree annotated with example values from ONE
    sampled row (`limit(1)` — a cheap single-partition job), with value
    truncation and max-items-per-container like the reference.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _connectors(n: int) -> list[str]:
    return ["├─ "] * (n - 1) + ["└─ "] if n else []


def _type_name(dtype: T.DataType) -> str:
    # containers get short tags (children render as tree nodes; a full
    # simpleString would leak grandchildren past max_depth)
    if isinstance(dtype, T.StructType):
        return "struct"
    if isinstance(dtype, T.ArrayType):
        return f"array<{_type_name(dtype.elementType)}>"
    if isinstance(dtype, T.MapType):
        return f"map<{_type_name(dtype.keyType)},{_type_name(dtype.valueType)}>"
    return dtype.simpleString()


def schema_tree(
    df: DataFrame,
    *,
    max_depth: int | None = None,
    show_types: bool = True,
    print_output: bool = True,
    writer=None,
) -> str:
    """ASCII tree of df.schema (metadata only — runs no job)."""

    lines: list[str] = ["root"]

    def walk(fields: list[T.StructField], prefix: str, depth: int) -> None:
        if max_depth is not None and depth > max_depth:
            return
        conns = _connectors(len(fields))
        for f, conn in zip(fields, conns):
            label = f.name
            if show_types:
                label += f": {_type_name(f.dataType)}"
                if not f.nullable:
                    label += " (required)"
            lines.append(prefix + conn + label)
            child_prefix = prefix + ("│  " if conn.startswith("├") else "   ")
            inner = _inner_struct(f.dataType)
            if inner is not None:
                walk(list(inner.fields), child_prefix, depth + 1)

    walk(list(df.schema.fields), "", 1)
    out = "\n".join(lines)
    if print_output:
        (writer or print)(out)
    return out


def _inner_struct(dtype: T.DataType) -> T.StructType | None:
    if isinstance(dtype, T.StructType):
        return dtype
    if isinstance(dtype, T.ArrayType) and isinstance(dtype.elementType, T.StructType):
        return dtype.elementType
    return None


def _render(value: Any, truncate_value_len: int | None) -> str:
    if isinstance(value, str):
        shown = value
        if truncate_value_len is not None and len(shown) > truncate_value_len:
            shown = shown[:truncate_value_len] + "…"
        return json.dumps(shown, ensure_ascii=False)
    return repr(value)


def sample_tree(
    df: DataFrame,
    *,
    max_depth: int | None = None,
    max_items_per_container: int | None = None,
    truncate_value_len: int | None = None,
    sort_keys: bool = True,
    print_output: bool = True,
    writer=None,
    _rows: list | None = None,
) -> str:
    """Tree of one sampled row's values (reference walk's data view).

    Containers beyond ``max_depth`` render as their type tag; sequences are
    truncated to ``max_items_per_container`` (mappings never are — reference
    behavior, data_structures.py:360-466). ``_rows`` lets walk_sample pass
    an already-collected sample so print and return describe the SAME row.
    """
    rows = df.limit(1).collect() if _rows is None else _rows
    lines: list[str] = ["root"]

    def children(value: Any) -> list[tuple[str, Any]] | None:
        if isinstance(value, dict):
            items = list(value.items())
            if sort_keys:
                items.sort(key=lambda kv: str(kv[0]))
            return [(str(k), v) for k, v in items]
        if hasattr(value, "asDict"):  # Row
            items = list(value.asDict().items())
            if sort_keys:
                items.sort(key=lambda kv: kv[0])
            return items
        if isinstance(value, (list, tuple)):
            items = list(enumerate(value))
            if max_items_per_container is not None:
                items = items[:max_items_per_container]
            return [(f"[{i}]", v) for i, v in items]
        return None

    def walk(pairs: list[tuple[str, Any]], prefix: str, depth: int) -> None:
        conns = _connectors(len(pairs))
        for (label, value), conn in zip(pairs, conns):
            kids = children(value)
            if kids is None:
                lines.append(prefix + conn + f"{label} = {_render(value, truncate_value_len)}")
                continue
            if max_depth is not None and depth >= max_depth:
                lines.append(prefix + conn + f"{label} = <{type(value).__name__}>")
                continue
            lines.append(prefix + conn + label)
            walk(kids, prefix + ("│  " if conn.startswith("├") else "   "), depth + 1)

    if rows:
        walk(children(rows[0]) or [], "", 1)
    out = "\n".join(lines)
    if print_output:
        (writer or print)(out)
    return out


def _as_plain(value: Any) -> Any:
    """Row -> dict so the collected copy is plain Python containers (the
    reference's record type)."""
    if hasattr(value, "asDict"):
        return {k: _as_plain(v) for k, v in value.asDict().items()}
    if isinstance(value, dict):
        return {k: _as_plain(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_as_plain(v) for v in value]
    if isinstance(value, tuple):
        return tuple(_as_plain(v) for v in value)
    return value


def collect_limited(
    value: Any,
    *,
    max_depth: int | None = None,
    max_items_per_container: int | None = None,
    sort_keys: bool = True,
    _depth: int = 0,
) -> Any:
    """The reference walk's collected-copy semantics
    (``/root/reference/etlutil/data_structures.py:360-466``) over one
    row's value tree:

      - containers at ``max_depth`` become EMPTY containers of the same
        kind (structure marker without contents — mirrors the printed
        form, which shows the container tag only);
      - mappings always process EVERY key (``max_items_per_container``
        does not apply to them);
      - sequences truncate to ``max_items_per_container``, preserving
        list vs tuple;
      - primitives (incl. strings — no truncation in the copy) pass
        through unchanged.
    """
    value = _as_plain(value)
    is_seq = isinstance(value, (list, tuple)) and not isinstance(value, (str, bytes))
    if max_depth is not None and _depth >= max_depth:
        if isinstance(value, dict):
            return {}
        if is_seq:
            return [] if isinstance(value, list) else ()
        return value
    if isinstance(value, dict):
        items = list(value.items())
        if sort_keys:
            items.sort(key=lambda kv: str(kv[0]))
        return {
            k: collect_limited(
                v,
                max_depth=max_depth,
                max_items_per_container=max_items_per_container,
                sort_keys=sort_keys,
                _depth=_depth + 1,
            )
            if isinstance(v, (dict, list, tuple)) and not isinstance(v, (str, bytes))
            else v
            for k, v in items
        }
    if is_seq:
        items = list(value)
        if max_items_per_container is not None:
            items = items[:max_items_per_container]
        out = [
            collect_limited(
                v,
                max_depth=max_depth,
                max_items_per_container=max_items_per_container,
                sort_keys=sort_keys,
                _depth=_depth + 1,
            )
            if isinstance(v, (dict, list, tuple)) and not isinstance(v, (str, bytes))
            else v
            for v in items
        ]
        return out if isinstance(value, list) else tuple(out)
    return value


def walk_sample(
    df: DataFrame,
    *,
    print_output: bool = True,
    max_depth: int | None = None,
    max_items_per_container: int | None = None,
    truncate_value_len: int | None = None,
    sort_keys: bool = True,
    writer=None,
) -> Any:
    """The reference ``walk`` contract on a DataFrame: print the value
    tree of ONE sampled row (optional) and ALWAYS return the collected,
    limit-applied copy as plain Python containers — print + return, same
    as ``data_structures.py:243-340``. Depth counting matches the
    reference (root container is depth 0, so ``max_depth=1`` keeps top-
    level keys and empties their child containers)."""
    # collect ONCE: limit(1) after a shuffle is nondeterministic across
    # jobs, so printing and returning must share the same sampled row
    rows = df.limit(1).collect()
    if print_output:
        sample_tree(
            df,
            max_depth=max_depth,
            max_items_per_container=max_items_per_container,
            truncate_value_len=truncate_value_len,
            sort_keys=sort_keys,
            print_output=True,
            writer=writer,
            _rows=rows,
        )
    if not rows:
        return None
    return collect_limited(
        rows[0],
        max_depth=max_depth,
        max_items_per_container=max_items_per_container,
        sort_keys=sort_keys,
    )
