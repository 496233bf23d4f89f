"""Plan-inspection helpers: make plan QUALITY testable, not just results.

The 100 TB posture lives or dies on three plan properties — filters reach
the parquet scan, projections prune the read schema, and hot expressions
stay inside whole-stage codegen. These helpers parse
``df.explain("formatted")`` output so pytest can assert those properties
per operator (tests/test_plan_quality.py), turning "would this survive a
scale-up" from a review comment into CI.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The executed-plan string (AQE final plan when available)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema strings of every scan — assert column pruning."""
    return [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", formatted_plan(df))]


def scan_columns(df: DataFrame) -> set[str]:
    """Union of column names actually read from parquet."""
    cols: set[str] = set()
    for schema in read_schemas(df):
        cols.update(re.findall(r"(\w+):", schema))
    return cols


def _final_tree(plan: str) -> str:
    """The final-plan tree only: after execution AQE prints both '== Final
    Plan ==' and '== Initial Plan ==' trees — counting across both would
    double-count every operator."""
    if "== Final Plan ==" in plan:
        return plan.split("== Final Plan ==")[1].split("== Initial Plan ==")[0]
    return plan.split("\n\n")[0]


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators (excludes broadcast)."""
    tree = _final_tree(formatted_plan(df))
    return len(re.findall(r"(?<!Broadcast)Exchange \(\d+\)", tree))


def broadcast_count(df: DataFrame) -> int:
    tree = _final_tree(formatted_plan(df))
    return len(re.findall(r"BroadcastExchange \(\d+\)", tree))


def codegen_stage_count(df: DataFrame, *, execute: bool = True) -> int:
    """Distinct WholeStageCodegen spans in the (AQE-final) plan.

    Under AQE the pre-execution formatted plan omits codegen annotations,
    so by default the DataFrame is executed first — collect() specifically:
    it drives THIS DataFrame's QueryExecution to its AQE final plan (a
    count()/noop-write would plan a separate query and leave this one
    unannotated). Meant for test-sized frames."""
    if execute:
        df.collect()
    plan = formatted_plan(df)
    # formatted mode marks codegen membership as "[codegen id : N]";
    # simple mode as "WholeStageCodegen (N)" — accept either
    ids = re.findall(r"codegen id : (\d+)", plan)
    ids += re.findall(r"WholeStageCodegen \((\d+)\)", plan)
    return len(set(ids))


def assert_compiles_within_codegen_limits(df: DataFrame) -> None:
    """Execute with janino fallback disabled: a stage whose generated code
    exceeds the 64KB method limit raises instead of silently interpreting."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        df.write.format("noop").mode("overwrite").save()
    finally:
        spark.conf.set("spark.sql.codegen.fallback", prev)


def assert_pushdown(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in some pushed filter."""
    filters = " | ".join(pushed_filters(df))
    missing = [f for f in fragments if f not in filters]
    assert not missing, f"filters not pushed to scan: {missing}; got [{filters}]"


def assert_scan_pruned(df: DataFrame, allowed: set[str]) -> None:
    """Assert no scan reads columns outside ``allowed``."""
    extra = scan_columns(df) - set(allowed)
    assert not extra, f"scan reads unpruned columns: {sorted(extra)}"
