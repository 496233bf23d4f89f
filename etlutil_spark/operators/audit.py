"""Data-quality audits: the checks a pipeline runs BEFORE trusting a
batch — referential integrity (orphaned foreign keys), NULL keys,
primary-key uniqueness. All expressed as aggregates over joins so they
run at any scale; results are tiny per-relation summary rows that feed
an alerting sink, never row-level dumps.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fk_orphan_counts(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Per-relation referential-integrity summary.

    ``relations``: (name, child_df, child_key, parent_df, parent_key)
    tuples, where ``parent_key`` is unique in the parent (a primary
    key — duplicates would double-count children). For each relation,
    ONE pass over the child: a left join against the parent's key
    column (Catalyst broadcasts dimension-sized parents; AQE handles
    the fact-fact cases), then conditional counts — total children,
    NULL child keys (can never match; reported separately, not as
    orphans), and orphans (non-NULL keys with no parent).

    Returns (relation, n_children, n_null_keys, n_orphans) — a bounded
    |relations|-row frame regardless of data volume.

    Consecutive relations sharing the same child frame (by object
    identity) fold into ONE pass: the child is scanned once with all of
    the group's key columns, each parent left-joined in turn, and one
    aggregate emits the group's summary structs — a fact table audited
    against k parents costs one scan, not k.

    The parent side of every join is its DISTINCT key projection (r12
    verdict item 4): the old fold left-joined the raw key column and
    leaned on the "parent keys are unique" contract — a parent that
    violated it would multiply child rows and silently corrupt
    n_children/n_null_keys for every OTHER relation in its group. The
    distinct makes multiplication structurally impossible (orphan-ness
    is key EXISTENCE, so the result is identical for honest parents and
    now also correct for dirty ones), and it costs no extra shuffle:
    the aggregation's hash partitioning on the key is exactly what the
    join needs (exchange reuse), and dimension-sized parents still
    broadcast after the distinct."""
    grouped: list[list[tuple[str, DataFrame, str, DataFrame, str]]] = []
    for rel in relations:
        if grouped and grouped[-1][0][1] is rel[1]:
            grouped[-1].append(rel)
        else:
            grouped.append([rel])
    parts = []
    for rels in grouped:
        child = rels[0][1]
        j = child.select(
            *[F.col(ck).alias(f"_k{i}") for i, (_, _, ck, _, _) in enumerate(rels)]
        )
        for i, (_, _, _, parent, pk) in enumerate(rels):
            # DISTINCT parent keys: orphan-ness is key existence, so this
            # is result-identical for unique-keyed parents and makes the
            # group-fold's row-multiplication failure mode (a dirty parent
            # corrupting every other relation's counts) structurally
            # impossible. The aggregate's hashpartitioning(pk) is exactly
            # the join's required distribution, so no extra join shuffle.
            j = j.join(
                parent.select(F.col(pk).alias(f"_p{i}")).distinct(),
                F.col(f"_k{i}") == F.col(f"_p{i}"),
                "left",
            )
        structs = [
            F.struct(
                F.lit(name).alias("relation"),
                F.count("*").cast("bigint").alias("n_children"),
                F.sum(F.col(f"_k{i}").isNull().cast("int"))
                .cast("bigint")
                .alias("n_null_keys"),
                F.sum(
                    (F.col(f"_k{i}").isNotNull() & F.col(f"_p{i}").isNull()).cast(
                        "int"
                    )
                )
                .cast("bigint")
                .alias("n_orphans"),
            )
            for i, (name, _, _, _, _) in enumerate(rels)
        ]
        parts.append(j.agg(F.array(*structs).alias("_a")).select(F.inline("_a")))
    return reduce(DataFrame.unionByName, parts)


def key_uniqueness(
    tables: list[tuple[str, DataFrame, str]],
) -> DataFrame:
    """Per-table primary-key audit: (table, n_rows, n_distinct_keys,
    n_duplicate_rows, n_null_keys). One aggregate per table; NULL keys
    are excluded from the distinct count (SQL COUNT(DISTINCT) semantics
    in both engines)."""
    parts = []
    for name, df, key in tables:
        c: Column = F.col(key)
        parts.append(
            df.agg(
                F.lit(name).alias("table_name"),
                F.count("*").cast("bigint").alias("n_rows"),
                F.countDistinct(c).cast("bigint").alias("n_distinct_keys"),
                (F.count(c) - F.countDistinct(c))
                .cast("bigint")
                .alias("n_duplicate_rows"),
                F.sum(c.isNull().cast("int")).cast("bigint").alias(
                    "n_null_keys"
                ),
            )
        )
    return reduce(DataFrame.unionByName, parts)


def value_rule_counts(
    tables: list[tuple[str, DataFrame, list[tuple[str, Column]]]],
) -> DataFrame:
    """Per-rule value-constraint audit: (relation, rule, n_rows,
    n_violations).

    ``tables``: (relation_name, df, [(rule_name, violation_predicate)])
    — the predicate is TRUE for a violating row (NULL counts as
    non-violating, SQL filter semantics). Each relation is scanned
    ONCE: every rule becomes a conditional SUM inside a single
    aggregate, then the 1-row result is unpivoted with ``stack`` into
    one row per rule. No shuffle carries row-level data — the only
    exchange moves |rules| summary rows per relation, so the audit
    costs one map-side pass per table at any scale."""
    parts = []
    for name, df, rules in tables:
        aggs = [F.count("*").cast("bigint").alias("_n")]
        for i, (_, pred) in enumerate(rules):
            aggs.append(
                F.sum(F.coalesce(pred.cast("int"), F.lit(0)))
                .cast("bigint")
                .alias(f"_v{i}")
            )
        one = df.agg(*aggs)
        pairs = ", ".join(
            f"'{rule}', _v{i}" for i, (rule, _) in enumerate(rules)
        )
        parts.append(
            one.select(
                F.lit(name).alias("relation"),
                F.expr(f"stack({len(rules)}, {pairs})").alias(
                    "rule", "n_violations"
                ),
                F.col("_n").alias("n_rows"),
            ).select("relation", "rule", "n_rows", "n_violations")
        )
    return reduce(DataFrame.unionByName, parts)


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    content_cols: list[str],
) -> DataFrame:
    """Release diff between two versions of a keyed dataset — the
    audit a corpus publisher runs before shipping v(N+1): how many
    rows were added, removed, changed (same id, different content),
    and unchanged. Content equality is a NULL-safe struct compare over
    ``content_cols`` (the scd2_intervals idiom), so NULL vs '' vs 0
    diffs are real diffs and NULL == NULL is unchanged.

    One full-outer keyed join is the whole plan — both sides shuffle
    once on the id (co-partitioned/bucketed stores join shuffle-free);
    the four counts reduce map-side. Returns one row:
    (n_old, n_new, n_added, n_removed, n_changed, n_unchanged)."""
    o = old.select(
        F.col(id_col),
        F.struct(*[F.col(c) for c in content_cols]).alias("_oc"),
    )
    n = new.select(
        F.col(id_col),
        F.struct(*[F.col(c) for c in content_cols]).alias("_nc"),
    )
    j = o.join(n, id_col, "full_outer")
    # count(), not sum(when) — SUM over ZERO rows is NULL, so diffing
    # two empty versions would report NULL counts instead of 0 (caught
    # by the hypothesis property test)
    return j.agg(
        F.count("_oc").cast("bigint").alias("n_old"),
        F.count("_nc").cast("bigint").alias("n_new"),
        F.count(
            F.when(F.col("_oc").isNull() & F.col("_nc").isNotNull(), F.lit(1))
        ).cast("bigint").alias("n_added"),
        F.count(
            F.when(F.col("_oc").isNotNull() & F.col("_nc").isNull(), F.lit(1))
        ).cast("bigint").alias("n_removed"),
        F.count(
            F.when(
                F.col("_oc").isNotNull()
                & F.col("_nc").isNotNull()
                & ~F.col("_oc").eqNullSafe(F.col("_nc")),
                F.lit(1),
            )
        ).cast("bigint").alias("n_changed"),
        F.count(
            F.when(F.col("_oc").eqNullSafe(F.col("_nc")), F.lit(1))
        ).cast("bigint").alias("n_unchanged"),
    )
