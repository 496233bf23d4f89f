"""Skew mitigation for joins and aggregations.

AQE's skew-join handling (``spark.sql.adaptive.skewJoin.enabled``, on in
session.get_spark) splits oversized shuffle partitions at runtime and is
the first line of defense. Salting is the explicit fallback for the cases
AQE can't fix — a broadcast-ineligible join where ONE key holds a double-
digit percent of all rows (the power-law head of user_id/domain/token
distributions in web-scale corpora):

  - fact side: append a uniform salt in [0, n) to the key;
  - dim side: explode each row into all n salt values;
  - join on (key, salt) — the hot key's rows now spread over n partitions.

Aggregation skew uses the two-phase form: partial agg on (key, salt), then
final agg on key — the map-side combine Spark already does for algebraic
aggregates, made explicit for things like collect_list where it doesn't.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, n_salts: int, *, salt_col: str = SALT_COL) -> DataFrame:
    """Uniform random salt in [0, n_salts). Non-deterministic by design —
    it only routes rows, never appears in results."""
    return df.withColumn(salt_col, (F.rand() * n_salts).cast("int"))


def explode_salt(df: DataFrame, n_salts: int, *, salt_col: str = SALT_COL) -> DataFrame:
    """Replicate every row once per salt value (the build/dim side)."""
    return df.withColumn(
        salt_col, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join that spreads each join key over ``n_salts`` shuffle
    partitions: salt the fact side, explode the dim side, join on
    keys+salt, drop the salt. Semantically identical to
    ``fact.join(dim, on, how)`` for inner/left joins (each fact row meets
    each matching dim row exactly once — one salt value matches).

    Cost: dim side is written ``n_salts`` times into the shuffle. Worth it
    exactly when the hot key's partition would otherwise exceed executor
    memory; pick n_salts ~ (hot-key rows / healthy-partition rows)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    f = with_salt(fact, n_salts)
    d = explode_salt(dim, n_salts)
    return f.join(d, on + [SALT_COL], how).drop(SALT_COL)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    *,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation for skewed keys, for aggregates where the
    partial/final split is expressible: pass phase-1 expressions in
    ``aggs`` (name -> Column over raw rows); phase 2 re-aggregates the
    named partials with the matching combiner, which the caller selects by
    convention: sum->sum, count->sum, min->min, max->max.

    For algebraic aggregates Spark's partial aggregation already does
    this; use salted_agg when a single key's groups state (collect_list,
    exact distinct sets) must be split across tasks."""
    phase1 = df.groupBy(
        *keys, (F.rand() * n_salts).cast("int").alias(SALT_COL)
    ).agg(*[c.alias(name) for name, c in aggs.items()])
    # combiner convention: the phase-1 alias encodes the merge op
    merged = []
    for name in aggs:
        if name.startswith(("min_",)):
            merged.append(F.min(name).alias(name))
        elif name.startswith(("max_",)):
            merged.append(F.max(name).alias(name))
        else:  # sums and counts both merge by sum
            merged.append(F.sum(name).alias(name))
    return phase1.groupBy(*keys).agg(*merged)
