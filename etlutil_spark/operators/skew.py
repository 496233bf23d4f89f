"""Skew mitigation for joins and aggregations.

AQE's skew-join handling (``spark.sql.adaptive.skewJoin.enabled``, on in
session.get_spark) splits oversized shuffle partitions at runtime and is
the first line of defense. Salting is the explicit fallback for the cases
AQE can't fix — a broadcast-ineligible join where ONE key holds a double-
digit percent of all rows (the power-law head of user_id/domain/token
distributions in web-scale corpora):

  - fact side: append a salt in [0, n) to the key;
  - dim side: explode each row into all n salt values;
  - join on (key, salt) — the hot key's rows now spread over n partitions.

The salt is DETERMINISTIC: ``pmod(xxhash64(row columns), n)``. A
nondeterministic ``rand()`` ahead of a shuffle is the classic
retry-correctness hazard — when a task retries or a stage recomputes, the
recomputed partitions re-roll their salts and rows can be double-counted
or dropped. Content-derived salts reproduce identically on any replay, so
salted operators stay exactly-once under failures. (Rows identical in
every salt-input column share a salt — harmless: duplicates co-locating
does not change results, only worst-case balance for pathological
all-duplicate keys.)

Aggregation skew uses the two-phase form: partial agg on (key, salt), then
final agg on key — the map-side combine Spark already does for algebraic
aggregates, made explicit for things like collect_list where it doesn't.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from etlutil_spark.operators.util import pin
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SALT_COL = "_salt"

#: allowed phase-2 merge ops for :func:`salted_agg`; anything else (avg,
#: stddev, countDistinct, ...) is not mergeable from per-salt partials by a
#: single op and must be decomposed by the caller (avg = sum + count).
COMBINERS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def _salt_expr(df: DataFrame, n_salts: int, salt_on: list[str] | None) -> Column:
    cols = [F.col(c) for c in (salt_on or df.columns)]
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")


def with_salt(
    df: DataFrame,
    n_salts: int,
    *,
    salt_col: str = SALT_COL,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Deterministic salt in [0, n_salts) derived from row content
    (xxhash64 over ``salt_on`` columns, default: all columns). It only
    routes rows, never appears in results — but unlike ``rand()`` it
    reproduces identically on task retry / stage recompute."""
    return df.withColumn(salt_col, _salt_expr(df, n_salts, salt_on))


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
    aggs: dict[str, tuple[Column, str]],
    *,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    ``aggs`` maps each output name to an EXPLICIT ``(phase1, combiner)``
    pair: the phase-1 aggregate runs over raw rows grouped by
    (keys, salt); the combiner — one of ``'sum' | 'min' | 'max'`` — merges
    the per-salt partials per key. Making the combiner explicit (instead
    of inferring it from an alias prefix) turns the
    wrong-combiner-silently-wrong-answer footgun into a build-time
    ValueError: non-mergeable aggregates like ``avg`` have no valid
    combiner and must be decomposed (avg = sum partial / count partial,
    merged by sum each).

    For algebraic aggregates Spark's partial aggregation already does
    this; use salted_agg when a single key's group state (collect_list,
    exact distinct sets) must be split across tasks."""
    for name, pair in aggs.items():
        if not (isinstance(pair, tuple) and len(pair) == 2):
            raise TypeError(
                f"aggs[{name!r}] must be a (phase1_column, combiner) tuple; "
                f"got {type(pair).__name__}"
            )
        if pair[1] not in COMBINERS:
            raise ValueError(
                f"aggs[{name!r}]: unsupported combiner {pair[1]!r} — pick one "
                f"of {sorted(COMBINERS)}; non-mergeable aggregates (avg, "
                "stddev, countDistinct, ...) must be decomposed into "
                "mergeable partials"
            )
    phase1 = df.groupBy(
        *keys, _salt_expr(df, n_salts, None).alias(SALT_COL)
    ).agg(*[c.alias(name) for name, (c, _) in aggs.items()])
    merged = [COMBINERS[comb](name).alias(name) for name, (_, comb) in aggs.items()]
    return phase1.groupBy(*keys).agg(*merged)


def key_skew_report(
    df: DataFrame,
    key_cols: str | list[str],
    *,
    top_n: int = 20,
) -> DataFrame:
    """Skew diagnostic — the pre-flight audit behind every salting
    decision: the ``top_n`` hottest key values with their row counts,
    corpus share, and the global skew factor (hottest key's count over
    the mean per-key count). A skew_factor near 1 means AQE alone is
    fine; double digits on a broadcast-ineligible join key is the signal
    to reach for salted_join / salted_agg.

    One keyed count aggregate (map-side combined, so even the hottest
    key costs each task one row), a 1-row totals scalar broadcast back,
    and a TakeOrderedAndProject for the top-n — no full sort, no
    row-level shuffle beyond the count itself. NULL keys count as a key
    (a NULL-heavy join column is the most common skew of all).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    # the per-key count feeds the totals scalar AND the top-n heap; pin
    # it so the scan + count shuffle run once, not once per consumer
    counts = df.groupBy(*keys).agg(F.count("*").alias("n_rows")).transform(pin)
    totals = counts.agg(
        F.sum("n_rows").cast("bigint").alias("_total"),
        F.count("*").cast("bigint").alias("_n_keys"),
        F.max("n_rows").cast("bigint").alias("_max_n"),
    )
    top = counts.orderBy(F.col("n_rows").desc(), *[F.col(k).asc_nulls_last() for k in keys]).limit(
        top_n
    )
    j = top.join(F.broadcast(totals))
    w = Window.orderBy(F.col("n_rows").desc(), *[F.col(k).asc_nulls_last() for k in keys])
    return j.select(
        F.row_number().over(w).cast("int").alias("rank"),
        *keys,
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
        F.round(
            F.col("_max_n").cast("double") * F.col("_n_keys").cast("double") / F.col("_total").cast("double"),
            6,
        ).alias("skew_factor"),
    )
