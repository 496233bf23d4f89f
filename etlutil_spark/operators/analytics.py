"""Event-sequence analytics: ordered funnels and cohort retention.

The behavioral-analytics layer over the events table — the two query
shapes every product/growth pipeline runs and the reference (a
record-at-a-time dict toolkit) has no notion of: "how many users made it
through view -> click -> purchase IN ORDER?" and "of the users who
arrived in week W, how many were still active k weeks later?".

Scale design: both operators are chains of per-user aggregations — every
stage is a keyed shuffle on user_id (never a window over collected
per-user event arrays, which at 100 TB would buffer whale users'
histories in executor memory). The funnel's strictly-ordered semantics
come from re-aggregating against the previous stage's timestamp, so
stage k costs one join + one groupBy on the SAME user_id key — AQE
reuses the partitioning across stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from etlutil_spark.operators.util import pin
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strictly-ordered funnel: (step, step_idx, n_users) where a user
    counts for step k only with an event of type steps[k] STRICTLY AFTER
    their earliest qualifying chain through steps[0..k-1].

    Semantics pin: each stage anchors on the EARLIEST qualifying
    timestamp of the previous stage (the standard greedy funnel — a
    later anchor can only lose conversions, never gain them, so greedy
    is exact for "did the ordered sequence happen?").

    One shuffle per step on the same user key; stage frames shrink
    monotonically, and each carries one row per surviving user. Each
    stage frame is pinned with a lazy checkpoint: it feeds BOTH its own
    count leg and the next stage's join, and without the pin the final
    union re-derives stage k's whole chain once per downstream leg
    (step i re-scans events i times — quadratic passes in |steps|)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    stage = None
    counts = []
    for i, step in enumerate(steps):
        matched = events.where(F.col(type_col) == step)
        if stage is not None:
            matched = matched.join(stage, user_col).where(
                F.col(ts_col) > F.col("_anchor")
            )
        stage = (
            matched.groupBy(user_col)
            .agg(F.min(ts_col).alias("_anchor"))
            .transform(pin)
        )
        counts.append(
            stage.select(
                F.lit(step).alias("step"),
                F.lit(i + 1).alias("step_idx"),
            ).groupBy("step", "step_idx").agg(F.count("*").alias("n_users"))
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def retention_cohorts(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: (cohort_period, period_offset, n_users) —
    users whose FIRST event falls in cohort_period and who are active
    again period_offset periods later (offset 0 = the cohort size).

    One distinct (user, period) pass with the cohort period attached by
    a per-user window-min (identical to the old min-aggregate + join
    back, including NULL-period rows, but the activity subtree is
    planned once and nothing corpus-proportional is broadcast); the
    final matrix aggregate is (cohorts x offsets)-sized, i.e. tiny. The
    window partitions on user over the user's DISTINCT periods —
    bounded by the calendar, so whale users cost nothing extra."""
    from pyspark.sql.window import Window

    p = F.date_trunc(period, F.col(ts_col)).cast("date")
    activity = events.select(F.col(user_col), p.alias("p")).distinct()
    days = {"week": 7, "day": 1}.get(period)
    if days is None:
        raise ValueError(f"unsupported period {period!r} (use 'week' or 'day')")
    return (
        activity.withColumn(
            "cohort_p", F.min("p").over(Window.partitionBy(user_col))
        )
        .select(
            "cohort_p",
            (F.datediff(F.col("p"), F.col("cohort_p")) / days)
            .cast("int")
            .alias("period_offset"),
        )
        .groupBy("cohort_p", "period_offset")
        .agg(F.count("*").alias("n_users"))
    )


def transition_matrix(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts between consecutive event
    types within each user's timeline: (prev_type, next_type, n, p) with
    p = n / SUM(n per prev_type), rounded to 6.

    The sequence-statistics primitive (what follows what?) behind
    next-action models and funnel hypothesis generation. One per-user
    lag window (ordered by ts with an explicit unique tiebreak, so the
    pair set is deterministic under timestamp ties) + a groupBy over the
    |types|^2-sized matrix; the per-prev_type normalization runs on that
    tiny aggregate, not the events."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        events.select(
            F.lag(type_col).over(w).alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n"))
    )
    row_tot = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(row_tot), 6).alias("p"),
    )


def rfm_scores(
    orders: DataFrame,
    *,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    as_of: str = "1998-12-31",
    n_buckets: int = 4,
) -> DataFrame:
    """Per-customer RFM (recency / frequency / monetary) quartile scores
    — the classic customer-segmentation primitive (score 1 = best
    quartile on every axis: most recent, most frequent, highest spend).

    Each score is an EXACT equal-count quantile bucket computed with
    quantiles.exact_ntile (range-repartition + rank offsets), never a
    global ``ntile() OVER (ORDER BY ...)`` — that plans as a
    single-partition window, the canonical scale-killer. The ntile runs
    over the per-customer AGGREGATE (one keyed shuffle bounds it by
    |customers|, not order volume), with the customer key as tiebreak so
    assignment is deterministic and bit-identical to ANSI NTILE.
    Descending axes (frequency, monetary) are expressed as negated
    ascending sort columns, which is exactly ``ORDER BY x DESC`` for the
    total order; monetary sums run as DECIMAL so they are exact and
    partition-order-independent."""
    from etlutil_spark.operators.quantiles import exact_ntile

    per_cust = (
        orders.groupBy(cust_col)
        .agg(
            F.datediff(
                F.lit(as_of).cast("date"), F.max(F.to_date(date_col))
            ).alias("recency_days"),
            F.count("*").alias("frequency"),
            F.sum(F.col(amount_col).cast("decimal(38,4)")).alias("monetary"),
        )
        .withColumn("_neg_f", -F.col("frequency"))
        .withColumn("_neg_m", -F.col("monetary"))
    )
    d = exact_ntile(per_cust, n_buckets, ["recency_days", cust_col], bucket_col="r_q")
    d = exact_ntile(d, n_buckets, ["_neg_f", cust_col], bucket_col="f_q")
    d = exact_ntile(d, n_buckets, ["_neg_m", cust_col], bucket_col="m_q")
    return d.drop("_neg_f", "_neg_m")


def basket_rules(
    baskets: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    top_n: int = 20,
) -> DataFrame:
    """Association rules over co-occurring items: for every directed
    item pair (antecedent -> consequent) seen together in at least
    ``min_pair_count`` baskets, emit support / confidence / lift, keep
    the ``top_n`` by lift (full deterministic tie-break).

    Scale shape: ONE basket-keyed shuffle collapses line volume to
    per-basket distinct item sets (collect_set — sets are small and
    bounded: a market basket, an order's distinct brands); pairs then
    explode MAP-SIDE from each set, so there is no self-join and no
    second pass over the data — the quadratic fan-out happens only
    within a basket's array, never across baskets. Item totals and the
    basket-count scalar come from the same lazily-checkpointed sets.
    The 1-row basket-count aggregate is the scalar-broadcast idiom;
    item counts (|items| rows) broadcast into the pair table.
    Lift/confidence are double divisions of exact integer counts —
    bit-identical in any engine and partition order."""
    sets = (
        baskets.select(basket_col, item_col)
        .where(F.col(item_col).isNotNull())
        .groupBy(basket_col)
        .agg(F.collect_set(item_col).alias("_items"))
        .transform(pin)
    )
    n_baskets = sets.groupBy().agg(F.count("*").alias("_nb"))
    # |items|-row totals consumed by both rule sides; pin so the explode
    # + count over the basket sets runs once
    item_counts = (
        sets.select(F.explode("_items").alias(item_col))
        .groupBy(item_col)
        .agg(F.count("*").alias("_ni"))
        .transform(pin)
    )
    pair_structs = F.filter(
        F.flatten(
            F.transform(
                "_items",
                lambda x: F.transform(
                    "_items", lambda y: F.struct(x.alias("a"), y.alias("c"))
                ),
            )
        ),
        lambda p: p["a"] != p["c"],
    )
    pairs = (
        sets.select(F.explode(pair_structs).alias("_p"))
        .select(
            F.col("_p.a").alias("antecedent"), F.col("_p.c").alias("consequent")
        )
        .groupBy("antecedent", "consequent")
        .agg(F.count("*").alias("n_pair"))
        .where(F.col("n_pair") >= min_pair_count)
    )
    ca = item_counts.select(
        F.col(item_col).alias("antecedent"), F.col("_ni").alias("_ca")
    )
    cb = item_counts.select(
        F.col(item_col).alias("consequent"), F.col("_ni").alias("_cb")
    )
    scored = (
        pairs.join(F.broadcast(ca), "antecedent")
        .join(F.broadcast(cb), "consequent")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "n_pair",
            F.round(F.col("n_pair") / F.col("_nb"), 6).alias("support"),
            F.round(F.col("n_pair") / F.col("_ca"), 6).alias("confidence"),
            F.round(
                (F.col("n_pair") * F.col("_nb"))
                / (F.col("_ca") * F.col("_cb")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(),
        F.col("confidence").desc(),
        F.col("antecedent").asc(),
        F.col("consequent").asc(),
    ).limit(top_n)


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group1,
    group2,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between ``group1`` and
    ``group2``'s value distributions: 1 row (n1, n2, u1, z) with the
    tie-corrected normal approximation — the nonparametric A/B test for
    skewed metrics (revenue per user, latency) where a t-test's
    normality assumption fails.

    Ranking never sorts the corpus through one task: rows collapse to
    the distinct-value table (one keyed aggregate), and the global
    running count over that table uses exact_cumsum's parallel-ranking
    recipe (range repartition + exact driver prefix offsets — see
    operators/quantiles.py), so every stage stays distributed even for
    a continuous value column whose distinct table is corpus-scale.
    Tie groups get the textbook average rank, kept integral as
    avg_rank*2 = 2*cum - n_v + 1; all sums are exact BIGINTs and the
    closed form is one fixed-shape double expression (z rounded at 6:
    sqrt ulp discipline)."""
    from etlutil_spark.operators.quantiles import exact_cumsum

    s = df.where(
        F.col(group_col).isin(group1, group2) & F.col(value_col).isNotNull()
    )
    pv = s.groupBy(value_col).agg(
        F.sum(F.when(F.col(group_col) == group1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1_v"),
        F.count("*").cast("bigint").alias("n_v"),
    )
    c = exact_cumsum(pv, "n_v", [value_col], cumsum_col="cum")
    agg = c.agg(
        F.sum("n1_v").cast("bigint").alias("n1"),
        F.sum("n_v").cast("bigint").alias("n"),
        F.sum(
            F.col("n1_v") * (F.lit(2) * F.col("cum") - F.col("n_v") + F.lit(1))
        )
        .cast("bigint")
        .alias("r1x2"),
        F.sum(F.col("n_v") * F.col("n_v") * F.col("n_v") - F.col("n_v"))
        .cast("bigint")
        .alias("ties"),
    )
    n1, n, r1x2, ties = F.col("n1"), F.col("n"), F.col("r1x2"), F.col("ties")
    u1 = (r1x2 - n1 * (n1 + F.lit(1))) / F.lit(2.0)
    z = (u1 - n1 * (n - n1) / F.lit(2.0)) / F.sqrt(
        n1 * (n - n1) / F.lit(12.0)
        * ((n + F.lit(1)) - ties.cast("double") / (n * (n - F.lit(1))))
    )
    return agg.select(
        n1.alias("n1"),
        (n - n1).cast("bigint").alias("n2"),
        u1.alias("u1"),
        F.round(z, 6).alias("z"),
    )
