"""Query catalog: every implemented operator exposed as a (spark_builder,
oracle_sql) pair for the driver's correctness gate.

Builders take ``(spark, sf_dir)`` and return a DataFrame; oracle SQL is ANSI
SQL DuckDB runs on the same parquet views. Column names are aliased
identically on both sides (the driver sorts columns by name before hashing).

Float policy: every floating-point aggregate goes through DECIMAL so the sum
is exact and order-independent, then casts back to DOUBLE — bit-identical in
Spark and DuckDB, immune to partition-order drift at any scale factor.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etlutil_spark.functions import dates as D
from etlutil_spark.functions.daterange import DateRange, DateRanges
from etlutil_spark.sources.testdata import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _dec(col, scale: int = 4):
    """Exact-sum helper: double -> decimal(38,scale)."""
    return F.col(col).cast(f"decimal(38,{scale})") if isinstance(col, str) else col.cast(f"decimal(38,{scale})")


# ---------------------------------------------------------------------------
# Analytics core: scan -> filter -> agg / joins / window / top-k
# (capabilities the reference lacked; Spark supplies them natively — SURVEY §2.3)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4)) * (1 - CAST(l_discount AS DECIMAL(38,4)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4)) * (1 - CAST(l_discount AS DECIMAL(38,4))) * (1 + CAST(l_tax AS DECIMAL(38,4)))) AS DOUBLE) AS sum_charge,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_price,
      CAST(CAST(SUM(CAST(l_discount AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape. One scan -> partial agg -> final agg; the shipdate
    filter pushes to parquet row-group stats; decimal sums keep results
    order-independent across any partition count."""
    li = load_table(spark, "lineitem", sf_dir)
    disc_price = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    charge = disc_price * (1 + _dec("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_top_orders",
    """
    SELECT
      l.l_orderkey AS o_orderkey,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,4)) * (1 - CAST(l.l_discount AS DECIMAL(38,4)))) AS DOUBLE) AS revenue,
      o.o_orderdate,
      o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension filter first, then join -> agg ->
    deterministic top-k (revenue DESC, key ASC tiebreak)."""
    c = load_table(spark, "customer", sf_dir).where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = load_table(spark, "lineitem", sf_dir).where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    revenue = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(l.l_orderkey.alias("o_orderkey"), "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    """
    SELECT
      n.n_name AS nation,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,4)) * (1 - CAST(l.l_discount AS DECIMAL(38,4)))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape. region/nation are broadcast (fixed-size dims); the
    fact-fact joins shuffle on their keys and AQE handles skew."""
    l = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = F.broadcast(load_table(spark, "nation", sf_dir))
    r = F.broadcast(
        load_table(spark, "region", sf_dir).where(F.col("r_name") == "ASIA")
    )
    revenue = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@register(
    "top_customers_per_segment",
    """
    SELECT c_mktsegment, c_custkey, c_name, rnk
    FROM (
      SELECT c_mktsegment, c_custkey, c_name,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer
    )
    WHERE rnk <= 5
    """,
)
def top_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function top-k per group (deterministic tiebreak on key)."""
    from pyspark.sql.window import Window

    c = load_table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("c_mktsegment", "c_custkey", "c_name", "rnk")
    )


# ---------------------------------------------------------------------------
# Date layer (reference date.py operators as data-parallel queries)
# ---------------------------------------------------------------------------


@register(
    "date_spine_days",
    """
    SELECT CAST(d AS DATE) AS d
    FROM generate_series(DATE '2024-01-01', DATE '2024-03-31', INTERVAL 1 DAY) AS t(d)
    """,
)
def date_spine_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """generate_date_array / GENERATE_DATE_ARRAY clone (date.py:70-155)."""
    return D.date_spine(spark, "2024-01-01", "2024-03-31", 1, "DAY")


@register(
    "date_spine_month_backward",
    # start + k*interval per element (BigQuery GENERATE_DATE_ARRAY semantics,
    # matches Spark's sequence; DuckDB's own generate_series compounds the
    # clamping so it is NOT equivalent)
    """
    SELECT CAST(DATE '2024-01-31' - (i * INTERVAL '2 months') AS DATE) AS d
    FROM generate_series(0, 6) AS t(i)
    """,
)
def date_spine_month_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative interval + month stepping (end-of-month aware)."""
    return D.date_spine(spark, "2024-01-31", "2023-01-31", -2, "MONTH")


@register(
    "events_monthly",
    """
    SELECT
      strftime(ts, '%Y-%m') AS ym,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(38,9))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def events_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """format_year_month (date.py:45-67) as a bucket key."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy(D.year_month("ts").alias("ym")).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,9)")).cast("double").alias("total_value"),
    )


@register(
    "events_weekly_buckets",
    """
    SELECT
      CAST(date_trunc('week', ts) AS DATE) AS week_start,
      COUNT(*) AS n_events,
      COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
    """,
)
def events_weekly_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monday-start weekly buckets (reference weeks are Mon-Sun)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy(D.week_start("ts").alias("week_start")).agg(
        F.count("*").alias("n_events"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
    )


@register(
    "events_relative_month_frame",
    """
    SELECT event_type,
           COUNT(*) AS n_events
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-02-01 00:00:00'
    GROUP BY event_type
    """,
)
def events_relative_month_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_relative_date_frame + half-open ts predicate (date.py:158-235,
    :429): the frame computed driver-side becomes pushed-down literals."""
    dr = DateRange.single_calendar_period("MONTH", 0, date_anchor="2024-01-15")
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.where(D.ts_in_range("ts", dr))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
    )


@register(
    "events_8_8_8_rest",
    """
    SELECT
      CASE WHEN day(ts) <= 8 THEN 1 WHEN day(ts) <= 16 THEN 2
           WHEN day(ts) <= 24 THEN 3 ELSE 4 END AS month_chunk,
      COUNT(*) AS n_events,
      COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
    """,
)
def events_8_8_8_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split_month_8_8_8_rest on data (date.py:714-753)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy(D.month_bucket_8_8_8_rest("ts").alias("month_chunk")).agg(
        F.count("*").alias("n_events"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
    )


@register(
    "events_backfill_chunks",
    """
    WITH chunks AS (
      SELECT
        DATE '2024-01-30' - CAST((i + 1) * 7 - 1 AS INTEGER) AS bucket_start,
        DATE '2024-01-30' - CAST(i * 7 AS INTEGER) AS bucket_end
      FROM generate_series(0, 4) AS t(i)
    )
    SELECT c.bucket_start, c.bucket_end, COUNT(*) AS n_events
    FROM events e
    JOIN chunks c
      ON CAST(e.ts AS DATE) BETWEEN c.bucket_start AND c.bucket_end
    GROUP BY 1, 2
    """,
)
def events_backfill_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DateRanges.split_lookback_period driving a chunked aggregation
    (date.py:907-956): 35 days back from 2024-01-30 in 7-day chunks; the
    chunk list is broadcast so the fact table never shuffles for the tag."""
    ranges = DateRanges().split_lookback_period(35, 7, date_end="2024-01-30")
    ev = load_table(spark, "events", sf_dir)
    return (
        D.range_bucket_join(ev, "ts", ranges)
        .groupBy("bucket_start", "bucket_end")
        .agg(F.count("*").alias("n_events"))
    )


@register(
    "events_calendar_periods",
    """
    WITH periods AS (
      SELECT CAST(date_trunc('week', DATE '2024-01-28' - CAST(i * 7 AS INTEGER)) AS DATE) AS bucket_start,
             LEAST(CAST(date_trunc('week', DATE '2024-01-28' - CAST(i * 7 AS INTEGER)) + INTERVAL 6 DAY AS DATE), DATE '2024-01-28') AS bucket_end
      FROM generate_series(0, 3) AS t(i)
    )
    SELECT p.bucket_start, p.bucket_end, COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(38,9))) AS DOUBLE) AS total_value
    FROM events e
    JOIN periods p ON CAST(e.ts AS DATE) BETWEEN p.bucket_start AND p.bucket_end
    GROUP BY 1, 2
    """,
)
def events_calendar_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DateRanges.calendar_periods (date.py:807-857): 4 Mon-Sun weeks ending
    2024-01-28, most-recent trimmed, driving a per-period rollup."""
    ranges = DateRanges().calendar_periods("WEEK", 4, date_end="2024-01-28")
    ev = load_table(spark, "events", sf_dir)
    return (
        D.range_bucket_join(ev, "ts", ranges)
        .groupBy("bucket_start", "bucket_end")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,9)")).cast("double").alias("total_value"),
        )
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver smoke-check query: q1 pricing summary at the given sf."""
    return q1_pricing_summary(spark, sf_dir)
