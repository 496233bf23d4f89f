"""Watermarked stream-stream joins.

The streaming completion of the temporal-join family (operators/asof.py
is the batch form): correlate two live event streams — purchases with
the clicks that preceded them — without ever materializing either side.

How Spark bounds the state (the 100 TB-of-stream story): each side
buffers rows in the state store only until the OTHER side's watermark
plus the join's time bound passes them. Both inputs therefore MUST carry
a watermark, and the join condition MUST include a time-range predicate —
without them the state grows forever and Spark rejects the query
(inner joins) or can never emit (outer joins). Late rows beyond the
watermark are dropped, exactly like the windowed aggregations.

Semantics note vs ``asof_join``: the as-of join picks the SINGLE latest
left row; a stream-stream interval join emits EVERY pair inside the
tolerance window. Dedup to the latest click per purchase downstream if
as-of semantics are needed (a per-purchase max_by in the sink batch, or
`dropDuplicates` on the purchase key after a window) — picking "latest"
cannot be finalized until the watermark closes the interval, which is
why the primitive emits pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def preceding_interval_cond(
    key_a, key_b, ts_earlier, ts_later, tolerance: str
):
    """THE join predicate of this family — key equality plus
    ``ts_earlier in [ts_later - tolerance, ts_later]`` — factored out so
    every watermarked interval join in the package (clicks_before_
    purchases here, events.attribution_join_stream) shares one
    definition: a boundary or watermark-derivation fix lands everywhere
    at once instead of drifting between copies."""
    return (
        (F.col(key_a) == F.col(key_b))
        & (F.col(ts_earlier) >= F.expr(f"{ts_later} - INTERVAL {tolerance}"))
        & (F.col(ts_earlier) <= F.col(ts_later))
    )


def clicks_before_purchases(
    purchases: DataFrame,
    clicks: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tolerance: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Every (purchase, click) pair where the same key's click happened in
    ``[purchase.ts - tolerance, purchase.ts]``. Works identically on
    streaming frames (watermarked stream-stream join, bounded state) and
    batch frames (plain interval join) — the pytest equivalence contract.

    Output: key, purchase_id, purchase_ts, click_id, click_ts,
    lag_seconds (integer seconds, purchase - click).

    At scale the join shuffles both sides on the key; the time predicate
    prunes state/probe pairs. For batch backfills prefer
    ``operators/asof.asof_join`` when only the latest click matters — it
    is one sort-merge pass instead of a pair fan-out."""
    p = purchases.select(
        F.col(key_col).alias("k"),
        F.col("event_id").alias("purchase_id"),
        F.col(ts_col).alias("p_ts"),
    )
    c = clicks.select(
        F.col(key_col).alias("ck"),
        F.col("event_id").alias("click_id"),
        F.col(ts_col).alias("c_ts"),
    )
    if p.isStreaming:
        p = p.withWatermark("p_ts", watermark)
    if c.isStreaming:
        c = c.withWatermark("c_ts", watermark)
    cond = preceding_interval_cond("k", "ck", "c_ts", "p_ts", tolerance)
    return p.join(c, cond, "inner").select(
        F.col("k").alias(key_col),
        "purchase_id",
        F.col("p_ts").alias("purchase_ts"),
        "click_id",
        F.col("c_ts").alias("click_ts"),
        # floor of the TRUE microsecond difference — truncating each side
        # to whole seconds first made sub-second lags off by up to 1s
        F.expr("(unix_micros(p_ts) - unix_micros(c_ts)) div 1000000").alias(
            "lag_seconds"
        ),
    )
