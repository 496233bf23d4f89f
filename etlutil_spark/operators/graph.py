"""Iterative graph analytics over edge-list DataFrames: PageRank.

The iterative-algorithm pattern on Spark (Pregel-style supersteps): each
iteration is one keyed join (ranks onto edges by source) plus one keyed
aggregate (flows by destination), materialized with an eager
``localCheckpoint`` so iteration k+1 plans against k's RESULT instead of
re-deriving its whole lineage (a DataFrame subtree referenced twice is
planned twice — the checkpoint is what keeps N iterations O(N) instead
of O(N^2) plan blowup). On a 1000-executor cluster this is exactly how
PageRank runs: ranks and edges co-partition on the source key, the
per-iteration shuffle moves |edges| flow rows, and the driver holds
nothing but the node-count scalar.

Determinism contract (what makes an exact unrolled-SQL oracle possible):
all rank mass is 64-bit integer math. The initial mass ``total // n``
and teleport term are integer floor-divisions; each edge's flow is
``(((r * 85) div 100) * w) div ow`` — multiply-then-floor-divide, exact
in any engine; dangling mass is redistributed as ``dm div n``. Floors
leak a few units of mass per iteration (identically in every engine),
which is irrelevant to ranking and keeps every intermediate exact.

Overflow bound: ``damped_rank * w`` must stay under 2^63, i.e. max edge
weight below ~1e6 at the default ``total=1e12``. Pre-normalize (divide
weights by their GCD or bucket them) for heavier multigraphs, or lower
``total``.

Reference parity note: the reference engine (a record-at-a-time dict
toolkit) has no graph operator; this extends the analytics family the
way SURVEY.md section 2.4 prescribes (link/affinity analysis over the
events stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_TOTAL = 10**12


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    iters: int = 3,
    total: int = DEFAULT_TOTAL,
) -> DataFrame:
    """Weighted PageRank with damping 0.85 over an edge list, ``iters``
    synchronous iterations from a uniform start. Returns one row per
    node: ``node``, ``pr_mass`` (exact integer rank mass out of
    ``total``), ``pr`` (the double ratio, rounded to 6), ``n_out``,
    ``out_weight``.

    Nodes with no out-edges (dangling) redistribute their damped mass
    uniformly each iteration; nodes with no in-edges keep teleport +
    dangling share. Every iteration materializes via eager
    localCheckpoint — see the module docstring for why.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    e0 = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("bigint").alias("w"),
    )
    outw = (
        e0.groupBy("src")
        .agg(
            F.sum("w").cast("bigint").alias("ow"),
            F.count("*").alias("n_out"),
        )
        .localCheckpoint()
    )
    bad_ow = outw.where(F.col("ow").isNull() | (F.col("ow") <= 0)).limit(1).collect()
    if bad_ow:
        raise ValueError(
            "pagerank: source node "
            f"{bad_ow[0]['src']!r} has non-positive/NULL total out-weight "
            "(weights must be positive integers; fractional weights "
            "truncate to 0 under the bigint cast) — flow division would "
            "fail under ANSI mode or silently leak the node's mass"
        )
    e = e0.join(outw.select("src", "ow"), "src").localCheckpoint()
    nodes = (
        e0.select(F.col("src").alias("node"))
        .union(e0.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty edge list")
    tele = ((total * 15) // 100) // n
    r = nodes.withColumn("r", F.lit(total // n).cast("bigint")).localCheckpoint()
    srcs = outw.select("src")
    for _ in range(iters):
        dm_df = (
            r.join(srcs, r["node"] == srcs["src"], "left_anti")
            .agg(F.sum(F.expr("(r * 85) div 100")).alias("_s"))
            .select(F.coalesce(F.col("_s"), F.lit(0)).cast("bigint").alias("dm"))
        )
        flow = (
            e.join(r, e["src"] == r["node"])
            .select(
                "dst",
                F.expr("(((r * 85) div 100) * w) div ow").alias("_f"),
            )
            .groupBy("dst")
            .agg(F.sum("_f").cast("bigint").alias("f"))
        )
        r = (
            nodes.crossJoin(F.broadcast(dm_df))
            .join(flow, nodes["node"] == flow["dst"], "left")
            .select(
                "node",
                (
                    F.lit(tele)
                    + F.coalesce(F.col("f"), F.lit(0))
                    + F.expr(f"dm div {n}")
                )
                .cast("bigint")
                .alias("r"),
            )
            .localCheckpoint()
        )
    return (
        r.join(outw, r["node"] == outw["src"], "left")
        .select(
            "node",
            F.col("r").alias("pr_mass"),
            F.round(F.col("r") / F.lit(float(total)), 6).alias("pr"),
            F.coalesce("n_out", F.lit(0)).cast("bigint").alias("n_out"),
            F.coalesce("ow", F.lit(0)).cast("bigint").alias("out_weight"),
        )
    )
