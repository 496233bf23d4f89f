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

from etlutil_spark.operators.util import pin
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
        .transform(pin)
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
    e = e0.join(outw.select("src", "ow"), "src").transform(pin)
    nodes = (
        e0.select(F.col("src").alias("node"))
        .union(e0.select(F.col("dst").alias("node")))
        .distinct()
        .transform(pin)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty edge list")
    tele = ((total * 15) // 100) // n
    r = nodes.withColumn("r", F.lit(total // n).cast("bigint")).transform(pin)
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
            .transform(pin)
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


def triangle_stats(
    edges: DataFrame, *, src: str = "u", dst: str = "v"
) -> DataFrame:
    """Global triangle census of an undirected simple graph: 1 row
    (n_nodes, n_edges, n_wedges, n_triangles, clustering_coeff) where
    clustering_coeff = 3*T / wedges (the global transitivity ratio).

    Degree-ordered orientation (the Suri-Vassilvitskii MapReduce
    algorithm, MR "node-iterator++"): orient every edge from its
    lower-(degree, node) endpoint to the higher one, so each triangle is
    counted exactly once at its lowest vertex AND every out-neighborhood
    is bounded by O(sqrt(m)) — the wedge self-join's group sizes stay
    sub-quadratic even on power-law graphs whose hubs would make the
    naive neighbor join O(max_degree^2). The count is two equi-joins:
    wedges (s -> a, s -> b with a before b in the same total order) and
    the closing oriented edge (a -> b); no stage is ever all-pairs.

    Input must be distinct undirected edges (one row per {u, v}, no
    self-loops, either endpoint order); the operator canonicalizes and
    dedups defensively. Exact integer counts — engine-portable; the
    coefficient is one double division rounded at 6."""
    # the canonical edge list feeds four legs (both union arms of the
    # degree count, the orientation join, the n_edges scalar) and its
    # lineage — the caller's basket self-join + distinct — is the
    # expensive part; materialize it once
    e0 = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .transform(pin)
    )
    # degrees feed both orientation joins and the wedge-count scalar
    nodes = (
        e0.select(F.col("a").alias("node"))
        .union(e0.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("d"))
        .transform(pin)
    )
    # the edge+degree table feeds orientation AND the wedge/closing
    # joins below — materialize once
    ed = (
        e0.join(nodes.withColumnRenamed("node", "a").withColumnRenamed("d", "da"), "a")
        .join(nodes.withColumnRenamed("node", "b").withColumnRenamed("d", "db"), "b")
        .transform(pin)
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("s"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("t"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dt"),
    ).transform(pin)
    e1 = o.select(F.col("s"), F.col("t").alias("t1"), F.col("dt").alias("d1"))
    e2 = o.select(F.col("s"), F.col("t").alias("t2"), F.col("dt").alias("d2"))
    wedges = e1.join(e2, "s").where(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("t1") < F.col("t2")))
    )
    closing = o.select(F.col("s").alias("t1"), F.col("t").alias("t2"))
    tri = wedges.join(closing, ["t1", "t2"], "left_semi")
    t_cnt = tri.agg(F.count("*").cast("bigint").alias("n_triangles"))
    summary = (
        nodes.agg(
            F.count("*").cast("bigint").alias("n_nodes"),
            (F.sum(F.col("d") * (F.col("d") - 1)) / F.lit(2))
            .cast("bigint")
            .alias("n_wedges"),
        )
        .crossJoin(e0.agg(F.count("*").cast("bigint").alias("n_edges")))
        .crossJoin(t_cnt)
    )
    return summary.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(
            F.col("n_wedges") > 0,
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering_coeff"),
    )


def kcore(
    edges: DataFrame,
    k: int,
    *,
    src: str = "u",
    dst: str = "v",
    max_rounds: int = 40,
) -> DataFrame:
    """k-core of an undirected simple graph: the maximal subgraph where
    every node has degree >= k (Seidman 1983) — the standard density
    filter before community/affinity analysis: spam rings, loosely
    attached long-tail items and one-off co-occurrences peel away, the
    stable co-purchase backbone remains. Returns the surviving EDGE list
    (a, b) with a < b, canonicalized and deduped defensively like
    triangle_stats.

    Parallel peeling (the Pregel/Montresor form): each round one
    degree aggregate + a two-sided semi-join drops EVERY node currently
    below k at once; repeat until a round removes nothing. Each round is
    bounded work (one keyed agg, one join) and an eager localCheckpoint
    truncates the lineage (the pagerank O(N)-vs-O(N^2) planning rule).
    Round count equals the graph's peeling depth: single digits on
    real co-occurrence graphs (dense cores, shallow shells), but a
    path/ring-shaped shell CAN peel O(n/2) rounds — past ``max_rounds``
    the operator RAISES (never returns a half-peeled graph silently);
    the unrolled-SQL oracle side is naturally idempotent because a
    converged round is a no-op filter.

    Exactness: pure integer degrees and set filters — no floats
    anywhere, so the surviving edge set is bit-identical in any engine.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .transform(pin)
    )
    n_edges = e.count()
    for _ in range(max_rounds):
        if n_edges == 0:
            return e
        deg = (
            e.select(F.col("a").alias("node"))
            .union(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        good = deg.where(F.col("deg") >= k).select("node")
        e = (
            e.join(good.withColumnRenamed("node", "a"), "a", "semi")
            .join(good.withColumnRenamed("node", "b"), "b", "semi")
            .select("a", "b")
            .transform(pin)
        )
        n_now = e.count()
        if n_now == n_edges:
            return e
        n_edges = n_now
    raise RuntimeError(
        f"kcore did not converge within {max_rounds} peeling rounds — "
        "a deep shell structure; raise max_rounds"
    )
