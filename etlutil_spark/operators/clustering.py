"""Distributed k-means (Lloyd's) over embedding columns.

Scale posture (the 100 TB plan): the assignment step is map-side only —
the k centroids are embedded as literal arrays in the projection, so no
join, no broadcast exchange, no shuffle touches the data path. Each
update step is one keyed partial-aggregate shuffle whose reduced output
is k rows of (count, per-dim sums); the driver holds k*d integers
between iterations (the bounded-collect idiom used by mixture_rates).
That is exactly how Lloyd's runs on a 1000-executor cluster: broadcast
tiny centroids out, tree-aggregate tiny sums back.

Determinism contract (what makes an exact DuckDB oracle possible): all
arithmetic after a one-time quantization is 64-bit integer math.

* quantize: ``q_d = floor(double(x_d) * scale)`` — float->double is
  exact, the multiply and floor are IEEE-identical in every engine, and
  no decimal rounding mode is involved (empirically bit-identical
  between Spark and DuckDB across every test scale factor; the
  float->DECIMAL cast is NOT portable — the two engines round
  differently — which is why this path deliberately avoids decimals).
* init: centroid ``j`` is the vector with the (j+1)-th smallest id.
* assign: argmin_j of the exact integer squared-L2 distance, ties
  broken by smaller cluster id.
* update: ``c'_d = floor(double(sum_d) / n)``; an empty cluster keeps
  its previous centroid.

With inputs |x| < ~100 and d <= 128, distances stay far below 2^63 at
the default scale — no overflow, no floats, no cross-engine drift.

Reference parity note: the reference engine has no clustering operator;
this extends the curation family (SemDeDup-style corpus bucketing, IVF
coarse-quantizer training) the way SURVEY.md section 2.4 prescribes.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SCALE = 1_000_000


def _quantize(vec_col: str, scale: int) -> Column:
    return F.transform(
        vec_col, lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("bigint")
    )


def _best_cluster(centroids: list[list[int]]) -> Column:
    """struct(dist, cluster) of the nearest centroid; integer-exact,
    ties to the smaller cluster id via lexicographic struct min."""
    candidates = []
    for j, cent in enumerate(centroids):
        dist = F.aggregate(
            F.zip_with("_qv", F.lit(cent).cast("array<bigint>"), lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        candidates.append(F.struct(dist.alias("d"), F.lit(j).cast("bigint").alias("c")))
    return F.array_min(F.array(*candidates))


def kmeans_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Run ``iters`` assignment rounds (``iters - 1`` centroid updates)
    and return the final assignment: (id, cluster, dist).

    ``dist`` is the exact integer squared-L2 distance in quantized
    space. The returned plan is scan -> project: the final centroids are
    literals, so a consumer pays zero shuffles.
    """
    if k < 1 or iters < 1:
        raise ValueError(f"k and iters must be >= 1, got k={k} iters={iters}")
    q = df.where(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()).select(
        F.col(id_col), _quantize(vec_col, scale).alias("_qv")
    )
    seed_rows = q.orderBy(id_col).limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(f"need at least k={k} rows to seed centroids, got {len(seed_rows)}")
    centroids = [list(r["_qv"]) for r in seed_rows]
    dim = len(centroids[0])

    for _ in range(iters - 1):
        assigned = q.select("_qv", _best_cluster(centroids)["c"].alias("cluster"))
        sums = assigned.groupBy("cluster").agg(
            F.count("*").alias("n"),
            *[F.sum(F.element_at("_qv", d + 1)).alias(f"s{d}") for d in range(dim)],
        )
        by_cluster = {int(r["cluster"]): r for r in sums.collect()}  # k rows, bounded
        centroids = [
            [math.floor(float(r[f"s{d}"]) / r["n"]) for d in range(dim)]
            if (r := by_cluster.get(j)) is not None
            else centroids[j]  # empty cluster keeps its previous centroid
            for j in range(k)
        ]

    best = _best_cluster(centroids)
    return q.select(F.col(id_col), best["c"].alias("cluster"), best["d"].alias("dist"))
