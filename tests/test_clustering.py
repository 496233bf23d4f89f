"""k-means operator invariants (the oracle parity test covers exact
cross-engine agreement; these pin the operator's own contract)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etlutil_spark.operators.clustering import kmeans_assign


def _load(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


class TestKmeansAssign:
    def test_partition_layout_invariance(self, spark, sf_dir):
        """Assignments must not depend on how the input is partitioned —
        the cross-engine determinism contract implies cross-layout
        determinism too."""
        e = _load(spark, sf_dir)
        a = {r["vec_id"]: (r["cluster"], r["dist"]) for r in kmeans_assign(e, "vec_id", "embedding", k=4, iters=2).collect()}
        b = {
            r["vec_id"]: (r["cluster"], r["dist"])
            for r in kmeans_assign(e.repartition(7), "vec_id", "embedding", k=4, iters=2).collect()
        }
        assert a == b

    def test_assignment_is_nearest_centroid(self, spark, sf_dir):
        """Brute-force check in Python: each point's reported (cluster,
        dist) is the argmin over the final centroids, ties to the
        smaller cluster id. Recovers the centroids by re-running the
        quantization + update steps independently."""
        e = _load(spark, sf_dir).limit(64)
        k, iters, scale = 3, 2, 1_000_000
        rows = e.where(F.col("embedding").isNotNull()).select("vec_id", "embedding").collect()
        qvecs = {r["vec_id"]: [math.floor(float(x) * scale) for x in r["embedding"]] for r in rows}
        cents = [qvecs[v] for v in sorted(qvecs)[:k]]

        def nearest(v, cs):
            return min(
                (sum((a - b) * (a - b) for a, b in zip(v, c)), j) for j, c in enumerate(cs)
            )

        for _ in range(iters - 1):
            groups: dict[int, list[list[int]]] = {}
            for v in qvecs.values():
                _, j = nearest(v, cents)
                groups.setdefault(j, []).append(v)
            cents = [
                [math.floor(float(sum(col)) / len(g)) for col in zip(*g)] if (g := groups.get(j)) else cents[j]
                for j in range(k)
            ]

        got = {r["vec_id"]: (r["cluster"], r["dist"]) for r in kmeans_assign(e, "vec_id", "embedding", k=k, iters=iters).collect()}
        for vid, v in qvecs.items():
            d, j = nearest(v, cents)
            assert got[vid] == (j, d), f"vec {vid}: expected ({j},{d}), got {got[vid]}"

    def test_iterations_do_not_increase_inertia(self, spark, sf_dir):
        e = _load(spark, sf_dir)
        inertia = {
            it: kmeans_assign(e, "vec_id", "embedding", k=8, iters=it)
            .agg(F.sum("dist").alias("s"))
            .collect()[0]["s"]
            for it in (1, 3)
        }
        assert inertia[3] <= inertia[1]

    def test_uses_multiple_clusters(self, spark, sf_dir):
        e = _load(spark, sf_dir)
        n = kmeans_assign(e, "vec_id", "embedding", k=8, iters=3).select("cluster").distinct().count()
        assert n >= 2

    def test_too_few_rows_raises(self, spark, sf_dir):
        e = _load(spark, sf_dir).limit(3)
        with pytest.raises(ValueError, match="at least k"):
            kmeans_assign(e, "vec_id", "embedding", k=5, iters=1)

    def test_bad_params_raise(self, spark, sf_dir):
        e = _load(spark, sf_dir)
        with pytest.raises(ValueError, match="k and iters"):
            kmeans_assign(e, "vec_id", "embedding", k=0, iters=1)


class TestIvfKmeansTopk:
    def test_full_probe_equals_brute_force(self, spark, sf_dir):
        """nprobe = k probes every cell, so the result must equal the
        global exact top-k in quantized space."""
        import math

        from pyspark.sql import functions as F

        from etlutil_spark.operators.clustering import ivf_kmeans_topk

        e = _load(spark, sf_dir)
        qvec = [float(x) for x in e.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
        got = [
            (r["vec_id"], r["dist"])
            for r in ivf_kmeans_topk(e, "vec_id", "embedding", qvec, k=4, iters=2, nprobe=4, topk=5).collect()
        ]
        qv = [math.floor(x * 1_000_000) for x in qvec]
        rows = e.select("vec_id", "embedding").collect()
        brute = sorted(
            (
                sum((math.floor(float(a) * 1_000_000) - b) ** 2 for a, b in zip(r["embedding"], qv)),
                r["vec_id"],
            )
            for r in rows
        )[:5]
        assert got == [(v, d) for d, v in brute]

    def test_partial_probe_is_subset_of_corpus_cells(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from etlutil_spark.operators.clustering import ivf_kmeans_topk, kmeans_assign

        e = _load(spark, sf_dir)
        qvec = [float(x) for x in e.where(F.col("vec_id") == 7).collect()[0]["embedding"]]
        hits = ivf_kmeans_topk(e, "vec_id", "embedding", qvec, k=8, iters=3, nprobe=2, topk=10)
        cells = kmeans_assign(e, "vec_id", "embedding", k=8, iters=3)
        joined = hits.join(cells, "vec_id").select("cluster").distinct()
        assert joined.count() <= 2  # results only come from the probed cells

    def test_bad_nprobe_raises(self, spark, sf_dir):
        import pytest as _pytest

        from etlutil_spark.operators.clustering import ivf_kmeans_topk

        e = _load(spark, sf_dir)
        with _pytest.raises(ValueError, match="nprobe"):
            ivf_kmeans_topk(e, "vec_id", "embedding", [0.0] * 64, k=4, nprobe=5)


class TestSemdedup:
    def test_exact_duplicate_dropped_at_radius_zero(self, spark, sf_dir):
        """radius=0 is exact semantic dedup: a duplicated vector's
        larger id is dropped, everything else survives."""
        from pyspark.sql import functions as F

        e = _load(spark, sf_dir).limit(50)
        dup = e.where(F.col("vec_id") == 3).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
        )
        from etlutil_spark.operators.clustering import semdedup

        out = {r["vec_id"]: r for r in semdedup(e.unionByName(dup), "vec_id", "embedding", k=4, iters=2, radius=0).collect()}
        assert out[100003]["kept"] == 0 and out[100003]["n_near_smaller"] == 1
        assert out[3]["kept"] == 1
        assert sum(1 for r in out.values() if r["kept"] == 0) == 1

    def test_keep_first_semantics(self, spark, sf_dir):
        """The smallest id in any near-dup pair is always kept."""
        from pyspark.sql import functions as F

        from etlutil_spark.operators.clustering import semdedup

        e = _load(spark, sf_dir)
        out = semdedup(e, "vec_id", "embedding", k=8, iters=3, radius=1_300_000_000_000)
        min_id = out.agg(F.min("vec_id")).collect()[0][0]
        assert out.where(F.col("vec_id") == min_id).collect()[0]["kept"] == 1
        # dropped rows always cite at least one smaller neighbor
        bad = out.where((F.col("kept") == 0) & (F.col("n_near_smaller") == 0)).count()
        assert bad == 0

    def test_negative_radius_raises(self, spark, sf_dir):
        import pytest as _pytest

        from etlutil_spark.operators.clustering import semdedup

        with _pytest.raises(ValueError, match="radius"):
            semdedup(_load(spark, sf_dir), "vec_id", "embedding", radius=-1)


class TestPqAdcTopk:
    def test_query_ranks_itself_first(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from etlutil_spark.operators.clustering import pq_adc_topk

        e = _load(spark, sf_dir)
        qvec = [float(x) for x in e.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
        top = pq_adc_topk(e, "vec_id", "embedding", qvec, m=8, ksub=16, iters=2, topk=3).collect()
        assert top[0]["vec_id"] == 0  # ADC residual is small vs inter-vector distances

    def test_recall_floor_vs_exact(self, spark, sf_dir):
        """PQ recall@10 on isotropic synthetic embeddings (the
        worst case for any quantizer — no cluster structure to exploit;
        measured mean 0.34 over 5 queries). Pin a regression floor."""
        import math

        from etlutil_spark.operators.clustering import pq_adc_topk

        e = _load(spark, sf_dir)
        rows = e.collect()
        vecs = {r["vec_id"]: [math.floor(float(x) * 1_000_000) for x in r["embedding"]] for r in rows}
        embs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
        recalls = []
        for qid in (0, 7, 42, 99, 123):
            qv = vecs[qid]
            exact = {v for _, v in sorted((sum((a - b) ** 2 for a, b in zip(v, qv)), vid) for vid, v in vecs.items())[:10]}
            got = {r["vec_id"] for r in pq_adc_topk(e, "vec_id", "embedding", embs[qid], m=8, ksub=16, iters=2, topk=10).collect()}
            recalls.append(len(got & exact) / 10)
        assert sum(recalls) / len(recalls) >= 0.25, recalls
        assert min(recalls) >= 0.1, recalls

    def test_bad_subspace_split_raises(self, spark, sf_dir):
        import pytest as _pytest

        from etlutil_spark.operators.clustering import pq_adc_topk

        e = _load(spark, sf_dir)
        with _pytest.raises(ValueError, match="not divisible"):
            pq_adc_topk(e, "vec_id", "embedding", [0.0] * 64, m=7)
        with _pytest.raises(ValueError, match="query dim"):
            pq_adc_topk(e, "vec_id", "embedding", [0.0] * 32, m=8)


class TestSeedPlan:
    def test_seed_stage_is_heap_not_sort(self, spark, sf_dir):
        """r8 verdict follow-up: the smallest-id seed collect must plan
        as TakeOrderedAndProject (per-partition k-heap, zero exchanges),
        never a global Sort — at 1e9 vectors a full sort for k seed rows
        is the difference between a scan and a shuffle of the corpus."""
        from etlutil_spark.operators.clustering import _quantize
        from etlutil_spark.sources.testdata import load_table

        df = load_table(spark, "embeddings", sf_dir)
        q = df.select("vec_id", _quantize("embedding", 1_000_000).alias("_qv"))
        seed = q.orderBy("vec_id").limit(8)
        plan = seed._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, plan
        assert "Exchange" not in plan, plan
        assert "+- *(1) Sort" not in plan, plan


class TestTopPc:
    """gram_matrix + power_iteration_top_pc (r9): the integer recurrence
    must recover a planted dominant direction."""

    def test_recovers_planted_direction(self, spark):
        import math
        import random

        from pyspark.sql import functions as F

        from etlutil_spark.operators.clustering import (
            gram_matrix,
            power_iteration_top_pc,
        )

        rnd = random.Random(9)
        d = 8
        axis = [1.0 if i == 2 else 0.0 for i in range(d)]
        rows = []
        for i in range(400):
            t = rnd.gauss(0, 5)  # dominant variance along the axis
            rows.append(
                (i, [t * a + rnd.gauss(0, 0.3) for a in axis])
            )
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        G, n = gram_matrix(df, "embedding", scale=1_000)
        assert n == 400 and len(G) == d
        v, rayleigh = power_iteration_top_pc(G, rounds=15)
        norm = math.sqrt(sum(x * x for x in v))
        unit = [x / norm for x in v]
        # cosine with the planted axis must be ~1 (sign-free)
        cos = abs(sum(u * a for u, a in zip(unit, axis)))
        assert cos > 0.99, (cos, unit)
        assert rayleigh > 0

    def test_zero_matrix_raises(self):
        import pytest as _pytest

        from etlutil_spark.operators.clustering import power_iteration_top_pc

        with _pytest.raises(ValueError):
            power_iteration_top_pc([[0, 0], [0, 0]])
