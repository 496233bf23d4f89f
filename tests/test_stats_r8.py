"""Unit tests for the r8 statistics additions, checked against
hand-computed textbook values (not the DuckDB oracle —
tests/test_oracle_parity.py covers that)."""

from __future__ import annotations

import math

import pytest

from etlutil_spark.operators.analytics import mann_whitney_u


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v double")


class TestMannWhitney:
    def test_no_ties_hand_computed(self, spark):
        """click [1,2,4] vs purchase [3,5]: ranks 1,2,4 -> R1=7,
        U1 = 7 - 3*4/2 = 1."""
        df = _df(
            spark,
            [("click", 1.0), ("click", 2.0), ("click", 4.0),
             ("purchase", 3.0), ("purchase", 5.0)],
        )
        r = mann_whitney_u(df, "v", "g", "click", "purchase").collect()[0]
        assert (r["n1"], r["n2"]) == (3, 2)
        assert r["u1"] == 1.0
        # z = (U1 - n1 n2/2) / sqrt(n1 n2 (n+1)/12) with no tie term
        expect_z = (1.0 - 3.0) / math.sqrt(3 * 2 * 6 / 12.0)
        assert r["z"] == pytest.approx(expect_z, abs=1e-6)

    def test_tied_values_get_average_ranks(self, spark):
        """click [1,2,2] vs purchase [2,3]: the three 2s share average
        rank 3 -> R1 = 1 + 3 + 3 = 7, U1 = 7 - 6 = 1; tie term
        sum(t^3 - t) = 24."""
        df = _df(
            spark,
            [("click", 1.0), ("click", 2.0), ("click", 2.0),
             ("purchase", 2.0), ("purchase", 3.0)],
        )
        r = mann_whitney_u(df, "v", "g", "click", "purchase").collect()[0]
        assert r["u1"] == 1.0
        var = 3 * 2 / 12.0 * ((5 + 1) - 24.0 / (5 * 4))
        expect_z = (1.0 - 3.0) / math.sqrt(var)
        assert r["z"] == pytest.approx(expect_z, abs=1e-6)

    def test_identical_distributions_z_zero(self, spark):
        """Same multiset in both groups: U1 = n1*n2/2 exactly, z = 0."""
        rows = [("click", float(v)) for v in (1, 2, 3, 4)] + [
            ("purchase", float(v)) for v in (1, 2, 3, 4)
        ]
        r = mann_whitney_u(_df(spark, rows), "v", "g", "click", "purchase")
        row = r.collect()[0]
        assert row["u1"] == 4 * 4 / 2.0
        assert row["z"] == 0.0

    def test_other_groups_and_nulls_excluded(self, spark):
        df = _df(
            spark,
            [("click", 1.0), ("purchase", 2.0), ("view", 99.0),
             ("click", None)],
        )
        r = mann_whitney_u(df, "v", "g", "click", "purchase").collect()[0]
        assert (r["n1"], r["n2"]) == (1, 1)


class TestTriangleStats:
    def _stats(self, spark, edges):
        from etlutil_spark.operators.graph import triangle_stats

        df = spark.createDataFrame(edges, "u bigint, v bigint")
        return triangle_stats(df).collect()[0]

    def test_k4_has_four_triangles(self, spark):
        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        r = self._stats(spark, k4)
        assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)
        # K4: every wedge closes -> transitivity 1
        assert r["clustering_coeff"] == 1.0

    def test_triangle_plus_tail(self, spark):
        """Triangle 0-1-2 plus pendant 2-3: 1 triangle, wedges =
        1+1+3 = 5, transitivity 3/5."""
        r = self._stats(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])
        assert r["n_triangles"] == 1 and r["n_wedges"] == 5
        assert r["clustering_coeff"] == 0.6

    def test_triangle_free_graph(self, spark):
        """4-cycle: wedges but zero triangles."""
        r = self._stats(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
        assert r["n_triangles"] == 0 and r["clustering_coeff"] == 0.0

    def test_input_canonicalization(self, spark):
        """Reversed duplicates and self-loops must not change counts."""
        r = self._stats(
            spark,
            [(0, 1), (1, 0), (1, 2), (0, 2), (2, 0), (1, 1)],
        )
        assert (r["n_edges"], r["n_triangles"]) == (3, 1)


class TestLengthGroupedBatches:
    def test_assignment_is_rank_order(self, spark):
        from etlutil_spark.operators.packing import length_grouped_batches

        df = spark.createDataFrame(
            [(i, ln) for i, ln in enumerate([5, 1, 9, 3, 7, 2, 8])],
            "doc_id long, n long",
        )
        out = length_grouped_batches(df, "n", "doc_id", batch_size=3)
        rows = {r["doc_id"]: (r["rank"], r["batch_id"]) for r in out.collect()}
        # length order: 1,2,3,5,7,8,9 -> ids 1,5,3,0,4,6,2
        assert [rows[i][0] for i in (1, 5, 3, 0, 4, 6, 2)] == list(range(1, 8))
        assert rows[1][1] == 0 and rows[0][1] == 1 and rows[2][1] == 2

    def test_ties_break_on_id(self, spark):
        from etlutil_spark.operators.packing import length_grouped_batches

        df = spark.createDataFrame(
            [(3, 4), (1, 4), (2, 4)], "doc_id long, n long"
        )
        out = length_grouped_batches(df, "n", "doc_id", batch_size=2)
        rows = {r["doc_id"]: r["rank"] for r in out.collect()}
        assert rows == {1: 1, 2: 2, 3: 3}

    def test_bad_batch_size_raises(self, spark):
        from etlutil_spark.operators.packing import length_grouped_batches

        df = spark.createDataFrame([(1, 1)], "doc_id long, n long")
        with pytest.raises(ValueError, match="batch_size"):
            length_grouped_batches(df, "n", "doc_id", batch_size=0)

    def test_sorted_batching_never_wastes_more(self, spark, sf_dir):
        """On the real corpus the sorted assignment's padding waste must
        be at most the hash-order baseline's (the whole point of the
        operator)."""
        from etlutil_spark.queries import QUERIES

        r = QUERIES["docs_length_batching"](spark, sf_dir).collect()[0]
        assert r["waste_sorted"] <= r["waste_hashed"]
        assert r["n_batches"] == -(-r["n_docs"] // 32)


class TestTheil:
    def test_decomposition_identity_and_zero_case(self, spark, sf_dir):
        """T_total == T_between + T_within up to the 1e-9 quantization,
        and a perfectly equal corpus scores ~0 on all three."""
        from etlutil_spark.queries import QUERIES

        r = QUERIES["docs_theil_inequality"](spark, sf_dir).collect()[0]
        assert r["theil_total"] >= 0
        gap = abs(r["theil_total"] - r["theil_between"] - r["theil_within"])
        assert gap < 1e-6

    def test_equal_distribution_scores_zero(self, spark, monkeypatch):
        """All docs the same length in every source -> every component
        exactly 0 (ln(1) terms quantize to 0)."""
        import etlutil_spark.queries as Q

        df = spark.createDataFrame(
            [(i, "w x y z", "s" + str(i % 3)) for i in range(30)],
            "doc_id long, text string, source string",
        )
        monkeypatch.setattr(
            Q, "load_table", lambda spark_, name, sf: df
        )
        r = Q.QUERIES["docs_theil_inequality"](spark, "ignored").collect()[0]
        assert (r["theil_total"], r["theil_between"], r["theil_within"]) == (
            0.0, 0.0, 0.0,
        )
