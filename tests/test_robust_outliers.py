"""group_mad_outliers edge cases the oracle-parity sweep can't reach
(the synthetic events table has no zero-MAD or whale-dominated group)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etlutil_spark.operators.profile import group_mad_outliers, group_zscores


def _rows(spark, data):
    return spark.createDataFrame(data, "grp string, value double")


class TestGroupMadOutliers:
    def test_whale_resistant(self, spark):
        """One whale in a tight group: the MAD flag catches it. The
        moment z-score of the same data is dragged by the whale itself
        (its |z| stays under sqrt(n), ~3.3 here), demonstrating why the
        robust twin exists."""
        data = [("a", float(v)) for v in [10, 11, 10, 12, 11, 10, 11, 12, 10, 11, 1000.0]]
        out = group_mad_outliers(_rows(spark, data), "grp", "value").collect()[0]
        assert out["n_outliers"] == 1
        z = group_zscores(_rows(spark, data), "grp", "value")
        whale_z = z.where(F.col("value") == 1000.0).collect()[0]["zscore"]
        assert abs(whale_z) < 3.5  # classic z-score misses its own whale

    def test_zero_mad_counts_off_median_rows(self, spark):
        """MAD = 0 (majority identical): no division, every off-median
        row flags."""
        data = [("a", 5.0)] * 6 + [("a", 7.0), ("a", 3.0)]
        out = group_mad_outliers(_rows(spark, data), "grp", "value").collect()[0]
        assert out["mad"] == 0.0
        assert out["n_outliers"] == 2

    def test_circuit_breaker_trips_on_unbounded_group(self, spark):
        """r12 verdict item 4: a group whose collected array exceeds
        max_group_rows must RAISE (fail loudly before the pathological
        shape grows), never degrade silently. RED on the pre-breaker
        code (it silently computed the median of the oversized group)."""
        import pytest
        from pyspark.sql.utils import PySparkRuntimeError
        from py4j.protocol import Py4JJavaError

        big = spark.range(0, 500).selectExpr(
            "'hot' AS grp", "CAST(id AS DOUBLE) AS value"
        )
        with pytest.raises(Exception, match="max_group_rows"):
            group_mad_outliers(
                big, "grp", "value", max_group_rows=100
            ).collect()
        # at or under the bound: computes normally
        ok = group_mad_outliers(
            big, "grp", "value", max_group_rows=500
        ).collect()[0]
        assert ok["n"] == 500

    def test_nulls_excluded(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", None), ("a", 2.0), ("a", 3.0)], "grp string, value double"
        )
        out = group_mad_outliers(df, "grp", "value").collect()[0]
        assert out["n"] == 3 and out["med"] == 2.0

    def test_partition_layout_invariance(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_type", "value")
        a = sorted(map(tuple, group_mad_outliers(ev, "event_type", "value").collect()))
        b = sorted(map(tuple, group_mad_outliers(ev.repartition(13), "event_type", "value").collect()))
        assert a == b


class TestCorrMatrix:
    def test_known_correlations(self, spark):
        from etlutil_spark.operators.profile import corr_matrix

        data = [(float(i), float(2 * i), float(-i), 7.0) for i in range(1, 21)]
        df = spark.createDataFrame(data, "a double, b double, c double, d double")
        out = {(r["col_x"], r["col_y"]): r for r in corr_matrix(df, ["a", "b", "c", "d"]).collect()}
        assert abs(out[("a", "b")]["pearson_r"] - 1.0) < 1e-12  # perfectly linear
        assert abs(out[("a", "c")]["pearson_r"] + 1.0) < 1e-12  # anti-correlated
        assert out[("a", "d")]["pearson_r"] is None  # zero variance -> NULL
        assert all(r["n"] == 20 for r in out.values())

    def test_null_rows_dropped_complete_case(self, spark):
        from etlutil_spark.operators.profile import corr_matrix

        df = spark.createDataFrame(
            [(1.0, 1.0), (2.0, None), (3.0, 3.0), (None, 4.0), (5.0, 5.0)],
            "a double, b double",
        )
        out = corr_matrix(df, ["a", "b"]).collect()[0]
        assert out["n"] == 3 and abs(out["pearson_r"] - 1.0) < 1e-12

    def test_single_column_raises(self, spark):
        import pytest as _pytest

        from etlutil_spark.operators.profile import corr_matrix

        df = spark.createDataFrame([(1.0,)], "a double")
        with _pytest.raises(ValueError, match="at least two"):
            corr_matrix(df, ["a"])


class TestCurriculumPhases:
    def test_balanced_phases_and_ordering(self, spark):
        from etlutil_spark.operators.sampling import curriculum_phases

        df = spark.createDataFrame(
            [(i, float(i), 10) for i in range(100)], "doc_id long, score double, w int"
        )
        out = {r["phase"]: r for r in curriculum_phases(df, "score", weight_col="w").collect()}
        assert set(out) == {0, 1, 2, 3}
        # phase 0 holds the TOP scores and phases are contiguous, descending
        assert out[0]["min_score"] > out[1]["max_score"] or out[0]["min_score"] >= out[1]["max_score"]
        assert out[0]["max_score"] == 99.0 and out[3]["min_score"] == 0.0
        assert sum(r["n_docs"] for r in out.values()) == 100
        assert all(r["n_weight"] == r["n_docs"] * 10 for r in out.values())

    def test_null_scores_excluded(self, spark):
        from etlutil_spark.operators.sampling import curriculum_phases

        df = spark.createDataFrame(
            [(1, 1.0), (2, None), (3, 2.0), (4, 3.0), (5, 4.0)], "doc_id long, score double"
        )
        out = curriculum_phases(df, "score", phases=2).collect()
        assert sum(r["n_docs"] for r in out) == 4

    def test_bad_phases_raise(self, spark):
        import pytest as _pytest

        from etlutil_spark.operators.sampling import curriculum_phases

        df = spark.createDataFrame([(1, 1.0)], "doc_id long, score double")
        with _pytest.raises(ValueError, match="phases"):
            curriculum_phases(df, "score", phases=1)

    def test_empty_or_all_null_scores_raise_named_error(self, spark):
        """Regression: percentile over zero non-NULL scores returns
        NULL, which used to crash with an opaque 'NoneType is not
        subscriptable' instead of naming the contract."""
        import pytest as _pytest

        from etlutil_spark.operators.sampling import curriculum_phases

        empty = spark.createDataFrame([], "doc_id long, score double")
        with _pytest.raises(ValueError, match="non-NULL score"):
            curriculum_phases(empty, "score")
        nulls = spark.createDataFrame(
            [(1, None), (2, None)], "doc_id long, score double"
        )
        with _pytest.raises(ValueError, match="non-NULL score"):
            curriculum_phases(nulls, "score")


class TestMixtureEpochPlan:
    def test_deficit_math(self, spark):
        from etlutil_spark.operators.sampling import mixture_epoch_plan

        df = spark.createDataFrame(
            [("en", 100)] * 10 + [("zh", 100)] * 2, "lang string, n_tokens int"
        )
        out = {
            r["lang"]: r
            for r in mixture_epoch_plan(
                df, "lang", "n_tokens", {"en": 0.5, "zh": 0.5}, budget_tokens=4000, max_epochs=2.0
            ).collect()
        }
        # en: wants 2000, has 1000, cap 2.0 -> supply 2000, no deficit
        assert out["en"]["achievable_tokens"] == 2000 and out["en"]["deficit_tokens"] == 0
        assert out["en"]["epochs_planned"] == 2.0
        # zh: wants 2000, has 200, cap 2.0 -> supply 400, deficit 1600
        assert out["zh"]["achievable_tokens"] == 400 and out["zh"]["deficit_tokens"] == 1600
        assert out["zh"]["epochs_needed"] == 10.0 and out["zh"]["epochs_planned"] == 2.0

    def test_unweighted_stratum_gets_zero_desired(self, spark):
        from etlutil_spark.operators.sampling import mixture_epoch_plan

        df = spark.createDataFrame([("en", 10), ("xx", 10)], "lang string, n_tokens int")
        out = {
            r["lang"]: r
            for r in mixture_epoch_plan(
                df, "lang", "n_tokens", {"en": 1.0}, budget_tokens=100
            ).collect()
        }
        assert out["xx"]["weight"] == 0.0 and out["xx"]["desired_tokens"] == 0

    def test_typo_stratum_raises(self, spark):
        import pytest as _pytest

        from etlutil_spark.operators.sampling import mixture_epoch_plan

        df = spark.createDataFrame([("en", 10)], "lang string, n_tokens int")
        with _pytest.raises(ValueError, match="absent"):
            mixture_epoch_plan(df, "lang", "n_tokens", {"enn": 1.0}, budget_tokens=100)

    def test_all_null_token_stratum_reports_full_deficit(self, spark):
        """Regression: SUM over an all-NULL token column is NULL, and
        least(desired, NULL) skips the NULL — the unsuppliable stratum
        used to read deficit_tokens = 0 (mixture declared trainable).
        It must read supply 0 / deficit = desired."""
        from etlutil_spark.operators.sampling import mixture_epoch_plan

        df = spark.createDataFrame(
            [("en", 100), ("code", None), ("code", None)],
            "lang string, n_tokens int",
        )
        out = {
            r["lang"]: r
            for r in mixture_epoch_plan(
                df, "lang", "n_tokens", {"en": 0.5, "code": 0.5},
                budget_tokens=200,
            ).collect()
        }
        assert out["code"]["n_tokens"] == 0
        assert out["code"]["achievable_tokens"] == 0
        assert out["code"]["deficit_tokens"] == 100
        assert out["code"]["epochs_needed"] is None


class TestContainmentPairs:
    def test_excerpt_detected_where_jaccard_misses(self, spark):
        from etlutil_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs

        short = "alpha beta gamma delta epsilon zeta"
        long_ = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(30))
        df = spark.createDataFrame([(1, short), (2, long_)], "doc_id long, text string")
        cont = containment_pairs(df, "doc_id", "text", n=3, threshold=0.9).collect()
        assert len(cont) == 1
        r = cont[0]
        assert r["cont_a_in_b"] == 1.0  # the short doc is fully contained
        assert r["cont_b_in_a"] < 0.1
        # symmetric Jaccard at the same bar finds nothing
        assert ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.9).count() == 0

    def test_unrelated_docs_no_pair(self, spark):
        from etlutil_spark.operators.dedup import containment_pairs

        df = spark.createDataFrame(
            [(1, "aa bb cc dd ee"), (2, "ff gg hh ii jj")], "doc_id long, text string"
        )
        assert containment_pairs(df, "doc_id", "text", n=3, threshold=0.1).count() == 0


class TestPiiScanReport:
    def test_counts_per_kind(self, spark):
        from etlutil_spark.operators.text_analysis import pii_scan_report

        df = spark.createDataFrame(
            [
                ("a", "mail me at x@y.example.com or z@w.example.org"),
                ("a", "call +1 (555) 123-4567 please"),
                ("a", "clean document text"),
                ("b", "host 192.168.0.1 and 10.0.0.2"),
                ("b", None),
            ],
            "source string, text string",
        )
        out = {r["source"]: r for r in pii_scan_report(df, "text", "source").collect()}
        assert out["a"]["n_email"] == 2 and out["a"]["n_phone"] == 1 and out["a"]["n_ipv4"] == 0
        assert out["a"]["docs_with_pii"] == 2 and abs(out["a"]["pii_rate"] - 2 / 3) < 1e-6
        assert out["b"]["n_ipv4"] == 2 and out["b"]["n_docs"] == 2  # NULL text = clean, still counted
        assert out["b"]["docs_with_pii"] == 1

    def test_unknown_kind_raises(self, spark):
        import pytest as _pytest

        from etlutil_spark.operators.text_analysis import pii_scan_report

        df = spark.createDataFrame([("a", "x")], "source string, text string")
        with _pytest.raises(ValueError, match="unknown PII kinds"):
            pii_scan_report(df, "text", "source", kinds=("email", "ssn"))

    def test_report_predicts_redaction_reach(self, spark):
        """docs_with_pii == docs redact_pii would modify."""
        from pyspark.sql import functions as F

        from etlutil_spark.functions.text import redact_pii
        from etlutil_spark.operators.text_analysis import pii_scan_report

        df = spark.createDataFrame(
            [("a", "x@y.example.com here"), ("a", "no pii"), ("a", "ip 1.2.3.4")],
            "source string, text string",
        )
        report = pii_scan_report(df, "text", "source").collect()[0]
        changed = df.where(redact_pii("text") != F.col("text")).count()
        assert report["docs_with_pii"] == changed == 2

    def test_int_scale_mode_matches_decimal_mode(self, spark):
        """On fixed-point data the fast hi/lo long-sum path and the
        decimal-sum path must produce the same correlations."""
        from etlutil_spark.operators.profile import corr_matrix

        data = [(round(i * 0.07, 2), round(100 - i * 1.31, 2)) for i in range(200)]
        df = spark.createDataFrame(data, "a double, b double")
        slow = {(r["col_x"], r["col_y"]): r["pearson_r"] for r in corr_matrix(df, ["a", "b"]).collect()}
        fast = {(r["col_x"], r["col_y"]): r["pearson_r"] for r in corr_matrix(df, ["a", "b"], int_scale=100).collect()}
        for k in slow:
            assert abs(slow[k] - fast[k]) < 1e-12, (k, slow[k], fast[k])
