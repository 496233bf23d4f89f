"""Unit/property tests for the r6 session-3 operators: RFM segmentation,
basket association rules, integer-exact PageRank, and DSIR importance
weights. PageRank is checked against an independent plain-Python
reference with the same integer-arithmetic contract; the others pin
closed-form expectations on small hand-built inputs."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from etlutil_spark.operators.analytics import basket_rules, rfm_scores
from etlutil_spark.operators.graph import pagerank
from etlutil_spark.operators.text_analysis import dsir_log_weights


class TestRfmScores:
    def test_scores_are_quartiles_and_deterministic(self, spark, sf_dir):
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        out = rfm_scores(orders).collect()
        n = len(out)
        assert n == orders.select("o_custkey").distinct().count()
        for axis in ("r_q", "f_q", "m_q"):
            vals = [r[axis] for r in out]
            assert set(vals) <= {1, 2, 3, 4}
            # exact ntile: bucket sizes differ by at most 1
            sizes = [vals.count(b) for b in sorted(set(vals))]
            assert max(sizes) - min(sizes) <= 1
        # best quartiles hold the extremes
        top_m = max(out, key=lambda r: (r["monetary"], -r["o_custkey"]))
        assert top_m["m_q"] == 1
        top_f = max(out, key=lambda r: (r["frequency"], -r["o_custkey"]))
        assert top_f["f_q"] == 1
        most_recent = min(out, key=lambda r: (r["recency_days"], r["o_custkey"]))
        assert most_recent["r_q"] == 1

    def test_matches_builtin_ntile(self, spark, sf_dir):
        """Each axis must equal ANSI NTILE(4) over the same total order
        (the single-partition form exact_ntile exists to avoid)."""
        from pyspark.sql.window import Window

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        got = rfm_scores(orders)
        ref = got.select(
            "o_custkey",
            F.ntile(4)
            .over(Window.orderBy(F.col("recency_days"), F.col("o_custkey")))
            .alias("ref_r"),
            F.ntile(4)
            .over(
                Window.orderBy(F.col("frequency").desc(), F.col("o_custkey"))
            )
            .alias("ref_f"),
            "r_q",
            "f_q",
        )
        bad = ref.where(
            (F.col("ref_r") != F.col("r_q")) | (F.col("ref_f") != F.col("f_q"))
        ).count()
        assert bad == 0


class TestBasketRules:
    def _baskets(self, spark):
        rows = [
            (1, "beer"), (1, "chips"),
            (2, "beer"), (2, "chips"),
            (3, "beer"), (3, "chips"),
            (4, "beer"), (4, "soda"),
            (5, "chips"),
            (6, "soda"),
            (6, "soda"),  # duplicate line: distinct collapses it
        ]
        return spark.createDataFrame(rows, "basket int, item string")

    def test_known_metrics(self, spark):
        out = {
            (r["antecedent"], r["consequent"]): r
            for r in basket_rules(
                self._baskets(spark),
                basket_col="basket",
                item_col="item",
                min_pair_count=2,
                top_n=100,
            ).collect()
        }
        # 6 baskets; beer in 4, chips in 4, beer&chips in 3
        r = out[("beer", "chips")]
        assert r["n_pair"] == 3
        assert r["support"] == round(3 / 6, 6)
        assert r["confidence"] == round(3 / 4, 6)
        assert r["lift"] == round(3 * 6 / (4 * 4), 6)
        # lift is symmetric, confidence need not be
        assert out[("chips", "beer")]["lift"] == r["lift"]
        # beer&soda co-occur once only -> below min_pair_count
        assert ("beer", "soda") not in out

    def test_top_n_is_deterministic_prefix(self, spark):
        full = basket_rules(
            self._baskets(spark),
            basket_col="basket",
            item_col="item",
            min_pair_count=1,
            top_n=100,
        ).collect()
        top2 = basket_rules(
            self._baskets(spark),
            basket_col="basket",
            item_col="item",
            min_pair_count=1,
            top_n=2,
        ).collect()
        key = lambda r: (-r["lift"], -r["confidence"], r["antecedent"], r["consequent"])
        assert [key(r) for r in top2] == sorted(key(r) for r in full)[:2]


def _ref_pagerank(edges, iters, total=10**12):
    """Independent integer PageRank: dict arithmetic, same floor rules."""
    outw: dict = {}
    for s, d, w in edges:
        outw[s] = outw.get(s, 0) + w
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    tele = ((total * 15) // 100) // n
    r = {v: total // n for v in nodes}
    for _ in range(iters):
        dm = sum((r[v] * 85) // 100 for v in nodes if v not in outw)
        flow = {v: 0 for v in nodes}
        for s, d, w in edges:
            flow[d] += (((r[s] * 85) // 100) * w) // outw[s]
        r = {v: tele + flow[v] + dm // n for v in nodes}
    return r


class TestPagerank:
    EDGES = [
        ("a", "b", 3), ("a", "c", 1),
        ("b", "c", 2),
        ("c", "a", 1),
        ("d", "a", 5),  # d has no in-edges; e is dangling
        ("a", "e", 1),
    ]

    @pytest.mark.parametrize("iters", [1, 3])
    def test_matches_reference(self, spark, iters):
        edges = spark.createDataFrame(self.EDGES, "src string, dst string, w long")
        got = {r["node"]: r["pr_mass"] for r in pagerank(edges, iters=iters).collect()}
        assert got == _ref_pagerank(self.EDGES, iters)

    def test_mass_roughly_conserved_and_sink_accumulates(self, spark):
        edges = spark.createDataFrame(self.EDGES, "src string, dst string, w long")
        rows = pagerank(edges, iters=3).collect()
        total = sum(r["pr_mass"] for r in rows)
        # floors only ever LOSE mass, and at most a few units per node/iter
        assert 10**12 * 0.98 < total <= 10**12
        by = {r["node"]: r for r in rows}
        # hubs with in-flow outrank the source-only node d
        assert by["a"]["pr_mass"] > by["d"]["pr_mass"]
        assert by["c"]["pr_mass"] > by["d"]["pr_mass"]
        # dangling node metadata
        assert by["e"]["n_out"] == 0 and by["e"]["out_weight"] == 0

    def test_empty_graph_raises(self, spark):
        empty = spark.createDataFrame([], "src string, dst string, w long")
        with pytest.raises(ValueError, match="empty"):
            pagerank(empty)


class TestDsirWeights:
    def test_target_vocab_scores_higher(self, spark):
        rows = [
            (1, "alpha beta alpha", "en"),
            (2, "alpha beta gamma", "en"),
            (3, "delta epsilon zeta", "de"),
            (4, "delta delta epsilon", "de"),
            (5, "alpha delta", "fr"),  # mixed vocab -> in between
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
        out = {
            r["doc_id"]: r
            for r in dsir_log_weights(df, F.col("lang") == "en").collect()
        }
        assert out[1]["n_tokens"] == 3
        # target-exclusive vocab scores above raw-exclusive vocab
        assert out[1]["dsir_logw"] > out[5]["dsir_logw"] > out[3]["dsir_logw"]
        # sign of an individual score depends on the smoothing mass at toy
        # scale; only the target-vs-raw ORDERING is the operator's contract
        assert out[2]["dsir_logw"] > out[4]["dsir_logw"]

    def test_empty_target_raises(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta", "de")], "doc_id int, text string, lang string"
        )
        with pytest.raises(ValueError, match="target"):
            dsir_log_weights(df, F.col("lang") == "en")

    def test_tokenless_docs_absent(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha", "en"), (2, "...", "en"), (3, None, "en")],
            "doc_id int, text string, lang string",
        )
        out = dsir_log_weights(df, F.col("lang") == "en").collect()
        assert {r["doc_id"] for r in out} == {1}


class TestBpePairMerge:
    def test_hand_counted_pairs(self, spark, tmp_path):
        import etlutil_spark.queries as Q

        docs = spark.createDataFrame(
            [(1, "aba ab", "en", "s", 6), (2, "aba", "en", "s", 3)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
        out = {
            r["pair"]: r
            for r in Q.QUERIES["docs_bpe_pair_merge"](spark, str(tmp_path)).collect()
        }
        # vocab: aba x2, ab x1 -> pairs: ab (2 from aba + 1 from ab), ba (2)
        assert out["ab"]["weighted_n"] == 3 and out["ab"]["n_positions"] == 2
        assert out["ba"]["weighted_n"] == 2 and out["ba"]["n_positions"] == 1

    def test_repeated_pair_within_word(self, spark, tmp_path):
        import etlutil_spark.queries as Q

        docs = spark.createDataFrame(
            [(1, "aaa aaa", "en", "s", 7)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
        out = {
            r["pair"]: r
            for r in Q.QUERIES["docs_bpe_pair_merge"](spark, str(tmp_path)).collect()
        }
        # vocab: aaa x2; 'aa' occurs at two positions in the one word
        assert out["aa"]["weighted_n"] == 4 and out["aa"]["n_positions"] == 2


class TestCohortLtv:
    def test_hand_built_cohorts(self, spark, tmp_path):
        import etlutil_spark.queries as Q

        rows = [
            (1, 1, "O", 100.0, datetime(2024, 1, 15), "P1"),
            (2, 1, "O", 50.0, datetime(2024, 3, 2), "P1"),
            (3, 2, "O", 70.0, datetime(2024, 3, 10), "P1"),
        ]
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
        out = {
            (r["cohort_month"], r["month_offset"]): r
            for r in Q.QUERIES["orders_cohort_ltv"](spark, str(tmp_path)).collect()
        }
        assert out[("2024-01", 0)]["revenue"] == 100.0
        assert out[("2024-01", 2)]["revenue"] == 50.0
        assert out[("2024-01", 2)]["cum_revenue"] == 150.0
        assert out[("2024-03", 0)]["n_active_customers"] == 1
        assert out[("2024-03", 0)]["cum_revenue"] == 70.0
        assert len(out) == 3


class TestInterArrivalProfile:
    def test_hand_built_gaps(self, spark, tmp_path):
        import etlutil_spark.queries as Q

        rows = [
            (1, datetime(2024, 1, 1, 0, 0, 0), 1, "A", 1.0, "{}"),
            (2, datetime(2024, 1, 1, 0, 0, 10), 1, "B", 1.0, "{}"),
            (3, datetime(2024, 1, 1, 0, 0, 30), 1, "A", 1.0, "{}"),
            (4, datetime(2024, 1, 1, 0, 1, 0), 2, "A", 1.0, "{}"),  # lone event
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        out = {
            r["event_type"]: r
            for r in Q.QUERIES["events_inter_arrival_profile"](
                spark, str(tmp_path)
            ).collect()
        }
        assert out["B"]["n_gaps"] == 1 and out["B"]["median_gap_s"] == 10.0
        assert out["A"]["n_gaps"] == 1 and out["A"]["max_gap_s"] == 20
        assert set(out) == {"A", "B"}  # the lone event contributes no gap


class TestRevenueTrend:
    def test_exact_linear_series(self, spark, tmp_path):
        import etlutil_spark.queries as Q

        rows = [
            (1, 1, "O", 100.0, datetime(2024, 1, 10), "P"),
            (2, 1, "O", 200.0, datetime(2024, 2, 10), "P"),
            (3, 2, "O", 300.0, datetime(2024, 3, 10), "P"),
        ]
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
        row = Q.QUERIES["orders_revenue_trend"](spark, str(tmp_path)).collect()[0]
        assert row["n_months"] == 3
        assert row["slope"] == 100.0
        assert row["intercept"] == 100.0


class TestFramePlan:
    def test_uniform_sampling_arithmetic(self, spark, tmp_path):
        import etlutil_spark.queries as Q

        docs = spark.createDataFrame(
            [(0, "x", "en", "s", 7000)],  # dur = 8000ms, fps 24.00
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
        out = sorted(
            Q.QUERIES["multimodal_frame_plan"](spark, str(tmp_path)).collect(),
            key=lambda r: r["sample_ord"],
        )
        assert len(out) == 8
        for i, r in enumerate(out):
            assert r["ts_ms"] == i * 1000
            assert r["frame_idx"] == (i * 1000 * 2400) // 100000
            assert r["fps_x100"] == 2400


class TestDupSpanFraction:
    def _run(self, spark, tmp_path, docs):
        import etlutil_spark.queries as Q

        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in docs],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
        return {
            r["doc_id"]: r
            for r in Q.QUERIES["docs_dup_span_fraction"](
                spark, str(tmp_path)
            ).collect()
        }

    def test_shared_run_coverage(self, spark, tmp_path):
        shared = "a b c d e f g h"  # 8 tokens, shared verbatim
        out = self._run(
            spark,
            tmp_path,
            [(1, shared + " x y z w"), (2, shared), (3, "p q r")],
        )
        # doc1: only the first shingle is cross-doc -> 8 of 12 covered
        assert out[1]["dup_tokens"] == 8 and out[1]["dup_fraction"] == round(8 / 12, 6)
        assert out[2]["dup_tokens"] == 8 and out[2]["dup_fraction"] == 1.0
        # doc3 is too short for a shingle and shares nothing
        assert out[3]["dup_tokens"] == 0 and out[3]["dup_fraction"] == 0.0

    def test_overlapping_spans_union_not_sum(self, spark, tmp_path):
        run10 = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"  # 10 tokens -> 3 dup shingles
        out = self._run(spark, tmp_path, [(1, run10), (2, run10)])
        # overlapping intervals [1,8],[2,9],[3,10] union to 10, not 24
        assert out[1]["dup_tokens"] == 10 and out[1]["dup_fraction"] == 1.0


class TestQualityDeciles:
    def test_decile_shape_and_monotone_scores(self, spark, sf_dir):
        import etlutil_spark.queries as Q

        rows = Q.QUERIES["docs_quality_deciles"](spark, sf_dir).collect()
        by = {r["decile"]: r for r in rows}
        assert set(by) == set(range(1, 11))
        sizes = [by[i]["n_docs"] for i in range(1, 11)]
        assert max(sizes) - min(sizes) <= 1  # exact equal-count deciles
        scores = [by[i]["avg_score"] for i in range(1, 11)]
        assert scores == sorted(scores, reverse=True)  # decile 1 = best


class TestExactCumsum:
    def test_matches_window_form(self, spark):
        from pyspark.sql.window import Window

        from etlutil_spark.operators.quantiles import exact_cumsum

        df = spark.createDataFrame(
            [(i, (i * 37) % 11) for i in range(200)], "id long, v long"
        )
        got = exact_cumsum(df, "v", ["v", "id"], cumsum_col="cs")
        w = Window.orderBy("v", "id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        ref = df.withColumn("ref", F.sum("v").over(w))
        bad = (
            got.join(ref, ["id", "v"])
            .where(F.col("cs") != F.col("ref"))
            .count()
        )
        assert bad == 0

    def test_decimal_values_exact(self, spark):
        from decimal import Decimal

        from etlutil_spark.operators.quantiles import exact_cumsum

        df = spark.createDataFrame(
            [(i, Decimal(f"{i}.{i % 10}0")) for i in range(1, 50)],
            "id long, v decimal(10,2)",
        )
        rows = sorted(
            exact_cumsum(df, "v", ["id"], cumsum_col="cs").collect(),
            key=lambda r: r["id"],
        )
        running = Decimal(0)
        for r in rows:
            running += r["v"]
            assert r["cs"] == running

    def test_empty_input(self, spark):
        from etlutil_spark.operators.quantiles import exact_cumsum

        df = spark.createDataFrame([], "id long, v long")
        assert exact_cumsum(df, "v", ["id"]).count() == 0

    def test_null_values_match_window_form(self, spark):
        """Rows whose range-partition-local prefix is all-NULL must still
        surface the prior partitions' sum, exactly as SUM() OVER does."""
        from pyspark.sql.window import Window

        from etlutil_spark.operators.quantiles import exact_cumsum

        rows = [(i, None if i % 3 == 0 else i) for i in range(120)]
        df = spark.createDataFrame(rows, "id long, v long")
        got = exact_cumsum(df, "v", ["id"], cumsum_col="cs", n_partitions=8)
        w = Window.orderBy("id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        ref = df.withColumn("ref", F.sum("v").over(w))
        bad = (
            got.join(ref, "id")
            .where(
                ~(
                    (F.col("cs") == F.col("ref"))
                    | (F.col("cs").isNull() & F.col("ref").isNull())
                )
            )
            .count()
        )
        assert bad == 0


class TestAbcClasses:
    def test_partition_and_share_bounds(self, spark, sf_dir):
        import etlutil_spark.queries as Q

        rows = {r["abc_class"]: r for r in Q.QUERIES["lineitem_abc_classes"](spark, sf_dir).collect()}
        assert set(rows) <= {"A", "B", "C"} and "A" in rows
        total_share = sum(r["rev_share"] for r in rows.values())
        assert abs(total_share - 1.0) < 1e-4
        # A covers at most 80% of revenue and the head is revenue-denser
        # than its part-count share
        n_total = sum(r["n_parts"] for r in rows.values())
        assert rows["A"]["rev_share"] <= 0.8 + 1e-9
        assert rows["A"]["rev_share"] > rows["A"]["n_parts"] / n_total


class TestTimeToConvert:
    def test_hand_built_funnel(self, spark, tmp_path):
        import etlutil_spark.queries as Q

        rows = [
            # user 1 converts in 100s
            (1, datetime(2024, 1, 1, 0, 0, 0), 1, "view", 1.0, "{}"),
            (2, datetime(2024, 1, 1, 0, 1, 40), 1, "purchase", 1.0, "{}"),
            # user 2 converts in 300s (first view / first purchase rule)
            (3, datetime(2024, 1, 1, 0, 0, 0), 2, "view", 1.0, "{}"),
            (4, datetime(2024, 1, 1, 0, 2, 0), 2, "view", 1.0, "{}"),
            (5, datetime(2024, 1, 1, 0, 5, 0), 2, "purchase", 1.0, "{}"),
            # user 3: purchase BEFORE any view -> not a converter
            (6, datetime(2024, 1, 1, 0, 0, 0), 3, "purchase", 1.0, "{}"),
            (7, datetime(2024, 1, 1, 0, 1, 0), 3, "view", 1.0, "{}"),
            # user 4: view only
            (8, datetime(2024, 1, 1, 0, 0, 0), 4, "view", 1.0, "{}"),
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        r = Q.QUERIES["events_time_to_convert"](spark, str(tmp_path)).collect()[0]
        assert r["n_converters"] == 2
        assert r["median_s"] == 200.0  # interpolated between 100 and 300
        assert r["avg_s"] == 200.0


class TestLangConfusion:
    def test_matrix_shares_sum_to_one(self, spark, sf_dir):
        import etlutil_spark.queries as Q

        rows = Q.QUERIES["docs_lang_confusion"](spark, sf_dir).collect()
        by_label: dict = {}
        for r in rows:
            by_label.setdefault(r["labeled_lang"], []).append(r)
        for label, cells in by_label.items():
            assert abs(sum(c["label_share"] for c in cells) - 1.0) < 1e-4
            assert all(c["n_docs"] > 0 for c in cells)


class TestRunningMax:
    def test_matches_window_form(self, spark):
        from pyspark.sql.window import Window

        from etlutil_spark.operators.quantiles import exact_running_max

        df = spark.createDataFrame(
            [(i, (i * 73) % 29) for i in range(300)], "id long, v long"
        )
        got = exact_running_max(df, "v", ["id"], out_col="rm")
        w = Window.orderBy("id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        ref = df.withColumn("ref", F.max("v").over(w))
        bad = got.join(ref, ["id", "v"]).where(F.col("rm") != F.col("ref")).count()
        assert bad == 0

    def test_null_values_ignored(self, spark):
        from etlutil_spark.operators.quantiles import exact_running_max

        df = spark.createDataFrame(
            [(1, 5), (2, None), (3, 2), (4, 9)], "id long, v long"
        )
        rows = {
            r["id"]: r["rm"]
            for r in exact_running_max(df, "v", ["id"], out_col="rm").collect()
        }
        assert rows == {1: 5, 2: 5, 3: 5, 4: 9}


class TestLatenessProfile:
    def test_hand_built_arrival_order(self, spark, tmp_path):
        import etlutil_spark.queries as Q

        rows = [
            # arrival (event_id) order; ts seconds offsets 0, 100, 40, 4000
            (1, datetime(2024, 1, 1, 0, 0, 0), 1, "view", 1.0, "{}"),
            (2, datetime(2024, 1, 1, 0, 1, 40), 1, "view", 1.0, "{}"),
            (3, datetime(2024, 1, 1, 0, 0, 40), 1, "view", 1.0, "{}"),  # 60s late
            (4, datetime(2024, 1, 1, 1, 6, 40), 1, "view", 1.0, "{}"),
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        out = {
            r["lateness_bucket"]: r
            for r in Q.QUERIES["events_lateness_profile"](
                spark, str(tmp_path)
            ).collect()
        }
        assert out["0_on_time"]["n_events"] == 3
        # event 3 is exactly 60s behind the high-water mark of event 2
        assert out["2_lt_10m"]["n_events"] == 1
        assert out["2_lt_10m"]["max_late_s"] == 60


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(starts=st.sets(st.integers(1, 60), min_size=1, max_size=25))
def test_lead_cap_formula_equals_interval_union(starts):
    """docs_dup_span_fraction counts covered positions as
    sum(min(k, gap-to-next-start)) over sorted duplicate-shingle starts;
    that closed form must equal the brute-force union of [p, p+k-1]
    intervals for every start layout."""
    k = 8
    ss = sorted(starts)
    covered: set = set()
    for p in ss:
        covered.update(range(p, p + k))
    total = sum(
        min(k, ss[i + 1] - ss[i]) if i + 1 < len(ss) else k
        for i in range(len(ss))
    )
    assert total == len(covered)


class TestEntropyBySource:
    def test_flat_vs_skewed_sources(self, spark, tmp_path):
        import math

        import etlutil_spark.queries as Q

        docs = [
            (1, "a b c d", "en", "flat", 7),
            (2, "e f g h", "en", "flat", 7),      # flat: 8 distinct tokens once
            (3, "x x x x", "en", "skew", 7),
            (4, "x x x y", "en", "skew", 7),      # skew: x dominates
        ]
        spark.createDataFrame(
            docs,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
        out = {
            r["source"]: r
            for r in Q.QUERIES["docs_entropy_by_source"](
                spark, str(tmp_path)
            ).collect()
        }
        assert out["flat"]["vocab"] == 8
        assert abs(out["flat"]["token_entropy"] - math.log(8)) < 1e-5
        assert abs(out["flat"]["norm_entropy"] - 1.0) < 1e-5
        assert out["skew"]["norm_entropy"] < 0.6


class TestActivityStreaks:
    def test_hand_built_streaks(self, spark, tmp_path):
        import etlutil_spark.queries as Q

        rows = [
            # user 1: days 1,2,3 then 5 -> max streak 3
            (1, datetime(2024, 1, 1), 1), (2, datetime(2024, 1, 2), 1),
            (3, datetime(2024, 1, 3), 1), (4, datetime(2024, 1, 5), 1),
            # user 2: one day twice -> max streak 1
            (5, datetime(2024, 1, 1), 2), (6, datetime(2024, 1, 1, 9), 2),
            # user 3: days 1,2 -> max streak 2
            (7, datetime(2024, 2, 1), 3), (8, datetime(2024, 2, 2), 3),
        ]
        spark.createDataFrame(
            [(i, ts, u, "view", 1.0, "{}") for i, ts, u in rows],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        out = {
            r["max_streak"]: r["n_users"]
            for r in Q.QUERIES["user_activity_streaks"](spark, str(tmp_path)).collect()
        }
        assert out == {3: 1, 1: 1, 2: 1}


class TestChangepointCusum:
    def test_level_shift_located(self, spark, tmp_path):
        import etlutil_spark.queries as Q

        rows = []
        eid = 0
        # 10 days at 2 events/day, then 10 days at 8 events/day:
        # the cusum trough sits at the last low day (2024-01-10)
        for day in range(1, 21):
            for _ in range(2 if day <= 10 else 8):
                eid += 1
                rows.append((eid, datetime(2024, 1, day, 12), 1, "view", 1.0, "{}"))
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        r = Q.QUERIES["events_changepoint_cusum"](spark, str(tmp_path)).collect()[0]
        assert str(r["peak_day"]) == "2024-01-10"
        assert r["n_days"] == 20
        assert r["direction"] == -1  # counts below the mean before the shift
        assert r["peak_cusum"] == -30.0  # 10 days * (2 - 5 mean) = -30
