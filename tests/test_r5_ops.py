"""Round-5 operators: TF-IDF / BM25 / bigram LM counts, weighted
sampling, sweep-line interval concurrency, native HLL sketches, and
embedding dimension statistics. Catalog-level Spark-vs-DuckDB parity for
the oracle-backed queries lives in test_oracle_parity.py; these tests
pin the operator semantics on hand-built frames where the expected
answer is computable by hand (or a reference formula in plain Python)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox naps under the lazy dog"),
        (3, "spark shuffles partition data across executors"),
        (4, "the dog naps"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestTfIdf:
    def test_distinctive_terms_win(self, docs):
        from etlutil_spark.operators.text_analysis import tfidf_top_terms

        out = tfidf_top_terms(docs, 2).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        # every doc gets at most k rows, ranked 1..k
        for doc_id, rs in by_doc.items():
            assert [r.rnk for r in sorted(rs, key=lambda r: r.rnk)] == list(
                range(1, len(rs) + 1)
            )
        # doc 3 shares no vocabulary: every term has df=1, tf=1 — top
        # terms are the alphabetically first (ties break term ASC)
        d3 = sorted(by_doc[3], key=lambda r: r.rnk)
        assert [r.term for r in d3] == ["across", "data"]
        # 'the' appears in 3 of 4 docs: idf = ln(4/3), and with tf=2 it
        # must still lose to a doc-unique term (idf = ln 4) in doc 1
        d1_terms = {r.term for r in by_doc[1]}
        assert "the" not in d1_terms

    def test_score_formula(self, docs):
        from etlutil_spark.operators.text_analysis import tfidf_top_terms

        out = {(r.doc_id, r.term): r for r in tfidf_top_terms(docs, 2).collect()}
        r = out[(1, "fox")] if (1, "fox") in out else None
        if r is not None:  # fox: tf=1 in doc1, df=2
            assert r.tfidf == pytest.approx(round(1 * math.log(4 / 2), 6))
        # deterministic across runs
        again = {(r.doc_id, r.term): r.tfidf for r in tfidf_top_terms(docs, 2).collect()}
        assert {k: v.tfidf for k, v in out.items()} == again


class TestBm25:
    def test_matches_reference_formula(self, docs):
        from etlutil_spark.operators.text_analysis import bm25_search

        got = {r.doc_id: r for r in bm25_search(docs, ["dog", "spark"], k=10).collect()}
        # plain-Python reference implementation
        corpus = {
            1: "the quick brown fox jumps over the lazy dog".split(),
            2: "the quick brown fox naps under the lazy dog".split(),
            3: "spark shuffles partition data across executors".split(),
            4: "the dog naps".split(),
        }
        n = len(corpus)
        avgdl = sum(len(t) for t in corpus.values()) / n
        k1, b = 1.2, 0.75
        expected = {}
        for q in ["dog", "spark"]:
            df_q = sum(1 for t in corpus.values() if q in t)
            if df_q == 0:
                continue
            idf = math.log(1 + (n - df_q + 0.5) / (df_q + 0.5))
            for doc_id, toks in corpus.items():
                tf = toks.count(q)
                if tf == 0:
                    continue
                contrib = idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(toks) / avgdl)
                )
                expected[doc_id] = expected.get(doc_id, 0.0) + round(contrib, 9)
        assert set(got) == set(expected)
        for doc_id, score in expected.items():
            assert got[doc_id].bm25 == pytest.approx(round(score, 6), abs=2e-6)
        # doc 3 matches only 'spark'; docs 1/2/4 only 'dog'
        assert got[3].n_matched_terms == 1

    def test_no_match_no_row(self, docs):
        from etlutil_spark.operators.text_analysis import bm25_search

        assert bm25_search(docs, ["zzzmissing"], k=10).count() == 0


class TestBigrams:
    def test_exact_counts(self, docs):
        from etlutil_spark.operators.text_analysis import bigram_counts

        got = {r.bigram: r.n for r in bigram_counts(docs, 100).collect()}
        assert got["the quick"] == 2
        assert got["quick brown"] == 2
        assert got["lazy dog"] == 2
        assert got["the dog"] == 1
        assert got["spark shuffles"] == 1
        # single-token docs contribute nothing; total = sum(len-1)
        assert sum(got.values()) == (9 - 1) * 2 + (6 - 1) + (3 - 1)

    def test_topk_order_ties_on_bigram(self, docs):
        from etlutil_spark.operators.text_analysis import bigram_counts

        rows = bigram_counts(docs, 5).collect()
        keys = [(-r.n, r.bigram) for r in rows]
        assert keys == sorted(keys)


class TestWeightedSample:
    def test_exact_n_deterministic_and_weight_sensitive(self, spark):
        from etlutil_spark.operators.sampling import weighted_sample

        rows = [(i, 1e9 if i < 10 else 1e-9) for i in range(110)]
        df = spark.createDataFrame(rows, "id bigint, w double")
        out = weighted_sample(df, 10, "w", "id", seed="t1")
        ids = sorted(r.id for r in out.collect())
        # heavy rows have priority u^(1e-9) ~ 1, light u^(1e9) ~ 0:
        # the sample IS the heavy block
        assert ids == list(range(10))
        again = sorted(r.id for r in weighted_sample(df, 10, "w", "id", seed="t1").collect())
        assert again == ids
        # a different seed still returns exactly n
        assert weighted_sample(df, 25, "w", "id", seed="t2").count() == 25

    def test_invalid_weights_dropped_and_bad_n_raises(self, spark):
        from etlutil_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame(
            [(1, 2.0), (2, 0.0), (3, -1.0), (4, None)], "id bigint, w double"
        )
        assert [r.id for r in weighted_sample(df, 10, "w", "id").collect()] == [1]
        with pytest.raises(ValueError, match="positive"):
            weighted_sample(df, 0, "w", "id")


class TestIntervalConcurrency:
    def test_peak_and_half_open_boundary(self, spark):
        from etlutil_spark.operators.rangejoin import interval_concurrency

        d = dt.date
        rows = [
            # key a: [1,5) [2,4) [3,8) -> peak 3 at day 3; [5,6) reuses
            # the slot freed at 5 (half-open: close before open)
            ("a", d(2024, 1, 1), d(2024, 1, 5)),
            ("a", d(2024, 1, 2), d(2024, 1, 4)),
            ("a", d(2024, 1, 3), d(2024, 1, 8)),
            ("a", d(2024, 1, 5), d(2024, 1, 6)),
            # key b: back-to-back [1,2) [2,3) never overlap
            ("b", d(2024, 1, 1), d(2024, 1, 2)),
            ("b", d(2024, 1, 2), d(2024, 1, 3)),
        ]
        df = spark.createDataFrame(rows, "k string, s date, e date")
        got = {r.k: r for r in interval_concurrency(df, "k", "s", "e").collect()}
        assert got["a"].peak_concurrent == 3
        assert got["a"].peak_at == d(2024, 1, 3)
        assert got["b"].peak_concurrent == 1
        assert got["b"].peak_at == d(2024, 1, 1)


class TestHll:
    def test_error_bound_vs_exact(self, spark):
        from etlutil_spark.operators.sketch import hll_distinct
        from etlutil_spark.sources.testdata import load_table

        ev = load_table(spark, "events", SF).select(
            F.to_date("ts").alias("day"), "user_id"
        )
        est = {r.day: r.est_distinct for r in hll_distinct(ev, ["day"], "user_id").collect()}
        exact = {
            r.day: r.n
            for r in ev.groupBy("day").agg(F.countDistinct("user_id").alias("n")).collect()
        }
        assert set(est) == set(exact)
        for day, n in exact.items():
            assert abs(est[day] - n) / max(n, 1) < 0.05, (day, est[day], n)

    def test_rollup_merges_sketches_losslessly(self, spark):
        from etlutil_spark.operators.sketch import hll_distinct, hll_rollup
        from etlutil_spark.sources.testdata import load_table

        ev = load_table(spark, "events", SF).select(
            F.date_trunc("week", "ts").cast("date").alias("week"),
            F.to_date("ts").alias("day"),
            "user_id",
        )
        daily = hll_distinct(ev, ["week", "day"], "user_id")
        rolled = {
            r.week: r.est_distinct for r in hll_rollup(daily, ["week"]).collect()
        }
        direct = {
            r.week: r.est_distinct
            for r in hll_distinct(ev, ["week"], "user_id").collect()
        }
        # merging daily sketches must give the same estimate as sketching
        # the week directly — the property that makes stored sketches
        # answer arbitrary-range questions without rescanning
        assert rolled == direct


class TestEmbeddingDimProfile:
    def test_matches_numpy(self, spark):
        import numpy as np

        from etlutil_spark.operators.profile import embedding_dim_profile

        mat = np.array(
            [[1.0, -2.0, 0.5], [3.0, 0.0, 0.25], [-1.0, 4.0, 0.125], [0.5, 2.0, 1.0]]
        )
        df = spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
            "vec_id bigint, embedding array<float>",
        )
        got = {r.dim: r for r in embedding_dim_profile(df).collect()}
        assert set(got) == {0, 1, 2}
        for dim in range(3):
            col = mat[:, dim]
            assert got[dim].n == 4
            assert got[dim].mean == pytest.approx(round(col.mean(), 6))
            assert got[dim].std == pytest.approx(round(col.std(ddof=1), 6), abs=1e-6)
            assert got[dim].min_v == pytest.approx(col.min())
            assert got[dim].max_v == pytest.approx(col.max())


class TestTrailingWindow:
    def test_time_anchored_frame(self, spark):
        from etlutil_spark.operators.timeseries import trailing_window

        ts = dt.datetime
        rows = [
            # user 1: events on day 1, 3, 9, 11 — 7-day trailing frames
            (1, 1, ts(2024, 1, 1, 12), 10.0),
            (2, 1, ts(2024, 1, 3, 12), 20.0),   # includes day 1
            (3, 1, ts(2024, 1, 9, 12), 40.0),   # includes day 3 (6d), not day 1 (8d)
            (4, 1, ts(2024, 1, 11, 12), 80.0),  # includes day 9; day 3 is exactly 8d
            # user 2 isolated
            (5, 2, ts(2024, 1, 9, 12), 5.0),
        ]
        df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, ts timestamp, value double")
        got = {r.event_id: r for r in trailing_window(df, "user_id", "ts", "value", days=7).collect()}
        assert (got[1].trail_sum, got[1].trail_n) == (10.0, 1)
        assert (got[2].trail_sum, got[2].trail_n) == (30.0, 2)
        assert (got[3].trail_sum, got[3].trail_n) == (60.0, 2)
        assert (got[4].trail_sum, got[4].trail_n) == (120.0, 2)
        assert (got[5].trail_sum, got[5].trail_n) == (5.0, 1)

    def test_exact_boundary_inclusive(self, spark):
        from etlutil_spark.operators.timeseries import trailing_window

        ts = dt.datetime
        rows = [
            (1, 1, ts(2024, 1, 1, 0, 0, 0), 1.0),
            (2, 1, ts(2024, 1, 8, 0, 0, 0), 2.0),  # exactly 7d later: in frame
        ]
        df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, ts timestamp, value double")
        got = {r.event_id: r for r in trailing_window(df, "user_id", "ts", "value", days=7).collect()}
        assert (got[2].trail_sum, got[2].trail_n) == (3.0, 2)


class TestPsiDrift:
    def test_identical_cohorts_zero_psi(self, spark):
        from etlutil_spark.operators.profile import psi_drift

        rows = [(float(v), c) for v in range(100) for c in ("a", "b")]
        df = spark.createDataFrame(rows, "v double, cohort string")
        out = psi_drift(df, "v", "cohort", "a", "b", bins=5, lo=0.0, hi=100.0).collect()
        assert len(out) == 5
        assert all(r.psi_term == 0.0 for r in out)
        assert all(r.n_base == r.n_test == 20 for r in out)

    def test_shifted_cohort_flags_drift(self, spark):
        from etlutil_spark.operators.profile import psi_drift

        rows = [(float(v % 50), "a") for v in range(200)] + [
            (float(50 + v % 50), "b") for v in range(200)
        ]
        df = spark.createDataFrame(rows, "v double, cohort string")
        out = psi_drift(df, "v", "cohort", "a", "b", bins=4, lo=0.0, hi=100.0).collect()
        total = sum(r.psi_term for r in out)
        assert total > 0.25  # fully disjoint supports => strong drift
        with pytest.raises(ValueError, match="bins"):
            psi_drift(df, "v", "cohort", "a", "b", bins=0)

    def test_outliers_clamp_to_edge_bins(self, spark):
        from etlutil_spark.operators.profile import psi_drift

        df = spark.createDataFrame(
            [(-100.0, "a"), (1e9, "a"), (5.0, "b")], "v double, cohort string"
        )
        out = {r.bin: r for r in psi_drift(df, "v", "cohort", "a", "b", bins=3, lo=0.0, hi=9.0).collect()}
        assert out[0].n_base == 1 and out[2].n_base == 1
        assert out[1].n_test == 1


class TestStreamStreamJoin:
    def test_stream_matches_batch(self, spark):
        from etlutil_spark.sources.testdata import load_table
        from etlutil_spark.streaming.events import (
            run_stream_query,
            stream_events_from_dir,
        )
        from etlutil_spark.streaming.joins import clicks_before_purchases

        src = f"{SF}/events.parquet"
        sp = stream_events_from_dir(spark, src).where(F.col("event_type") == "purchase")
        sc = stream_events_from_dir(spark, src).where(F.col("event_type") == "click")
        got = run_stream_query(
            clicks_before_purchases(sp, sc),
            query_name="t_ss_join",
            output_mode="append",
        )
        ev = load_table(spark, "events", SF)
        batch = clicks_before_purchases(
            ev.where(F.col("event_type") == "purchase"),
            ev.where(F.col("event_type") == "click"),
        )
        s = {tuple(r) for r in got.collect()}
        b = {tuple(r) for r in batch.collect()}
        assert s == b and len(b) > 0


class TestScreenAgainstCorpus:
    def test_flags_only_cross_split_dups(self, spark):
        from etlutil_spark.operators.dedup import (
            minhash_band_index,
            screen_against_corpus,
        )

        base = "the quick brown fox jumps over the lazy dog near the river"
        rows = [
            (1, base + " bank"),                      # corpus
            (2, base + " bend"),                      # corpus near-dup of 1
            (3, "completely different text about spark shuffle engines today"),
            (10, base + " bank"),                     # NEW: dup of corpus 1/2
            (11, "unrelated fresh content with no corpus overlap at all ok"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        new = df.where(F.col("doc_id") >= 10)
        corpus = df.where(F.col("doc_id") < 10)
        got = screen_against_corpus(
            new, corpus, "doc_id", "text", verify_threshold=0.5
        ).collect()
        pairs = {(r.new_id, r.corpus_id) for r in got}
        assert (10, 1) in pairs  # exact dup found
        assert all(r.new_id >= 10 and r.corpus_id < 10 for r in got)
        assert not any(r.new_id == 11 for r in got)  # clean doc stays clean
        # corpus-internal pair (1,2) must NOT appear: screening is new-vs-
        # corpus only, never corpus self-dedup
        assert not any(p == (1, 2) or p == (2, 1) for p in pairs)
        # prebuilt stored index gives the identical answer
        idx = minhash_band_index(corpus, "doc_id", "text")
        again = screen_against_corpus(
            new, corpus, "doc_id", "text", verify_threshold=0.5, corpus_index=idx
        ).collect()
        assert {(r.new_id, r.corpus_id, r.jaccard) for r in again} == {
            (r.new_id, r.corpus_id, r.jaccard) for r in got
        }

    def test_candidates_only_mode(self, spark):
        from etlutil_spark.operators.dedup import screen_against_corpus

        df = spark.createDataFrame(
            [(1, "a b c d e f g h"), (10, "a b c d e f g h")],
            "doc_id bigint, text string",
        )
        out = screen_against_corpus(
            df.where(F.col("doc_id") >= 10),
            df.where(F.col("doc_id") < 10),
            "doc_id",
            "text",
            verify_threshold=None,
        )
        assert out.columns == ["new_id", "corpus_id"]
        assert [(r.new_id, r.corpus_id) for r in out.collect()] == [(10, 1)]


class TestTokenDrift:
    def test_identical_cohorts_zero_kl(self, spark):
        from etlutil_spark.operators.text_analysis import token_drift

        rows = [(c, "alpha beta gamma alpha") for c in ("a", "b")]
        df = spark.createDataFrame(rows, "cohort string, text string")
        out = token_drift(df, F.col("cohort") == "a").collect()
        assert {r.term for r in out} == {"alpha", "beta", "gamma"}
        assert all(r.kl_term == 0.0 for r in out)
        assert all(r.p_base == r.p_test for r in out)

    def test_shifted_token_flags_positive_kl(self, spark):
        from etlutil_spark.operators.text_analysis import token_drift

        rows = [
            ("a", "alpha alpha alpha alpha beta"),
            ("b", "beta beta beta beta alpha"),
        ]
        df = spark.createDataFrame(rows, "cohort string, text string")
        out = {r.term: r for r in token_drift(df, F.col("cohort") == "a").collect()}
        # alpha is over-represented in base -> positive kl contribution;
        # beta under-represented -> negative; total KL > 0
        assert out["alpha"].kl_term > 0
        assert out["beta"].kl_term < 0
        assert sum(r.kl_term for r in out.values()) > 0
        # vocabulary-absent smoothing: a term only in base still finite
        rows2 = [("a", "only base words"), ("b", "different test words")]
        df2 = spark.createDataFrame(rows2, "cohort string, text string")
        out2 = {r.term: r for r in token_drift(df2, F.col("cohort") == "a").collect()}
        assert out2["only"].n_test == 0 and out2["only"].p_test > 0


class TestFunnelAndRetention:
    def test_funnel_strict_order(self, spark):
        import datetime as dtm

        from etlutil_spark.operators.analytics import funnel_counts

        t = lambda h: dtm.datetime(2024, 1, 1, h)  # noqa: E731
        rows = [
            # u1 completes in order
            (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
            # u2 clicks BEFORE viewing: click must not count
            (2, t(2), "click"), (2, t(3), "view"),
            # u3 views only
            (3, t(1), "view"),
            # u4 purchase exactly AT the click time: strict > excludes it
            (4, t(1), "view"), (4, t(2), "click"), (4, t(2), "purchase"),
        ]
        df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_type string")
        got = {r.step: r for r in funnel_counts(df, ["view", "click", "purchase"]).collect()}
        assert got["view"].n_users == 4
        assert got["click"].n_users == 2  # u1 and u4
        assert got["purchase"].n_users == 1  # u1 only
        assert [got[s].step_idx for s in ("view", "click", "purchase")] == [1, 2, 3]
        with pytest.raises(ValueError, match="non-empty"):
            funnel_counts(df, [])

    def test_funnel_empty_stage_emits_no_row(self, spark):
        import datetime as dtm

        from etlutil_spark.operators.analytics import funnel_counts

        df = spark.createDataFrame(
            [(1, dtm.datetime(2024, 1, 1), "view")],
            "user_id bigint, ts timestamp, event_type string",
        )
        got = funnel_counts(df, ["view", "click"]).collect()
        assert [(r.step, r.n_users) for r in got] == [("view", 1)]

    def test_retention_matrix(self, spark):
        import datetime as dtm

        from etlutil_spark.operators.analytics import retention_cohorts

        d = lambda day: dtm.datetime(2024, 1, day, 12)  # noqa: E731
        rows = [
            (1, d(1)), (1, d(8)), (1, d(22)),   # cohort W0, offsets 0,1,3
            (2, d(1)), (2, d(2)),               # same week twice -> one offset-0
            (3, d(8)),                          # cohort W1, offset 0 only
        ]
        df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
        got = {(r.cohort_p.isoformat(), r.period_offset): r.n_users
               for r in retention_cohorts(df).collect()}
        assert got[("2024-01-01", 0)] == 2   # u1, u2
        assert got[("2024-01-01", 1)] == 1   # u1
        assert got[("2024-01-01", 3)] == 1   # u1
        assert got[("2024-01-08", 0)] == 1   # u3
        assert ("2024-01-01", 2) not in got
        with pytest.raises(ValueError, match="period"):
            retention_cohorts(df, period="month")


class TestTransitionMatrix:
    def test_counts_and_row_normalization(self, spark):
        import datetime as dtm

        from etlutil_spark.operators.analytics import transition_matrix

        t = lambda h: dtm.datetime(2024, 1, 1, h)  # noqa: E731
        rows = [
            (1, 1, t(1), "a"), (2, 1, t(2), "b"), (3, 1, t(3), "a"),
            (4, 1, t(4), "b"),
            (5, 2, t(1), "a"), (6, 2, t(2), "a"),
            # user boundary: no transition from u1's last to u2's first
        ]
        df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, ts timestamp, event_type string")
        got = {(r.prev_type, r.next_type): r for r in transition_matrix(df).collect()}
        assert got[("a", "b")].n == 2
        assert got[("b", "a")].n == 1
        assert got[("a", "a")].n == 1
        assert ("b", "b") not in got
        # rows normalize within prev_type: a -> {b: 2/3, a: 1/3}
        assert got[("a", "b")].p == pytest.approx(0.666667)
        assert got[("a", "a")].p == pytest.approx(0.333333)
        assert got[("b", "a")].p == 1.0

    def test_timestamp_tie_deterministic(self, spark):
        import datetime as dtm

        from etlutil_spark.operators.analytics import transition_matrix

        ts = dtm.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(1, 1, ts, "x"), (2, 1, ts, "y"), (3, 1, ts, "z")],
            "event_id bigint, user_id bigint, ts timestamp, event_type string",
        )
        runs = [
            {(r.prev_type, r.next_type) for r in transition_matrix(df).collect()}
            for _ in range(2)
        ]
        assert runs[0] == runs[1] == {("x", "y"), ("y", "z")}
