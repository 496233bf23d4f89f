"""Late-r5 operators: training-mixture rebalancing (mixture_rates /
mixture_sample) and linear quality-model scoring (quality_model_score).
Catalog-level Spark-vs-DuckDB parity for their registered queries lives in
test_oracle_parity.py; these tests pin the operator semantics on
hand-built frames where the expected answer is computable in plain
Python."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    # three sources with very different weight totals: src_a 1000 rows of
    # weight 10, src_b 100 rows of weight 10, src_c 50 rows of weight 2,
    # plus a stratum that no target mentions
    rows = (
        [(i, "src_a", 10) for i in range(1000)]
        + [(10_000 + i, "src_b", 10) for i in range(100)]
        + [(20_000 + i, "src_c", 2) for i in range(50)]
        + [(30_000 + i, "src_junk", 10) for i in range(25)]
    )
    return spark.createDataFrame(rows, "doc_id bigint, source string, w int")


class TestMixtureRates:
    def test_rates_match_closed_form(self, corpus):
        from etlutil_spark.operators.sampling import mixture_rates

        shares = {"src_a": 0.5, "src_b": 0.4, "src_c": 0.1}
        rates = {
            r["source"]: r["_rate"]
            for r in mixture_rates(
                corpus, "source", shares, weight_col="w"
            ).collect()
        }
        # W_a=10000, W_b=1000, W_c=100 -> T = min(20000, 2500, 1000) = 1000
        assert rates["src_a"] == pytest.approx(0.5 * 1000 / 10000)
        assert rates["src_b"] == pytest.approx(0.4 * 1000 / 1000)
        assert rates["src_c"] == pytest.approx(0.1 * 1000 / 100)
        # the binding stratum (min W_s/share_s = src_c) keeps everything
        assert rates["src_c"] == 1.0
        assert all(v <= 1.0 for v in rates.values())
        # strata outside the target get no rate row at all
        assert "src_junk" not in rates

    def test_row_weighted_when_no_weight_col(self, corpus):
        from etlutil_spark.operators.sampling import mixture_rates

        rates = {
            r["source"]: r["_rate"]
            for r in mixture_rates(
                corpus, "source", {"src_a": 0.8, "src_c": 0.2}
            ).collect()
        }
        # counts: a=1000, c=50 -> T = min(1250, 250) = 250
        assert rates["src_a"] == pytest.approx(0.8 * 250 / 1000)
        assert rates["src_c"] == 1.0

    def test_invalid_shares_raise(self, corpus):
        from etlutil_spark.operators.sampling import mixture_rates

        with pytest.raises(ValueError, match="negative"):
            mixture_rates(corpus, "source", {"src_a": -0.1})
        with pytest.raises(ValueError, match="positive"):
            mixture_rates(corpus, "source", {"src_a": 0.0})

    def test_typoed_stratum_raises_instead_of_renormalizing(self, corpus):
        from etlutil_spark.operators.sampling import mixture_rates

        # 'src_bb' (meant 'src_b') has no corpus rows: silently dropping
        # it would deliver a 100%-src_a "mixture" nobody asked for
        with pytest.raises(ValueError, match="src_bb"):
            mixture_rates(corpus, "source", {"src_a": 0.2, "src_bb": 0.8})

    def test_degenerate_weight_total_raises_with_stratum_name(self, spark):
        from etlutil_spark.operators.sampling import mixture_rates

        # src_z has rows but all-NULL weights; src_y sums to 0 — both
        # previously died in the rate arithmetic (TypeError /
        # ZeroDivisionError) without naming the offending stratum
        df = spark.createDataFrame(
            [(1, "src_x", 10), (2, "src_z", None), (3, "src_y", 0)],
            "doc_id bigint, source string, w int",
        )
        with pytest.raises(ValueError, match="src_z"):
            mixture_rates(
                df, "source", {"src_x": 0.5, "src_z": 0.5}, weight_col="w"
            )
        with pytest.raises(ValueError, match="src_y"):
            mixture_rates(
                df, "source", {"src_x": 0.5, "src_y": 0.5}, weight_col="w"
            )

    def test_non_string_stratum_column(self, spark):
        from etlutil_spark.operators.sampling import mixture_rates

        # int source ids must round-trip through the rates frame with
        # their own type (the schema was previously hardcoded to string)
        df = spark.createDataFrame(
            [(i, i % 2, 1) for i in range(100)],
            "doc_id bigint, source_id bigint, w int",
        )
        rates = mixture_rates(df, "source_id", {0: 0.5, 1: 0.5})
        assert dict(rates.dtypes)["source_id"] == "bigint"
        got = {r["source_id"]: r["_rate"] for r in rates.collect()}
        assert got == {0: 1.0, 1: 1.0}


class TestMixtureSample:
    def test_mixture_approaches_target_and_never_upsamples(self, corpus):
        from etlutil_spark.operators.sampling import mixture_sample

        shares = {"src_a": 0.5, "src_b": 0.4, "src_c": 0.1}
        kept = mixture_sample(
            corpus, "source", shares, "doc_id", weight_col="w", seed="t1"
        )
        got = {
            r["source"]: (r["n"], r["wsum"])
            for r in kept.groupBy("source")
            .agg(F.count("*").alias("n"), F.sum("w").alias("wsum"))
            .collect()
        }
        orig = {"src_a": (1000, 10000), "src_b": (100, 1000), "src_c": (50, 100)}
        assert "src_junk" not in got
        total_w = sum(w for _, w in got.values())
        for s, (n, w) in got.items():
            assert n <= orig[s][0] and w <= orig[s][1]  # downsample only
            # hash sampling is binomial around the rate: 3 sigma of
            # sqrt(p(1-p)N) on the row counts keeps this deterministic-ish
            assert w / total_w == pytest.approx(shares[s], abs=0.06)
        # the binding stratum (rate 1.0) is kept in full
        assert got["src_c"] == orig["src_c"]

    def test_deterministic_across_runs(self, corpus):
        from etlutil_spark.operators.sampling import mixture_sample

        shares = {"src_a": 0.3, "src_b": 0.7}
        a = sorted(
            r["doc_id"]
            for r in mixture_sample(
                corpus, "source", shares, "doc_id", seed="t2"
            ).collect()
        )
        b = sorted(
            r["doc_id"]
            for r in mixture_sample(
                corpus, "source", shares, "doc_id", seed="t2"
            ).collect()
        )
        assert a == b and len(a) > 0


class TestQualityModelScore:
    def test_score_matches_hand_formula(self, spark):
        from etlutil_spark.operators.text_analysis import (
            DEFAULT_QUALITY_WEIGHTS as W,
            quality_model_score,
        )

        text = "the quick brown fox jumps over the lazy dog"
        df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
        row = quality_model_score(df, "text").collect()[0]
        toks = text.lower().split()
        n = len(toks)
        stop = {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"}
        len_norm = round(min(n / 50.0, 1.0), 6)
        alpha = round(
            sum(c.isalpha() or c == " " for c in text) / len(text), 6
        )
        stop_sat = round(
            min(sum(t in stop for t in toks) / n * 5.0, 1.0), 6
        )
        dup = round(1.0 - len(set(toks)) / n, 6)
        expected = round(
            W["bias"]
            + W["len_norm"] * len_norm
            + W["alpha"] * alpha
            + W["stop_sat"] * stop_sat
            + W["dup"] * dup,
            6,
        )
        # 2e-6: Python round() is banker's, Spark's is HALF_UP — a logit
        # landing on a .xxxxxx5 boundary rounds apart by one ulp-of-rounding
        assert row["model_score"] == pytest.approx(expected, abs=2e-6)
        assert row["kept"] == int(row["model_score"] >= 0.55)

    def test_kept_flag_consistent_and_threshold_respected(self, spark):
        from etlutil_spark.operators.text_analysis import quality_model_score

        rows = [
            (1, "the quick brown fox jumps over the lazy dog and runs"),
            (2, "spam spam spam spam spam spam spam spam"),
            (3, ""),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {r["doc_id"]: r for r in quality_model_score(df, "text").collect()}
        for r in out.values():
            assert r["kept"] == int(r["model_score"] >= 0.55)
        # heavy repetition scores strictly below natural prose
        assert out[2]["model_score"] < out[1]["model_score"]
        # empty text degrades to the bias term
        assert out[3]["model_score"] == pytest.approx(0.0)

    def test_custom_weights_and_validation(self, spark):
        from etlutil_spark.operators.text_analysis import quality_model_score

        df = spark.createDataFrame(
            [(1, "the dog naps in a park")], "doc_id bigint, text string"
        )
        harsher = quality_model_score(
            df, "text", weights={"dup": -5.0}
        ).collect()[0]
        default = quality_model_score(df, "text").collect()[0]
        assert harsher["model_score"] <= default["model_score"]
        with pytest.raises(ValueError, match="unknown feature"):
            quality_model_score(df, "text", weights={"nope": 1.0})


class TestQuantizationErrorProfile:
    def test_exact_levels_and_constant_dims_have_zero_error(self, spark):
        from etlutil_spark.operators.profile import quantization_error_profile

        # dim 0 takes integer values 0..255 (exactly the 8-bit code points
        # after min-max scaling -> zero reconstruction error); dim 1 is
        # constant (scale 0, zero error by the documented rule)
        rows = [(i, [float(i), 7.0]) for i in range(256)]
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
        out = {r["dim"]: r for r in quantization_error_profile(df).collect()}
        assert out[0]["scale"] == pytest.approx(1.0)
        assert out[0]["mean_abs_err"] == 0.0 and out[0]["max_abs_err"] == 0.0
        assert out[1]["scale"] == 0.0
        assert out[1]["mean_abs_err"] == 0.0 and out[1]["max_abs_err"] == 0.0

    def test_error_matches_hand_computation(self, spark):
        from etlutil_spark.operators.profile import quantization_error_profile

        vals = [0.0, 0.3, 0.5, 1.0]
        df = spark.createDataFrame(
            [(i, [v]) for i, v in enumerate(vals)],
            "vec_id bigint, embedding array<double>",
        )
        row = quantization_error_profile(df, bits=2).collect()[0]
        # bits=2 -> 3 levels, scale = 1/3; codes floor(v*3) clamped to 3
        scale = 1.0 / 3.0
        errs = [abs(v - min(int(v / scale), 3) * scale) for v in vals]
        assert row["scale"] == pytest.approx(scale, abs=1e-9)
        assert row["max_abs_err"] == pytest.approx(round(max(errs), 6), abs=1e-6)
        assert row["mean_abs_err"] == pytest.approx(
            round(sum(errs) / len(errs), 6), abs=2e-6
        )

    def test_bits_validated(self, spark):
        from etlutil_spark.operators.profile import quantization_error_profile

        df = spark.createDataFrame(
            [(1, [0.0])], "vec_id bigint, embedding array<double>"
        )
        with pytest.raises(ValueError, match="bits"):
            quantization_error_profile(df, bits=0)


class TestMixtureRatesProperty:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    strata = st.dictionaries(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        st.tuples(
            st.integers(1, 40),  # row count
            st.floats(0.05, 1.0),  # target share (unnormalized)
        ),
        min_size=2,
        max_size=5,
    )

    @given(spec=strata)
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[
            HealthCheck.function_scoped_fixture,
            HealthCheck.too_slow,
        ],
    )
    def test_rates_are_feasible_proportional_and_tight(self, spark, spec):
        from etlutil_spark.operators.sampling import mixture_rates

        data = []
        uid = 0
        for s, (n, _) in sorted(spec.items()):
            for _i in range(n):
                data.append((uid, s))
                uid += 1
        df = spark.createDataFrame(data, "doc_id bigint, source string")
        shares = {s: share for s, (_, share) in spec.items()}
        rates = {
            r["source"]: r["_rate"]
            for r in mixture_rates(df, "source", shares).collect()
        }
        counts = {s: n for s, (n, _) in spec.items()}
        t = min(counts[s] / shares[s] for s in spec)
        assert set(rates) == set(spec)
        for s, rate in rates.items():
            assert 0.0 < rate <= 1.0
            # achieved weight is proportional to the target share with
            # constant of proportionality T (the feasible total)
            assert counts[s] * rate == pytest.approx(shares[s] * t, rel=1e-9)
        # the plan is tight: some stratum is kept in full
        assert any(r == pytest.approx(1.0, abs=1e-12) for r in rates.values())


class TestQualityModelStreaming:
    def test_quality_model_stream_matches_batch(self, spark, sf_dir):
        """quality_model_score is a stateless projection, so its streaming
        twin must be bit-identical per micro-batch — the property that
        lets live corpus scoring share the backfill code path."""
        from etlutil_spark.operators.text_analysis import quality_model_score
        from etlutil_spark.sources.testdata import load_table
        from etlutil_spark.streaming.documents import stream_documents_from_dir
        from etlutil_spark.streaming.events import run_stream_query

        stream = stream_documents_from_dir(spark, f"{sf_dir}/documents.parquet")
        streamed = run_stream_query(
            quality_model_score(stream, "text").select(
                "doc_id", "model_score", "kept"
            ),
            query_name="t_quality_stream",
            output_mode="append",
        )
        batch = quality_model_score(load_table(spark, "documents", sf_dir), "text").select(
            "doc_id", "model_score", "kept"
        )
        s = {tuple(r) for r in streamed.collect()}
        b = {tuple(r) for r in batch.collect()}
        assert s == b and len(b) > 0


class TestQuantizeRerankTopk:
    def test_recovers_exact_topk_when_rerank_covers_corpus(self, spark):
        from etlutil_spark.operators.similarity import (
            cosine_topk,
            quantize_rerank_topk,
        )

        import random

        rng = random.Random(7)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
        ]
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
        q = rows[0][1]
        exact = [tuple(r) for r in cosine_topk(df, q, k=5).collect()]
        two_stage = [
            tuple(r)
            for r in quantize_rerank_topk(
                df, q, k=5, rerank_k=60, bits=8
            ).collect()
        ]
        # rerank_k covers the whole corpus -> stage one cannot lose the
        # true top-k, and stage two scores are the exact cosines
        assert two_stage == exact

    def test_validation(self, spark):
        from etlutil_spark.operators.similarity import quantize_rerank_topk

        df = spark.createDataFrame(
            [(1, [0.1, 0.2])], "vec_id bigint, embedding array<double>"
        )
        with pytest.raises(ValueError, match="rerank_k"):
            quantize_rerank_topk(df, [0.1, 0.2], k=10, rerank_k=5)
        with pytest.raises(ValueError, match="bits"):
            quantize_rerank_topk(df, [0.1, 0.2], bits=0)
        with pytest.raises(ValueError, match="does not match"):
            quantize_rerank_topk(df, [0.1, 0.2, 0.3])


class TestDecayWeight:
    def test_half_life_halves(self, spark):
        from etlutil_spark.operators.timeseries import decay_weight

        rows = [
            (1, "1997-12-31"),  # 1 day old
            (2, "1997-10-03"),  # 90 days old -> weight 0.5
            (3, "1997-07-05"),  # 180 days old -> weight 0.25
            (4, "1998-01-01"),  # age 0 -> weight 1.0
        ]
        df = spark.createDataFrame(rows, "id bigint, d string")
        w = decay_weight("d", "1998-01-01", half_life_days=90.0)
        got = {r["id"]: r["w"] for r in df.select("id", w.alias("w")).collect()}
        assert got[4] == 1.0
        assert got[2] == pytest.approx(0.5, abs=1e-9)
        assert got[3] == pytest.approx(0.25, abs=1e-9)
        assert 0.99 < got[1] < 1.0


class TestTypeAffinity:
    def test_lift_matches_hand_computation(self, spark):
        from etlutil_spark.queries import QUERIES  # noqa: F401  (shape ref)

        # 4 user-days: {a,b} x2, {a} x1, {b,c} x1
        # n_groups=4, n_a=3, n_b=3, n_c=1, n_ab=2, n_bc=1
        import datetime as dt

        rows = [
            (1, dt.datetime(2024, 1, 1, 10), "a"),
            (1, dt.datetime(2024, 1, 1, 11), "b"),
            (2, dt.datetime(2024, 1, 1, 9), "a"),
            (2, dt.datetime(2024, 1, 1, 9, 30), "b"),
            (3, dt.datetime(2024, 1, 1, 8), "a"),
            (4, dt.datetime(2024, 1, 1, 8), "b"),
            (4, dt.datetime(2024, 1, 1, 8, 5), "c"),
        ]
        ev = spark.createDataFrame(
            rows, "user_id bigint, ts timestamp, event_type string"
        )
        from pyspark.sql import functions as FF

        base = ev.select(
            "user_id", FF.to_date("ts").alias("day"), "event_type"
        ).distinct()
        # replicate the registered query's math on the tiny frame
        n_groups = base.select("user_id", "day").distinct().count()
        pairs = {}
        per_group = {}
        for r in base.collect():
            per_group.setdefault((r["user_id"], r["day"]), set()).add(
                r["event_type"]
            )
        singles = {}
        for types in per_group.values():
            for t in types:
                singles[t] = singles.get(t, 0) + 1
            for x in types:
                for y in types:
                    if x < y:
                        pairs[(x, y)] = pairs.get((x, y), 0) + 1
        assert n_groups == 4
        assert pairs == {("a", "b"): 2, ("b", "c"): 1}
        lift_ab = pairs[("a", "b")] * n_groups / (singles["a"] * singles["b"])
        assert lift_ab == pytest.approx(2 * 4 / 9)


class TestChunkDocuments:
    def test_overlap_and_full_coverage(self, spark):
        from etlutil_spark.operators.text_analysis import chunk_documents

        words = [f"w{i}" for i in range(25)]
        df = spark.createDataFrame(
            [(1, " ".join(words)), (2, "short doc"), (3, "")],
            "doc_id bigint, text string",
        )
        out = chunk_documents(df, "text", chunk_tokens=10, overlap=4)
        rows = sorted(
            ((r["doc_id"], r["chunk_idx"], r["chunk_text"]) for r in out.collect())
        )
        by_doc = {}
        for d, i, t in rows:
            by_doc.setdefault(d, []).append((i, t.split()))
        # doc 1: 25 tokens, stride 6 -> starts 0,6,12,18 (a start at 24
        # would emit only overlap tokens chunk 3 already carries)
        chunks = [t for _, t in sorted(by_doc[1])]
        assert [len(c) for c in chunks] == [10, 10, 10, 7]
        # consecutive chunks share exactly `overlap` tokens
        for a, b in zip(chunks, chunks[1:]):
            assert a[-4:] == b[:4] or len(b) < 4
        # reassembling with the overlap removed recovers the original
        rebuilt = chunks[0] + [w for c in chunks[1:] for w in c[4:]]
        assert rebuilt == words
        # short doc -> one partial chunk; empty doc -> no chunks
        assert [len(c) for _, c in sorted(by_doc[2])] == [2]
        assert 3 not in by_doc

    def test_validation(self, spark):
        from etlutil_spark.operators.text_analysis import chunk_documents

        df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
        with pytest.raises(ValueError, match="chunk_tokens"):
            chunk_documents(df, "text", chunk_tokens=0)
        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(df, "text", chunk_tokens=8, overlap=8)


class TestNegativePairs:
    def test_dense_ids_get_k_valid_negatives(self, spark):
        from etlutil_spark.operators.sampling import negative_pairs

        df = spark.createDataFrame(
            [(i,) for i in range(40)], "doc_id bigint"
        )
        out = negative_pairs(df, "doc_id", k=3, seed="t").collect()
        assert len(out) == 40 * 3  # dense space: every draw exists
        for r in out:
            assert r["neg_id"] != r["doc_id"]  # never a self-pair
            assert 0 <= r["neg_id"] < 40
        ranks = {}
        for r in out:
            ranks.setdefault(r["doc_id"], set()).add(r["neg_rank"])
        assert all(v == {0, 1, 2} for v in ranks.values())

    def test_deterministic_and_seed_sensitive(self, spark):
        from etlutil_spark.operators.sampling import negative_pairs

        df = spark.createDataFrame([(i,) for i in range(30)], "doc_id bigint")
        a = sorted(map(tuple, negative_pairs(df, "doc_id", seed="s1").collect()))
        b = sorted(map(tuple, negative_pairs(df, "doc_id", seed="s1").collect()))
        c = sorted(map(tuple, negative_pairs(df, "doc_id", seed="s2").collect()))
        assert a == b
        assert a != c

    def test_sparse_ids_drop_missing_draws(self, spark):
        from etlutil_spark.operators.sampling import negative_pairs

        # ids 0..9 and 90..99: draws land anywhere in [0, 100) and only
        # existing ids survive the join
        df = spark.createDataFrame(
            [(i,) for i in list(range(10)) + list(range(90, 100))],
            "doc_id bigint",
        )
        out = negative_pairs(df, "doc_id", k=2, seed="t").collect()
        ids = set(range(10)) | set(range(90, 100))
        assert 0 < len(out) <= 20 * 2
        assert all(r["neg_id"] in ids for r in out)

    def test_validation(self, spark):
        from etlutil_spark.operators.sampling import negative_pairs

        df = spark.createDataFrame([(1,)], "doc_id bigint")
        with pytest.raises(ValueError, match="k must be positive"):
            negative_pairs(df, "doc_id", k=0)


class TestChunkProperty:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(
        n_tokens=st.integers(0, 120),
        chunk=st.integers(2, 40),
        overlap_frac=st.floats(0.0, 0.9),
    )
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[
            HealthCheck.function_scoped_fixture,
            HealthCheck.too_slow,
        ],
    )
    def test_reassembly_and_bounds(self, spark, n_tokens, chunk, overlap_frac):
        from etlutil_spark.operators.text_analysis import chunk_documents

        overlap = min(int(chunk * overlap_frac), chunk - 1)
        words = [f"t{i}" for i in range(n_tokens)]
        df = spark.createDataFrame(
            [(1, " ".join(words))], "doc_id bigint, text string"
        )
        rows = sorted(
            (r["chunk_idx"], r["chunk_text"].split() if r["chunk_text"] else [])
            for r in chunk_documents(
                df, "text", chunk_tokens=chunk, overlap=overlap
            ).collect()
        )
        chunks = [c for _, c in rows]
        if n_tokens == 0:
            assert chunks == []
            return
        # chunk_idx is dense from 0
        assert [i for i, _ in rows] == list(range(len(rows)))
        # every chunk within size bounds; only the last may be short
        assert all(1 <= len(c) <= chunk for c in chunks)
        assert all(len(c) == chunk for c in chunks[:-1]) or len(chunks) == 1
        # de-overlapped reassembly recovers the document exactly
        rebuilt = list(chunks[0]) + [
            w for c in chunks[1:] for w in c[overlap:]
        ]
        assert rebuilt == words


class TestQuantizationProperty:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(
        vals=st.lists(
            st.floats(-100, 100, allow_nan=False, allow_infinity=False),
            min_size=2,
            max_size=30,
        ),
        bits=st.integers(2, 10),
    )
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[
            HealthCheck.function_scoped_fixture,
            HealthCheck.too_slow,
        ],
    )
    def test_error_bounded_by_scale(self, spark, vals, bits):
        from etlutil_spark.operators.profile import quantization_error_profile

        df = spark.createDataFrame(
            [(i, [v]) for i, v in enumerate(vals)],
            "vec_id bigint, embedding array<double>",
        )
        row = quantization_error_profile(df, bits=bits).collect()[0]
        # floor quantization over [mn, mx]: reconstruction error is
        # strictly below one code step (the scale). The profile rounds
        # max_abs_err to 6 decimals and scale to 9, so the comparison
        # needs 5e-7-scale slack for the rounding, not just fp ulps
        assert row["max_abs_err"] <= row["scale"] * (1 + 1e-9) + 1e-6
        assert 0.0 <= row["mean_abs_err"] <= row["max_abs_err"] + 1e-6


class TestLmScore:
    def test_matches_hand_lm_and_ranks_fluency(self, spark):
        from etlutil_spark.operators.text_analysis import lm_score

        import math
        from collections import Counter

        docs = {1: "a b a b a b", 2: "a b c d e f", 3: "x"}
        df = spark.createDataFrame(
            list(docs.items()), "doc_id bigint, text string"
        )
        out = {r["doc_id"]: r for r in lm_score(df).collect()}
        toks = {d: t.split() for d, t in docs.items()}
        bigrams = [
            (w1, w2)
            for t in toks.values()
            for w1, w2 in zip(t, t[1:])
        ]
        cab = Counter(bigrams)
        ca = Counter(w1 for w1, _ in bigrams)
        vocab = len({w for t in toks.values() for w in t})
        for d in (1, 2):
            expect_terms = [
                round(
                    math.log(
                        (cab[bg] + 0.5) / (ca[bg[0]] + 0.5 * vocab)
                    ),
                    6,
                )
                for bg in zip(toks[d], toks[d][1:])
            ]
            expected = round(sum(expect_terms) / len(expect_terms), 6)
            assert out[d]["lm_score"] == pytest.approx(expected, abs=2e-6)
            assert out[d]["n_bigrams"] == len(toks[d]) - 1
        # repeated common bigrams score above one-off sequences
        assert out[1]["lm_score"] > out[2]["lm_score"]
        # single-token doc has no bigrams -> absent
        assert 3 not in out


class TestNullTextHandling:
    def test_null_text_is_not_silently_kept(self, spark):
        """least() skips NULL operands, so an unguarded logit would give
        NULL-text rows full length credit (score 1.2, kept) — they must
        surface as NULL score / NULL kept instead."""
        from etlutil_spark.operators.text_analysis import (
            chunk_documents,
            lm_score,
            quality_model_score,
        )

        df = spark.createDataFrame(
            [(1, None), (2, "the dog runs fast")], "doc_id bigint, text string"
        )
        scored = {r["doc_id"]: r for r in quality_model_score(df, "text").collect()}
        assert scored[1]["model_score"] is None and scored[1]["kept"] is None
        assert scored[2]["model_score"] is not None
        # chunking and LM scoring simply emit nothing for NULL text
        assert {r["doc_id"] for r in chunk_documents(df, "text").collect()} == {2}
        assert {r["doc_id"] for r in lm_score(df).collect()} == {2}


class TestNullKeyHandling:
    def test_null_keys_drop_rather_than_corrupt(self, spark):
        """The sampling family's NULL policy (drop, never misroute) must
        hold for the late-r5 operators too."""
        from etlutil_spark.operators.sampling import (
            mixture_sample,
            negative_pairs,
        )

        corpus = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, None), (None, "b"), (4, "b")],
            "doc_id bigint, source string",
        )
        kept = mixture_sample(
            corpus, "source", {"a": 0.5, "b": 0.5}, "doc_id", seed="t"
        ).collect()
        # NULL stratum joins nothing; NULL key hashes to NULL and filters
        assert all(r["source"] is not None and r["doc_id"] is not None for r in kept)

        ids = spark.createDataFrame(
            [(0,), (1,), (2,), (None,)], "doc_id bigint"
        )
        pairs = negative_pairs(ids, "doc_id", k=2, seed="t").collect()
        assert all(
            r["doc_id"] is not None and r["neg_id"] is not None for r in pairs
        )


class TestNegativePairsDegenerate:
    def test_single_doc_corpus_yields_no_pairs(self, spark):
        """With one id the +1 skip wraps back onto the anchor; the final
        self-pair filter must yield zero pairs, never anchor==negative."""
        from etlutil_spark.operators.sampling import negative_pairs

        df = spark.createDataFrame([(0,)], "doc_id bigint")
        assert negative_pairs(df, "doc_id", k=2, seed="t").count() == 0
