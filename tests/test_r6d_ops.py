"""Unit/property tests for the r6 session-4 operators: Pareto skyline,
Benford audit, Gini concentration, integer-exact EWMA, multi-touch
attribution, session paths, fuzzy-edit dedup, vocabulary growth,
correlated sampling, GROUPING SETS, value-rule audit, A/B summary,
winnowing fingerprints, seasonal decomposition, and the partitioned
write/read roundtrip. Each is checked against an independent
plain-Python reference or a closed-form invariant — not against the
DuckDB oracle (tests/test_oracle_parity.py already does that)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F

from etlutil_spark.queries import QUERIES


def _md5_unit(seed: str, key) -> float:
    h = hashlib.md5((seed + str(key)).encode()).hexdigest()
    return int(h[:15], 16) / 2.0**60


class TestSkyline:
    def test_matches_bruteforce_dominance(self, spark, sf_dir):
        pts = [
            (r["p_partkey"], r["p_retailprice"], r["p_size"])
            for r in spark.read.parquet(f"{sf_dir}/part.parquet")
            .select("p_partkey", "p_retailprice", "p_size")
            .collect()
            if r["p_retailprice"] is not None and r["p_size"] is not None
        ]

        def dominated(a):
            return any(
                q[1] <= a[1]
                and q[2] >= a[2]
                and (q[1] < a[1] or q[2] > a[2])
                for q in pts
            )

        expect = {p[0] for p in pts if not dominated(p)}
        got = {
            r["p_partkey"]
            for r in QUERIES["part_skyline"](spark, sf_dir).collect()
        }
        assert got == expect


class TestBenford:
    def test_histogram_is_complete_and_shares_sum(self, spark, sf_dir):
        rows = QUERIES["orders_benford"](spark, sf_dir).collect()
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        n_total = orders.where(F.col("o_totalprice") >= 1).count()
        assert sum(r["n"] for r in rows) == n_total
        assert all(r["digit"] in set("123456789") for r in rows)
        assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
        # benford expectation is the analytic curve, independent of data
        import math

        for r in rows:
            assert (
                abs(
                    r["benford_share"]
                    - math.log10(1 + 1 / int(r["digit"]))
                )
                < 1e-5
            )


class TestGini:
    def test_matches_plain_python(self, spark, sf_dir):
        ev = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .where(F.col("user_id").isNotNull() & F.col("event_type").isNotNull())
            .groupBy("event_type", "user_id")
            .count()
            .collect()
        )
        by_type = defaultdict(list)
        for r in ev:
            by_type[r["event_type"]].append(r["count"])
        out = {
            r["event_type"]: r
            for r in QUERIES["events_gini_by_type"](spark, sf_dir).collect()
        }
        assert set(out) == set(by_type)
        for t, xs in by_type.items():
            xs = sorted(xs)
            n, sx = len(xs), sum(xs)
            six = sum((i + 1) * x for i, x in enumerate(xs))
            expect = (2.0 * six - (n + 1.0) * sx) / (n * 1.0 * sx)
            assert abs(out[t]["gini"] - expect) < 1e-5
            assert out[t]["n_users"] == n
            assert -1e-9 <= out[t]["gini"] < 1.0


class TestEwma:
    def test_matches_plain_python_finite_window(self, spark, sf_dir):
        daily = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .where(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
            .groupBy("event_type", F.to_date("ts").alias("day"))
            .count()
            .collect()
        )
        series = defaultdict(dict)
        for r in daily:
            series[r["event_type"]][r["day"]] = r["count"]
        out = QUERIES["events_ewma_daily"](spark, sf_dir).collect()
        assert len(out) == len(daily)
        for r in out:
            s = series[r["event_type"]]
            num = den = 0
            for d, c in s.items():
                k = (r["day"] - d).days
                if 0 <= k <= 13:
                    w = 7**k * 10 ** (13 - k)
                    num += c * w
                    den += w
            assert abs(r["ewma"] - num / den) < 1e-9


class TestMultitouch:
    def test_credit_conservation_and_split(self, spark, sf_dir):
        ev = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
            .select("event_id", "user_id", "ts", "event_type", "value")
            .collect()
        )
        touches = defaultdict(list)
        for r in ev:
            if r["event_type"] in ("click", "view"):
                touches[r["user_id"]].append((r["ts"], r["event_type"]))
        expect = defaultdict(lambda: [0, 0])  # type -> [n, units]
        for r in ev:
            if r["event_type"] != "purchase" or r["value"] is None:
                continue
            window = [
                t
                for t in touches[r["user_id"]]
                if t[0] < r["ts"]
                and (r["ts"] - t[0]).total_seconds() <= 7 * 86400
            ]
            if not window:
                continue
            uv = round(r["value"] * 1000000)
            per = int(uv / len(window))
            for _, tt in window:
                expect[tt][0] += 1
                expect[tt][1] += per
        out = {
            r["touch_type"]: r
            for r in QUERIES["events_multitouch_attribution"](
                spark, sf_dir
            ).collect()
        }
        assert set(out) == set(expect)
        for tt, (n, units) in expect.items():
            assert out[tt]["n_touches"] == n
            assert abs(out[tt]["credited_revenue"] - units / 1e6) < 2e-6


class TestSessionPaths:
    def test_paths_are_wellformed_topk(self, spark, sf_dir):
        rows = QUERIES["events_session_paths"](spark, sf_dir).collect()
        assert 0 < len(rows) <= 10
        types = {"signup", "error", "click", "view", "purchase"}
        counts = [r["n_sessions"] for r in rows]
        assert counts == sorted(counts, reverse=True)
        for r in rows:
            segs = r["path"].split(">")
            assert 1 <= len(segs) <= 3
            assert set(segs) <= types


class TestFuzzyEdit:
    def test_pairs_share_block_and_thresholds(self, spark, sf_dir):
        docs = {
            r["doc_id"]: r
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "lang", "text")
            .collect()
        }
        for r in QUERIES["dedup_fuzzy_edit"](spark, sf_dir).collect():
            assert r["a_id"] < r["b_id"]
            assert 0 <= r["edit_dist"] <= 16
            a, b = docs[r["a_id"]], docs[r["b_id"]]
            assert a["lang"] == b["lang"] == r["lang"]

            def norm(t):
                return "".join(
                    ch for ch in t.lower() if " " <= ch <= "~"
                )

            assert norm(a["text"])[:24] == norm(b["text"])[:24]


class TestVocabGrowth:
    def test_cumulative_vocab_closes_at_source_total(self, spark, sf_dir):
        from etlutil_spark.functions.text import tokens

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        totals = {
            r["source"]: r["v"]
            for r in d.where(
                F.col("source").isNotNull() & F.col("text").isNotNull()
            )
            .select("source", F.explode(tokens("text")).alias("tk"))
            .groupBy("source")
            .agg(F.countDistinct("tk").alias("v"))
            .collect()
        }
        rows = QUERIES["docs_vocab_growth"](spark, sf_dir).collect()
        by_src = defaultdict(list)
        for r in rows:
            by_src[r["source"]].append(r)
        for src, rs in by_src.items():
            rs = sorted(rs, key=lambda r: r["quartile"])
            assert [r["quartile"] for r in rs] == list(
                range(1, len(rs) + 1)
            )
            cums = [r["cum_vocab"] for r in rs]
            assert cums == sorted(cums)
            assert cums[-1] == totals.get(src, 0)
            assert sum(r["new_tokens"] for r in rs) == cums[-1]
            sizes = [r["n_docs"] for r in rs]
            assert max(sizes) - min(sizes) <= 1


class TestCorrelatedSample:
    def test_sample_set_matches_portable_hash(self, spark, sf_dir):
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
        expect_keys = {
            r["c_custkey"]
            for r in cust
            if _md5_unit("corr-v1", r["c_custkey"]) < 0.10
        }
        seg_of = {r["c_custkey"]: r["c_mktsegment"] for r in cust}
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
        exp = defaultdict(lambda: [set(), 0, 0.0])
        for k in expect_keys:
            exp[seg_of[k]][0].add(k)
        for o in orders:
            if o["o_custkey"] in expect_keys:
                seg = seg_of[o["o_custkey"]]
                exp[seg][1] += 1
                exp[seg][2] += o["o_totalprice"]
        out = {
            r["c_mktsegment"]: r
            for r in QUERIES["sample_correlated_join"](
                spark, sf_dir
            ).collect()
        }
        assert set(out) == set(exp)
        for seg, (keys, n_orders, rev) in exp.items():
            assert out[seg]["n_sampled_customers"] == len(keys)
            assert out[seg]["n_orders"] == n_orders
            assert abs(out[seg]["est_revenue"] - rev * 10) < 1e-2


class TestGroupingSets:
    def test_margins_equal_detail_sums(self, spark, sf_dir):
        rows = QUERIES["pricing_grouping_sets"](spark, sf_dir).collect()
        detail = [r for r in rows if r["gid"] == 0]
        by_flag = [r for r in rows if r["gid"] == 1]  # status aggregated
        by_status = [r for r in rows if r["gid"] == 2]  # flag aggregated
        assert len(detail) + len(by_flag) + len(by_status) == len(rows)
        for m in by_flag:
            ds = [d for d in detail if d["l_returnflag"] == m["l_returnflag"]]
            assert m["n"] == sum(d["n"] for d in ds)
            assert abs(m["revenue"] - sum(d["revenue"] for d in ds)) < 1e-6
        for m in by_status:
            ds = [d for d in detail if d["l_linestatus"] == m["l_linestatus"]]
            assert m["n"] == sum(d["n"] for d in ds)
            assert abs(m["sum_qty"] - sum(d["sum_qty"] for d in ds)) < 1e-6


class TestValueRules:
    def test_synthetic_counts_and_null_semantics(self, spark):
        from etlutil_spark.operators.audit import value_rule_counts

        df = spark.createDataFrame(
            [(1, 10.0), (2, -5.0), (3, None), (4, 0.0)],
            "id bigint, v double",
        )
        out = {
            (r["relation"], r["rule"]): r
            for r in value_rule_counts(
                [
                    (
                        "t",
                        df,
                        [
                            ("v_negative", F.col("v") < 0),
                            ("v_null", F.col("v").isNull()),
                            ("v_nonpositive", F.col("v") <= 0),
                        ],
                    )
                ]
            ).collect()
        }
        assert out[("t", "v_negative")]["n_violations"] == 1  # NULL != viol
        assert out[("t", "v_null")]["n_violations"] == 1
        assert out[("t", "v_nonpositive")]["n_violations"] == 2
        assert all(r["n_rows"] == 4 for r in out.values())

    def test_catalog_report_shape(self, spark, sf_dir):
        rows = QUERIES["audit_value_ranges"](spark, sf_dir).collect()
        assert len(rows) == 10
        assert {r["relation"] for r in rows} == {
            "lineitem",
            "orders",
            "events",
            "part",
        }
        for r in rows:
            assert 0 <= r["n_violations"] <= r["n_rows"]


class TestAbSummary:
    def test_arms_partition_users_and_z_sign(self, spark, sf_dir):
        r = QUERIES["events_ab_test_summary"](spark, sf_dir).collect()[0]
        n_users = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .where(F.col("user_id").isNotNull())
            .select("user_id")
            .distinct()
            .count()
        )
        assert r["n_a"] + r["n_b"] == n_users
        assert 0 <= r["rate_a"] <= 1 and 0 <= r["rate_b"] <= 1
        if r["z_score"] is not None and r["rate_a"] != r["rate_b"]:
            assert (r["z_score"] > 0) == (r["rate_a"] > r["rate_b"])


class TestWinnowing:
    def test_selection_bounds_and_sharing(self, spark, sf_dir):
        rows = QUERIES["docs_winnowing"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r["n_kgrams"] >= 4 or r["n_selected"] == 0
            # distinct window minima can never exceed window count
            assert 1 <= r["n_selected"] <= max(r["n_kgrams"] - 3, 1)
            assert 0 <= r["n_shared"] <= r["n_selected"]

    def test_shared_run_guarantee_on_handmade_pair(self, spark, sf_dir, tmp_path):
        """Two docs sharing a >=8-token run must share a fingerprint
        (the winnowing guarantee with k=5, w=4: any 8-token shared run
        contains a full hash window)."""
        import pandas as pd

        shared = "alpha beta gamma delta epsilon zeta eta theta"
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    "one two three " + shared + " four five six",
                    "seven eight " + shared + " nine ten eleven",
                ],
                "lang": ["en", "en"],
                "source": ["a", "b"],
                "n_chars": [10, 10],
            }
        ).to_parquet(tmp_path / "documents.parquet")
        rows = QUERIES["docs_winnowing"](spark, str(tmp_path)).collect()
        assert len(rows) == 2
        assert all(r["n_shared"] >= 1 for r in rows)


class TestSeasonalDecompose:
    def test_additive_identity_and_trend_support(self, spark, sf_dir):
        rows = sorted(
            QUERIES["orders_seasonal_decompose"](spark, sf_dir).collect(),
            key=lambda r: r["month"],
        )
        n = len(rows)
        for i, r in enumerate(rows):
            rank = i + 1
            if 7 <= rank <= n - 6:
                assert r["trend"] is not None
                # additive identity up to the micro-unit quantization
                assert (
                    abs(
                        r["revenue"]
                        - (r["trend"] + r["seasonal"] + r["residual"])
                    )
                    < 5e-6
                )
            else:
                assert r["trend"] is None and r["residual"] is None


class TestZipfFit:
    def test_matches_plain_python_ols(self, spark, sf_dir):
        import math

        from etlutil_spark.functions.text import tokens as tok

        freqs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .where(F.col("text").isNotNull())
            .select(F.explode(tok("text")).alias("tk"))
            .groupBy("tk")
            .count()
            .collect()
        )
        ranked = sorted(freqs, key=lambda r: (-r["count"], r["tk"]))[:500]
        Q = 1000000
        xs = [
            math.floor(math.log(i + 1) * Q) for i in range(len(ranked))
        ]
        ys = [math.floor(math.log(r["count"]) * Q) for r in ranked]
        n, sx, sy = len(xs), sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        out = QUERIES["docs_zipf_fit"](spark, sf_dir).collect()[0]
        assert out["n_ranks"] == n
        assert abs(out["zipf_slope"] - slope) < 1e-5
        assert out["zipf_slope"] < 0  # frequency decays with rank


class TestSnapshotDiff:
    def test_classification_matches_plain_python(self, spark, sf_dir):
        rows = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
            .select("user_id", "ts", "event_id", "event_type", "value")
            .collect()
        )
        from datetime import datetime

        t1, t2 = datetime(2024, 1, 16), datetime(2024, 1, 24)

        def latest(cutoff):
            best = {}
            for r in rows:
                if r["ts"] < cutoff:
                    k = (r["ts"], r["event_id"])
                    if r["user_id"] not in best or k > best[r["user_id"]][0]:
                        best[r["user_id"]] = (
                            k,
                            (r["event_type"], r["value"]),
                        )
            return {u: v[1] for u, v in best.items()}

        s1, s2 = latest(t1), latest(t2)
        expect = defaultdict(int)
        for u, state in s2.items():
            if u not in s1:
                expect["added"] += 1
            elif s1[u] != state:
                expect["changed"] += 1
            else:
                expect["unchanged"] += 1
        out = {
            r["change_type"]: r["n_users"]
            for r in QUERIES["events_snapshot_diff"](spark, sf_dir).collect()
        }
        assert out == dict(expect)


class TestChecksumBlocks:
    def test_xor_matches_plain_python_digests(self, spark, sf_dir):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()

        def dec4(v):
            if v is None:
                return "N"
            from decimal import Decimal

            return str(
                Decimal(str(v)).quantize(Decimal("0.0001"))
            )

        import hashlib as hl
        from datetime import timezone

        expect = defaultdict(lambda: [0, 0])
        for r in li:
            micros = (
                "N"
                if r["l_shipdate"] is None
                else str(
                    int(
                        r["l_shipdate"]
                        .replace(tzinfo=timezone.utc)
                        .timestamp()
                        * 1_000_000
                    )
                )
            )
            payload = "|".join(
                [
                    str(r["l_orderkey"]),
                    str(r["l_linenumber"]),
                    str(r["l_partkey"]) if r["l_partkey"] is not None else "N",
                    str(r["l_suppkey"]) if r["l_suppkey"] is not None else "N",
                    dec4(r["l_quantity"]),
                    dec4(r["l_extendedprice"]),
                    dec4(r["l_discount"]),
                    dec4(r["l_tax"]),
                    r["l_returnflag"] or "N",
                    r["l_linestatus"] or "N",
                    micros,
                ]
            )
            h = int(
                hl.md5(("ck-v1" + payload).encode()).hexdigest()[:15], 16
            )
            b = r["l_orderkey"] % 256
            expect[b][0] += 1
            expect[b][1] ^= h
        out = {
            r["block"]: (r["n_rows"], r["checksum"])
            for r in QUERIES["lineitem_checksum_blocks"](
                spark, sf_dir
            ).collect()
        }
        assert out == {b: tuple(v) for b, v in expect.items()}


class TestTrigramSearch:
    def test_typo_query_ranks_true_name_first(self, spark, sf_dir):
        rows = QUERIES["part_trigram_search"](spark, sf_dir).collect()
        assert rows and len(rows) <= 15
        sims = [r["sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(0 < s <= 1 for s in sims)
        # the typo'd query 'smal wiget' must surface 'small widget' first
        assert rows[0]["p_name"] == "small widget"
        # spot-check the Jaccard arithmetic on the top hit
        def tg(s):
            s = s.lower()
            return {s[i : i + 3] for i in range(len(s) - 2)}

        q = tg("smal wiget")
        a = tg(rows[0]["p_name"])
        expect = len(a & q) / len(a | q)
        assert abs(rows[0]["sim"] - expect) < 1e-5


class TestBalanceMoments:
    def test_matches_plain_python_moments(self, spark, sf_dir):
        import math

        rows = (
            spark.read.parquet(f"{sf_dir}/customer.parquet")
            .where(
                F.col("c_acctbal").isNotNull()
                & F.col("c_mktsegment").isNotNull()
            )
            .collect()
        )
        cents = defaultdict(list)
        for r in rows:
            cents[r["c_mktsegment"]].append(
                math.floor(r["c_acctbal"] * 100.0 + 0.5)
            )
        out = {
            r["c_mktsegment"]: r
            for r in QUERIES["customer_balance_moments"](
                spark, sf_dir
            ).collect()
        }
        assert set(out) == set(cents)
        for seg, vs in cents.items():
            n = len(vs)
            mean = sum(vs) / n
            m2 = sum((v - mean) ** 2 for v in vs) / n
            m3 = sum((v - mean) ** 3 for v in vs) / n
            m4 = sum((v - mean) ** 4 for v in vs) / n
            assert out[seg]["n"] == n
            assert abs(out[seg]["mean"] - mean / 100) < 1e-4
            assert abs(out[seg]["std"] - math.sqrt(m2) / 100) < 1e-4
            if m2 > 0:
                assert abs(out[seg]["skewness"] - m3 / m2**1.5) < 1e-4
                assert abs(out[seg]["ex_kurtosis"] - (m4 / m2**2 - 3)) < 1e-4


class TestChi2:
    def test_closed_form_equals_textbook_sum(self, spark, sf_dir):
        obs = defaultdict(int)
        for r in (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .where(F.col("l_quantity").isNotNull())
            .select(F.col("l_quantity").cast("bigint").alias("v"))
            .collect()
        ):
            obs[r["v"]] += 1
        k, n = len(obs), sum(obs.values())
        exp = n / k
        chi2 = sum((o - exp) ** 2 / exp for o in obs.values())
        out = QUERIES["lineitem_quantity_chi2"](spark, sf_dir).collect()[0]
        assert out["n_levels"] == k and out["n_rows"] == n
        assert abs(out["chi2"] - chi2) < 1e-4


class TestKmSurvival:
    def test_matches_plain_python_product_limit(self, spark, sf_dir):
        rows = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .where(
                F.col("o_custkey").isNotNull()
                & F.col("o_orderdate").isNotNull()
            )
            .select("o_custkey", F.to_date("o_orderdate").alias("d"))
            .collect()
        )
        by_cust = defaultdict(list)
        horizon = max(r["d"] for r in rows)
        for r in rows:
            by_cust[r["o_custkey"]].append(r["d"])
        intervals = []  # (duration, is_event)
        for ds in by_cust.values():
            ds = sorted(ds)
            for a, b in zip(ds, ds[1:]):
                intervals.append(((b - a).days, 1))
            intervals.append(((horizon - ds[-1]).days, 0))
        out = sorted(
            QUERIES["orders_km_survival"](spark, sf_dir).collect(),
            key=lambda r: r["duration_days"],
        )
        s = 1.0
        expect = {}
        for t in sorted({d for d, e in intervals if e}):
            n_risk = sum(1 for d, _ in intervals if d >= t)
            d_t = sum(1 for d, e in intervals if d == t and e)
            s *= (n_risk - d_t) / n_risk
            expect[t] = (n_risk, d_t, s)
        assert [r["duration_days"] for r in out] == sorted(expect)
        for r in out:
            n_risk, d_t, s = expect[r["duration_days"]]
            assert r["n_risk"] == n_risk and r["n_events"] == d_t
            assert abs(r["survival"] - s) < 1e-5
        # survival is non-increasing
        surv = [r["survival"] for r in out]
        assert all(a >= b - 1e-12 for a, b in zip(surv, surv[1:]))


class TestPartitionRoundtrip:
    def test_counts_match_direct_scan(self, spark, sf_dir):
        out = {
            r["event_type"]: r["n"]
            for r in QUERIES["io_partition_roundtrip"](
                spark, sf_dir
            ).collect()
        }
        direct = {
            r["event_type"]: r["n"]
            for r in spark.read.parquet(f"{sf_dir}/events.parquet")
            .where(
                F.to_date("ts").between("2024-01-08", "2024-01-14")
                & F.col("event_type").isNotNull()
            )
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert out == direct
