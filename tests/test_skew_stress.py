"""Skew stress: the salted operators under their actual design condition
— a power-law key where ONE key holds half the corpus. sf-table tests
exercise correctness on benign distributions; these pin correctness on
the adversarial one (and document why the salted plan exists at all:
at 100 TB a 50% hot key makes the unsalted per-key window a single
straggler task holding half the data)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed_events(spark):
    """40k events, user 0 owns 50%; timestamps interleave so the hot key
    spans many days (the salted plan's day-bucket dimension) and sessions
    straddle midnights."""
    n = 40_000
    df = spark.range(0, n).select(
        F.col("id").alias("event_id"),
        # hot key: every even row -> user 0; rest spread over 100 users
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise((F.col("id") % 199) + 1)
        .alias("user_id"),
        # ~17 days of data, events every ~37s per stream, gaps > 30min
        # appear naturally when a user's rows are sparse
        F.timestamp_seconds(
            F.lit(1704067200) + (F.col("id") * 37) % (86400 * 17)
            + (F.col("id") % 97) * 1800
        ).alias("ts"),
        (F.col("id") % 13).cast("double").alias("value"),
    )
    return df.localCheckpoint(eager=True)


class TestSkewedSessionization:
    def test_salted_equals_unsalted_on_hot_key(self, spark, skewed_events):
        from etlutil_spark.operators.sessions import session_stats

        plain = {
            (r["user_id"], r["session_seq"]): (
                r["session_start"],
                r["session_end"],
                r["n_events"],
                r["duration_s"],
            )
            for r in session_stats(skewed_events, "user_id", "ts").collect()
        }
        salted = {
            (r["user_id"], r["session_seq"]): (
                r["session_start"],
                r["session_end"],
                r["n_events"],
                r["duration_s"],
            )
            for r in session_stats(
                skewed_events, "user_id", "ts", salted=True
            ).collect()
        }
        assert plain == salted
        # sanity: the hot key actually dominates and has many sessions
        hot_sessions = [k for k in plain if k[0] == 0]
        assert sum(plain[k][2] for k in hot_sessions) == 20_000
        assert len(hot_sessions) > 1

    def test_salted_agg_equals_plain_on_hot_key(self, spark, skewed_events):
        from etlutil_spark.operators.skew import salted_agg

        plain = {
            r["user_id"]: (r["n"], round(r["total"], 6))
            for r in skewed_events.groupBy("user_id")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(38,6)"))
                .cast("double")
                .alias("total"),
            )
            .collect()
        }
        salted = {
            r["user_id"]: (r["n"], round(r["total"], 6))
            for r in salted_agg(
                skewed_events,
                ["user_id"],
                {
                    "n": (F.count("*"), "sum"),
                    "total": (
                        F.sum(F.col("value").cast("decimal(38,6)")),
                        "sum",
                    ),
                },
                n_salts=8,
            )
            .select(
                "user_id",
                "n",
                F.col("total").cast("double").alias("total"),
            )
            .collect()
        }
        assert plain == salted

    def test_salted_join_equals_plain_on_hot_key(self, spark, skewed_events):
        from etlutil_spark.operators.skew import salted_join

        dim = spark.createDataFrame(
            [(i, f"seg{i % 5}") for i in range(200)], "user_id long, segment string"
        )
        plain = sorted(
            (r["event_id"], r["segment"])
            for r in skewed_events.join(dim, ["user_id"], "inner").collect()
        )
        salted = sorted(
            (r["event_id"], r["segment"])
            for r in salted_join(
                skewed_events, dim, ["user_id"], n_salts=8
            ).collect()
        )
        assert plain == salted
        # left join: unmatched fact rows (user 0 missing from a pruned dim)
        # survive exactly once with NULL payload
        dim_no_hot = dim.where(F.col("user_id") != 0)
        left = salted_join(
            skewed_events, dim_no_hot, ["user_id"], n_salts=8, how="left"
        )
        hot = left.where(F.col("user_id") == 0).collect()
        assert len(hot) == 20_000 and all(r["segment"] is None for r in hot)


class TestKeySkewReport:
    def test_hot_key_surfaces_with_share_and_factor(self, spark):
        from etlutil_spark.operators.skew import key_skew_report

        data = [("whale",)] * 80 + [(f"u{i}",) for i in range(20)]
        df = spark.createDataFrame(data, "k string")
        rows = key_skew_report(df, "k", top_n=3).collect()
        assert rows[0]["rank"] == 1 and rows[0]["k"] == "whale"
        assert rows[0]["n_rows"] == 80 and rows[0]["share"] == 0.8
        # max/mean: 80 / (100/21) keys
        assert abs(rows[0]["skew_factor"] - 80 * 21 / 100) < 1e-6
        assert len(rows) == 3

    def test_null_keys_counted(self, spark):
        from etlutil_spark.operators.skew import key_skew_report

        df = spark.createDataFrame([(None,)] * 5 + [("a",)], "k string")
        rows = key_skew_report(df, "k", top_n=2).collect()
        assert rows[0]["k"] is None and rows[0]["n_rows"] == 5

    def test_bad_top_n_raises(self, spark):
        import pytest as _pytest

        from etlutil_spark.operators.skew import key_skew_report

        df = spark.createDataFrame([("a",)], "k string")
        with _pytest.raises(ValueError, match="top_n"):
            key_skew_report(df, "k", top_n=0)


class TestSemDeDupDegenerateFit:
    """semdedup's quadratic stage is safe only while cells stay small —
    the occupancy circuit-breaker must trip on a degenerate fit (all
    vectors in one cell) BEFORE the O(n^2) within-cell join runs."""

    def _near_identical(self, spark, n=300, d=4):
        # all vectors within a tiny ball -> every Lloyd's fit collapses
        # the corpus into one cell no matter how k centroids initialize
        return spark.range(0, n).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    (F.lit(1.0) + (F.col("id") % 7) * 1e-9).cast("float")
                    for _ in range(d)
                ]
            ).alias("embedding"),
        )

    def test_degenerate_fit_raises_before_quadratic_stage(self, spark):
        from etlutil_spark.operators.clustering import semdedup

        df = self._near_identical(spark)
        with pytest.raises(ValueError, match="degenerate cluster fit"):
            semdedup(
                df, "vec_id", "embedding", k=4, iters=2, radius=10,
                max_cell_share=0.5,
            ).collect()

    def test_balanced_fit_passes_guard(self, spark):
        from etlutil_spark.operators.clustering import semdedup

        # 4 well-separated blobs of 50 -> shares ~0.25 each, under 0.5
        df = spark.range(0, 200).select(
            F.col("id").alias("vec_id"),
            F.array(
                ((F.col("id") % 4) * 10.0).cast("float"),
                ((F.col("id") % 4) * -10.0).cast("float"),
            ).alias("embedding"),
        )
        out = semdedup(
            df, "vec_id", "embedding", k=4, iters=3, radius=0,
            max_cell_share=0.5,
        )
        assert out.count() == 200

    def test_guard_off_by_default(self, spark):
        """Without the cap the (small) degenerate input still computes —
        the guard is opt-in so exploratory runs on tiny corpora work."""
        from etlutil_spark.operators.clustering import semdedup

        df = self._near_identical(spark, n=40)
        rows = semdedup(df, "vec_id", "embedding", k=4, iters=2, radius=10).collect()
        # all vectors are near-identical within radius: only vec_id 0 survives
        assert sum(r["kept"] for r in rows) == 1

    def test_bad_share_raises(self, spark):
        from etlutil_spark.operators.clustering import semdedup

        df = self._near_identical(spark, n=10)
        with pytest.raises(ValueError, match="max_cell_share"):
            semdedup(
                df, "vec_id", "embedding", k=2, iters=2, radius=1,
                max_cell_share=1.5,
            )


class TestHotShingleCap:
    """The CC-dedup family's pair stage under its adversarial input: a
    boilerplate 3-gram shared by EVERY document. Uncapped, that one
    shingle's self-join group is quadratic in corpus size (the 100 TB
    scale-killer the r7 verdict named); max_shingle_freq=50 bounds every
    join group while genuinely near-duplicate pairs — which share RARE
    shingles — still pair."""

    @pytest.fixture(scope="class")
    def boilerplate_docs(self, spark):
        # 400 docs, all starting with the same header (hot shingles), each
        # with a unique tail; docs 0/1 and 2/3 are genuine near-dup pairs
        # (identical long rare tails).
        rows = []
        header = "terms of service apply here"
        for i in range(400):
            if i in (0, 1):
                tail = "alpha beta gamma delta epsilon zeta eta theta"
            elif i in (2, 3):
                tail = "one two three four five six seven eight nine"
            else:
                tail = f"unique{i} tail{i} words{i} body{i} text{i} end{i}"
            rows.append((i, f"{header} {tail}"))
        return spark.createDataFrame(rows, "doc_id int, text string").localCheckpoint(
            eager=True
        )

    def test_cap_keeps_rare_near_dups_and_drops_boilerplate_pairs(
        self, spark, boilerplate_docs
    ):
        from etlutil_spark.operators.dedup import ngram_jaccard_pairs

        pairs = {
            (r["id_a"], r["id_b"])
            for r in ngram_jaccard_pairs(
                boilerplate_docs, "doc_id", "text", n=3, threshold=0.6,
                max_shingle_freq=50,
            ).collect()
        }
        # the genuine near-dups survive (they share rare tail shingles and,
        # with the hot header shingles filtered from BOTH sets, their
        # filtered-universe Jaccard is 1.0)...
        assert (0, 1) in pairs and (2, 3) in pairs
        # ...and no boilerplate-only pair exists: the hot header shingles
        # (doc freq 400 > 50) never reach the self-join
        assert pairs == {(0, 1), (2, 3)}

    def test_capped_clusters_match_ground_truth(self, spark, boilerplate_docs):
        from etlutil_spark.operators.dedup import (
            duplicate_clusters,
            ngram_jaccard_pairs,
        )

        pairs = ngram_jaccard_pairs(
            boilerplate_docs, "doc_id", "text", n=3, threshold=0.6,
            max_shingle_freq=50,
        )
        clusters = {
            r["member_id"]: r["cluster_id"]
            for r in duplicate_clusters(pairs).collect()
        }
        assert clusters == {0: 0, 1: 0, 2: 2, 3: 2}

    def test_registered_cc_queries_pass_the_cap(self):
        """Source-level contract pin: the two CC catalog queries (whose
        final plans truncate the pair stage behind a checkpoint, so a
        plan assertion can't see it) must pass max_shingle_freq to
        ngram_jaccard_pairs — the cap is what bounds their join groups
        at corpus scale."""
        import inspect

        from etlutil_spark import queries as q

        for fn in (q.dedup_clusters, q.dedup_best_of_cluster, q.dedup_ngram_jaccard):
            src = inspect.getsource(fn)
            assert "max_shingle_freq=50" in src, fn.__name__


class TestChainComponents:
    """r9: large-star/small-star CC must converge on chain-shaped
    components in O(log n) star rounds — the shape (template-drift
    page A ≈ B ≈ C ≈ ...) where r1-r8's min-label propagation needed
    O(diameter) rounds and died at the 20-round cap."""

    def test_500_node_chain_converges_and_labels_min(self, spark):
        from pyspark.sql import functions as F

        from etlutil_spark.operators.dedup import duplicate_clusters

        n = 500
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
        )
        # the old min-label algorithm provably needed diameter=499
        # rounds; the star algorithm must land well inside the same
        # 20-round cap that killed it
        out = duplicate_clusters(pairs, max_iterations=20).collect()
        assert len(out) == n
        assert all(r["cluster_id"] == 0 for r in out)

    def test_two_chains_and_isolated_edge(self, spark):
        from etlutil_spark.operators.dedup import duplicate_clusters

        edges = (
            [(i, i + 1) for i in range(10, 60)]        # chain rooted 10
            + [(i, i + 1) for i in range(100, 140)]    # chain rooted 100
            + [(1000, 2000)]                           # isolated pair
        )
        out = {
            r["member_id"]: r["cluster_id"]
            for r in duplicate_clusters(
                spark.createDataFrame(edges, "id_a long, id_b long")
            ).collect()
        }
        assert all(out[i] == 10 for i in range(10, 61))
        assert all(out[i] == 100 for i in range(100, 141))
        assert out[1000] == 1000 and out[2000] == 1000

    def test_matches_union_find_on_random_graph(self, spark):
        import random

        from etlutil_spark.operators.dedup import duplicate_clusters

        rnd = random.Random(20260815)
        edges = list(
            {
                (a, b)
                for a, b in (
                    (rnd.randint(0, 299), rnd.randint(0, 299))
                    for _ in range(250)
                )
                if a != b
            }
        )
        out = {
            r["member_id"]: r["cluster_id"]
            for r in duplicate_clusters(
                spark.createDataFrame(edges, "id_a long, id_b long")
            ).collect()
        }
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {node: find(node) for node in parent}
        assert out == want


class TestLshBandingPlan:
    def test_planner_midpoints(self):
        from etlutil_spark.operators.dedup import lsh_banding_plan

        # 32 hashes: threshold 0.6 -> the catalog's 8x4 banding
        assert lsh_banding_plan(0.6, 32) == {"bands": 8, "rows": 4, "s50": 0.594604}
        # high-precision target prefers fewer, longer bands
        assert lsh_banding_plan(0.85, 32)["rows"] == 8
        # recall-heavy target prefers many short bands
        assert lsh_banding_plan(0.3, 32)["bands"] == 16
        import pytest as _p

        with _p.raises(ValueError):
            lsh_banding_plan(0.0)
