"""Hypothesis property tests — the reference's portable spec (SURVEY §5):
idempotence, no-op identity, no-empties-after-remove_empty, leaf
preservation under flatten, determinism. The reference proves these per
nested dict (tests/test_data_structures_property.py); here they hold per
DataFrame over generated nested schemas.

Example counts are kept small: each example builds a DataFrame (driver
round-trip), so the suite aims for schema diversity, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etlutil_spark.operators.flatten import flatten_struct
from etlutil_spark.operators.prune import prune_columns

PROP = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# scalar leaves: None / int / string (covers NULL vs 0 vs "" distinctions)
leaf = st.one_of(st.none(), st.integers(-5, 5), st.text("abxy_", max_size=3))
name = st.text("abcde", min_size=1, max_size=3)


@st.composite
def record(draw, depth: int = 2):
    """Nested dict with string keys; max `depth` struct levels."""
    n = draw(st.integers(1, 3))
    keys = draw(
        st.lists(name, min_size=n, max_size=n, unique=True)
    )
    out = {}
    for k in keys:
        if depth > 0 and draw(st.booleans()):
            out[k] = draw(record(depth=depth - 1))
        else:
            out[k] = draw(leaf)
    return out


def to_df(spark, rec: dict):
    """One-row DataFrame; schema derived from the record with NULLs typed
    as string (Spark needs a concrete type)."""
    from pyspark.sql import types as T

    def field_type(v):
        if isinstance(v, dict):
            return T.StructType(
                [T.StructField(k, field_type(x)) for k, x in sorted(v.items())]
            )
        if isinstance(v, bool):
            return T.BooleanType()
        if isinstance(v, int):
            return T.LongType()
        return T.StringType()

    def as_row(v):
        if isinstance(v, dict):
            return tuple(as_row(x) for _, x in sorted(v.items()))
        return v

    schema = field_type(rec)
    return spark.createDataFrame([as_row(rec)], schema)


def rows_set(df):
    return sorted(map(repr, df.collect()))


class TestPruneProperties:
    @PROP
    @given(rec=record())
    def test_noop_identity(self, spark, rec):
        df = to_df(spark, rec)
        assert prune_columns(df) is df  # reference :88-89 short-circuit

    @PROP
    @given(rec=record())
    def test_idempotent(self, spark, rec):
        df = to_df(spark, rec)
        once = prune_columns(df, keys_to_remove=["a"], remove_empty=True)
        twice = prune_columns(once, keys_to_remove=["a"], remove_empty=True)
        assert once.schema == twice.schema
        assert rows_set(once) == rows_set(twice)

    @PROP
    @given(rec=record())
    def test_removed_key_never_survives(self, spark, rec):
        df = to_df(spark, rec)
        out = prune_columns(df, keys_to_remove=["b"])

        def names(dt, prefix=""):
            from pyspark.sql import types as T

            acc = []
            if isinstance(dt, T.StructType):
                for f in dt.fields:
                    acc.append(f.name)
                    acc += names(f.dataType)
            return acc

        assert "b" not in names(out.schema)

    @PROP
    @given(rec=record())
    def test_deterministic(self, spark, rec):
        df = to_df(spark, rec)
        a = prune_columns(df, values_to_remove=[""], remove_empty=True)
        b = prune_columns(df, values_to_remove=[""], remove_empty=True)
        assert rows_set(a) == rows_set(b)


class TestFlattenProperties:
    @PROP
    @given(rec=record())
    def test_leaf_values_preserved(self, spark, rec):
        """Flatten renames paths but never changes leaf multiset
        (data_structures.py leaf-preservation invariant)."""
        df = to_df(spark, rec)
        flat = flatten_struct(df)

        def leaves(v):
            if isinstance(v, dict):
                out = []
                for _, x in sorted(v.items()):
                    out += leaves(x)
                return out
            return [v]

        expect = sorted(map(repr, leaves(rec)))
        row = flat.collect()[0]
        got = sorted(map(repr, row))
        assert got == expect

    @PROP
    @given(rec=record())
    def test_flat_schema_has_no_structs(self, spark, rec):
        from pyspark.sql import types as T

        flat = flatten_struct(to_df(spark, rec))
        assert not any(isinstance(f.dataType, T.StructType) for f in flat.schema.fields)

    @PROP
    @given(rec=record())
    def test_idempotent_on_flat(self, spark, rec):
        flat = flatten_struct(to_df(spark, rec))
        again = flatten_struct(flat)
        assert flat.schema == again.schema
        assert rows_set(flat) == rows_set(again)

    @PROP
    @given(rec=record())
    def test_depth_zero_is_identity(self, spark, rec):
        df = to_df(spark, rec)
        out = flatten_struct(df, max_depth=0)
        assert out.schema == df.schema
        assert rows_set(out) == rows_set(df)


class TestHashProperties:
    @PROP
    @given(vals=st.lists(st.text(max_size=8), min_size=1, max_size=5, unique=True))
    def test_sha256_is_hex_and_injective_here(self, spark, vals):
        from etlutil_spark.functions.hashing import sha256_hex

        df = spark.createDataFrame([(v,) for v in vals], "s string")
        out = [r.h for r in df.select(sha256_hex("s").alias("h")).collect()]
        assert all(len(h) == 64 and set(h) <= set("0123456789abcdef") for h in out)
        assert len(set(out)) == len(vals)

    @PROP
    @given(vals=st.lists(st.text("abc ", min_size=1, max_size=12), min_size=1, max_size=4))
    def test_md5_bigint_nonnegative_and_stable(self, spark, vals):
        from etlutil_spark.functions.hashing import md5_bigint

        df = spark.createDataFrame([(v,) for v in vals], "s string")
        one = [r.h for r in df.select(md5_bigint("s").alias("h")).collect()]
        two = [r.h for r in df.select(md5_bigint("s").alias("h")).collect()]
        assert one == two
        assert all(0 <= h < 2**60 for h in one)


class TestSamplingProperties:
    """Content-hash sampling invariants (operators/sampling.py)."""

    @PROP
    @given(
        rate=st.floats(0.0, 1.0, allow_nan=False),
        n=st.integers(1, 300),
        seed=st.text("abc", min_size=1, max_size=4),
    )
    def test_subset_and_stable(self, spark, rate, n, seed):
        from etlutil_spark.operators.sampling import deterministic_sample

        df = spark.range(0, n).withColumnRenamed("id", "k")
        kept1 = {r.k for r in deterministic_sample(df, rate, "k", seed=seed).collect()}
        kept2 = {r.k for r in deterministic_sample(df, rate, "k", seed=seed).collect()}
        assert kept1 == kept2                       # deterministic
        assert kept1 <= set(range(n))               # subset
        if rate == 0.0:
            assert kept1 == set()
        if rate == 1.0:
            assert kept1 == set(range(n))

    @PROP
    @given(n=st.integers(1, 200))
    def test_split_partitions_every_row_exactly_once(self, spark, n):
        from etlutil_spark.operators.sampling import assign_split

        df = spark.range(0, n).withColumnRenamed("id", "k")
        out = assign_split(df, "k").collect()
        assert len(out) == n
        assert {r.split for r in out} <= {"train", "eval", "test"}


class TestPackingProperties:
    """Next-fit packing invariants (operators/packing.py)."""

    @PROP
    @given(
        tokens=st.lists(st.integers(0, 50), min_size=1, max_size=40),
        budget=st.integers(1, 60),
    )
    def test_offsets_are_prefix_sums_and_cut_rule_holds(self, spark, tokens, budget):
        from etlutil_spark.operators.packing import pack_by_token_budget

        rows = [(i, n) for i, n in enumerate(tokens)]
        df = spark.createDataFrame(rows, "doc_id bigint, n_tok bigint")
        got = sorted(
            pack_by_token_budget(df, budget, n_tokens_col="n_tok").collect(),
            key=lambda r: r.doc_id,
        )
        running = 0
        for r in got:
            assert r.pack_offset == running           # offsets = prefix sums
            assert r.pack_id == running // budget     # exact cut rule
            running += r.n_tokens
        # token conservation: packs partition the stream
        assert running == sum(tokens)


# ---------------------------------------------------------------------------
# Temporal operators: randomized logs vs pure-Python reference models
# ---------------------------------------------------------------------------

from datetime import datetime, timedelta

_T0 = datetime(2024, 1, 1)

# a log: list of (key, day-offset, state); unique (key, day) enforced below
log_entry = st.tuples(
    st.integers(1, 3), st.integers(0, 12), st.one_of(st.none(), st.sampled_from("abc"))
)


def _scd2_reference(entries):
    """Pure-Python SCD2: per key, sort by ts, collapse equal-state runs,
    half-open intervals, NULL-safe state compare."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, d, s in entries:
        by_key[k].append((d, s))
    out = []
    for k, obs in by_key.items():
        obs.sort()
        runs = []
        for d, s in obs:
            if not runs or runs[-1][1] != s:
                runs.append([d, s])
        for i, (d, s) in enumerate(runs):
            nxt = runs[i + 1][0] if i + 1 < len(runs) else None
            out.append(
                (
                    k,
                    s,
                    _T0 + timedelta(days=d),
                    None if nxt is None else _T0 + timedelta(days=nxt),
                    1 if nxt is None else 0,
                )
            )
    return sorted(out, key=lambda t: (t[0], t[2]))


class TestScd2Properties:
    @PROP
    @given(entries=st.lists(log_entry, min_size=1, max_size=14))
    def test_matches_reference_model(self, spark, entries):
        from etlutil_spark.operators.scd2 import scd2_intervals

        # unique (key, day): the operator's tie contract
        dedup = {(k, d): (k, d, s) for k, d, s in entries}
        entries = list(dedup.values())
        df = spark.createDataFrame(
            [(k, _T0 + timedelta(days=d), s) for k, d, s in entries],
            "k int, at timestamp, s string",
        )
        got = sorted(
            map(tuple, scd2_intervals(df, "k", "at", "s").collect()),
            key=lambda t: (t[0], t[2]),
        )
        assert got == _scd2_reference(entries)

    @PROP
    @given(entries=st.lists(log_entry, min_size=2, max_size=14), cut=st.integers(1, 11))
    def test_incremental_apply_equals_recompute(self, spark, entries, cut):
        """For ANY time split, scd2_apply(dim(before), after) must equal
        scd2_intervals(all) — the incremental-maintenance invariant."""
        from etlutil_spark.operators.scd2 import scd2_apply, scd2_intervals

        dedup = {(k, d): (k, d, s) for k, d, s in entries}
        entries = list(dedup.values())
        before = [(k, d, s) for k, d, s in entries if d < cut]
        after = [(k, d, s) for k, d, s in entries if d >= cut]
        if not before or not after:
            return
        mk = lambda rows: spark.createDataFrame(
            [(k, _T0 + timedelta(days=d), s) for k, d, s in rows],
            "k int, at timestamp, s string",
        )
        dim = scd2_intervals(mk(before), "k", "at", "s")
        inc = scd2_apply(dim, mk(after), "k", "at", "s", strict=True)
        key = lambda t: (t[0], t[2])
        assert sorted(map(tuple, inc.collect()), key=key) == _scd2_reference(entries)


class TestGapFillProperties:
    @PROP
    @given(
        obs=st.lists(
            st.tuples(st.integers(1, 2), st.integers(0, 10), st.integers(-3, 3)),
            min_size=1,
            max_size=10,
        )
    )
    def test_dense_grid_and_ffill_model(self, spark, obs):
        from datetime import date

        from etlutil_spark.operators.timeseries import gap_fill

        dedup = {(k, d): (k, d, v) for k, d, v in obs}
        obs = list(dedup.values())
        d0 = date(2024, 3, 1)
        df = spark.createDataFrame(
            [(k, d0 + timedelta(days=d), v) for k, d, v in obs],
            "k int, d date, v int",
        )
        out = gap_fill(df, "k", "d", ffill_cols=["v"])
        rows = sorted(map(tuple, out.collect()))

        # model: per key, every day min..max present exactly once, value =
        # last observation at or before that day
        from collections import defaultdict

        by_key = defaultdict(dict)
        for k, d, v in obs:
            by_key[k][d] = v
        want = []
        for k, days in by_key.items():
            lo, hi = min(days), max(days)
            last = None
            for d in range(lo, hi + 1):
                if d in days:
                    last = days[d]
                want.append((k, d0 + timedelta(days=d), last))
        assert rows == sorted(want)


class TestExactNtileProperties:
    """operators/quantiles.py must be bit-identical to F.ntile over the
    same unique total order, for any row count / bucket count / partition
    count — the closed-form bucket rule and the distributed rank offsets
    are both exercised."""

    @PROP
    @given(
        n=st.integers(0, 120),
        buckets=st.integers(1, 7),
        parts=st.integers(1, 6),
    )
    def test_matches_real_ntile(self, spark, n, buckets, parts):
        from pyspark.sql.window import Window

        from etlutil_spark.operators.quantiles import exact_ntile

        # values with heavy ties; id breaks them into a unique total order
        df = spark.range(0, n).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        )
        got = {
            r.k: r.bucket
            for r in exact_ntile(
                df, buckets, ["v", "k"], n_partitions=parts
            ).collect()
        }
        want = {
            r.k: r.nt
            for r in df.withColumn(
                "nt", F.ntile(buckets).over(Window.orderBy("v", "k"))
            ).collect()
        }
        assert got == want

    @PROP
    @given(
        n=st.integers(0, 120),
        buckets=st.integers(1, 7),
        parts=st.integers(1, 6),
        groups=st.integers(1, 4),
    )
    def test_grouped_matches_real_ntile(self, spark, n, buckets, parts, groups):
        from pyspark.sql.window import Window

        from etlutil_spark.operators.quantiles import exact_grouped_ntile

        # group key cycles (with one NULL group when groups > 1 — SQL
        # PARTITION BY treats NULL as a group and so must the operator);
        # values carry heavy ties; id breaks them into a unique order
        df = spark.range(0, n).select(
            F.col("id").alias("k"),
            F.when(
                F.col("id") % groups == 0, F.lit(None).cast("string")
            )
            .otherwise((F.col("id") % groups).cast("string"))
            .alias("g"),
            (F.col("id") % 5).alias("v"),
        )
        got = {
            r.k: r.bucket
            for r in exact_grouped_ntile(
                df, buckets, ["g"], ["v", "k"], n_partitions=parts
            ).collect()
        }
        want = {
            r.k: r.nt
            for r in df.withColumn(
                "nt",
                F.ntile(buckets).over(Window.partitionBy("g").orderBy("v", "k")),
            ).collect()
        }
        assert got == want

    @PROP
    @given(
        n=st.integers(0, 120),
        parts=st.integers(1, 6),
        groups=st.integers(1, 4),
    )
    def test_grouped_rank_matches_row_number(self, spark, n, parts, groups):
        from pyspark.sql.window import Window

        from etlutil_spark.operators.quantiles_grouped import exact_grouped_rank

        df = spark.range(0, n).select(
            F.col("id").alias("k"),
            F.when(
                F.col("id") % groups == 0, F.lit(None).cast("string")
            )
            .otherwise((F.col("id") % groups).cast("string"))
            .alias("g"),
            (F.col("id") % 5).alias("v"),
        )
        got = {
            r.k: (r.rk, r.gn)
            for r in exact_grouped_rank(
                df, ["g"], ["v", "k"], rank_col="rk", n_col="gn",
                n_partitions=parts,
            ).collect()
        }
        w = Window.partitionBy("g")
        want = {
            r.k: (r.rk, r.gn)
            for r in df.withColumn(
                "rk", F.row_number().over(w.orderBy("v", "k"))
            )
            .withColumn("gn", F.count("*").over(w))
            .collect()
        }
        assert got == want

    def test_grouped_edges(self, spark):
        import pytest as _pt

        from etlutil_spark.operators.quantiles import exact_grouped_ntile
        from etlutil_spark.operators.quantiles_grouped import exact_grouped_rank

        df = spark.createDataFrame([], "g string, v int, id int")
        # empty input preserves schema and adds a typed null column
        e1 = exact_grouped_ntile(df, 4, ["g"], ["v", "id"])
        assert e1.count() == 0 and dict(e1.dtypes)["bucket"] == "int"
        e2 = exact_grouped_rank(df, ["g"], ["v", "id"], n_col="n")
        assert e2.count() == 0
        assert dict(e2.dtypes)["rank"] == "bigint"
        assert dict(e2.dtypes)["n"] == "bigint"
        with _pt.raises(ValueError):
            exact_grouped_ntile(df, 0, ["g"], ["v", "id"])
        # reserved scratch names are rejected loudly
        clash = spark.createDataFrame([("a", 1)], "g string, _lr int")
        with _pt.raises(ValueError):
            exact_grouped_rank(clash, ["g"], ["_lr"])

    def test_grouped_high_cardinality_group_circuit_breaker(self, spark):
        """A high-cardinality group key (per-user shape) must raise the
        bounded-groups contract error instead of funnelling the
        (partition x group) offset table through the driver; legitimate
        bounded calls pass at the same bound."""
        import pytest as _pt

        from etlutil_spark.operators.quantiles import exact_grouped_ntile
        from etlutil_spark.operators.quantiles_grouped import exact_grouped_rank

        hi = spark.range(0, 500).select(
            F.col("id").alias("g"), (F.col("id") % 7).alias("v")
        )
        with _pt.raises(ValueError, match="max_offset_rows"):
            exact_grouped_rank(hi, ["g"], ["v", "g"], max_offset_rows=100)
        with _pt.raises(ValueError, match="max_offset_rows"):
            exact_grouped_ntile(hi, 4, ["g"], ["v", "g"], max_offset_rows=100)
        lo = spark.range(0, 500).select(
            (F.col("id") % 3).alias("g"),
            F.col("id").alias("v"),
        )
        # n_partitions pinned: the offset table is ~n_parts + n_groups
        # rows, so leaving it at defaultParallelism would make this
        # "legitimate call passes" leg flaky on very-wide boxes
        assert exact_grouped_rank(
            lo, ["g"], ["v"], n_partitions=8, max_offset_rows=100
        ).count() == 500

    @PROP
    @given(n=st.integers(0, 100), buckets=st.integers(1, 5))
    def test_grouped_ntile_two_group_cols(self, spark, n, buckets):
        from pyspark.sql.window import Window

        from etlutil_spark.operators.quantiles import exact_grouped_ntile

        df = spark.range(0, n).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("g1"),
            (F.col("id") % 2).alias("g2"),
            (F.col("id") % 4).alias("v"),
        )
        got = {
            r.k: r.bucket
            for r in exact_grouped_ntile(
                df, buckets, ["g1", "g2"], ["v", "k"], n_partitions=4
            ).collect()
        }
        want = {
            r.k: r.nt
            for r in df.withColumn(
                "nt",
                F.ntile(buckets).over(
                    Window.partitionBy("g1", "g2").orderBy("v", "k")
                ),
            ).collect()
        }
        assert got == want


class TestR5Properties:
    @PROP
    @given(
        n=st.integers(1, 20),
        rows=st.lists(
            st.tuples(st.integers(0, 60), st.floats(0.1, 100.0)),
            min_size=1,
            max_size=30,
        ),
    )
    def test_weighted_sample_matches_reference_aes(self, spark, n, rows):
        """weighted_sample must select EXACTLY the top-n priorities of the
        Efraimidis-Spirakis reference computed in plain Python from the
        same portable hash."""
        import hashlib

        data = [(i, w) for i, (key, w) in enumerate(rows)]
        df = spark.createDataFrame(data, "id bigint, w double")
        from etlutil_spark.operators.sampling import weighted_sample

        got = sorted(r.id for r in weighted_sample(df, n, "w", "id", seed="p1").collect())

        def unit(i: int) -> float:
            h = int(hashlib.md5(f"p1{i}".encode()).hexdigest()[:15], 16)
            return (h + 1) / (2**60 + 2)

        pri = sorted(
            ((unit(i) ** (1.0 / w), -i) for i, w in data), reverse=True
        )
        want = sorted(-negi for _, negi in pri[:n])
        assert got == want

    def test_weighted_sample_tiny_weights_no_underflow_bias(self, spark):
        """Regression: with weights ~1e-3 the textbook u^(1/w) priority
        underflows to 0.0 for EVERY row, so selection degenerated to key
        order; the log-space priority must rank them by ln(u)/w."""
        import hashlib
        import math

        n_rows, n = 200, 20
        df = spark.createDataFrame(
            [(i, 1e-6) for i in range(n_rows)], "id bigint, w double"
        )
        from etlutil_spark.operators.sampling import weighted_sample

        got = sorted(
            r.id
            for r in weighted_sample(df, n, "w", "id", seed="uf1").collect()
        )

        def unit(i: int) -> float:
            h = int(hashlib.md5(f"uf1{i}".encode()).hexdigest()[:15], 16)
            return (h + 1) / (2**60 + 2)

        # the textbook priority underflows for (almost) every row here:
        # u^(1/w) = u^1e6 == 0.0 unless u > 1 - ~7.5e-7
        n_under = sum(unit(i) ** 1e6 == 0.0 for i in range(n_rows))
        assert n_under > n_rows * 0.9
        pri = sorted(
            ((math.log(unit(i)) / 1e-6, -i) for i in range(n_rows)),
            reverse=True,
        )
        want = sorted(-negi for _, negi in pri[:n])
        assert got == want
        assert got != list(range(n))  # NOT the key-order degenerate tail

    def test_weighted_sample_nan_weights_never_win(self, spark):
        """r12 bug hunt: Spark orders NaN GREATER than any double, so a
        NaN weight passed the w > 0 filter and its NaN priority sorted
        first descending — NaN-weight rows ALWAYS won the sample. They
        must be dropped like NULL/zero/negative weights."""
        from etlutil_spark.operators.sampling import weighted_sample

        rows = [(i, 1.0) for i in range(20)] + [
            (100, float("nan")),
            (101, float("nan")),
        ]
        df = spark.createDataFrame(rows, "k long, w double")
        got = {r.k for r in weighted_sample(df, 3, "w", "k").collect()}
        assert not ({100, 101} & got), got
        assert len(got) == 3

    def test_curriculum_nan_scores_excluded(self, spark):
        """NaN scores would skew the percentile cuts silently (Spark
        sorts NaN above every score); they must be excluded like NULL."""
        from etlutil_spark.operators.sampling import curriculum_phases

        clean = spark.createDataFrame(
            [(float(i),) for i in range(40)], "s double"
        )
        noisy = clean.unionByName(
            spark.createDataFrame(
                [(float("nan"),)] * 8, "s double"
            )
        )
        want = sorted(
            tuple(r) for r in curriculum_phases(clean, "s").collect()
        )
        got = sorted(
            tuple(r) for r in curriculum_phases(noisy, "s").collect()
        )
        assert got == want

    @PROP
    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(1, 10)),
            min_size=1,
            max_size=25,
        )
    )
    def test_interval_concurrency_matches_brute_force(self, spark, rows):
        """Sweep-line peak == brute-force point-scan peak over half-open
        integer day intervals."""
        import datetime as dt

        base = dt.date(2024, 1, 1)
        data = [
            (str(k), base + dt.timedelta(days=s), base + dt.timedelta(days=s + d))
            for k, s, d in rows
        ]
        df = spark.createDataFrame(data, "k string, s date, e date")
        from etlutil_spark.operators.rangejoin import interval_concurrency

        got = {r.k: (r.peak_concurrent, r.peak_at) for r in interval_concurrency(df, "k", "s", "e").collect()}
        for key in {str(k) for k, _, _ in rows}:
            ivs = [(s, e) for kk, s, e in data if kk == key]
            days = sorted({d for s, e in ivs for d in (s, e)})
            best, best_at = 0, None
            for day in days:
                c = sum(1 for s, e in ivs if s <= day < e)
                if c > best:
                    best, best_at = c, day
            assert got[key][0] == best
            assert got[key][1] == best_at

    @PROP
    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 1), st.integers(0, 20), st.floats(-5, 5)),
            min_size=2,
            max_size=30,
        ).filter(lambda r: len({x[0] for x in r}) == 2)
    )
    def test_trailing_window_matches_brute_force(self, spark, rows):
        """RANGE-frame trailing sums == O(n^2) reference over exact
        timestamps (7-day window, inclusive boundary)."""
        import datetime as dt

        data = [
            (i, u, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h * 13), round(v, 3))
            for i, (u, h, v) in enumerate(rows)
        ]
        df = spark.createDataFrame(data, "event_id bigint, user_id bigint, ts timestamp, value double")
        from etlutil_spark.operators.timeseries import trailing_window

        got = {r.event_id: (r.trail_sum, r.trail_n) for r in trailing_window(df, "user_id", "ts", "value", days=7).collect()}
        span = dt.timedelta(days=7)
        for i, u, ts, v in data:
            frame = [vv for _, uu, tt, vv in data if uu == u and ts - span <= tt <= ts]
            from decimal import Decimal

            want = float(sum(Decimal(str(round(x, 6))) for x in frame))
            assert got[i][1] == len(frame)
            assert abs(got[i][0] - round(want, 6)) < 1e-9, (i, got[i], want)


# --- r9: large-star/small-star connected components vs union-find ----------

_edges_strategy = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)),
    min_size=1,
    max_size=60,
)


@given(edges=_edges_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
def test_star_cc_matches_union_find(spark, edges):
    """duplicate_clusters (alternating large-star/small-star) must equal
    a union-find reference on ANY generated graph — self-loops,
    duplicate edges, singletons-by-absence, and arbitrary component
    shapes included."""
    from etlutil_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["member_id"]: r["cluster_id"]
        for r in duplicate_clusters(pairs).collect()
    }
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want


class TestDuplicateSpanProperties:
    """duplicate_spans (operators/dedup.py) vs a brute-force maximal
    matched-run finder on tiny random corpora: the seed-and-chain
    diagonal merge must produce EXACTLY the maximal shared-token runs
    of length >= min_len, for every pair, at every offset."""

    @staticmethod
    def _brute(docs: dict, k: int, min_len: int):
        out = set()
        ids = sorted(docs)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = docs[ids[x]], docs[ids[y]]
                seeds = {
                    (i, j)
                    for i in range(len(a) - k + 1)
                    for j in range(len(b) - k + 1)
                    if a[i : i + k] == b[j : j + k]
                }
                by_diag = {}
                for i, j in seeds:
                    by_diag.setdefault(i - j, []).append(i)
                for d, pos in by_diag.items():
                    pos.sort()
                    run_start = pos[0]
                    prev = pos[0]
                    for p in pos[1:] + [None]:
                        if p is None or p != prev + 1:
                            span = prev - run_start + k
                            if span >= min_len:
                                out.add(
                                    (
                                        ids[x],
                                        ids[y],
                                        run_start + 1,       # 1-based
                                        run_start - d + 1,
                                        span,
                                    )
                                )
                            if p is not None:
                                run_start = p
                        if p is not None:
                            prev = p
        return out

    @PROP
    @given(
        docs=st.lists(
            st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=14),
            min_size=2,
            max_size=4,
        )
    )
    def test_matches_bruteforce(self, spark, docs):
        from etlutil_spark.operators.dedup import duplicate_spans

        k, min_len = 3, 4
        corpus = {i + 1: toks for i, toks in enumerate(docs)}
        df = spark.createDataFrame(
            [(i, " ".join(toks)) for i, toks in corpus.items()],
            "doc_id bigint, text string",
        )
        got = {
            (r["id_a"], r["id_b"], r["a_start"], r["b_start"], r["span_tokens"])
            for r in duplicate_spans(
                df, "doc_id", "text", k=k, min_len=min_len,
                max_gram_freq=10_000,
            ).collect()
        }
        assert got == self._brute(corpus, k, min_len)


    @PROP
    @given(
        docs=st.lists(
            st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=16),
            min_size=1,
            max_size=3,
        )
    )
    def test_self_spans_match_bruteforce(self, spark, docs):
        from etlutil_spark.operators.dedup import self_repeated_spans

        k, min_len = 3, 3
        corpus = {i + 1: toks for i, toks in enumerate(docs)}
        df = spark.createDataFrame(
            [(i, " ".join(toks)) for i, toks in corpus.items()],
            "doc_id bigint, text string",
        )
        got = {
            (r["doc_id"], r["first_start"], r["second_start"], r["span_tokens"])
            for r in self_repeated_spans(
                df, "doc_id", "text", k=k, min_len=min_len,
                max_gram_freq=10_000,
            ).collect()
        }
        want = set()
        for did, a in corpus.items():
            seeds = {
                (i, j)
                for i in range(len(a) - k + 1)
                for j in range(len(a) - k + 1)
                if i < j and a[i : i + k] == a[j : j + k]
            }
            by_off = {}
            for i, j in seeds:
                by_off.setdefault(j - i, []).append(i)
            for off, pos in by_off.items():
                pos.sort()
                run_start, prev = pos[0], pos[0]
                for p in pos[1:] + [None]:
                    if p is None or p != prev + 1:
                        span = prev - run_start + k
                        if span >= min_len:
                            want.add(
                                (did, run_start + 1, run_start + off + 1, span)
                            )
                        if p is not None:
                            run_start = p
                    if p is not None:
                        prev = p
        assert got == want

    @PROP
    @given(
        docs=st.lists(
            st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=14),
            min_size=2,
            max_size=4,
        )
    )
    def test_cut_accounting_matches_bruteforce_union(self, spark, docs):
        from etlutil_spark.operators.dedup import cut_duplicate_spans

        k, min_len = 3, 4
        corpus = {i + 1: toks for i, toks in enumerate(docs)}
        df = spark.createDataFrame(
            [(i, " ".join(toks)) for i, toks in corpus.items()],
            "doc_id bigint, text string",
        )
        got = {
            r["doc_id"]: (r["n_tokens"], r["cut_tokens"])
            for r in cut_duplicate_spans(
                df, "doc_id", "text", k=k, min_len=min_len,
                max_gram_freq=10_000,
            ).collect()
        }
        spans = self._brute(corpus, k, min_len)
        cut_positions = {}
        for _ida, idb, _a_start, b_start, span in spans:
            cut_positions.setdefault(idb, set()).update(
                range(b_start, b_start + span)
            )
        want = {
            did: (len(toks), len(cut_positions.get(did, set())))
            for did, toks in corpus.items()
            if len(toks) > 0
        }
        assert got == want


class TestDatasetDiffProperties:
    """r10: dataset_diff vs a Python reference over generated keyed
    versions — counts must satisfy the identities and NULL-safe
    content compare."""

    @PROP
    @given(
        old_keys=st.sets(st.integers(0, 15), max_size=10),
        new_keys=st.sets(st.integers(0, 15), max_size=10),
        flips=st.sets(st.integers(0, 15), max_size=8),
        nulls=st.sets(st.integers(0, 15), max_size=6),
    )
    def test_matches_reference(self, spark, old_keys, new_keys, flips, nulls):
        from etlutil_spark.operators.audit import dataset_diff

        def content(k, side):
            if k in nulls:
                return None
            if side == "new" and k in flips:
                return f"v{k}x"
            return f"v{k}"

        old_rows = [(k, content(k, "old")) for k in sorted(old_keys)]
        new_rows = [(k, content(k, "new")) for k in sorted(new_keys)]
        old = spark.createDataFrame(old_rows, "id bigint, c string") if old_rows else \
            spark.createDataFrame([], "id bigint, c string")
        new = spark.createDataFrame(new_rows, "id bigint, c string") if new_rows else \
            spark.createDataFrame([], "id bigint, c string")
        r = dataset_diff(old, new, "id", ["c"]).collect()[0]
        both = old_keys & new_keys
        changed = {k for k in both if content(k, "old") != content(k, "new")}
        assert r["n_old"] == len(old_keys)
        assert r["n_new"] == len(new_keys)
        assert r["n_added"] == len(new_keys - old_keys)
        assert r["n_removed"] == len(old_keys - new_keys)
        assert r["n_changed"] == len(changed)
        assert r["n_unchanged"] == len(both) - len(changed)
        # identity: every joined row lands in exactly one bucket
        assert (
            r["n_added"] + r["n_removed"] + r["n_changed"] + r["n_unchanged"]
            == len(old_keys | new_keys)
        )


class TestClusterStoreProperty:
    """The persisted cluster store must be indistinguishable from the
    live pipeline on ANY corpus — pairs at threshold 0.0 and the CC map
    at the build threshold — since six audit queries trust it."""

    @PROP
    @given(data=st.data())
    def test_store_equals_live_pipeline(self, spark, tmp_path_factory, data):
        from etlutil_spark.operators.dedup import (
            duplicate_clusters,
            ensure_cluster_store,
            ngram_jaccard_pairs,
            read_cluster_map,
            read_cluster_pairs,
        )

        words = ["alpha", "beta", "gamma", "delta", "omega", "zeta"]
        n_docs = data.draw(st.integers(2, 6))
        texts = [
            " ".join(
                data.draw(
                    st.lists(
                        st.sampled_from(words), min_size=4, max_size=10
                    )
                )
            )
            for _ in range(n_docs)
        ]
        base = str(tmp_path_factory.mktemp("clprop"))
        spark.createDataFrame(
            list(enumerate(texts)), "doc_id bigint, text string"
        ).coalesce(1).write.mode("overwrite").parquet(base + "/docs")
        d = spark.read.parquet(base + "/docs")
        path = base + "/store"
        ensure_cluster_store(
            spark, d, path, id_col="doc_id", text_col="text", n=2,
            threshold=0.5, max_shingle_freq=50,
        )
        live_pairs = sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in ngram_jaccard_pairs(
                d, "doc_id", "text", n=2, threshold=0.0, max_shingle_freq=50
            ).collect()
        )
        got_pairs = sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in read_cluster_pairs(spark, path).collect()
        )
        assert got_pairs == live_pairs
        live_cl = sorted(
            (r.member_id, r.cluster_id)
            for r in duplicate_clusters(
                ngram_jaccard_pairs(
                    d, "doc_id", "text", n=2, threshold=0.5,
                    max_shingle_freq=50,
                )
            ).collect()
        )
        got_cl = sorted(
            (r.member_id, r.cluster_id)
            for r in read_cluster_map(spark, path).collect()
        )
        assert got_cl == live_cl
