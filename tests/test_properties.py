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
