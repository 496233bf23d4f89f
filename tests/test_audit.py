"""Data-quality audits (operators/audit.py). The registered
audit_fk_orphans query proves the plumbing against DuckDB on the clean
corpus (all zeros — the expected production result); these tests prove
the DETECTION semantics on handmade dirty data."""

from __future__ import annotations

from etlutil_spark.operators.audit import fk_orphan_counts, key_uniqueness


class TestFkOrphans:
    def test_detects_orphans_and_null_keys(self, spark):
        child = spark.createDataFrame(
            [(1, 10), (2, 10), (3, 99), (4, None), (5, 98)],
            "id bigint, fk bigint",
        )
        parent = spark.createDataFrame([(10,), (11,)], "pk bigint")
        got = fk_orphan_counts([("c->p", child, "fk", parent, "pk")]).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["relation"], r["n_children"]) == ("c->p", 5)
        # fk=99 and fk=98 are orphans; the NULL key is reported apart
        assert r["n_orphans"] == 2
        assert r["n_null_keys"] == 1

    def test_clean_relation_audits_to_zero(self, spark):
        child = spark.createDataFrame([(1, 10), (2, 11)], "id bigint, fk bigint")
        parent = spark.createDataFrame([(10,), (11,)], "pk bigint")
        r = fk_orphan_counts([("c->p", child, "fk", parent, "pk")]).collect()[0]
        assert (r["n_orphans"], r["n_null_keys"]) == (0, 0)

    def test_multiple_relations_union(self, spark):
        a = spark.createDataFrame([(1, 7)], "id bigint, fk bigint")
        p = spark.createDataFrame([(7,)], "pk bigint")
        q = spark.createDataFrame([(8,)], "pk bigint")
        got = {
            r["relation"]: r["n_orphans"]
            for r in fk_orphan_counts(
                [("a->p", a, "fk", p, "pk"), ("a->q", a, "fk", q, "pk")]
            ).collect()
        }
        assert got == {"a->p": 0, "a->q": 1}


class TestKeyUniqueness:
    def test_duplicates_and_nulls(self, spark):
        t = spark.createDataFrame(
            [(1,), (1,), (2,), (None,)], "k bigint"
        )
        r = key_uniqueness([("t", t, "k")]).collect()[0]
        assert r["n_rows"] == 4
        assert r["n_distinct_keys"] == 2
        assert r["n_duplicate_rows"] == 1  # one extra copy of k=1
        assert r["n_null_keys"] == 1


class TestFkOrphanGroupFoldGuard:
    """r12 verdict item 4: the group-fold left-joins every parent of a
    shared child in sequence. A parent with DUPLICATE keys used to
    multiply child rows and silently corrupt n_children/n_null_keys for
    every other relation in the group; the distinct-parent-key join makes
    that structurally impossible. This is the poisoned case — it was RED
    on the pre-guard code (n_children read 8, not 5, for both
    relations)."""

    def test_duplicate_parent_keys_cannot_corrupt_group(self, spark):
        child = spark.createDataFrame(
            [(1, 10, 20), (2, 10, 21), (3, 99, 20), (4, None, 22), (5, 11, None)],
            "id bigint, fk1 bigint, fk2 bigint",
        )
        # parent1 is DIRTY: key 10 appears 4x (would multiply the two
        # fk1=10 children into 8 rows under a raw left join)
        parent1 = spark.createDataFrame(
            [(10,), (10,), (10,), (10,), (11,)], "pk bigint"
        )
        parent2 = spark.createDataFrame([(20,), (21,)], "pk bigint")
        got = {
            r["relation"]: r
            for r in fk_orphan_counts(
                [
                    ("c->p1", child, "fk1", parent1, "pk"),
                    ("c->p2", child, "fk2", parent2, "pk"),
                ]
            ).collect()
        }
        # BOTH relations must see the true 5 children despite p1's dups
        assert got["c->p1"]["n_children"] == 5
        assert got["c->p2"]["n_children"] == 5
        assert got["c->p1"]["n_orphans"] == 1  # fk1=99
        assert got["c->p1"]["n_null_keys"] == 1
        assert got["c->p2"]["n_orphans"] == 1  # fk2=22
        assert got["c->p2"]["n_null_keys"] == 1
