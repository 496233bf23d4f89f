"""Operator-semantics unit tests over tiny in-memory DataFrames.

These carry the reference's portable property invariants (SURVEY §5):
no-op identity, NULL/0/False distinctions, idempotence, leaf preservation
under flatten, first-match-wins rules."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etlutil_spark.operators.casts import convert_types
from etlutil_spark.operators.clean import clean_columns
from etlutil_spark.operators.flatten import flatten_struct
from etlutil_spark.operators.project import select_with_extras
from etlutil_spark.operators.prune import prune_columns
from etlutil_spark.operators.jsonify import to_json_string
from etlutil_spark.operators.normalize_dates import normalize_date_fields
from etlutil_spark.operators.walk import sample_tree, schema_tree


@pytest.fixture(scope="module")
def nested_df(spark):
    return spark.createDataFrame(
        [
            (1, {"b": {"c": 10, "d": "x"}, "e": 5}, ["a", "", "b"], 0),
            (2, {"b": {"c": None, "d": ""}, "e": 0}, [], None),
        ],
        "id bigint, a struct<b: struct<c: bigint, d: string>, e: bigint>, tags array<string>, zero bigint",
    )


class TestFlatten:
    def test_full_flatten(self, nested_df):
        out = flatten_struct(nested_df)
        assert out.columns == ["id", "a__b__c", "a__b__d", "a__e", "tags", "zero"]
        rows = {r.id: r for r in out.collect()}
        assert rows[1].a__b__c == 10 and rows[1].a__e == 5

    def test_depth_limit_and_sep(self, nested_df):
        out = flatten_struct(nested_df, max_depth=1, sep=".")
        assert "a.b" in out.columns and "a.e" in out.columns
        assert flatten_struct(nested_df, max_depth=0).columns == nested_df.columns

    def test_skip_wins_over_whitelist(self, nested_df):
        out = flatten_struct(nested_df, keys_to_flat=["a"], keys_to_skip=["a"])
        assert out.columns == nested_df.columns

    def test_whitelist_matches_bare_name_at_any_level(self, nested_df):
        # reference: eligibility tests the CHILD KEY ("b"), not the joined
        # path ("a__b") — keys_to_flat=["a","b"] flattens both levels
        # (an earlier revision compared "a__b" to the whitelist and left
        # the inner struct nested)
        out = flatten_struct(nested_df, keys_to_flat=["a", "b"])
        assert "a__b__c" in out.columns and "a__b__d" in out.columns
        # whitelist without the inner name stops at one level
        out2 = flatten_struct(nested_df, keys_to_flat=["a"])
        assert "a__b" in out2.columns and "a__b__c" not in out2.columns

    def test_skip_matches_bare_name_at_any_level(self, nested_df):
        out = flatten_struct(nested_df, keys_to_skip=["b"])
        assert "a__b" in out.columns and "a__b__c" not in out.columns
        assert "a__e" in out.columns

    def test_keep_original(self, nested_df):
        out = flatten_struct(nested_df, keep_original=True)
        assert "a" in out.columns and "a__e" in out.columns

    def test_collision_last_write_wins(self, spark):
        # reference tests/test_data_structures.py:1186-1189
        df = spark.createDataFrame([(1, (2,))], "a__b bigint, a struct<b: bigint>")
        out = flatten_struct(df)
        assert out.columns == ["a__b"]
        assert out.collect()[0].a__b == 2

    def test_idempotent_when_flat(self, spark):
        df = spark.createDataFrame([(1, "x")], "a bigint, b string")
        assert flatten_struct(df).columns == ["a", "b"]


class TestSelectWithExtras:
    def test_extra_key_collision_renamed_not_swept(self, spark):
        # reference tests/test_data_structures_edges.py:342-353
        df = spark.createDataFrame(
            [(123, "conflict!", 30)], "id bigint, extra_collected string, age bigint"
        )
        out, moved = select_with_extras(df, ["id"])
        assert moved == ["age"]
        row = out.collect()[0]
        assert row.extra_collected_original == "conflict!"
        assert row.extra_collected == '{"age":30}'
        assert row.id == 123

    def test_extra_key_cascade_collision(self, spark):
        # reference tests/test_data_structures_edges.py:356-371
        df = spark.createDataFrame(
            [(123, "conflict1", "conflict2", "conflict3", 30)],
            "id bigint, extra_collected string, extra_collected_original string, "
            "extra_collected_original2 string, age bigint",
        )
        out, moved = select_with_extras(df, ["id"])
        row = out.collect()[0]
        assert row.extra_collected_original_original == "conflict1"
        # pre-existing *_original columns are pinned top-level, never swept
        assert row.extra_collected_original == "conflict2"
        assert row.extra_collected_original2 == "conflict3"
        assert moved == ["age"]
        assert row.extra_collected == '{"age":30}'

    def test_default_order_sorts_extra_key_too(self, spark):
        # reference default: ONE lexicographic sort over all top-level
        # names INCLUDING extra_collected — its docstring example yields
        # {'extra_collected': ..., 'id': ..., 'name': ...} (an earlier
        # revision forced extra_collected last)
        df = spark.createDataFrame(
            [(1, "alex", 30, "berlin")],
            "id bigint, name string, age bigint, city string",
        )
        out, moved = select_with_extras(df, ["id", "name"])
        assert out.columns == ["extra_collected", "id", "name"]
        assert moved == ["age", "city"]

    def test_preserve_order_interleaves_filled_keys(self, spark):
        # reference preserve_order walks allowed_ordered over kept_items
        # AFTER fill_missing, so an absent key appears in its whitelist
        # position (an earlier revision appended filled keys after kept)
        df = spark.createDataFrame([(1, "x")], "id bigint, name string")
        out, _ = select_with_extras(
            df, ["name", "missing", "id"], preserve_order=True,
            fill_missing=True, always_add_extra=True,
        )
        assert out.columns == ["name", "missing", "id", "extra_collected"]

    def test_moved_and_extras(self, nested_df):
        out, moved = select_with_extras(nested_df, ["id", "zero"])
        assert moved == ["a", "tags"]
        # default order: lexicographic over ALL names incl. extra_collected
        assert out.columns == ["extra_collected", "id", "zero"]
        row = out.where(F.col("id") == 1).collect()[0]
        assert '"e":5' in row.extra_collected

    def test_fill_missing_and_order(self, nested_df):
        out, _ = select_with_extras(
            nested_df, ["zero", "id", "ghost"], fill_missing=True, preserve_order=True
        )
        assert out.columns == ["zero", "id", "ghost", "extra_collected"]
        assert out.select("ghost").distinct().collect()[0][0] is None

    def test_no_extras_unless_always(self, spark):
        df = spark.createDataFrame([(1, "x")], "a bigint, b string")
        out, moved = select_with_extras(df, ["a", "b"])
        assert moved == [] and out.columns == ["a", "b"]
        out2, _ = select_with_extras(df, ["a", "b"], always_add_extra=True)
        assert out2.columns == ["a", "b", "extra_collected"]


class TestConvertTypes:
    def test_scalar_matrix(self, spark):
        df = spark.createDataFrame(
            [("42", "3.14", "yes", "2024-12-25", "abc", "")],
            "i string, f string, b string, d string, bad string, empty string",
        )
        out = convert_types(
            df,
            {"i": "int", "f": "float", "b": "bool", "d": "date", "bad": "int"},
        ).collect()[0]
        assert out.i == 42 and out.f == 3.14 and out.b is True
        assert str(out.d) == "2024-12-25"
        assert out.bad is None  # lenient: NULL on failure

    def test_int_via_float_truncation(self, spark):
        df = spark.createDataFrame([("3.14",), ("-2.9",)], "v string")
        vals = [r.v for r in convert_types(df, {"v": "int"}).collect()]
        assert vals == [3, -2]

    def test_bool_words_and_numbers(self, spark):
        # reference dispatch (data_structures.py:1110-1116): STRINGS are
        # true iff in the word list — numeric strings like "2" are FALSE
        # (an earlier revision numeric-coerced them to True); NUMBERS are
        # value != 0
        df = spark.createDataFrame(
            [("true",), ("ON",), ("0",), ("1",), ("2",), ("nope",), (None,)],
            "v string",
        )
        vals = [r.v for r in convert_types(df, {"v": "bool"}).collect()]
        assert vals == [True, True, False, True, False, False, None]
        num = spark.createDataFrame([(2,), (0,), (-1,), (None,)], "v int")
        nvals = [r.v for r in convert_types(num, {"v": "bool"}).collect()]
        assert nvals == [True, False, True, None]

    def test_timestamp_keeps_subsecond_precision(self, spark):
        # reference: datetime.fromtimestamp(float(v)) keeps the fraction
        df = spark.createDataFrame([("1735056631.5",)], "v string")
        out = convert_types(df, {"v": "timestamp"}).collect()[0]
        assert out.v.microsecond == 500000

    def test_timestamp_to_iso_fraction_like_isoformat(self, spark):
        # datetime.isoformat() appends ".ffffff" ONLY when nonzero
        df = spark.createDataFrame(
            [("1735056631.5", "3.14", "1735056631")], "a string, b string, c string"
        )
        out = convert_types(
            df, {"a": "timestamp_to_iso", "b": "timestamp_to_iso", "c": "timestamp_to_iso"}
        ).collect()[0]
        assert out.a == "2024-12-24T16:10:31.500000"
        assert out.b == "1970-01-01T00:00:03.140000"
        assert out.c == "2024-12-24T16:10:31"  # integral: no fraction

    def test_datetime_accepts_unpadded_components(self, spark):
        # Python strptime %m/%d/%H accept unpadded fields; the default
        # format list must too ("2024-1-5" parsed, not NULLed)
        df = spark.createDataFrame(
            [("2024-1-5", "2024-01-05 9:5:7")], "a string, b string"
        )
        out = convert_types(df, {"a": "datetime", "b": "datetime"}).collect()[0]
        assert str(out.a) == "2024-01-05 00:00:00"
        assert str(out.b) == "2024-01-05 09:05:07"

    def test_bool_empty_string_is_null(self, spark):
        # reference keeps "" untouched (a string) — the typed stand-in is
        # NULL, never False
        df = spark.createDataFrame([("",), ("true",)], "v string")
        vals = [r.v for r in convert_types(df, {"v": "bool"}).collect()]
        assert vals == [None, True]

    def test_empty_string_to_none(self, spark):
        df = spark.createDataFrame([("",)], "v string")
        assert convert_types(df, {"v": "str"}, empty_string_to_none=True).collect()[0].v is None

    def test_epoch_family(self, spark):
        df = spark.createDataFrame([("1735056631",)], "v string")
        out = convert_types(df, {"v": "timestamp_to_iso"}).collect()[0]
        assert out.v == "2024-12-24T16:10:31"  # UTC (reference used local TZ)

    def test_strict_raises(self, spark):
        df = spark.createDataFrame([("abc",)], "v string")
        with pytest.raises(Exception, match="strict convert failed"):
            convert_types(df, {"v": "int"}, strict=True).collect()

    def test_recursive_into_array_of_structs(self, spark):
        df = spark.createDataFrame(
            [(1, [{"value": "100"}, {"value": "200"}])],
            "id bigint, items array<struct<value: string>>",
        )
        out = convert_types(df, {"value": "int"}, recursive=True).collect()[0]
        assert [x.value for x in out.items] == [100, 200]

    def test_multi_format_datetime(self, spark):
        df = spark.createDataFrame(
            [("2024-12-25T15:30:45",), ("2024-12-25 15:30:45",), ("2024-12-25",)],
            "v string",
        )
        vals = [r.v for r in convert_types(df, {"v": "datetime"}).collect()]
        assert all(v is not None for v in vals)
        assert str(vals[0]) == "2024-12-25 15:30:45"


class TestCleanColumns:
    def test_callable_skip_rule_column_predicate(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("keepme",), ("scrub this long one",)], "password string"
        )
        out = clean_columns(
            df,
            keys_to_clean=["password"],
            clean_mode="replace",
            skip_rules={"password": [lambda c: F.length(c) <= 6]},
        )
        got = sorted(r.password for r in out.collect())
        assert got == sorted(["keepme", "replaced (etl)"])

    def test_callable_skip_rule_must_return_column(self, spark):
        import pytest as _pytest

        df = spark.createDataFrame([("x",)], "password string")
        with _pytest.raises(TypeError, match="Column"):
            clean_columns(
                df,
                keys_to_clean=["password"],
                clean_mode="replace",
                skip_rules={"password": [lambda c: True]},
            ).collect()

    def test_replace_and_null_guard(self, spark):
        df = spark.createDataFrame(
            [("secret", ""), (None, "x")], "password string, note string"
        )
        out = clean_columns(
            df, keys_to_clean=["password"], clean_mode="replace"
        ).collect()
        assert out[0].password == "replaced (etl)"
        assert out[1].password is None  # NULL never cleaned

    def test_hash_is_sha256_hex(self, spark):
        import hashlib

        df = spark.createDataFrame([("abc",)], "v string")
        out = clean_columns(df, keys_to_clean=["v"], clean_mode="hash").collect()[0]
        assert out.v == hashlib.sha256(b"abc").hexdigest()

    def test_delete_drops_nested_field(self, spark):
        df = spark.createDataFrame(
            [({"token": "t", "keep": 1},)], "profile struct<token: string, keep: bigint>"
        )
        out = clean_columns(df, keys_to_clean=["token"], clean_mode="delete")
        assert out.schema["profile"].dataType.fieldNames() == ["keep"]

    def test_skip_rules(self, spark):
        df = spark.createDataFrame(
            [("user@example.com",), ("user@evil.com",)], "email string"
        )
        out = clean_columns(
            df,
            keys_to_clean=["email"],
            clean_mode="empty",
            skip_rules={"email": ["@example.com"]},
        ).collect()
        assert out[0].email == "user@example.com" and out[1].email is None

    def test_truncation_hits_all_strings(self, spark):
        df = spark.createDataFrame([("x" * 30, "y" * 30)], "a string, b string")
        out = clean_columns(
            df, keys_to_clean=["a"], clean_mode="replace", truncate_strings=5
        ).collect()[0]
        assert out.a == "repla… truncated (etl)"
        assert out.b == "yyyyy… truncated (etl)"

    def test_reference_skip_rule_forms(self, spark):
        # the reference's SkipRuleConfig dicts ({"match": ..., "value"/
        # "pattern"/"func": ...}), scalar (non-list) entries, and None
        # members must all work (data_structures.py:1356-1463)
        df = spark.createDataFrame(
            [("a@corp.com",), ("b@other.com",), ("allow-x",), ("keep=1",)],
            "email string",
        )
        out = clean_columns(
            df, keys_to_clean=["email"], clean_mode="replace",
            skip_rules={"email": [
                {"match": "suffix", "value": "@corp.com"},
                {"match": "prefix", "value": "allow-"},
                None,
                {"match": "regex", "pattern": r"^keep="},
            ]},
        ).collect()
        vals = [r.email for r in out]
        assert vals == ["a@corp.com", "replaced (etl)", "allow-x", "keep=1"]
        # scalar entry = ONE suffix rule, never iterated character-wise
        out2 = clean_columns(
            df, keys_to_clean=["email"], clean_mode="replace",
            skip_rules={"email": "@corp.com"},
        ).collect()
        assert [r.email for r in out2] == [
            "a@corp.com", "replaced (etl)", "replaced (etl)", "replaced (etl)"
        ]
        # pre-fix, "allow-x" survived a scalar "@corp.com" entry because
        # iterating the string made every character its own suffix rule

    def test_delete_with_skip_rules_is_row_dependent(self, spark):
        # reference: skipped and empty values SURVIVE delete mode — a
        # typed column cannot vanish per row, so with skip rules delete
        # becomes EMPTY semantics (NULL deleted, keep skipped/empty)
        df = spark.createDataFrame(
            [("a@corp.com",), ("b@other.com",), ("",)], "email string"
        )
        out = clean_columns(
            df, keys_to_clean=["email"], clean_mode="delete",
            skip_rules={"email": "@corp.com"},
        ).collect()
        assert [r.email for r in out] == ["a@corp.com", None, ""]
        # without skip rules the column drops from the schema entirely
        out2 = clean_columns(
            df, keys_to_clean=["email"], clean_mode="delete"
        )
        assert out2.columns == []

    def test_string_rules_never_match_non_string_columns(self, spark):
        # reference predicates require isinstance(value, str): a numeric
        # 142 must NOT match suffix "42"; equals is Python-typed
        df = spark.createDataFrame([(142,), (42,)], "n bigint")
        out = clean_columns(
            df, keys_to_clean=["n"], clean_mode="empty",
            skip_rules={"n": ["42"]},
        ).collect()
        assert [r.n for r in out] == [None, None]  # both cleaned
        out2 = clean_columns(
            df, keys_to_clean=["n"], clean_mode="empty",
            skip_rules={"n": [{"match": "equals", "value": 42}]},
        ).collect()
        assert [r.n for r in out2] == [None, 42]  # typed equals skips 42

    def test_truncation_reaches_array_of_strings(self, spark):
        # reference process_container recurses into lists and truncates
        # every string (data_structures.py:1273-1282); the array branch
        # used to skip primitive-element arrays entirely
        df = spark.createDataFrame(
            [(["x" * 30, "ok"],)], "tags array<string>"
        )
        out = clean_columns(
            df, keys_to_clean=["nope"], clean_mode="replace",
            truncate_strings=5,
        ).collect()[0]
        assert out.tags == ["xxxxx… truncated (etl)", "ok"]

    def test_empty_mode_truncates_kept_strings(self, spark):
        # EMPTY mode keeps the original on the skip path; the reference
        # still truncates every surviving string
        df = spark.createDataFrame(
            [("keep-" + "z" * 30,), ("drop-me",)], "secret string"
        )
        out = clean_columns(
            df, keys_to_clean=["secret"], clean_mode="empty",
            skip_rules={"secret": [{"prefix": "keep-"}]},
            truncate_strings=8,
        ).collect()
        assert out[0].secret == "keep-zzz… truncated (etl)"
        assert out[1].secret is None

    def test_empty_container_under_target_is_not_cleaned(self, spark):
        # _value_is_empty (data_structures.py:1325-1333): an empty list
        # under a targeted key skips cleaning; string-casting an empty
        # array gives "[]" != "" so the old guard hashed it
        df = spark.createDataFrame(
            [([],), (["a"],)], "vals array<string>"
        )
        out = clean_columns(
            df, keys_to_clean=["vals"], clean_mode="hash"
        ).collect()
        assert out[0].vals == "[]"  # kept (string-cast of the original)
        assert len(out[1].vals) == 64  # sha256 hex of the non-empty array

    def test_fingerprint_mode_array_of_structs(self, spark):
        df = spark.createDataFrame(
            [([{"token": "abc", "n": 1}],)],
            "history array<struct<token: string, n: bigint>>",
        )
        out = clean_columns(
            df, keys_to_clean=["token"], clean_mode="farm_fingerprint"
        )
        elem = out.schema["history"].dataType.elementType
        assert dict((f.name, f.dataType.simpleString()) for f in elem.fields)["token"] == "bigint"


class TestPrune:
    def test_noop_identity(self, nested_df):
        assert prune_columns(nested_df) is nested_df

    def test_key_removal_any_depth(self, nested_df):
        out = prune_columns(nested_df, keys_to_remove=["d", "zero"])
        assert "zero" not in out.columns
        assert out.schema["a"].dataType["b"].dataType.fieldNames() == ["c"]

    def test_key_predicate(self, nested_df):
        out = prune_columns(nested_df, keys_to_remove=lambda k: k.startswith("ta"))
        assert "tags" not in out.columns

    def test_remove_empty_never_zero(self, nested_df):
        out = prune_columns(nested_df, remove_empty=True)
        rows = {r.id: r for r in out.collect()}
        assert rows[1].zero == 0  # 0 is NOT empty
        assert rows[1].tags == ["a", "b"]  # "" filtered from array
        assert rows[2].tags is None  # empty array nulled
        assert rows[2].a.b is None  # struct of empties nulled

    def test_value_removal_type_gated(self, nested_df):
        out = prune_columns(nested_df, values_to_remove=["a", 5])
        rows = {r.id: r for r in out.collect()}
        assert rows[1].tags == ["", "b"]  # "a" filtered
        assert rows[1].a.e is None  # 5 nulled
        assert rows[1].id == 1  # bigint 1 untouched by string "a"

    def test_value_removal_bool_int_cross_equality(self, spark):
        # Python bool IS an int: the reference's `==` matching removes
        # False for values_to_remove=[0] and 0 for [False]; the type
        # gate used to block both directions
        df = spark.createDataFrame(
            [(10, True, 7), (20, False, 0), (30, None, 1)],
            "id bigint, flag boolean, n bigint",
        )
        out = {r.id: r for r in prune_columns(df, values_to_remove=[0]).collect()}
        assert out[20].flag is None  # False == 0 -> removed
        assert out[10].flag is True
        assert out[20].n is None
        out2 = {r.id: r for r in prune_columns(df, values_to_remove=[False]).collect()}
        assert out2[20].n is None  # 0 == False -> removed
        assert out2[30].n == 1  # 1 only matches True, not False
        out3 = {r.id: r for r in prune_columns(df, values_to_remove=[True]).collect()}
        assert out3[30].n is None  # 1 == True -> removed
        assert out3[10].n == 7  # 7 != True
        assert out3[10].flag is None  # True removed from the bool column

    def test_map_entry_key_removal(self, spark):
        # a dict child is just a Mapping to the reference: keys_to_remove
        # strips matching MAP entries at the data level
        df = spark.createDataFrame(
            [(1, {"secret": 9, "keep": 1})], "id bigint, m map<string,bigint>"
        )
        out = prune_columns(df, keys_to_remove=["secret"]).collect()[0]
        assert out.m == {"keep": 1}
        # callable key specs are schema-side only (documented): map
        # entries stay
        out2 = prune_columns(
            df, keys_to_remove=lambda k: k == "secret"
        ).collect()[0]
        assert out2.m == {"secret": 9, "keep": 1}
        # max_depth=0 forbids touching the map's entries
        out3 = prune_columns(
            df, keys_to_remove=["secret"], max_depth=0
        ).collect()[0]
        assert out3.m == {"secret": 9, "keep": 1}

    def test_struct_at_depth_limit_is_never_empty(self, spark):
        # reference is_empty(dict) is len()==0; a dict whose children sit
        # PAST the recursion limit keeps them raw, has len>0, and is
        # never removed — the recursive struct-emptiness analog must not
        # peek past the depth gate (found by differential fuzzing)
        df = spark.createDataFrame(
            [(1, (("", []),))],
            "id bigint, outer struct<inner: struct<s: string, xs: array<string>>>",
        )
        out = prune_columns(df, remove_empty=True, max_depth=1).collect()[0]
        # inner's children are past max_depth=1: outer.inner stays
        assert out.outer.inner.s == "" and out.outer.inner.xs == []
        # unlimited depth: the empties cascade and the structs null out
        out2 = prune_columns(df, remove_empty=True).collect()[0]
        assert out2.outer is None

    def test_map_value_recursion(self, spark):
        # reference recursion enters dict children: empty strings inside
        # array-valued map entries are filtered, then emptied entries drop
        df = spark.createDataFrame(
            [(1, {"a": ["x", ""], "b": [""]})],
            "id bigint, m map<string,array<string>>",
        )
        out = prune_columns(df, remove_empty=True).collect()[0]
        assert out.m == {"a": ["x"]}

    def test_max_depth_gates(self, nested_df):
        out = prune_columns(nested_df, keys_to_remove=["c"], max_depth=1)
        # c lives at depth 2 -> out of reach
        assert "c" in out.schema["a"].dataType["b"].dataType.fieldNames()
        out2 = prune_columns(nested_df, keys_to_remove=["e"], max_depth=1)
        assert out2.schema["a"].dataType.fieldNames() == ["b"]


class TestJsonify:
    def test_idempotent_and_null_preserving(self, spark):
        df = spark.createDataFrame(
            [("already", {"a": 1}, None)],
            "s string, st struct<a: bigint>, n struct<b: bigint>",
        )
        out = to_json_string(df).collect()[0]
        assert out.s == "already"
        assert out.st == '{"a":1}'
        assert out.n is None

    def test_unknown_key_raises(self, spark):
        df = spark.createDataFrame([(1,)], "a bigint")
        with pytest.raises(KeyError):
            to_json_string(df, keys=["ghost"])


class TestNormalizeDates:
    def test_rename_and_first_match_wins(self, spark):
        df = spark.createDataFrame([(1735056631, "x")], "created_at long, id string")
        out = normalize_date_fields(
            df,
            [
                {"suffix": "_at", "convert": "timestamp_to_iso", "target": "datetime"},
                {"suffix": "_at", "convert": "timestamp_to_iso_date", "target": "date"},
            ],
        )
        assert out.columns == ["datetime_created", "id"]
        assert out.collect()[0].datetime_created == "2024-12-24T16:10:31"

    def test_keep_original_and_equals(self, spark):
        df = spark.createDataFrame([(1735056631,)], "created long")
        out = normalize_date_fields(
            df,
            [{"equals": "created", "convert": "timestamp_to_iso_date", "target": "date"}],
            keep_original=True,
        )
        assert out.columns == ["created", "date_created"]
        assert out.collect()[0].date_created == "2024-12-24"

    def test_bad_rule(self, spark):
        with pytest.raises(ValueError):
            normalize_date_fields(
                spark.range(1), [{"convert": "date", "target": "x"}]
            )

    def test_recursive_descends_structs_not_arrays(self, spark):
        df = spark.createDataFrame(
            [(1, (1735056631, "k", (1735056631,)), [(1735056631,)])],
            "id bigint, "
            "meta struct<created_at: bigint, keep: string, inner: struct<updated_at: bigint>>, "
            "arr array<struct<seen_at: bigint>>",
        )
        rules = [{"suffix": "_at", "convert": "timestamp_to_iso_date", "target": "date"}]
        out = normalize_date_fields(df, rules, recursive=True)
        row = out.collect()[0]
        assert out.schema["meta"].dataType.names == ["date_created", "keep", "inner"]
        assert row.meta.date_created == "2024-12-24"
        assert row.meta.inner.date_updated == "2024-12-24"
        # arrays are NOT descended (reference skips list items)
        assert out.schema["arr"].dataType.elementType.names == ["seen_at"]

    def test_recursive_off_leaves_structs_untouched(self, spark):
        df = spark.createDataFrame(
            [((1735056631,),)], "meta struct<created_at: bigint>"
        )
        rules = [{"suffix": "_at", "convert": "timestamp_to_iso_date", "target": "date"}]
        out = normalize_date_fields(df, rules)
        assert out.schema["meta"].dataType.names == ["created_at"]

    def test_recursive_keep_original_inside_struct(self, spark):
        df = spark.createDataFrame(
            [((1735056631,),)], "meta struct<created_at: bigint>"
        )
        rules = [{"suffix": "_at", "convert": "timestamp_to_iso_date", "target": "date"}]
        out = normalize_date_fields(df, rules, recursive=True, keep_original=True)
        assert out.schema["meta"].dataType.names == ["created_at", "date_created"]
        row = out.collect()[0]
        assert row.meta.created_at == 1735056631
        assert row.meta.date_created == "2024-12-24"

    def test_container_typed_match_renames_without_converting(self, spark):
        # reference: _convert_value(dict, "timestamp_to_iso") raises
        # TypeError internally -> lenient mode renames but keeps the
        # value; building the cast would AnalysisException even leniently
        df = spark.createDataFrame(
            [((7,), 1735056631)],
            "stats_at struct<n: bigint>, created_at bigint",
        )
        rules = [
            {"suffix": "_at", "convert": "timestamp_to_iso_date", "target": "date"}
        ]
        out = normalize_date_fields(df, rules)
        assert out.columns == ["date_stats", "date_created"]
        row = out.collect()[0]
        assert row.date_stats.n == 7  # struct kept verbatim
        assert row.date_created == "2024-12-24"
        # strict mode surfaces the container-type failure
        with pytest.raises(TypeError, match="strict convert failed"):
            normalize_date_fields(df, rules, strict=True)


class TestWalk:
    def test_schema_tree_shape(self, nested_df):
        out = schema_tree(nested_df, print_output=False)
        assert out.startswith("root")
        assert "├─ a: struct" in out and "└─ zero: bigint" in out

    def test_schema_tree_depth(self, nested_df):
        out = schema_tree(nested_df, max_depth=1, print_output=False)
        assert "a__b" not in out and "c" not in out.replace("struct", "")

    def test_sample_tree_values(self, nested_df):
        out = sample_tree(nested_df.orderBy("id").limit(1), print_output=False)
        assert "id = 1" in out

    def test_walk_sample_returns_collected_copy(self, spark):
        """Reference walk contract (data_structures.py:243-340): print is
        optional, the return value is ALWAYS the limit-applied copy."""
        from etlutil_spark.operators.walk import walk_sample

        df = spark.createDataFrame(
            [(1, {"b": 2, "a": 1}, [10, 20, 30], ("x", "y"))],
            "id long, m map<string,long>, xs array<long>, tp struct<u:string,v:string>",
        )
        got = walk_sample(df, print_output=False)
        assert got == {
            "id": 1,
            "m": {"a": 1, "b": 2},
            "xs": [10, 20, 30],
            "tp": {"u": "x", "v": "y"},
        }

    def test_collect_limited_reference_semantics(self):
        """Mirrors the reference's _collect_data rules
        (data_structures.py:360-466): depth-limited containers become
        EMPTY containers of the same kind; sequences truncate (list vs
        tuple preserved); mappings keep every key; strings pass through
        untruncated."""
        from etlutil_spark.operators.walk import collect_limited

        data = {
            "deep": {"inner": {"x": 1}},
            "seq": [1, 2, 3, 4],
            "tup": (1, 2, 3),
            "s": "long-string",
        }
        # max_depth: root=0, children containers empty out at depth 2
        assert collect_limited(data, max_depth=2) == {
            "deep": {"inner": {}},
            "seq": [1, 2, 3, 4],
            "tup": (1, 2, 3),
            "s": "long-string",
        }
        # item limit applies to sequences only, never mappings
        many_keys = {f"k{i}": i for i in range(10)}
        got = collect_limited(
            {"m": many_keys, "seq": [1, 2, 3, 4]}, max_items_per_container=2
        )
        assert got["m"] == many_keys
        assert got["seq"] == [1, 2]
        # depth limit at the root: empty container of the root's kind
        assert collect_limited(data, max_depth=0) == {}
        assert collect_limited([1, [2]], max_depth=0) == []
        assert collect_limited((1, 2), max_depth=0) == ()
