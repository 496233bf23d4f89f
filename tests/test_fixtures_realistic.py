"""Realistic-fixture layer (SURVEY §5 carry-over #3): the reference proves
its operators on real connector payloads (Jira changelog, API responses —
/root/reference/tests/fixtures/jira_item.json, conftest.py:97-110); this
mirrors those shapes as DataFrames (FIXTURES.md §1) and runs the same
operator compositions its tests exercise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etlutil_spark.operators.clean import clean_columns
from etlutil_spark.operators.flatten import flatten_struct
from etlutil_spark.operators.project import select_with_extras
from etlutil_spark.operators.prune import prune_columns


@pytest.fixture(scope="module")
def jira(spark):
    """FIXTURES.md §1 jira_changelog shape (reference
    tests/fixtures/jira_item.json)."""
    rows = [
        (
            "10000004",
            ("#4682B4", "asd@zaq.mko", "funny panda"),
            "2024-11-07T16:35:51.592+0300",
            [
                ("status", "jira", "status", None, None, "3", "In Progress"),
                ("assignee", "jira", "assignee", "u1", "old owl", "u2", "funny panda"),
                ("Rank", "custom", None, None, "", None, "Ranked higher"),
            ],
            "ETL",
            "ETL-909",
            "21314",
            "fb8d3ff0-0000-0000-0000-000000000000",
            "2024-12-23T16:30:31.668500",
            7,
        )
    ]
    schema = (
        "id string, "
        "author struct<accountId: string, emailAddress: string, displayName: string>, "
        "created string, "
        "items array<struct<field: string, fieldtype: string, fieldId: string, "
        "`from`: string, fromString: string, `to`: string, toString: string>>, "
        "project_key string, issue_key string, issue_id string, "
        "import_uuid_generated string, import_datetime string, import_last_days bigint"
    )
    return spark.createDataFrame(rows, schema)


class TestJiraChangelog:
    def test_prune_import_prefix_keys(self, jira):
        """Mirror of reference tests/test_data_structures.py:245-276:
        drop every import_* bookkeeping key by predicate."""
        out = prune_columns(jira, keys_to_remove=lambda k: k.startswith("import_"))
        assert [c for c in out.columns if c.startswith("import_")] == []
        assert "author" in out.columns  # everything else intact
        assert out.count() == 1

    def test_prune_empty_values_in_items(self, jira):
        """remove_empty nulls the ""/None leaves inside array-of-structs
        but keeps populated siblings."""
        out = prune_columns(jira, remove_empty=True)
        items = out.collect()[0]["items"]
        rank = [i for i in items if i.field == "Rank"][0]
        assert rank.fromString is None  # "" became NULL
        assert rank.toString == "Ranked higher"

    def test_flatten_then_whitelist_with_extras(self, jira):
        """The BQ-load prep composition: flatten author, whitelist the load
        columns, sweep the rest into extra_collected JSON."""
        flat = flatten_struct(jira, keys_to_skip=("items",))
        assert "author__emailAddress" in flat.columns
        allowed = ["id", "issue_key", "author__displayName", "created"]
        out, moved = select_with_extras(flat, allowed)
        assert set(allowed) <= set(out.columns)
        assert "import_uuid_generated" in moved
        row = out.collect()[0]
        assert row.author__displayName == "funny panda"
        assert "ETL" in row.extra_collected  # project_key preserved losslessly

    def test_clean_pii_email_hash(self, jira):
        """PII scrub (reference clean_dict hash mode) inside a nested
        struct: the email is replaced by its sha256, other fields stay."""
        out = clean_columns(
            jira, keys_to_clean=["emailAddress"], clean_mode="hash"
        )
        author = out.collect()[0]["author"]
        assert author.emailAddress != "asd@zaq.mko"
        assert len(author.emailAddress) == 64
        assert author.displayName == "funny panda"

    def test_full_pipeline_roundtrip_row_count(self, jira):
        out = clean_columns(
            prune_columns(
                flatten_struct(jira, keys_to_skip=("items",)),
                keys_to_remove=lambda k: k.startswith("import_"),
                remove_empty=True,
            ),
            keys_to_clean=["author__emailAddress"],
            clean_mode="hash",
        )
        assert out.count() == 1
        assert not [c for c in out.columns if c.startswith("import_")]
