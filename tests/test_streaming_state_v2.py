"""transformWithStateInPandas (Spark 4 StatefulProcessor) equivalence:
the v2 running-totals operator must converge to the batch aggregate
across micro-batches, same contract as the v1 GroupState twin.

The v2 operator's Python driver worker speaks protobuf to the JVM state
server; when `google.protobuf` is not installed (this container), the
whole module SKIPS — the operator itself is plain DataFrame API and runs
anywhere a stock PySpark 4 install does. The v1 twin
(`running_user_totals`) carries the always-on equivalence coverage."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

pytest.importorskip(
    "google.protobuf",
    reason="transformWithState's Python worker requires protobuf "
    "(stock PySpark dependency, absent in this container)",
)


@pytest.fixture()
def rocksdb_session(spark):
    """transformWithState only runs on the RocksDB state store; pin it for
    this test and restore the prior provider after."""
    from etlutil_spark.streaming.state_v2 import rocksdb_conf

    saved = {}
    for k, v in rocksdb_conf().items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


class TestTransformWithState:
    def test_v2_totals_accumulate_across_micro_batches(
        self, rocksdb_session, sf_dir, tmp_path
    ):
        spark = rocksdb_session
        from etlutil_spark.sources.testdata import load_table
        from etlutil_spark.streaming.events import run_stream_query
        from etlutil_spark.streaming.state_v2 import running_user_totals_v2

        ev = load_table(spark, "events", sf_dir)
        src_dir = str(tmp_path / "events_split")
        ev.repartition(4).write.parquet(src_dir)

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        got = run_stream_query(
            running_user_totals_v2(stream),
            query_name="t_twsv2",
            output_mode="update",
        )
        pdf = got.toPandas()
        latest = (
            pdf.groupby("user_id").last()[["n_events", "total_value"]].to_dict("index")
        )
        expect = {
            r.user_id: (r.n, round(r.total, 6))
            for r in ev.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
            .collect()
        }
        got_map = {
            k: (int(v["n_events"]), round(float(v["total_value"]), 6))
            for k, v in latest.items()
        }
        assert got_map == expect

    def test_v1_and_v2_agree(self, rocksdb_session, sf_dir, tmp_path):
        """Same stream through both stateful APIs -> identical final
        per-key totals (the v2 migration is a drop-in)."""
        spark = rocksdb_session
        from etlutil_spark.sources.testdata import load_table
        from etlutil_spark.streaming.events import (
            run_stream_query,
            running_user_totals,
        )
        from etlutil_spark.streaming.state_v2 import running_user_totals_v2

        ev = load_table(spark, "events", sf_dir).limit(2000)
        src_dir = str(tmp_path / "ev2")
        ev.repartition(2).write.parquet(src_dir)

        def final_totals(make_op, qname):
            stream = (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src_dir)
            )
            got = run_stream_query(
                make_op(stream), query_name=qname, output_mode="update"
            ).toPandas()
            last = got.groupby("user_id").last()
            return {
                int(k): (int(r["n_events"]), round(float(r["total_value"]), 6))
                for k, r in last.iterrows()
            }

        assert final_totals(running_user_totals, "t_v1") == final_totals(
            running_user_totals_v2, "t_v2"
        )
