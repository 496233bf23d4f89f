"""Stream-maintained anomaly detection: a watermarked tumbling-window
stream keeps the hourly counts rollup; trailing_baseline_over_counts
runs over the accumulated store. The equivalence contract: the
stream-maintained series must flag exactly the buckets the
batch-recomputed series flags (events_hourly_anomaly's math), across a
multi-micro-batch ingest."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etlutil_spark.operators.timeseries import (
    trailing_baseline_anomaly,
    trailing_baseline_over_counts,
)
from etlutil_spark.sources.testdata import load_table
from etlutil_spark.streaming.events import stream_events_from_dir, windowed_counts


@pytest.fixture(scope="module")
def split_events_dir(spark, sf_dir, tmp_path_factory):
    """The events table re-written as several files so the
    max_files_per_trigger=1 stream processes multiple micro-batches."""
    out = str(tmp_path_factory.mktemp("stream_src") / "events")
    load_table(spark, "events", sf_dir).repartition(5).write.mode("overwrite").parquet(out)
    return out


def test_stream_maintained_counts_flag_same_spikes_as_batch(spark, sf_dir, split_events_dir):
    stream = stream_events_from_dir(spark, split_events_dir)
    agg = windowed_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("anomaly_counts_store")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    store = spark.table("anomaly_counts_store").select(
        "event_type", F.col("window_start").alias("bucket"), "n_events"
    )

    streamed = trailing_baseline_over_counts(store, ["event_type"]).collect()
    batch = trailing_baseline_anomaly(
        load_table(spark, "events", sf_dir).select("event_type", "ts"), "ts", ["event_type"]
    ).collect()

    key = lambda r: (r["event_type"], r["bucket"])
    s = {key(r): (r["n_events"], r["baseline"], r["is_spike"]) for r in streamed}
    b = {key(r): (r["n_events"], r["baseline"], r["is_spike"]) for r in batch}
    assert s == b
    assert any(v[2] == 1 for v in b.values())  # the corpus does contain spikes
