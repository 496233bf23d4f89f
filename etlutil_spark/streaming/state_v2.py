"""Arbitrary stateful processing via transformWithStateInPandas (the
Spark 4 `StatefulProcessor` API — the successor to
``applyInPandasWithState``).

Why both exist in this repo: ``running_user_totals`` (streaming/events.py)
uses the v1 GroupState API, which is frozen but universally available;
this module is the same operator on the v2 API, which is where new
stateful semantics land (typed per-key state variables with independent
TTLs, timers for emit-on-silence, initial-state bootstrap, composite
list/map state). At 100 TB the operational difference is the state store:
v2 requires the RocksDB provider (see :func:`rocksdb_conf`), whose
changelog checkpointing and disk-backed maps are what keep hundreds of
millions of keys off the executor heap — exactly the regime where the
HDFS-backed in-memory default dies.

Batch twin for verification: a plain groupBy().agg() — the equivalence
test drives the stream over the same files and compares final totals.

Runtime dependency note: the v2 Python worker communicates with the JVM
state server over protobuf, so executing it requires the stock PySpark
dependency ``google.protobuf`` (absent in this build container — the
equivalence tests in tests/test_streaming_state_v2.py importorskip on
it; the v1 GroupState twin carries always-on coverage).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

if TYPE_CHECKING:
    import pandas as pd

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = "n BIGINT, total DOUBLE"


def rocksdb_conf() -> dict[str, str]:
    """Session conf required by transformWithState: the v2 operator only
    runs on the RocksDB state store (bundled with Spark 4, not the
    default). Changelog checkpointing makes commits O(delta) instead of
    O(state) — mandatory at large key cardinalities."""
    return {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": (
            "true"
        ),
    }


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running count/sum, emitted once per key per micro-batch.

    State is one typed value row per key (two numbers); with a TTL it
    would be evicted on inactivity — set ``ttl_ms`` for unbounded key
    spaces so the store tracks the active working set, not history."""

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", _STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key: Any, rows: Iterator["pd.DataFrame"], timerValues: Any
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if self._totals.exists():
            n, total = self._totals.get()
        else:
            n, total = 0, 0.0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_user_totals_v2(
    events: DataFrame, *, ttl_ms: int | None = None
) -> DataFrame:
    """The v2 twin of streaming/events.py:running_user_totals. Streaming
    input only (transformWithState has no batch execution path — use the
    groupBy().agg() twin for batch)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(ttl_ms=ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
