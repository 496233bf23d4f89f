"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the input has fewer partitions
    than the target (default: the cluster's defaultParallelism).

    CPU-heavy per-row operators (hashing every shingle, per-pair cosine)
    inherit the scan's partitioning; a small file with one row group gives
    ONE partition, serializing all downstream map work no matter how many
    cores exist. At real scale inputs arrive in thousands of partitions and
    this is a no-op — the gate means we never add a shuffle to data that is
    already spread out."""
    minp = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < minp:
        return df.repartition(minp)
    return df
