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


def dataset_digest(df: DataFrame) -> str:
    """Content-identity digest of the files backing ``df``'s scan:
    md5 over the sorted (path, length, mtime) of every input file.

    The ensure_* persisted stores fold this into their metadata so a
    store keyed by a path string cannot silently serve stale results
    after the dataset at that path is REGENERATED — same params +
    different bytes now reads as a param mismatch and rebuilds. Cost is
    one listStatus per input DIRECTORY (not one py4j round-trip per
    file — a 100 TB table has tens of thousands of part files but few
    directories, and this runs on every warm ensure_* call); an
    in-memory frame (no backing files) digests to the empty-list hash,
    which is stable but cannot detect content changes — persist such
    inputs first if staleness matters."""
    import hashlib
    import warnings
    from collections import defaultdict

    spark = df.sparkSession
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    by_dir: dict[str, set[str]] = defaultdict(set)
    input_files = df.inputFiles()
    if not input_files:
        warnings.warn(
            "dataset_digest: frame has no backing files (in-memory or view "
            "input) — digest is the constant empty-list hash and CANNOT "
            "detect content changes; persist the input first if staleness "
            "matters",
            stacklevel=2,
        )
    for f in input_files:
        parent, _, name = f.rpartition("/")
        by_dir[parent].add(name)
    h = hashlib.md5()
    entries: list[str] = []
    for parent, names in by_dir.items():
        p = jvm.org.apache.hadoop.fs.Path(parent)
        fs = p.getFileSystem(conf)
        seen: dict[str, str] = {}
        try:
            statuses = list(fs.listStatus(p))
        except Exception:
            # The input directory vanished between plan and digest (dataset
            # deleted or mid-regeneration). Every file in it reads as
            # 'missing' — a digest CHANGE — so the ensure_* reuse check
            # falls through to rebuild instead of propagating an opaque
            # JVM error out of a warm read: a damaged input must never
            # brick the store.
            statuses = []
        for st in statuses:
            nm = st.getPath().getName()
            if nm in names:
                seen[nm] = f"{st.getLen()}|{st.getModificationTime()}"
        for nm in names:
            entries.append(f"{parent}/{nm}|{seen.get(nm, 'missing')}\n")
    for line in sorted(entries):
        h.update(line.encode())
    return h.hexdigest()


def store_root(spark=None) -> str:
    """Base directory under which every ensure_* persisted store
    (cluster map, MinHash signatures, postings, IVF/IVFADC, histogram)
    is created by the query layer.

    Resolution order: the ``SPARK_GRAFT_STORE_DIR`` environment
    variable, then the Spark conf ``spark.etlutil.storeRoot`` (when a
    session is passed or active), then ``tempfile.gettempdir()``.

    The default is correct for single-box execution, where driver and
    executors share a filesystem. On a real cluster, point this at a
    path visible to every executor AND the driver (HDFS, NFS, or an
    object store via its Hadoop connector) — the stores are plain
    parquet + one meta sidecar, so any Hadoop-addressable filesystem
    works. This helper is the ONLY place the query layer binds a store
    location; the operators themselves take arbitrary paths."""
    import os
    import tempfile

    env = os.environ.get("SPARK_GRAFT_STORE_DIR")
    if env:
        return env.rstrip("/")
    try:
        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
        if spark is not None:
            conf_val = spark.conf.get("spark.etlutil.storeRoot", None)
            if conf_val:
                return conf_val.rstrip("/")
    except Exception:
        pass
    return tempfile.gettempdir()
