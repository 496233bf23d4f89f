#!/usr/bin/env python
"""Catalog determinism sweep: every registered query must produce a
hash-identical result under two deliberately different cluster shapes
(parallelism + shuffle-partition count). Catches partition-order-
dependent results (uncompensated float aggregation order, tie-breaks
that depend on task scheduling) that the DuckDB oracle comparison can
miss when both engines happen to agree at one configuration.

Run per round (r7 result: 202/202 identical):

    python tools/determinism_sweep.py [start [end]] 2>/dev/null

Prints one line per mismatch and a final summary; exits nonzero on any
mismatch.
"""

from __future__ import annotations

import hashlib
import os
import sys

# `python tools/determinism_sweep.py` puts tools/ (the script dir) on
# sys.path, not the repo root where __spark_entry__ lives — add it.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"
CONFIGS = [("32", "local[8]"), ("7", "local[3]")]


def canon_hash(df) -> str:
    pdf = df.toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return hashlib.md5(
        pd.util.hash_pandas_object(pdf.astype(str), index=False).values.tobytes()
    ).hexdigest()


def main() -> int:
    import __spark_entry__ as e

    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    end = int(sys.argv[2]) if len(sys.argv) > 2 else None
    results: dict[str, list[str]] = {}
    for parts, master in CONFIGS:
        spark = (
            SparkSession.builder.master(master)
            .config("spark.sql.shuffle.partitions", parts)
            .appName(f"determinism-{parts}")
            .getOrCreate()
        )
        qs = e.queries()
        names = list(qs)[start:end]
        for name in names:
            try:
                results.setdefault(name, []).append(canon_hash(qs[name](spark, SF)))
            except Exception as ex:  # noqa: BLE001 — report, don't abort the sweep
                results.setdefault(name, []).append("ERR:" + str(ex)[:120])
        spark.stop()
    bad = {k: v for k, v in results.items() if len(set(v)) != 1}
    print(f"checked {len(results)} mismatches {len(bad)}")
    for k, v in bad.items():
        print("MISMATCH", k, v)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
