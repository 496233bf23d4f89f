"""Oracle parity over a NAMED SUBSET of queries at one or more SFs.

Usage: python tools/subset_parity.py sf0.001,sf0.01 q1 q2 ...
Uses the same compare_query harness as the full catalog gate.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

sfs = sys.argv[1].split(",")
names = sys.argv[2:]

spark = SparkSession.builder.master("local[8]").appName("subset-parity").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e  # noqa: E402
from tests.helpers import compare_query  # noqa: E402

qs, os_ = e.queries(), e.oracle_sql()
n_fail = 0
for sf in sfs:
    sf_dir = f"/root/testdata/{sf}"
    for name in names:
        t0 = time.time()
        try:
            if name in os_:
                compare_query(qs[name](spark, sf_dir), os_[name], sf_dir)
                mode = "hash"
            else:
                assert qs[name](spark, sf_dir).count() >= 0
                mode = "rows"
            print(f"OK {name} [{mode}] {sf} {time.time()-t0:.1f}s", flush=True)
        except Exception as ex:
            n_fail += 1
            print(f"FAIL {name} {sf}: {type(ex).__name__}: {str(ex)[:200]}", flush=True)
print("DONE", "FAIL" if n_fail else "ALL GREEN", flush=True)
spark.stop()
sys.exit(1 if n_fail else 0)
