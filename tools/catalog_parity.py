"""Whole-catalog driver-shaped parity at the gate SF: every registered
query value-hash-compared to its DuckDB oracle at sf0.01 (rows-only for
oracle-less entries), vanilla session, cold ensure_* stores."""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

if "--keep-stores" not in sys.argv:
    from etlutil_spark.operators.util import store_root

    root = store_root()
    for entry in sorted(os.listdir(root)):
        if entry.startswith("etlutil_spark_"):
            shutil.rmtree(os.path.join(root, entry), ignore_errors=True)

spark = SparkSession.builder.master("local[8]").appName("catalog-parity").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e  # noqa: E402
from tests.helpers import compare_query  # noqa: E402

qs, os_ = e.queries(), e.oracle_sql()
t_start = time.time()
n_ok = n_fail = 0
for name in qs:
    t0 = time.time()
    try:
        if name in os_:
            compare_query(qs[name](spark, "/root/testdata/sf0.01"), os_[name], "/root/testdata/sf0.01")
            mode = "hash"
        else:
            assert qs[name](spark, "/root/testdata/sf0.01").count() >= 0
            mode = "rows"
        n_ok += 1
        print(f"OK {name} [{mode}] {time.time()-t0:.1f}s", flush=True)
    except Exception as ex:
        n_fail += 1
        print(f"FAIL {name}: {type(ex).__name__}: {str(ex)[:200]}", flush=True)
print(f"DONE: {n_ok} ok, {n_fail} fail of {len(qs)} in {time.time()-t_start:.0f}s", flush=True)
spark.stop()
sys.exit(1 if n_fail else 0)
