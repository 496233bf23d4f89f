"""Driver-shaped front-50 correctness sim: the exact t2 gate shape
(vanilla session, sf0.01, DuckDB value-hash compare via tests.helpers).
Run with cleared ensure_* store roots for cold-store realism."""
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

spark = SparkSession.builder.master("local[8]").appName("front50-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e  # noqa: E402
from tests.helpers import compare_query  # noqa: E402

print("entry rows:", len(e.entry(spark).collect()), flush=True)
qs, os_ = e.queries(), e.oracle_sql()
front = list(qs)[:50]
t_start = time.time()
n_ok = 0
for name in front:
    t0 = time.time()
    if name in os_:
        compare_query(qs[name](spark, "/root/testdata/sf0.01"), os_[name], "/root/testdata/sf0.01")
        mode = "hash"
    else:
        assert qs[name](spark, "/root/testdata/sf0.01").count() >= 0
        mode = "rows"
    n_ok += 1
    print(f"OK {name} [{mode}] {time.time()-t0:.1f}s", flush=True)
print(f"ALL OK: {n_ok}/50 in {time.time()-t_start:.0f}s", flush=True)
spark.stop()
