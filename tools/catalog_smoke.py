"""Whole-catalog smoke at sf0.1: run + collect every registered query,
print per-query wall and the slowest 15. Cold ensure_* stores."""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etlutil_spark.operators.util import store_root

root = store_root()
for entry in sorted(os.listdir(root)):
    if entry.startswith("etlutil_spark_"):
        shutil.rmtree(os.path.join(root, entry), ignore_errors=True)

from etlutil_spark.session import get_spark  # noqa: E402

spark = get_spark("catalog-smoke")
spark.sparkContext.setLogLevel("ERROR")
from etlutil_spark import queries as Q  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
t_all = time.time()
times = {}
fails = 0
for name in Q.QUERIES:
    t0 = time.time()
    try:
        Q.QUERIES[name](spark, SF).collect()
        times[name] = time.time() - t0
        print(f"OK {name} {times[name]:.1f}s", flush=True)
    except Exception as ex:
        fails += 1
        print(f"FAIL {name}: {type(ex).__name__}: {str(ex)[:160]}", flush=True)
print(f"DONE: {len(times)} ok, {fails} fail in {time.time()-t_all:.0f}s", flush=True)
print("slowest:")
for k, v in sorted(times.items(), key=lambda kv: -kv[1])[:15]:
    print(f"  {v:6.1f}  {k}", flush=True)
spark.stop()
