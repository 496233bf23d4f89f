"""Headline-only bench (same methodology as bench.py: warmup, cold store
reset, per-query median of N runs) for fast optimization iteration.
"""
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etlutil_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-headline")
    spark.sparkContext.setLogLevel("ERROR")
    from bench import HEADLINE  # noqa: E402
    from etlutil_spark import queries as Q  # noqa: E402
    from etlutil_spark.operators.util import store_root  # noqa: E402

    root = store_root(spark)
    for entry in sorted(os.listdir(root)) if os.path.isdir(root) else []:
        if entry.startswith("etlutil_spark_"):
            shutil.rmtree(os.path.join(root, entry), ignore_errors=True)

    Q.QUERIES["q1_pricing_summary"](spark, sf_dir).collect()
    t0 = time.perf_counter()
    spark.range(0, 20_000_000, 1, 32).selectExpr(
        "id % 97 AS k", "id % 31 AS v"
    ).groupBy("k").sum("v").collect()
    calib = round(time.perf_counter() - t0, 4)

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    run_timings = []
    for _ in range(n_runs):
        t = {}
        for name in HEADLINE:
            t0 = time.perf_counter()
            Q.QUERIES[name](spark, sf_dir).collect()
            t[name] = round(time.perf_counter() - t0, 4)
        run_timings.append(t)
    timings = {
        name: round(statistics.median(rt[name] for rt in run_timings), 4)
        for name in HEADLINE
    }
    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "value": total,
        "runs": [round(sum(t.values()), 4) for t in run_timings],
        "queries": timings,
        "calib_sec": calib,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
