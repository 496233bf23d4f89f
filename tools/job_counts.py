"""Deterministic per-query cost profile: number of Spark jobs, stages,
tasks, and shuffle exchanges. Wall-clock on this box is steal-noisy;
these counts are stable and are what actually scale (guide §1/§2).

Usage: python tools/job_counts.py [query ...]   (default: bench HEADLINE)
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etlutil_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("job-counts")
    spark.sparkContext.setLogLevel("ERROR")
    from bench import HEADLINE  # noqa: E402
    from etlutil_spark import queries as Q  # noqa: E402
    from etlutil_spark.operators.util import store_root  # noqa: E402
    from etlutil_spark.plans.inspect import exchange_count  # noqa: E402

    names = sys.argv[1:] or list(HEADLINE)
    root = store_root(spark)
    for entry in sorted(os.listdir(root)) if os.path.isdir(root) else []:
        if entry.startswith("etlutil_spark_"):
            shutil.rmtree(os.path.join(root, entry), ignore_errors=True)

    Q.QUERIES["q1_pricing_summary"](spark, sf_dir).collect()  # warm stores/JIT
    tracker = spark.sparkContext.statusTracker()

    print(f"{'query':34s} {'jobs':>4s} {'stages':>6s} {'tasks':>6s} {'exch':>4s}")
    for name in names:
        Q.QUERIES[name](spark, sf_dir).collect()  # warm any ensure_* store
        group = f"jc-{name}"
        spark.sparkContext.setJobGroup(group, name)
        df = Q.QUERIES[name](spark, sf_dir)
        df.collect()
        spark.sparkContext.setJobGroup(f"jc-{name}-done", name)
        new_jobs = sorted(tracker.getJobIdsForGroup(group))
        n_stages = n_tasks = 0
        for jid in new_jobs:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numTasks > 0:
                    n_stages += 1
                    n_tasks += si.numTasks
        ex = exchange_count(df)
        print(f"{name:34s} {len(new_jobs):4d} {n_stages:6d} {n_tasks:6d} {ex:4d}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
