"""Split per-query wall into construction (Python+analysis) vs execution.

For each headline query: t_build = QUERIES[name](spark, sf_dir) call time
(catalog fn + any eager probe jobs inside it), t_run1/t_run2 = two collects.
Prints a sorted table. Run AFTER a warmup so JIT noise is amortized.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etlutil_spark.session import get_spark  # noqa: E402

NAMES = sys.argv[1:] or [
    "q1_pricing_summary", "q3_top_orders", "q5_region_revenue",
    "top_customers_per_segment", "events_monthly", "events_weekly_buckets",
    "events_backfill_chunks", "events_tumbling_hourly", "sessionize_users",
    "docs_token_stats", "dedup_exact", "dedup_minhash_lsh",
    "sim_topk_bruteforce", "knn_join_topk", "docs_contamination",
    "docs_pack_token_budget", "asof_purchase_attribution",
    "scd2_apply_incremental", "kmv_distinct_events",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-headline")
    spark.sparkContext.setLogLevel("ERROR")
    from etlutil_spark import queries as Q  # noqa: E402

    Q.QUERIES["q1_pricing_summary"](spark, sf_dir).collect()  # warmup

    rows = []
    for name in NAMES:
        spark.sparkContext.setJobDescription(f"profile {name}")
        t0 = time.perf_counter()
        df = Q.QUERIES[name](spark, sf_dir)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.collect()
        t_run1 = time.perf_counter() - t0
        # fresh build, then warm second run
        df2 = Q.QUERIES[name](spark, sf_dir)
        t0 = time.perf_counter()
        df2.collect()
        t_run2 = time.perf_counter() - t0
        rows.append((name, t_build, t_run1, t_run2))
        print(
            f"{name:32s} build={t_build:6.3f} run1={t_run1:6.3f} run2={t_run2:6.3f}",
            flush=True,
        )
    print("\nsorted by build+run2 (steady-state cost):")
    for name, b, r1, r2 in sorted(rows, key=lambda r: -(r[1] + r[3])):
        print(f"  {b + r2:7.3f}  (build {b:6.3f} + run {r2:6.3f})  {name}")
    spark.stop()


if __name__ == "__main__":
    main()
