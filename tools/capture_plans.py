"""Dump .explain("formatted") for named queries to plans/<round>/<q>_<tag>.txt.

Usage: python tools/capture_plans.py <tag> <query> [<query> ...]
  tag: "before" or "after"
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
     SPARK_GRAFT_PLAN_ROUND (default r12).

Plans are captured on the UNEXECUTED DataFrame (AQE initial plan) plus a
summary line of shuffle/broadcast exchange counts from the final plan after
a noop-sink execution, so the files show both the static shape (join
strategy, PushedFilters, ReadSchema) and the executed reality.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etlutil_spark.plans.inspect import (  # noqa: E402
    broadcast_count,
    exchange_count,
    formatted_plan,
)
from etlutil_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    rnd = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r12")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    from etlutil_spark import queries as Q  # noqa: E402

    for name in names:
        spark.sparkContext.setJobDescription(f"plan-capture {name}")
        df = Q.QUERIES[name](spark, sf_dir)
        static = formatted_plan(df)
        # execute through the noop sink so the AQE final plan exists
        df.write.format("noop").mode("overwrite").save()
        final = formatted_plan(df)
        ex, bc = exchange_count(df), broadcast_count(df)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"== query: {name} ({tag}) sf_dir={sf_dir} ==\n")
            f.write(f"== summary: shuffle_exchanges={ex} broadcast_exchanges={bc} ==\n\n")
            f.write("== static (pre-execution) plan ==\n")
            f.write(static)
            f.write("\n\n== AQE final (post-execution) plan ==\n")
            f.write(final)
        print(f"wrote {path} (exchanges={ex}, broadcasts={bc})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
