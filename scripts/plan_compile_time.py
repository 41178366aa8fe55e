"""Measure per-query DRIVER-side cost split: DataFrame construction
(Python + any build-time jobs), then analysis+optimization+physical
planning (executedPlan force), vs total noop execution.

Each bench rep pays construction + planning again (fn builds a fresh
DataFrame), so a query whose planning dominates is optimized by
shrinking its plan, not its data path.

Run: python scripts/plan_compile_time.py name [name...]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from sentiment_analysis_vector_search_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    names = sys.argv[1:]
    spark = get_spark("plan-compile")
    queries = entrymod.queries()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    out = {}
    for name in names:
        fn = queries[name]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
        cons, plan, total = [], [], []
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            cons.append(t1 - t0)
            plan.append(t2 - t1)
            total.append(t3 - t0)
        out[name] = {
            "construct": round(statistics.median(cons), 3),
            "plan": round(statistics.median(plan), 3),
            "exec": round(statistics.median(total) - statistics.median(cons) - statistics.median(plan), 3),
            "total": round(statistics.median(total), 3),
        }
        print(f"{name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
