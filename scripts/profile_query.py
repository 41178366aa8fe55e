"""Isolated per-query profiler for the optimization rounds (guide §1).

Runs the named queries in a fresh bench-identical session, times each
with the noop sink (warmup + N reps), labels jobs, and optionally dumps
``explain("formatted")`` to plans/<tag>/<name>_<suffix>.txt.

Run: python scripts/profile_query.py [--reps N] [--plans TAG:SUFFIX] name [name...]
     (e.g. --plans r13:before  ->  plans/r13/<query>_before.txt)
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from sentiment_analysis_vector_search_spark.plans import plan_str
from sentiment_analysis_vector_search_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--plans", default=None, help="TAG:SUFFIX -> plans/TAG/<q>_SUFFIX.txt")
    args = ap.parse_args()

    spark = get_spark("profile")
    queries = entrymod.queries()
    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").count()  # warm JVM

    out = {}
    for name in args.names:
        fn = queries[name]
        if args.plans:
            tag, suffix = args.plans.split(":")
            import os

            os.makedirs(f"plans/{tag}", exist_ok=True)
            with open(f"plans/{tag}/{name}_{suffix}.txt", "w") as f:
                f.write(plan_str(fn(spark, args.sf_dir)))
        if args.reps == 0:  # plan-dump-only mode
            out[name] = {}
            continue
        spark.sparkContext.setJobDescription(f"{name}: warmup")
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name}: rep {i}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"median": round(statistics.median(runs), 3), "runs": runs}
        print(f"{name}: median {out[name]['median']}s  runs {runs}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
