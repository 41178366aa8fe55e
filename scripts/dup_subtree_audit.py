"""Duplicate-subtree audit (r13): execute each query with the noop sink
and report FINAL-plan operator counts — parquet scans per table,
HashAggregate count, ReusedExchange/BroadcastExchange — to flag plans
that evaluate an expensive subtree more than once.

Run: python scripts/dup_subtree_audit.py [out.json] [name...]
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from sentiment_analysis_vector_search_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dup_audit.json"
    names = sys.argv[2:]
    spark = get_spark("dup-audit")
    queries = entrymod.queries()
    todo = names or list(queries)
    report = {}
    for name in todo:
        try:
            df = queries[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            final = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            report[name] = {"error": str(e)[:200]}
            continue
        scans = re.findall(r"file:[^\]\s,]*?/(\w+)\.parquet", final)
        per_table = {}
        for t in scans:
            per_table[t] = per_table.get(t, 0) + 1
        report[name] = {
            "scans": per_table,
            "HashAggregate": final.count("HashAggregate"),
            "ReusedExchange": final.count("ReusedExchange"),
            "BroadcastExchange": final.count("BroadcastExchange"),
            "SortMergeJoin": final.count("SortMergeJoin"),
        }
        dup = {t: c for t, c in per_table.items() if c > 1}
        if dup:
            print(f"{name}: DUP scans {dup} aggs={report[name]['HashAggregate']}", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
