"""Plan-shape audit over every registered query (optimization round tooling).

For each query: build the DataFrame (no execution), capture the formatted
plan, and emit a JSON map with operator counts that matter at scale —
Exchange, Sort, joins by strategy, BatchEvalPython/ArrowEvalPython,
CartesianProduct, scans and their PushedFilters presence.

Run: python scripts/plan_audit.py [out.json] [only_prefix...]
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entrymod
from sentiment_analysis_vector_search_spark.plans import plan_str
from sentiment_analysis_vector_search_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"

NEEDLES = (
    "Exchange",
    "ReusedExchange",
    "Sort",
    "SortMergeJoin",
    "BroadcastHashJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "Window",
    "Generate",
    "Scan parquet",
    "ExistingRDD",
)


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_audit.json"
    prefixes = sys.argv[2:]
    spark = get_spark("plan-audit")
    queries = entrymod.queries()
    names = [
        n
        for n in queries
        if not prefixes or any(n.startswith(p) for p in prefixes)
    ]
    report = {}
    for name in names:
        try:
            df = queries[name](spark, SF_DIR)
            plan = plan_str(df)
        except Exception as e:  # noqa: BLE001
            report[name] = {"error": str(e)[:200]}
            print(f"{name}: ERROR {e}", file=sys.stderr)
            continue
        counts = {}
        for needle in NEEDLES:
            # count node headers only: lines like "* Sort (12)" / "+- Exchange ..."
            c = len(re.findall(rf"(?:\*\(\d+\) |\* |\+\- |:\- |^){re.escape(needle)}\b", plan, re.M))
            if c:
                counts[needle] = c
        counts["plan_chars"] = len(plan)
        report[name] = counts
        print(f"{name}: {counts}", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
