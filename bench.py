"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the `noop` sink (full execution, no
driver-side collect). The headline set covers every suite: relational,
sentiment pipeline, text analysis, dedup, similarity, streaming.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q_top_customers_window",
    "q_events_window",
    "q_events_sessions",
    "sent_classify",
    "sent_trends",
    "sent_trend_risk",
    "tfidf_vectors",
    "top_words",
    "text_quality",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_bruteforce_topk",
    "ann_bruteforce_topk_arrow",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "rag_retrieve",
    "q_events_asof_attribution",
    "q10_returned_items",
    "q_revenue_rollup",
    "q17_small_quantity",
    "pipeline_curate_stats",
    "dedup_components",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as entrymod
    from sentiment_analysis_vector_search_spark.session import get_spark

    spark = get_spark("bench")
    queries = entrymod.queries()

    # Warm the JVM + parquet footers outside the timed region.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"  {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
