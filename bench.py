"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: median_sec}, "spread": {name: max-min}, "sf": ...}.

Each query is forced end-to-end with the `noop` sink (full execution, no
driver-side collect) and timed SPARK_GRAFT_BENCH_REPS times (default 3);
the reported number is the per-query MEDIAN after one untimed warmup
execution — single-shot timings in a shared JVM swung 2-4x round-over-round
with zero code change (r3: q10_returned_items 3.1x), and a query's first
execution pays codegen compilation + shuffle-file setup that a sustained
workload never sees. The spread (max-min) flags queries whose median is
still noisy. The headline set
covers every suite: relational, sentiment pipeline, text analysis, dedup,
similarity, streaming.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

# Every suite is represented so regressions anywhere are visible
# round-over-round; only representatives_kmeans (iterative MLlib, memoized
# — a repeat-timing would measure the cache) sits out.
HEADLINE = [
    # relational
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q_top_customers_window",
    "q_market_share",
    "q_events_window",
    "q_events_sessions",
    "q_events_json",
    "q7_nation_trade",
    "q13_order_count_dist",
    # relational_ext
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_effect",
    "q18_large_orders",
    "q19_disjunctive_filter",
    "q22_dormant_customers",
    "q_revenue_rollup",
    "q16_supplier_breadth",
    "q_running_revenue",
    "q4_priority_exists",
    "q17_small_quantity",
    "q_sql_text_api",
    "q_revenue_moving_avg",
    # analytics_ext
    "q_events_asof_attribution",
    "q_value_percentiles",
    "emb_label_centroids",
    "q_events_funnel",
    "q_events_retention",
    "pipeline_curate_stats",
    "q_events_gapfill",
    "q_events_anomaly",
    "q_user_overlap",
    "q_order_deciles",
    "q_events_seasonality",
    "q_nation_segment_pivot",
    "q_churned_buyers",
    # sentiment pipeline
    "sent_classify",
    "sent_distribution",
    "sent_trends",
    "sent_trend_risk",
    "recommendation_prompts",
    # text analysis
    "tfidf_vectors",
    "top_words",
    "text_quality",
    "text_lang_id",
    "doc_top_keywords",
    # pipeline gates
    "text_pii_redact",
    "text_quality_gate",
    "sample_stratified",
    "docs_source_profile",
    "text_gopher_quality",
    "decontaminate_ngrams",
    "domain_mix_plan",
    # dedup
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    # dedup_embedding is not listed standalone: dedup_components
    # materializes the identical LSH candidate subplan as its input, so its
    # cost is already measured there once.
    "dedup_components",
    # similarity
    "ann_bruteforce_topk",
    "ann_bruteforce_topk_arrow",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "rag_retrieve",
    # multimodal plumbing
    "mm_decode_stub",
    "mm_frame_sample",
    # streaming (availableNow drain)
    "stream_windowed_counts",
    "stream_sessionize",
    "stream_stateful_user_stats",
    "stream_dedup_exact",
    "stream_interval_join",
    "stream_quality_gate",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as entrymod
    from sentiment_analysis_vector_search_spark.session import get_spark

    spark = get_spark("bench")
    queries = entrymod.queries()

    # Warm the JVM + parquet footers outside the timed region.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)
        spread[name] = round(max(runs) - min(runs), 3)
        print(f"  {name}: {timings[name]}s (spread {spread[name]}s)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
