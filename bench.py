"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line with per-query seconds.

Each query is fully materialized via a cheap count-style action
(df.write.format('noop') keeps the whole plan, no driver collection
cost skew). Timings include plan + execution, not session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Headline set: one per operator family (scan+agg, join, window dedup,
# merge, DQ, sessionize, text, similarity, near-dup).
HEADLINE = [
    "q1_pricing_summary",
    "q3_segment_revenue",
    "q5_nation_revenue",
    "q13_order_distribution",
    "q14_promo_revenue",
    "q18_large_orders",
    "q4_late_shipping_priority",
    "q7_volume_shipping",
    "q17_small_quantity_revenue",
    "q22_idle_customers",
    "cube_revenue",
    "window_functions_lineitem",
    "dedup_latest_lineitem",
    "merge_cdc_orders",
    "dq_checks_lineitem",
    "dq_aggregate_lineitem",
    "events_sessionize",
    "events_tumbling",
    "text_stats_documents",
    "exact_dedup_documents",
    "minhash_neardup_documents",
    "similarity_topk",
    "embedding_neardup",
    "asof_enrich_clicks",
]


def main() -> None:
    import __spark_entry__ as entry_mod
    from mydatalake_spark.session import get_spark

    spark = get_spark(
        app_name="mydatalake-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    # Steady-state measurement: one untimed warm pass over the whole
    # suite (JIT/codegen compilation, parquet footer + file-listing
    # caches), then the timed pass. Query latency, not JVM warm-up, is
    # the metric — cold-start costs are one-time per cluster, not
    # per-query, at the 100 TB design point.
    for name in HEADLINE:
        qs[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        start = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
