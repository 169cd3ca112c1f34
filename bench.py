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
    "q10_returned_items",
    "q19_disjunctive_revenue",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "q12_late_shipments_priority",
    "q16_supplier_part_breadth",
    "q21_waiting_suppliers",
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
    "chunk_documents",
    "hash_split_documents",
    "vocab_topk_documents",
    "minhash_neardup_documents",
    "similarity_topk",
    "embedding_neardup",
    "asof_enrich_clicks",
]


def bench_skew(spark) -> dict:
    """Skewed-join evidence: 70% of a 1.2M-row fact lands on ONE key.

    Compares the plain shuffle join (hot partition serializes the
    downstream per-row work) against operators/skew.py:salted_join
    (hot key spread over n_salts reducers). The dim side is forced
    non-broadcastable (thresholds -1) to model a dim too big to
    broadcast; AQE's own skew split does NOT trigger here — the hot
    partition is far below its 256 MB byte threshold, which is exactly
    the gap the manual salt covers. Also reports the join-output
    partition balance (max/mean row ratio): ~20× for plain, ~1× salted
    — the structural cause of the wall-clock gap, independent of
    machine noise.
    """
    from pyspark.sql import functions as F

    from mydatalake_spark.operators.skew import salted_join

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    fact = li.select(
        F.explode(F.sequence(F.lit(1), F.lit(2))).alias("rep"),
        F.when(F.pmod("l_orderkey", 100) < 70, 0)
        .otherwise(F.pmod("l_orderkey", 100)).alias("k"),
        "l_quantity", "l_extendedprice",
    ).persist()
    fact.count()
    dim = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 1.5).alias("w")
    )
    heavy = F.length(
        F.regexp_replace(
            F.repeat(
                F.concat_ws(
                    "|",
                    (F.col("l_extendedprice") * F.col("w")).cast("string"),
                    F.col("l_quantity").cast("string"),
                ),
                8,
            ),
            r"[0-9]", "#",
        )
    )

    def join_of(mode):
        if mode == "salted":
            return salted_join(fact, dim, ["k"], n_salts=int(CPUS))
        return fact.join(dim, "k")

    def run(mode):
        start = time.perf_counter()
        join_of(mode).groupBy("k").agg(F.sum(heavy).alias("s")).write.format(
            "noop"
        ).mode("overwrite").save()
        return round(time.perf_counter() - start, 3)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    # Keep the true hash layout: AQE's BYTE-based coalescing would fold
    # these (narrow-row) partitions into one, hiding the skew that a
    # 100 TB partition (too big to coalesce) would expose. Compute-heavy
    # skew is invisible to byte sizing either way — the salt is the fix.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        out = {}
        for mode in ("plain", "salted"):
            run(mode)                      # warm (codegen/JIT)
            # min of two timed runs (host-steal noise, see above)
            out[f"{mode}_sec"] = min(run(mode), run(mode))
        for mode in ("plain", "salted"):
            dist = [
                r["count"]
                for r in join_of(mode)
                .select(F.spark_partition_id().alias("pid"))
                .groupBy("pid").count().collect()
            ]
            out[f"{mode}_max_over_mean"] = round(
                max(dist) / (sum(dist) / len(dist)), 2
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        fact.unpersist()
    return out


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

    # Two timed passes, keep the MIN per query: this box is a shared
    # microVM and host CPU steal produces multi-second phantom spikes
    # (observed: the same scan-agg at 0.4 s and 54 s minutes apart).
    # The min is the standard steady-state estimator under external
    # interference — it reflects the plan, not the neighbor.
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name in HEADLINE:
            fn = qs[name]
            start = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - start, 3)
            timings[name] = min(timings.get(name, dt), dt)

    skew = bench_skew(spark)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "skew": skew,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
