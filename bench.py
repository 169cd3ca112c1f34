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
FLOORS_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_history", "floors.json"
)
# Tag recorded as provenance when this run sets a new floor.
RUN_LABEL = os.environ.get("SPARK_GRAFT_RUN_LABEL", "unlabeled_run")


def _label_ok() -> bool:
    """True iff RUN_LABEL is archivable: a safe bare filename that is
    neither the unlabeled default nor the reserved floor-book name.
    Floor WRITES and archives share this gate (VERDICT r9 ask #2):
    every floors.json provenance entry must resolve to an on-disk
    bench_history/{label}.json, so a run that can't archive must not
    be allowed to set a floor either."""
    import re

    if RUN_LABEL == "unlabeled_run" or RUN_LABEL == "floors":
        return False
    return re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9._-]*", RUN_LABEL) is not None


# ---------------------------------------------------------------------
# Host-phase calibration (VERDICT r11 ask #1). This shared microVM
# drifts through multi-round "phases": byte-identical code measured
# 2.3-2.9x its r9-seeded floors in r11, and proving "host, not
# regression" required a manual git-worktree A/B. These four anchors
# make that adjudication automatic: each is a HEADLINE query whose
# implementation is pinned by source-hash in tests/test_bench_floors.py
# (edit one and the test forces an explicit re-seed), and whose
# reference seconds below are its r9_builder_run1 floor — the basis
# every pre-r12 floor in floors.json was seeded on. phase_factor =
# median(min-of-3 / reference) over the anchors; ~1.0 means the box is
# in the r9 phase, 3.0 means everything honest runs 3x its floor.
# The anchors span the cost axes: scan->agg->lag-window (pure compute,
# no write), scan->agg (codegen throughput), partition-window shuffle,
# and a real catalog write path (staging write + bloom-pruned merge).
CALIBRATION_REF = {
    "forecast_backtest_revenue": 0.179,
    "q1_pricing_summary": 0.483,
    "window_functions_lineitem": 0.187,
    "merge_bloom_orders": 0.497,
    # Shuffle-heavy axis (VERDICT r12 ask #4): the band-equi-join +
    # groupBy shape whose host sensitivity exceeded the four anchors
    # above (1.2s r9 -> 2.2s r11 -> 2.7s r12 on byte-identical code).
    # Its ref is its r9_builder_run1 floor — the same basis phase as
    # the rest — so the phase record now shows the shuffle axis
    # explicitly instead of leaving this family to manual
    # adjudication. Note it drifts ABOVE the anchor median in slow
    # phases; the median keeps it from dominating the factor.
    "incremental_neardup_documents": 1.196,
}
CALIBRATION_SF = 0.1  # the refs are sf0.1 floors; other SFs get None


def _phase_factor(timings: dict, sf_num) -> dict | None:
    """Host-phase estimate from the calibration anchors' timed
    min-of-3 (they ride the normal HEADLINE pass — zero extra bench
    cost). Returns {"factor": median ratio, "ratios": {q: [sec, ref,
    ratio]}} or None off the calibrated SF / missing anchors."""
    if sf_num != CALIBRATION_SF:
        return None
    ratios = {}
    for q, ref in CALIBRATION_REF.items():
        t = timings.get(q)
        if t is None:
            continue
        ratios[q] = [t, ref, round(t / ref, 2)]
    if len(ratios) < 3:
        return None  # not enough anchors to call a phase
    vals = sorted(v[2] for v in ratios.values())
    mid = len(vals) // 2
    med = (
        vals[mid]
        if len(vals) % 2
        else round((vals[mid - 1] + vals[mid]) / 2, 2)
    )
    return {"factor": med, "ratios": ratios}


def _floor_report(
    timings: dict, sf: float | str, phase: dict | None = None
) -> dict | None:
    """Compare this run to the persisted best-known-floor file and
    update it (VERDICT r7 ask #3): single-run suite totals on this
    shared box span ±15% on identical code, so round-over-round
    deltas compare FLOORS (min honest seconds ever observed, with
    provenance), not samples. A new floor rewrites floors.json; a
    query above its floor is reported with the ratio so BENCHNOTES
    can separate 'regression' from 'host variance above a still-
    standing floor'."""
    try:
        with open(FLOORS_PATH) as fh:
            book = json.load(fh)
        if book.get("sf") != sf:
            return None  # floors are sf-specific; smoke runs don't count
        return _floor_report_inner(book, timings, phase)
    except Exception as e:
        # a malformed floors file/entry must never cost the headline
        # JSON lines — but surface WHAT broke (the section() contract)
        # so "floors stopped updating" is diagnosable from the record,
        # not indistinguishable from an intentional smoke run (None).
        return {"error": f"{type(e).__name__}: {e}"[:300]}


def _floor_report_inner(
    book: dict, timings: dict, phase: dict | None = None
) -> dict:
    """Only LABELED runs may write floors (VERDICT r9 ask #2): an
    unlabeled run still gets the full comparison report (above-floor
    ratios, would-be new floors), but the book on disk is untouched —
    floors.json provenance must always point at an archived
    bench_history/{label}.json, and _archive_run skips unlabeled runs,
    so an unlabeled floor write would be evidence the archive chain
    can't back (the r9 clone_orders hole)."""
    persist = _label_ok()
    pf = phase["factor"] if phase and phase.get("factor") else None
    floors = book.setdefault("floors", {})
    new_floors: dict[str, list] = {}
    above: dict[str, list] = {}
    above_norm: dict[str, list] = {}
    for q, t in timings.items():
        cur = floors.get(q)
        if cur is None or t < cur["sec"]:
            prev = cur["sec"] if cur else None
            if persist:
                floors[q] = {"sec": round(t, 3), "run": RUN_LABEL}
            new_floors[q] = [round(t, 3), prev]
        elif t >= 1.3 * cur["sec"] and t - cur["sec"] >= 0.3:
            above[q] = [round(t, 3), cur["sec"], round(t / cur["sec"], 2)]
        if cur is not None and pf:
            # phase-normalized ratio: the floors were seeded on the
            # r9-phase box the calibration anchors are pinned to, so
            # t/pf estimates what THIS code would score in that phase
            # — a query above floor raw but at floor normalized is
            # host drift, not a plan regression. A fast phase
            # (pf < 1) never excuses anything: clamp to 1.
            tn = t / max(pf, 1.0)
            if tn >= 1.3 * cur["sec"] and tn - cur["sec"] >= 0.3:
                above_norm[q] = [
                    round(tn, 3), cur["sec"], round(tn / cur["sec"], 2)
                ]
    if persist:
        try:
            with open(FLOORS_PATH, "w") as fh:
                json.dump(book, fh, indent=1)
                fh.write("\n")
        except OSError:
            pass
    total_floor = round(
        sum(floors[q]["sec"] for q in timings if q in floors), 3
    )
    out = {
        "suite_floor_sec": total_floor,
        "n_new_floors": len(new_floors),
        "new_floors": new_floors,
        "above_floor_1p3x": above,
        "floors_persisted": persist,
    }
    if pf:
        out["phase_factor"] = pf
        out["above_floor_1p3x_norm"] = above_norm
    return out

# Driver stdout tail capture is 2000 chars; the compact line must fit
# with margin even after a trailing newline and any stray prefix bytes.
COMPACT_BUDGET_BYTES = 1800


def build_compact_record(
    total: float,
    timings: dict,
    floors: dict | None,
    skew,
    family_tax,
    sf_num,
    archived: str | None = None,
) -> str:
    """Build the driver-facing compact JSON line under a hard byte
    budget (VERDICT r8 ask #1: BENCH_r08.json parsed=null because this
    line outgrew the driver's 2000-char capture).

    Core fields (headline seconds, floor summary counts) always ride;
    optional evidence sections are added most-valuable-first and the
    record degrades by dropping them least-valuable-first until it
    fits. The full record self-archives to bench_history/, so nothing
    is lost — this line only has to be parseable and comparable."""
    floors_ok = isinstance(floors, dict) and "error" not in floors
    rec = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "sf": sf_num,
        "compact": True,
    }
    if archived:
        # pointer to the self-archived FULL record (per-query seconds,
        # phase ratios, every evidence section) — the compact line
        # cannot carry 159 per-query entries inside the driver's
        # 2000-char tail capture, so it names where they live instead
        # (r15, VERDICT r14 ask #2). Repo-relative.
        rec["archived"] = archived
    if floors_ok:
        rec["floors"] = {
            "suite_floor_sec": floors["suite_floor_sec"],
            "n_new_floors": floors["n_new_floors"],
            "n_above_floor": len(floors["above_floor_1p3x"]),
        }
        if "phase_factor" in floors:
            # host-phase calibration (VERDICT r11 ask #1): raw count
            # above, phase-normalized count here — "above-floor
            # explained by phase X.Xx" is readable from this record
            rec["phase_factor"] = floors["phase_factor"]
            rec["floors"]["n_above_floor_norm"] = len(
                floors["above_floor_1p3x_norm"]
            )
    elif floors is not None:
        rec["floors"] = floors  # surface the error string
    # Optional sections, least-valuable LAST (dropped first on overrun).
    optional: list[tuple[str, object]] = []
    if floors_ok and floors["above_floor_1p3x"]:
        optional.append(
            (
                "above_floor_top3",
                dict(
                    sorted(
                        floors["above_floor_1p3x"].items(),
                        key=lambda kv: -kv[1][2],
                    )[:3]
                ),
            )
        )
    if isinstance(family_tax, dict):
        # ratios only — the native/portable absolute seconds live in
        # the archived full record
        tax = {
            k: v.get("portable_tax")
            for k, v in family_tax.items()
            if isinstance(v, dict) and "portable_tax" in v
        }
        if tax:
            optional.append(("hash_tax_ratio", tax))
    if isinstance(skew, dict) and "salted_max_over_mean" in skew:
        optional.append(
            (
                "skew_max_over_mean",
                [
                    skew.get("plain_max_over_mean"),
                    skew.get("salted_max_over_mean"),
                ],
            )
        )
    optional.append(
        (
            "slowest3",
            dict(sorted(timings.items(), key=lambda kv: -kv[1])[:3]),
        )
    )
    for key, val in optional:
        rec[key] = val
    line = json.dumps(rec)
    while len(line.encode()) > COMPACT_BUDGET_BYTES and optional:
        drop_key, _ = optional.pop()
        del rec[drop_key]
        line = json.dumps(rec)
    return line


def _archive_run(line: str) -> str | None:
    """Labeled runs self-archive (the bench protocol's manual
    copy-to-bench_history step, automated): full record under the run
    label, so floors provenance always points at an on-disk file.
    Label must be a safe bare filename and must not collide with the
    floor book (SPARK_GRAFT_RUN_LABEL=floors would clobber it with a
    wrong-shaped record and silently wipe all floor provenance).

    Archives are immutable evidence — floors.json provenance entries
    point at them by label, so re-running with a used label appends a
    numeric suffix instead of clobbering the original (ADVICE r8).
    Returns the path written, or None if unlabeled/unwritable."""
    if not _label_ok():
        return None
    try:
        base = os.path.join(os.path.dirname(FLOORS_PATH), RUN_LABEL)
        path = f"{base}.json"
        n = 2
        while os.path.exists(path):
            path = f"{base}.{n}.json"
            n += 1
        with open(path, "x") as fh:
            fh.write(line + "\n")
        return path
    except OSError:
        return None


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
    "events_windows",
    "text_stats_documents",
    "exact_dedup_documents",
    "chunk_documents",
    "hash_split_documents",
    "vocab_topk_documents",
    "minhash_neardup_documents",
    "similarity_topk",
    "embedding_neardup_lsh",
    "merge_into_orders",
    "ctas_part_orders",
    "scalar_functions_all",
    "asof_enrich_clicks",
    "winnow_pairs_documents",
    "decontaminate_documents",
    "repetition_stats_documents",
    "incremental_neardup_documents",
    "bm25_documents",
    "funnel_events",
    "neardup_clusters_documents",
    "quality_filter_documents",
    "heavy_hitters_tokens",
    "paragraph_dedup_documents",
    "semantic_dedup_embeddings",
    "pagerank_trade_graph",
    "histogram_events_value",
    "scd2_customer_status",
    "cdc_ops_apply_orders",
    "profile_lineitem",
    "interval_join_events",
    "weighted_sample_documents",
    "consistent_sample_join",
    "curation_pipeline_documents",
    "perplexity_documents",
    "triangle_count_parts",
    "gapfill_nation_revenue",
    "fuzzy_pairs_documents",
    "hll_shards_customers",
    "ab_test_events",
    "mannwhitney_events",
    "bfs_hops_trade",
    "minhash_calibration_documents",
    "quantized_recall_embeddings",
    "hard_negatives_embeddings",
    "centroid_accuracy_embeddings",
    "split_leakage_documents",
    "pareto_revenue_customers",
    "burst_users_events",
    "forecast_backtest_revenue",
    "cusum_changepoint_revenue",
    "mad_anomaly_days",
    "segment_overlap_users",
    "item_cosine_recs_parts",
    "bpe_merge_candidates_documents",
    "dp_counts_events",
    "ndcg_quantized_embeddings",
    "wor_sample_documents",
    "drift_by_segment_events",
    "langid_confusion_documents",
    "cycle_time_priority",
    "open_orders_daily",
    "bpe_two_rounds_documents",
    "canonical_by_quality_documents",
    "pixel_stats_documents",
    "cuped_events",
    "emd_events",
    "scorecard_events",
    "drift_report_events",
    "tfidf_keywords_documents",
    "mutual_info_orders",
    "psi_events",
    "trimmed_means_events",
    "duplicate_spans_documents",
    "ks_test_events",
    "chi2_priority_status",
    "theil_sen_users",
    "event_transitions",
    "top_paths_events",
    "snapshot_diff_orders",
    "dq_fk_orders",
    "multimodal_real_decode",
    "pit_join_orders",
    "attribution_events",
    "twap_events",
    "bootstrap_ci_events",
    "rolling_distinct_users",
    "zipf_alpha_documents",
    "gini_revenue_customers",
    "dedup_summary_documents",
    "audio_real_decode",
    "video_real_decode",
    "growth_rollups",
    "copy_into_orders",
    "generated_cols_orders",
    "temperature_mix_documents",
    "copurchase_lift_parts",
    "rfm_segments_customers",
    "ewma_daily_revenue",
    "event_entropy_users",
    "zscore_anomalies_events",
    "corr_matrix_lineitem",
    "mode_returnflag_by_priority",
    "key_skew_profile_lineitem",
    "source_overlap_documents",
    # r6 additions: layout/maintenance + retrieval operators, and the
    # three depth queries (multi-key sketch view, stateful-session
    # batch twin, WAP gate) — the last three write real catalog tables
    # per run, so their numbers include the staged-swap I/O they'd pay
    # in production.
    "zonemap_pruning_lineitem",
    "pq_recall_embeddings",
    "compaction_plan_lineitem",
    "join_size_estimate_orders",
    "bloom_prune_lineitem",
    "bloom_join_lineitem",
    "merge_bloom_orders",
    "merge_part_bloom_orders",
    "merge_equi_lineitem",
    "time_travel_orders",
    "restore_orders",
    "merge_part2_orders",
    "table_changes_orders",
    "cdf_commits_orders",
    "cdf_part_orders",
    "cdf_timestamp_orders",
    "cdf_sync_view_orders",
    "fastss_pairs_part",
    "fastss_d2_part",
    "pack_greedy_documents",
    "fuzzy_entity_clusters_part",
    "dml_orders",
    "clone_orders",
    "medallion_job_orders",
    "langid_kappa_documents",
    "boilerplate_strip_documents",
    "rrf_hybrid_documents",
    "rolling_distinct_by_type",
    "closed_sessions_events",
    "wap_quarantine_events",
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


# 16-check suite over lineitem covering all 7 check operators — the
# measurement behind the engine's signature claim (quality/checks.py:
# one scan vs the reference's per-test passes, reference
# lib/checker.py:296-308).
_DQ16 = (
    [{"column": c, "test_type": "missing"}
     for c in ("l_returnflag", "l_linestatus", "l_quantity",
               "l_extendedprice")]
    + [{"column": c, "test_type": "duplicated"}
       for c in ("l_orderkey", "l_partkey")]
    + [{"column": c, "test_type": "outside_of_rules",
        "kwargs": {"expression": e}}
       for c, e in (("l_discount", "l_discount <= 0.05"),
                    ("l_tax", "l_tax <= 0.08"),
                    ("l_quantity", "l_quantity <= 50"),
                    ("l_extendedprice", "l_extendedprice > 0"))]
    + [{"column": "l_shipdate", "test_type": "outdated",
        "test_name": f"outdated_{t}",
        "kwargs": {"threshold": t, "as_of": "1998-12-01"}}
       for t in (365, 730)]
    + [{"column": "l_returnflag", "test_type": "not_in_list",
        "kwargs": {"expected_values": ["A", "N", "R"]}},
       {"column": "l_linestatus", "test_type": "not_in_list",
        "kwargs": {"expected_values": ["O", "F"]}},
       {"column": "l_returnflag", "test_type": "pattern_mismatch",
        "kwargs": {"pattern": "^[A-Z]$"}},
       {"column": "l_quantity", "test_type": "type_mismatch",
        "kwargs": {"expected_type": "double"}}]
)


def bench_dq_pass_modes(spark) -> dict:
    """Single-pass check compilation vs the reference's n-pass shape.

    single_pass: quality/checks.py:annotate — all 16 predicates in one
    projection, one array<struct> explode, ONE scan of lineitem.
    n_pass: the reference architecture (lib/checker.py:296-308 +
    checker_handler.py:101-113) — one long-format frame per test,
    unionByName fold, so the plan scans lineitem 16 times.
    Identical output rows (sanity-checked once).

    Reported evidence is BOTH wall time and the physical plan's scan
    count. Locally the 16 redundant scans are nearly free (a 76 MB
    page-cache-resident file) while the single-pass chains its two
    window sorts sequentially where n_pass runs branches in parallel —
    so wall times are close at this size. The structural claim is the
    scan count: at 100 TB the table does not fit in cache and each
    extra scan is a full storage pass, which is why the engine
    compiles checks single-pass.
    """
    from functools import reduce

    from pyspark.sql import functions as F

    from mydatalake_spark.quality.checks import (
        annotate, build_check, composite_key,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    keys = ["l_orderkey", "l_linenumber"]

    def single_pass():
        return annotate(li, _DQ16, keys)

    def n_pass():
        keyed = li.withColumn("df_key", composite_key(keys))
        frames = []
        for spec in _DQ16:
            failed = build_check(
                spec["test_type"], spec["column"],
                **(spec.get("kwargs") or {}),
            )
            frames.append(keyed.select(
                "df_key",
                F.lit(spec["test_type"]).alias("test_type"),
                F.lit(spec["column"]).alias("column"),
                F.when(failed, F.lit("failed"))
                .otherwise(F.lit("passed")).alias("check_result"),
            ))
        return reduce(lambda a, b: a.unionByName(b), frames)

    # same row count from both shapes (cheap sanity, not timed)
    assert single_pass().count() == n_pass().count()

    def n_scans(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Scan parquet")

    out = {}
    for mode, fn in (("single_pass", single_pass), ("n_pass", n_pass)):
        def run():
            start = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - start, 3)

        run()                                  # warm
        out[f"{mode}_sec"] = min(run(), run())
        out[f"{mode}_scans"] = n_scans(fn())
    out["n_pass_over_single"] = round(
        out["n_pass_sec"] / out["single_pass_sec"], 2
    )
    return out


# Near-dup/ANN sub-quadratic evidence: candidate generation is banded
# (LSH bands / winnowing fingerprints / shingle equi-joins), so cost
# must grow far slower than the all-pairs bound (rows_ratio²).
SCALING_QUERIES = [
    "minhash_neardup_documents",
    "winnow_pairs_documents",
    "embedding_neardup_lsh",
    "similarity_topk",
    # r3 review asks: the two heavy non-banded operators need measured
    # (not argued) scale curves too — the iterative CC fixpoint and the
    # three-stage funnel.
    "neardup_clusters_documents",
    "funnel_events",
    # r4 additions: the wedge join (degree-ordered orientation) and the
    # block→verify fuzzy pipeline — both must track candidate growth,
    # not the pair bound.
    "triangle_count_parts",
    "fuzzy_pairs_documents",
    # r5 additions: the bounded-depth frontier BFS (cost tracks frontier
    # growth, not |V|²) and the bounded-group pairwise-slope join (cost
    # is Σn² over per-entity series, not corpus²).
    "bfs_hops_trade",
    "theil_sen_users",
    "duplicate_spans_documents",
    "split_leakage_documents",
    "item_cosine_recs_parts",
    # r6 additions: the corpus-frequency strip (df-table join + text
    # reassembly) and the PQ pipeline (train/encode/ADC/rerank with
    # the in-plan recall harness) — both must track corpus growth,
    # not the pair/cross bound.
    "boilerplate_strip_documents",
    "pq_recall_embeddings",
    # r7 additions: the composed bloom build→prune→join path — cost must
    # track the probe side linearly (filter build is build-side-sized,
    # the prune is map-only, the join shuffles only survivors) — and
    # the bloom-accelerated merge, whose cost must track the TARGET
    # linearly (the join shuffles only the ~1% bloom-hit slice; the
    # miss branch is a map-only bypass).
    "bloom_join_lineitem",
    "merge_bloom_orders",
    # r8 addition: the fully composed CDC path (partition pruning +
    # bloom row pruning through a real warehouse write) — cost must
    # track the TOUCHED SLICE plus the changeset, not the table; at
    # 10× the table with the same 1/97 changeset density the curve
    # must stay far under the quadratic bound like its parents.
    "merge_part_bloom_orders",
    # r9 additions: the deletion-neighborhood similarity join (cost
    # must track Σ df_l·df_r over variant buckets — the candidate
    # estimate the operator itself refuses on — never |L|·|R|), the
    # CDF diff (one full-outer join: change-sized output, table-sized
    # shuffle, nothing quadratic), and the entity-resolution capstone
    # (FastSS pairs + CC fixpoint — cost tracks pairs + iterations,
    # not nodes²).
    "fastss_pairs_part",
    "fastss_d2_part",
    "table_changes_orders",
    "fuzzy_entity_clusters_part",
    # r10 addition: row-level DML (copy-on-write DELETE+UPDATE through
    # a real partitioned warehouse) — cost must track the TOUCHED
    # LEAVES plus the probe scan linearly, never the table²; the
    # bounded groupBy probe and the partition-pruned rewrite are the
    # properties under measurement.
    "dml_orders",
]
SCALING_SMALL = "/root/testdata/sf0.01"


def bench_scaling(spark, qs) -> dict:
    """Two-point scaling curve: each pair-generating query timed at
    sf0.01 and at SF_DIR (sf0.1 per-round ⇒ 10× the corpus). An
    all-pairs implementation would scale ~rows_ratio² (100×); the
    banded paths should stay near-linear. time_ratio ≪ quadratic_bound
    is the pass signal the judge asked to see measured.
    """
    small_docs = spark.read.parquet(
        f"{SCALING_SMALL}/documents.parquet").count()
    big_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    small_emb = spark.read.parquet(
        f"{SCALING_SMALL}/embeddings.parquet").count()
    big_emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    small_ev = spark.read.parquet(
        f"{SCALING_SMALL}/events.parquet").count()
    big_ev = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    small_li = spark.read.parquet(
        f"{SCALING_SMALL}/lineitem.parquet").count()
    big_li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    out: dict = {"rows": {
        "documents": {"small": small_docs, "big": big_docs},
        "embeddings": {"small": small_emb, "big": big_emb},
        "events": {"small": small_ev, "big": big_ev},
        "lineitem": {"small": small_li, "big": big_li},
    }}
    for name in SCALING_QUERIES:
        if name.startswith(("embedding", "similarity")) or name.endswith(
            "_embeddings"
        ):
            rows_ratio = big_emb / small_emb
        elif "events" in name or name == "theil_sen_users":
            rows_ratio = big_ev / small_ev
        elif (
            "parts" in name or "trade" in name or "lineitem" in name
            or name.endswith("_orders")
        ):
            # all TPC-H-ish tables share the scale factor, so the
            # lineitem ratio IS the orders/part ratio
            rows_ratio = big_li / small_li
        else:
            rows_ratio = big_docs / small_docs
        iters: dict[str, int] = {}
        times = {}
        for tag, sf_dir in (("small", SCALING_SMALL), ("big", SF_DIR)):
            def run():
                start = time.perf_counter()
                res = qs[name](spark, sf_dir)
                res.write.format("noop").mode("overwrite").save()
                it = getattr(res, "_cc_iterations", None)
                if it is not None:
                    iters[tag] = it
                from mydatalake_spark.caching import release
                release(res)
                return round(time.perf_counter() - start, 3)

            run()                              # warm
            # one timed run: the quadratic-vs-linear signal (10× vs
            # 100×) is far above host noise; keep bench wall-time down
            times[tag] = run()
        out[name] = {
            "small_sec": times["small"],
            "big_sec": times["big"],
            "rows_ratio": round(rows_ratio, 1),
            "time_ratio": round(times["big"] / max(times["small"], 1e-3), 2),
            "quadratic_bound": round(rows_ratio ** 2, 1),
        }
        if iters:
            # fixpoint rounds at both sizes: the iterative operator's
            # cost model is rounds × per-round shuffle, so a flat round
            # count IS the sub-quadratic argument
            out[name]["cc_iterations"] = iters
    return out


def bench_dedup_summary_fed(spark) -> dict:
    """dedup_summary's two paths at SF_DIR: recompute (exact shingle
    self-join — the oracle-checked path) vs fed (persisted minhash
    signature table → band candidates → exact verify). The fed path
    is the production cadence: the dashboard reads silver-layer state
    instead of re-shingling the corpus, so its cost scales with
    signatures + candidates, not the shingle join."""
    import shutil
    import tempfile

    from mydatalake_spark.caching import release
    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.operators.neardup import (
        dedup_summary,
        incremental_dedup_pipeline,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    wh = tempfile.mkdtemp(prefix="bench_dsum_")
    try:
        cat = Catalog(spark, wh)
        t0 = time.perf_counter()
        pairs = incremental_dedup_pipeline(
            cat, "silver.dedup.sigs", docs, verify_threshold=0.2
        )
        release(pairs)
        build_sec = round(time.perf_counter() - t0, 3)

        out = {}
        for tag, kw in (
            ("recompute", {}),
            ("fed", {"catalog": cat, "sig_table": "silver.dedup.sigs"}),
        ):
            def run():
                start = time.perf_counter()
                res = dedup_summary(docs, jaccard_threshold=0.2, **kw)
                res.write.format("noop").mode("overwrite").save()
                release(res)
                return round(time.perf_counter() - start, 3)

            run()                              # warm
            out[f"{tag}_sec"] = min(run(), run())
        out["sig_build_sec"] = build_sec
        return out
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def bench_lsh_planned(spark) -> dict:
    """lsh_plan asymptotics, MEASURED: the embedding-cosine LSH path
    with auto-planned (bands, bits) — bits ∝ log2(n) pins bucket size
    so candidate growth stays ~linear — timed at both corpus sizes
    with recall measured against the exact BLAS pair set at the same
    size. This is the answer to the fixed-parameter scaling point in
    the registry query (32×3 is pinned there for the recall-1.0
    oracle): at scale you run the PLANNED parameters, and this section
    shows what they cost and what recall they buy.
    """
    from mydatalake_spark.caching import release
    from mydatalake_spark.operators.neardup import cosine_neardup_pairs

    out: dict = {}
    for tag, sf_dir in (("small", SCALING_SMALL), ("big", SF_DIR)):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

        def run():
            start = time.perf_counter()
            res = cosine_neardup_pairs(
                emb, threshold=0.45, exact=False, dim=64,
                auto_plan=True, auto_recall=0.95,
            )
            res.write.format("noop").mode("overwrite").save()
            release(res)
            return round(time.perf_counter() - start, 3)

        run()                                  # warm
        out[f"{tag}_sec"] = run()
        planned = cosine_neardup_pairs(
            emb, threshold=0.45, exact=False, dim=64,
            auto_plan=True, auto_recall=0.95,
        )
        got = {(r.id_a, r.id_b) for r in planned.collect()}
        release(planned)
        exact = cosine_neardup_pairs(emb, threshold=0.45, exact=True)
        truth = {(r.id_a, r.id_b) for r in exact.collect()}
        release(exact)
        out[f"{tag}_recall"] = (
            round(len(got & truth) / len(truth), 4) if truth else 1.0
        )
        out[f"{tag}_true_pairs"] = len(truth)
    out["time_ratio"] = round(
        out["big_sec"] / max(out["small_sec"], 1e-3), 2
    )
    return out


def bench_hash_family_tax(spark) -> dict:
    """Portable-vs-native hash-family cost, measured per round
    (VERDICT r7 ask #7): the registry replays md5/string keys so the
    DuckDB oracle can hash-check results bit-for-bit; production runs
    the xxhash64 codegen family. This section prices that
    checkability per affected operator — min-of-2 seconds per family
    at SF_DIR, plus the portable/native ratio — so "paid for hash
    replay" is a recorded number, not a recurring explanation.
    Defaults are unchanged (portable where the oracle needs it)."""
    from mydatalake_spark.caching import release, release_all
    from mydatalake_spark.operators.bloomjoin import bloom_build, bloom_prune
    from mydatalake_spark.operators.neardup import (
        minhash_signatures,
        ngram_jaccard_pairs,
        portable_minhash_signatures,
        winnow_fingerprints,
        winnow_pairs,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    from mydatalake_spark.operators.bloomjoin import bloom_mask_array

    # bloom_mask_array densifies to exactly m_bits/32 words (zero-mask
    # words included) — building the list from the sparse (word_idx,
    # mask) rows directly would shift word indexes and corrupt the
    # probe's re-derived modulus (false negatives).
    blooms = {
        fam: bloom_mask_array(
            bloom_build(urgent, "o_orderkey", m_bits=1 << 20, family=fam),
            m_bits=1 << 20,
        )
        for fam in ("native", "portable")
    }

    cases = {
        "minhash_sig16": {
            "native": lambda: minhash_signatures(
                docs, num_hashes=16, shingle_n=3
            ),
            "portable": lambda: portable_minhash_signatures(
                docs, num_hashes=16, shingle_n=3
            ),
        },
        "winnow_fingerprints": {
            fam: (
                lambda fam=fam: docs.select(
                    F.explode(
                        winnow_fingerprints("text", family=fam)
                    ).alias("fp")
                )
            )
            for fam in ("native", "portable")
        },
        "winnow_pairs": {
            fam: (lambda fam=fam: winnow_pairs(docs, family=fam))
            for fam in ("native", "portable")
        },
        "ngram_jaccard_pairs": {
            fam: (
                lambda fam=fam: ngram_jaccard_pairs(
                    docs, n=3, threshold=0.5, family=fam
                )
            )
            for fam in ("native", "portable")
        },
        "bloom_prune": {
            fam: (
                lambda fam=fam: bloom_prune(
                    li.select("l_orderkey"),
                    "l_orderkey",
                    blooms[fam],
                    family=fam,
                )
            )
            for fam in ("native", "portable")
        },
    }

    out: dict = {}
    for op, fams in cases.items():
        row: dict = {}
        for fam, mk in fams.items():
            best = None
            for _rep in range(3):  # rep 0 warms, keep min of the rest
                start = time.perf_counter()
                res = mk()
                res.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - start
                release(res)
                release_all()
                if _rep > 0:
                    best = dt if best is None else min(best, dt)
            row[fam] = round(best, 3)
        row["portable_tax"] = round(
            row["portable"] / max(row["native"], 1e-3), 2
        )
        out[op] = row
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
    from mydatalake_spark.caching import release as _release
    from mydatalake_spark.caching import release_all as _release_all

    for name in HEADLINE:
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        _release(df)
        # backstop: queries that derive frames from cache-adopting
        # operators may orphan the ownership attribute; the ledger
        # catches whatever release(df) missed
        _release_all()

    # Three timed passes, keep the MIN per query: this box is a shared
    # microVM and host CPU steal produces multi-second phantom spikes
    # (observed: the same scan-agg at 0.4 s and 54 s minutes apart).
    # The min is the standard steady-state estimator under external
    # interference — it reflects the plan, not the neighbor. min-of-3
    # (vs r2's min-of-2) after r2's q1 +44% wall-time delta turned out
    # to be exactly this noise.
    #
    # The 3 samples run BACK-TO-BACK per query (r6 change), not as 3
    # interleaved suite passes: interleaving made every sample of a
    # heavy query "first run after 124 other queries", so the min
    # captured suite-position state (lingering async cleanup, JIT
    # deopt after foreign codegen), not the plan. Measured on
    # pagerank: interleaved min ~7.0 s vs back-to-back min ~3.7 s,
    # with codegen-cache sizing (5000 entries) and forced full GC
    # both falsified as explanations (BENCHNOTES_r6.md); no state
    # carries between runs (each run rebuilds and releases its own
    # caches), so back-to-back min IS the per-query steady-state the
    # metric claims.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        for _rep in range(3):
            start = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - start, 3)
            timings[name] = min(timings.get(name, dt), dt)
            _release(df)
            _release_all()

    # Optional evidence sections must never cost us the headline JSON
    # line: a failure records an error string instead of aborting.
    def section(fn, *args):
        try:
            return fn(spark, *args)
        except Exception as e:          # pragma: no cover - defensive
            return {"error": f"{type(e).__name__}: {e}"[:300]}

    skew = section(bench_skew)
    dq_modes = section(bench_dq_pass_modes)
    scaling = section(bench_scaling, qs)
    lsh_planned = section(bench_lsh_planned)
    dedup_fed = section(bench_dedup_summary_fed)
    family_tax = section(bench_hash_family_tax)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_num = float(sf) if sf.replace(".", "").isdigit() else sf
    phase = _phase_factor(timings, sf_num)
    floors = _floor_report(timings, sf_num, phase)
    line = json.dumps(
        {
            "metric": "headline_suite_seconds",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "phase": phase,
            "floors": floors,
            "skew": skew,
            "dq_pass_modes": dq_modes,
            "scaling": scaling,
            "lsh_planned": lsh_planned,
            "dedup_summary_fed": dedup_fed,
            "hash_family_tax": family_tax,
            "sf": sf_num,
        }
    )
    # BENCH_r03.json had "parsed": null — Spark's \r console-progress
    # spam overwrote the start of the JSON line in the driver's tail
    # capture. The progress bar is now off in session defaults
    # (spark.ui.showConsoleProgress=false); belt-and-braces here:
    # flush stderr first, start the line at column 0 on a fresh line,
    # and flush stdout so the capture sees a complete line.
    sys.stderr.flush()
    sys.stdout.write("\n" + line + "\n")
    sys.stdout.flush()
    # The full line above has grown past the driver's tail-capture
    # buffer (BENCH_r04 clipped its head → "parsed": null). Emit a
    # SECOND, compact record LAST, so the capture always ends with a
    # complete parseable JSON line even when the full record is
    # truncated. BENCH_r08 clipped AGAIN (the floors section pushed
    # the compact line past the driver's 2000-char tail window), so
    # the compact record now has a HARD byte budget with a degrade
    # order: full per-query detail lives only in the self-archived
    # bench_history/{RUN_LABEL}.json — archived BEFORE the compact
    # line prints so the line can carry the archive path (r15,
    # VERDICT r14 ask #2: the adjudicator could not trace per-query
    # seconds from the captured tail to their on-disk record).
    archived = _archive_run(line)
    if archived:
        repo_root = os.path.dirname(os.path.abspath(__file__))
        archived = os.path.relpath(archived, repo_root)
    compact = build_compact_record(
        total, timings, floors, skew, family_tax, sf_num, archived
    )
    sys.stdout.write(compact + "\n")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
