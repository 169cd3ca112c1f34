"""Stats-driven planning (planning.py): fresh ANALYZE output feeds
bloom sizing and broadcast choices without probe jobs; stale stats
always fall back to the probe — never silently used."""

import pytest
from pyspark.sql import functions as F

from mydatalake_spark.catalog import Catalog
from mydatalake_spark.operators.bloomjoin import resolve_auto_m_bits
from mydatalake_spark.planning import (
    bloom_join_with_stats,
    broadcast_if_small,
    fresh_ndv,
    fresh_row_count,
)

TBL = "silver.dim.customers"


def _seed(spark, cat, n=500):
    df = spark.range(n).select(
        F.col("id").alias("cust_id"),
        (F.col("id") % 7).cast("string").alias("segment"),
    )
    cat.overwrite(df, TBL)
    return df


def test_fresh_ndv_lifecycle(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat)
    # never analyzed → None (run the probe)
    assert fresh_ndv(cat, TBL, "cust_id") is None
    cat.analyze(TBL)
    ndv = fresh_ndv(cat, TBL, "cust_id")
    assert ndv is not None and 450 <= ndv <= 550  # HLL ~2% error
    assert fresh_row_count(cat, TBL) == 500
    # unknown column → None
    assert fresh_ndv(cat, TBL, "nope") is None
    # a write flips the fingerprint → stats STALE → None again
    cat.append(
        spark.createDataFrame([(999999, "9")], "cust_id long, segment string"),
        TBL,
    )
    assert fresh_ndv(cat, TBL, "cust_id") is None
    assert fresh_row_count(cat, TBL) is None


def test_hint_skips_the_sizing_job_entirely(spark):
    # the build frame raises if ever evaluated; with a hint the sizing
    # path must not touch it
    poisoned = spark.range(10).select(
        F.raise_error(F.lit("sizing job ran")).alias("k")
    )
    m = resolve_auto_m_bits(poisoned, "k", 3, "test", n_keys_hint=1000)
    assert m is not None and m >= 1 << 13
    # and the hint feeds the same give-up policy as the probe
    assert (
        resolve_auto_m_bits(
            poisoned, "k", 3, "test", n_keys_hint=10**9
        )
        is None
    )


def test_bloom_join_with_stats_matches_plain_join(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat, n=50)
    cat.analyze(TBL)
    probe = spark.range(2000).select(
        F.col("id").alias("cust_id"),
        (F.col("id") * 2).alias("amount"),
    )
    got = bloom_join_with_stats(cat, probe, TBL, "cust_id")
    want = probe.join(cat.read(TBL), "cust_id")
    assert got.count() == want.count() == 50
    # the probe-side Exchange reads post-prune rows (the bloom mask
    # made it into the plan)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "bloom" in plan.lower() or "pmod" in plan.lower()


def test_broadcast_if_small_hints_and_large_does_not(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat, n=100)
    fact = spark.range(1000).select(F.col("id").alias("cust_id"))
    small = broadcast_if_small(cat, TBL)  # ~KBs, under any threshold
    plan = (
        fact.join(small, "cust_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # with an impossible threshold the hint is NOT added
    big = broadcast_if_small(cat, TBL, max_bytes=1)
    # hint absence: the logical plan carries no ResolvedHint
    logical = big._jdf.queryExecution().logical().toString()
    assert "hint" not in logical.lower()
