"""Sketch aggregates with built-in error-bound verification.

[extension] At 100 TB, exact COUNT(DISTINCT) and exact percentiles
force full shuffles of the distinct values; the sketch versions
(HyperLogLog++ behind ``approx_count_distinct``, KLL/GK behind
``percentile_approx``) are single-pass, mergeable, and
bounded-memory — the right default for profiling hot paths.

Each helper returns a frame that carries its own verification: the
exact value computed alongside and a boolean asserting the sketch
landed within its error contract. The exact side IS the expensive
path — these helpers exist for correctness gates (small SF) and for
making the error contract explicit; production calls use the sketch
expression alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_check(
    df: DataFrame,
    group_by: list[str],
    col: str,
    rsd: float = 0.02,
    tolerance: float = 0.10,
) -> DataFrame:
    """Per group: exact distinct count + whether the HLL++ estimate
    (relative standard deviation ``rsd``) lies within ``tolerance``
    relative error of it. ``tolerance`` should be a few sigma above
    ``rsd`` (default 5σ) so the check is deterministic-in-practice
    while still catching a broken sketch (which lands ~100% off)."""
    agg = df.groupBy(*group_by).agg(
        F.countDistinct(col).alias("exact_distinct"),
        F.approx_count_distinct(col, rsd=rsd).alias("__approx__"),
    )
    rel_err = (
        F.abs(F.col("__approx__") - F.col("exact_distinct"))
        / F.col("exact_distinct")
    )
    return agg.select(
        *group_by,
        "exact_distinct",
        (rel_err <= tolerance).alias("within_bound"),
    )


def approx_quantile_check(
    df: DataFrame,
    group_by: list[str],
    col: str,
    q: float = 0.5,
    rank_eps: float = 0.01,
    accuracy: int = 10000,
) -> DataFrame:
    """Per group: exact quantile at ``q`` (rounded for cross-engine
    compare) + whether ``percentile_approx`` honors its RANK-error
    contract: the sketch value must lie between the exact quantiles at
    ``q − rank_eps`` and ``q + rank_eps``. percentile_approx bounds
    rank error (≈ 1/accuracy), not value error — so this is the
    property it actually guarantees, and the one a broken sketch
    violates."""
    lo, hi = max(q - rank_eps, 0.0), min(q + rank_eps, 1.0)
    agg = df.groupBy(*group_by).agg(
        F.expr(f"percentile({col}, {q})").alias("__exact__"),
        F.expr(f"percentile({col}, {lo})").alias("__lo__"),
        F.expr(f"percentile({col}, {hi})").alias("__hi__"),
        F.percentile_approx(col, q, accuracy).alias("__approx__"),
    )
    return agg.select(
        *group_by,
        F.round("__exact__", 4).alias("exact_quantile"),
        (
            (F.col("__approx__") >= F.col("__lo__"))
            & (F.col("__approx__") <= F.col("__hi__"))
        ).alias("within_bound"),
    )


def hll_shard_union_check(
    df: DataFrame,
    group_by: list[str],
    col: str,
    shard_col: str,
    lg_k: int = 14,
    tolerance: float = 0.10,
) -> DataFrame:
    """Two-level mergeable-sketch pipeline: per (group, shard) build a
    Datasketches HLL sketch of ``col``; per group, *union the shard
    sketches* and estimate; verify the estimate lands within
    ``tolerance`` relative error of the exact distinct count.

    This is the pattern ``approx_count_distinct`` can't express:
    ``hll_sketch_agg`` emits a *binary, mergeable* sketch, so shard
    sketches can be persisted as a tiny stats table and re-unioned
    later across any shard subset — incremental distinct-count
    maintenance without ever rescanning the fact table. At 100 TB the
    per-shard pass is a map-side partial aggregate (each sketch is
    ≤ 2^lg_k bytes, regardless of input rows), the union pass moves
    only #groups × #shards sketches, and appending a new shard costs
    one scan of that shard alone. lg_k=14 gives rsd ≈ 1.04/√2¹⁴
    ≈ 0.8%; the default tolerance sits >10σ out so the check is
    deterministic-in-practice (cf. approx_distinct_check).

    The exact side exists for the correctness gate; production reads
    estimate-only.
    """
    shard_sketches = df.groupBy(*group_by, shard_col).agg(
        F.hll_sketch_agg(col, F.lit(lg_k)).alias("__sk__")
    )
    merged = shard_sketches.groupBy(*group_by).agg(
        F.hll_sketch_estimate(F.hll_union_agg("__sk__")).alias("__est__"),
        F.count(F.lit(1)).alias("n_shards"),
    )
    exact = df.groupBy(*group_by).agg(
        F.countDistinct(col).alias("exact_distinct")
    )
    rel_err = (
        F.abs(F.col("__est__") - F.col("exact_distinct"))
        / F.col("exact_distinct")
    )
    return merged.join(exact, list(group_by)).select(
        *group_by,
        "n_shards",
        "exact_distinct",
        (rel_err <= tolerance).alias("within_bound"),
    )
