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


def rolling_distinct_check(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    window_days: int = 7,
    lg_k: int = 14,
    tolerance: float = 0.10,
) -> DataFrame:
    """Rolling N-day distinct count via mergeable daily sketches: one
    HLL sketch per day, then a rows-cheap *window union* over the last
    N daily sketches — rolling distinct users without ever re-scanning
    N days of raw data, the query that's impossible with plain
    ``approx_count_distinct`` (not mergeable) and ruinous with exact
    ``COUNT(DISTINCT)`` (N-fold re-scan or an N-day shuffle per day).

    At 100 TB: the daily sketch build is the only input-sized pass
    (map-side partial agg, ≤2^lg_k bytes per day); the union window
    runs over #days sketch rows — kilobytes — so it is deliberately
    unpartitioned. Day gaps are handled by a RANGE frame on
    days-since-epoch, not a ROWS frame (a missing day must not widen
    the window).

    Returns ``(day, exact_distinct, within_bound)`` per observed day
    — the exact side (distinct pairs exploded to the ≤N windows each
    covers, equi-joined to observed days; no nested-loop range join)
    exists for the correctness gate; production reads the estimate
    alone.
    """
    from pyspark.sql import Window

    day = F.col(ts_col).cast("date")
    base = (
        df.select(day.alias("day"), F.col(key_col).alias("__k__"))
        .where(F.col("__k__").isNotNull())
    )
    daily = base.groupBy("day").agg(
        F.hll_sketch_agg("__k__", F.lit(lg_k)).alias("__sk__")
    )
    dayn = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    w = Window.orderBy(dayn).rangeBetween(-(window_days - 1), 0)
    est = daily.select(
        "day",
        F.hll_sketch_estimate(F.hll_union_agg("__sk__").over(w)).alias(
            "__est__"
        ),
    )
    pairs = base.distinct()
    cover = pairs.select(
        F.explode(
            F.sequence("day", F.date_add("day", window_days - 1))
        ).alias("wday"),
        "__k__",
    )
    days = daily.select(F.col("day").alias("wday"))
    exact = (
        cover.join(days, "wday")
        .groupBy(F.col("wday").alias("day"))
        .agg(F.countDistinct("__k__").alias("exact_distinct"))
    )
    rel = (
        F.abs(F.col("__est__") - F.col("exact_distinct"))
        / F.col("exact_distinct")
    )
    return est.join(exact, "day").select(
        "day", "exact_distinct", (rel <= tolerance).alias("within_bound")
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

def hll_intersection_check(
    df: DataFrame,
    seg_col: str,
    key_col: str,
    lg_k: int = 14,
    tolerance: float = 0.05,
) -> DataFrame:
    """Segment-overlap cardinality via HLL inclusion–exclusion:
    |A∩B| ≈ est(A) + est(B) − est(A∪B), the only way to intersect
    mergeable sketches (HLL unions natively but cannot intersect).
    For every segment pair: the estimate, the EXACT intersection (for
    the contract), and ``within_bound`` — |est − exact| ≤ tolerance ·
    |A∪B|. The bound is on the UNION scale because inclusion–exclusion
    compounds each union-sized error: a small true intersection can
    carry large RELATIVE error by construction, which is the honest
    contract (Datasketches documents the same caveat for set
    operations on HLL).

    Scale shape: one sketch per segment (a segment-count-sized frame),
    pairwise scalar ``hll_union`` over that tiny frame, and the exact
    side is a distinct (segment, key) self-join — only the contract
    verifier touches key-grain data; production reads sketches only.
    """
    e = df.select(
        F.col(seg_col).alias("__seg__"), F.col(key_col).alias("__k__")
    ).distinct()
    sk = e.groupBy("__seg__").agg(
        F.hll_sketch_agg("__k__", F.lit(lg_k)).alias("__sk__"),
        F.count(F.lit(1)).alias("__nd__"),
    )
    a = sk.select(
        F.col("__seg__").alias("seg_a"),
        F.col("__sk__").alias("__ska__"),
        F.col("__nd__").alias("__nda__"),
    )
    b = sk.select(
        F.col("__seg__").alias("seg_b"),
        F.col("__sk__").alias("__skb__"),
        F.col("__nd__").alias("__ndb__"),
    )
    pairs = a.join(b, F.col("seg_a") < F.col("seg_b"))
    est_a = F.hll_sketch_estimate("__ska__")
    est_b = F.hll_sketch_estimate("__skb__")
    est_u = F.hll_sketch_estimate(
        F.hll_union("__ska__", "__skb__", True)
    )
    est_i = est_a + est_b - est_u
    ex1 = e.select(
        F.col("__seg__").alias("seg_a"), F.col("__k__").alias("__ka__")
    )
    ex2 = e.select(
        F.col("__seg__").alias("seg_b"), F.col("__k__").alias("__ka__")
    )
    exact = (
        ex1.join(ex2, "__ka__")
        .where(F.col("seg_a") < F.col("seg_b"))
        .groupBy("seg_a", "seg_b")
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    out = pairs.join(exact, ["seg_a", "seg_b"], "left").select(
        "seg_a",
        "seg_b",
        F.coalesce("exact_intersection", F.lit(0))
        .cast("long")
        .alias("exact_intersection"),
        (
            F.col("__nda__") + F.col("__ndb__")
            - F.coalesce("exact_intersection", F.lit(0))
        ).cast("long").alias("exact_union"),
        (
            F.abs(
                est_i
                - F.coalesce("exact_intersection", F.lit(0)).cast("double")
            )
            <= tolerance
            * (
                F.col("__nda__") + F.col("__ndb__")
                - F.coalesce("exact_intersection", F.lit(0))
            ).cast("double")
        ).alias("within_bound"),
    )
    return out
