"""Experimentation statistics (A/B testing) as single-pass aggregates.

[extension] The analytics sibling of quality/checks.py: once a
pipeline can split traffic deterministically (operators/sampling.py
hash buckets), the next question is always "did the metric move, and
is the move real?" — a two-sample Welch t-test over the variant
metric distributions.

Spark-first shape: the whole test is ONE conditional aggregation pass
— count/mean/sample-variance per variant via ``F.when`` inside the
aggregate, then the t statistic and Welch–Satterthwaite degrees of
freedom as scalar column arithmetic on the single result row. No
join, no second scan, no UDF; at 100 TB it is a map-side partial
aggregate producing one row per partition, merged once.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _poisson_cdf_hex_bounds(max_w: int = 6) -> list[str]:
    """Cumulative Poisson(1) probabilities mapped to 4-hex-digit
    bucket bounds (16⁴ buckets — the same md5-bucket scheme as
    operators/sampling.py, so the mapping is engine-portable)."""
    bounds, cum, fact = [], 0.0, 1.0
    for w in range(max_w):
        fact = fact * w if w > 0 else 1.0
        cum += math.exp(-1.0) / fact
        bounds.append(format(int(cum * 16**4), "04x"))
    return bounds


_POISSON_BOUNDS = _poisson_cdf_hex_bounds()


def poisson_weight(key: Column) -> Column:
    """Deterministic Poisson(1)-distributed integer weight for ``key``
    (truncated at 6; tail mass beyond is ~1e-4 of a unit). The
    resampling primitive of the Poisson bootstrap: independent
    per-(row, resample) weights with no global coordination."""
    b = F.substring(F.md5(key), 1, 4)
    expr = F.when(b < F.lit(_POISSON_BOUNDS[0]), F.lit(0))
    for w, bound in enumerate(_POISSON_BOUNDS[1:], start=1):
        expr = expr.when(b < F.lit(bound), F.lit(w))
    return expr.otherwise(F.lit(len(_POISSON_BOUNDS)))


def poisson_weight_sql(key_sql: str) -> str:
    """The ANSI-SQL CASE replaying :func:`poisson_weight` bit-for-bit
    (DuckDB-oracle generator)."""
    parts = [
        f"WHEN SUBSTRING(MD5({key_sql}), 1, 4) < '{bound}' THEN {w}"
        for w, bound in enumerate(_POISSON_BOUNDS)
    ]
    return "CASE " + " ".join(parts) + f" ELSE {len(_POISSON_BOUNDS)} END"


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Exact Gini coefficient of ``value_col``'s concentration:
    G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over values ranked ascending with
    ``tiebreak_col`` completing a total order (deterministic ranks;
    the formula is tie-invariant since equal values commute). One
    unpartitioned rank window — size the input accordingly: feed
    per-entity AGGREGATES (customer totals, not order rows), which is
    also what the statistic means. Returns one row ``(n, gini)``."""
    w = Window.orderBy(value_col, tiebreak_col)
    ranked = df.select(
        F.col(value_col).alias("__x__"),
        F.row_number().over(w).cast("long").alias("__i__"),
    )
    n = F.count(F.lit(1))
    # rank·value products and n·Σx accumulate in DOUBLE space: with
    # integer-cent inputs the long arithmetic wraps int64 around
    # n·Σx ≈ 10^19 (large-sf corpora); doubles stay exact below 2^53
    # and degrade gracefully above, inside the 9-significant-digit
    # cross-engine comparator contract.
    return ranked.agg(
        n.alias("n"),
        F.round(
            2.0 * F.sum(F.col("__i__").cast("double")
                        * F.col("__x__").cast("double"))
            / (n.cast("double") * F.sum(F.col("__x__").cast("double")))
            - (n + 1).cast("double") / n.cast("double"),
            round_to,
        ).alias("gini"),
    )


def poisson_bootstrap_ci(
    df: DataFrame,
    id_col: str,
    value_col: str,
    n_resamples: int = 20,
    salt: str = "boot",
    z: float = 1.96,
    round_to: int = 4,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Bootstrap confidence interval for the mean of ``value_col`` —
    the Poisson bootstrap (Chamandy et al., "Estimating Uncertainty
    for Massive Data Streams", Google 2012): instead of materializing
    B resampled datasets, each row contributes to resample *b* with an
    independent Poisson(1) multiplicity, here derived deterministically
    from md5(salt#id#b) so the estimate is reproducible and
    engine-portable.

    Plan shape: ONE aggregation pass computing the plain mean plus B
    weighted means as sibling aggregate expressions — no explode, no
    row replication, no shuffle beyond the single partial-agg merge;
    the resample spread then folds over a B-element array on the
    one-row result. At 100 TB this costs one scan with ~2B+2 partial
    aggregates per partition, the textbook map-side shape.

    Returns one row per group (one row total without ``group_by``):
    ``(group..., n, mean, boot_se, ci_lo, ci_hi)`` (rounded).
    """
    v = F.col(value_col)
    base = df.where(v.isNotNull())
    resample_means = []
    for b in range(n_resamples):
        w = poisson_weight(
            F.concat_ws(
                "#",
                F.lit(salt),
                F.col(id_col).cast("string"),
                F.lit(str(b)),
            )
        )
        resample_means.append(
            (F.sum(v * w) / F.sum(w)).alias(f"__m{b}__")
        )
    aggs = [
        F.count(v).alias("n"),
        F.avg(v).alias("__mean__"),
        *resample_means,
    ]
    row = (
        base.groupBy(*group_by).agg(*aggs) if group_by else base.agg(*aggs)
    )
    arr = F.array(*[F.col(f"__m{b}__") for b in range(n_resamples)])
    mu = (
        F.aggregate(arr, F.lit(0.0), lambda a, x: a + x) / n_resamples
    )
    var = F.aggregate(
        arr, F.lit(0.0), lambda a, x: a + (x - mu) * (x - mu)
    ) / (n_resamples - 1)
    se = F.sqrt(var)
    return row.select(
        *(group_by or []),
        "n",
        F.round("__mean__", round_to).alias("mean"),
        F.round(se, round_to).alias("boot_se"),
        F.round(F.col("__mean__") - z * se, round_to).alias("ci_lo"),
        F.round(F.col("__mean__") + z * se, round_to).alias("ci_hi"),
    )


def welch_ttest(
    df: DataFrame,
    variant_col: Column,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Two-sample Welch t-test between ``variant_col`` == 0 and == 1.

    Returns one row: per-variant n / mean, the mean difference
    (B − A), the Welch t statistic, and the Welch–Satterthwaite
    effective degrees of freedom, all rounded to ``round_to`` (the
    cross-engine float contract). Uses sample variance (n−1), matching
    ANSI ``VAR_SAMP``; rows where the metric is null are excluded per
    variant (ANSI aggregate semantics on both engines).
    """
    va = F.when(variant_col == 0, F.col(value_col))
    vb = F.when(variant_col == 1, F.col(value_col))
    agg = df.agg(
        F.count(va).alias("n_a"),
        F.count(vb).alias("n_b"),
        F.avg(va).alias("__ma__"),
        F.avg(vb).alias("__mb__"),
        F.var_samp(va).alias("__sa__"),
        F.var_samp(vb).alias("__sb__"),
    )
    se_a = F.col("__sa__") / F.col("n_a")
    se_b = F.col("__sb__") / F.col("n_b")
    se2 = se_a + se_b
    t = (F.col("__mb__") - F.col("__ma__")) / F.sqrt(se2)
    dof = (se2 * se2) / (
        se_a * se_a / (F.col("n_a") - 1) + se_b * se_b / (F.col("n_b") - 1)
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round("__ma__", round_to).alias("mean_a"),
        F.round("__mb__", round_to).alias("mean_b"),
        F.round(F.col("__mb__") - F.col("__ma__"), round_to).alias(
            "mean_diff"
        ),
        F.round(t, round_to).alias("t_stat"),
        F.round(dof, round_to).alias("welch_df"),
    )
