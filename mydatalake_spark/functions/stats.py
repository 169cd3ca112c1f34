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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
