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
    group_by: str | None = None,
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
    aggs = [
        F.count(va).alias("n_a"),
        F.count(vb).alias("n_b"),
        F.avg(va).alias("__ma__"),
        F.avg(vb).alias("__mb__"),
        F.var_samp(va).alias("__sa__"),
        F.var_samp(vb).alias("__sb__"),
    ]
    agg = df.groupBy(group_by).agg(*aggs) if group_by else df.agg(*aggs)
    se_a = F.col("__sa__") / F.col("n_a")
    se_b = F.col("__sb__") / F.col("n_b")
    se2 = se_a + se_b
    t = (F.col("__mb__") - F.col("__ma__")) / F.sqrt(se2)
    dof = (se2 * se2) / (
        se_a * se_a / (F.col("n_a") - 1) + se_b * se_b / (F.col("n_b") - 1)
    )
    return agg.select(
        *([group_by] if group_by else []),
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

def mann_whitney_u(
    df: DataFrame,
    variant_col: Column,
    value_col: str,
    round_to: int = 4,
    group_by: str | None = None,
) -> DataFrame:
    """Mann–Whitney U rank-sum test (nonparametric Welch sibling)
    between ``variant_col`` == 0 (A) and == 1 (B).

    Scale shape: ranks are NOT computed by a global per-row window —
    the stream is first aggregated to DISTINCT metric values with
    per-variant counts (one shuffle, cardinality = |distinct values|),
    and midranks come from a cumulative window over that small grouped
    frame. The rank-sum then folds back as Σ count_b·midrank. Midranks
    are .5-multiples and all counts are integers, so every aggregate
    accumulates exactly in double/int64 — both engines derive the
    statistic from identical numbers regardless of execution order.

    Returns one row (per ``group_by`` value when set): n_a, n_b,
    u_stat (U of B), z (normal approximation WITH tie correction), and
    the rank-biserial effect size r = 2U/(n_a·n_b) − 1. With
    ``group_by`` the whole test runs once per metric/segment in the
    SAME pass — the experiment-scorecard shape — and the windows
    partition by the group key, so no group ever sees another's ranks.
    """
    gcols = [group_by] if group_by else []
    per_val = df.where(F.col(value_col).isNotNull()).select(
        *gcols,
        F.col(value_col).alias("__v__"),
        F.when(variant_col == 1, 1).otherwise(0).alias("__isb__"),
    ).groupBy(*gcols, "__v__").agg(
        F.count(F.lit(1)).alias("__t__"),
        F.sum("__isb__").alias("__tb__"),
    )
    w = (
        Window.partitionBy(*gcols)
        .orderBy("__v__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = per_val.select(
        *gcols,
        "__t__",
        "__tb__",
        # midrank of a tie-group = cum_before + (t+1)/2
        (
            F.sum("__t__").over(w) - F.col("__t__")
            + (F.col("__t__") + 1) / 2.0
        ).alias("__mr__"),
    )
    aggs = [
        F.sum("__t__").alias("__n__"),
        F.sum("__tb__").alias("n_b"),
        F.sum(F.col("__tb__") * F.col("__mr__")).alias("__rb__"),
        F.sum(
            F.col("__t__") * F.col("__t__") * F.col("__t__")
            - F.col("__t__")
        ).alias("__ties__"),
    ]
    agg = (
        ranked.groupBy(*gcols).agg(*aggs) if gcols else ranked.agg(*aggs)
    )
    n_a = (F.col("__n__") - F.col("n_b")).cast("long")
    n_b = F.col("n_b").cast("long")
    u = F.col("__rb__") - n_b * (n_b + 1) / 2.0
    mu = n_a.cast("double") * n_b.cast("double") / 2.0
    nn = F.col("__n__").cast("double")
    sigma2 = (
        n_a.cast("double") * n_b.cast("double") / 12.0
        * ((nn + 1.0) - F.col("__ties__").cast("double")
           / (nn * (nn - 1.0)))
    )
    z = (u - mu) / F.sqrt(sigma2)
    effect = 2.0 * u / (n_a.cast("double") * n_b.cast("double")) - 1.0
    return agg.select(
        *gcols,
        n_a.alias("n_a"),
        n_b.alias("n_b"),
        F.round(u, 1).alias("u_stat"),
        F.round(z, round_to).alias("z_stat"),
        F.round(effect, round_to).alias("rank_biserial"),
    )


#: Default bounded-distinct contract cap for the exact (unbinned)
#: ks_2samp / emd_1d path — matches the "≤ ~10⁶ distinct values"
#: docstring contract those operators have carried since r5.
ECDF_DISTINCT_CAP = 1_000_000


def _guard_ecdf_distinct(
    df: DataFrame, value_col: str, bins: int | None, max_distinct: int | None,
    op_name: str,
) -> None:
    """Refusal probe for the exact ECDF path (see the SCALE CONTRACT in
    :func:`ks_2samp`): when ``bins`` is None, the distinct-value frame
    feeds an UNPARTITIONED ordered window, so a distinct≈rows input
    (raw float timestamps, say) silently serializes the whole input
    through one task. One approx_count_distinct probe; skipped
    entirely when ``bins`` caps the frame or ``max_distinct=None``
    opts back into the fully lazy plan (plan-dump tooling,
    foreachBatch bodies)."""
    if bins is not None or max_distinct is None:
        return
    from ..operators.guards import assert_bounded_distinct

    assert_bounded_distinct(
        df.where(F.col(value_col).isNotNull()),
        value_col,
        max_distinct,
        op_name,
        "Pass bins= (e.g. bins=10_000) to pre-quantize to fixed-width "
        "bin midpoints, or max_distinct=None to accept the "
        "single-task window.",
    )


def _maybe_binned(df: DataFrame, value_col: str, bins: int | None):
    """Replace a continuous value column with its bin midpoint when
    ``bins`` is set: one cheap min/max aggregate, then a fixed-width
    quantization expression — bounds the distinct-value frame (and so
    the single-task ordered window downstream) to ``bins`` rows
    regardless of input cardinality. Deterministic and
    oracle-expressible (same min/max CTE + floor arithmetic in SQL)."""
    if bins is None:
        return F.col(value_col)
    lo_hi = (
        df.where(F.col(value_col).isNotNull())
        .agg(
            F.min(F.col(value_col).cast("double")).alias("lo"),
            F.max(F.col(value_col).cast("double")).alias("hi"),
        )
        .first()
    )
    if lo_hi is None or lo_hi.lo is None or lo_hi.hi <= lo_hi.lo:
        return F.col(value_col)
    width = (lo_hi.hi - lo_hi.lo) / bins
    q = F.least(
        F.floor((F.col(value_col).cast("double") - lo_hi.lo) / width),
        F.lit(bins - 1),
    )
    return lo_hi.lo + (q + 0.5) * width


def ks_2samp(
    df: DataFrame,
    variant_col: Column,
    value_col: str,
    round_to: int = 6,
    bins: int | None = None,
    max_distinct: int | None = ECDF_DISTINCT_CAP,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between
    ``variant_col`` == 0 (A) and == 1 (B): the max ECDF gap
    D = max_v |F_a(v) − F_b(v)|, plus the scaled statistic
    D·√(n_a·n_b/(n_a+n_b)) used by the asymptotic p-value.

    Same scale shape as :func:`mann_whitney_u`: aggregate to distinct
    values first (one shuffle), cumulative counts via a window over
    the grouped frame, then a single max. ECDF values are exact
    integer ratios, so D is the same double on any engine.

    SCALE CONTRACT: the ordered cumulative window runs unpartitioned,
    so the default (exact) path requires BOUNDED DISTINCT CARDINALITY
    in ``value_col`` — fine for prices/counts/scores with ≤ ~10⁶
    distinct values, wrong for e.g. raw float timestamps where
    distinct ≈ rows. For such continuous columns pass ``bins`` (e.g.
    10_000): values pre-quantize to fixed-width bin midpoints via
    :func:`_maybe_binned` (one extra min/max pass), capping the window
    frame at ``bins`` rows and bounding D's error by ~1/bins per side.

    The contract is a RUNTIME REFUSAL, not just prose: when ``bins``
    is None, one eager ``approx_count_distinct`` probe job runs at
    DataFrame-construction time and raises
    :class:`~mydatalake_spark.operators.guards.DistinctCardinalityExceeded`
    above ``max_distinct`` (default 10⁶). Pass ``max_distinct=None``
    where laziness is assumed (plan inspection, foreachBatch).
    """
    _guard_ecdf_distinct(df, value_col, bins, max_distinct, "ks_2samp")
    per_val = df.where(F.col(value_col).isNotNull()).select(
        _maybe_binned(df, value_col, bins).alias("__v__"),
        F.when(variant_col == 1, 1).otherwise(0).alias("__isb__"),
    ).groupBy("__v__").agg(
        F.count(F.lit(1)).alias("__t__"),
        F.sum("__isb__").alias("__tb__"),
    )
    w = (
        Window.orderBy("__v__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wfull = Window.orderBy("__v__").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per_val.select(
        (F.sum(F.col("__t__") - F.col("__tb__")).over(w)).alias("__ca__"),
        F.sum("__tb__").over(w).alias("__cb__"),
        F.sum(F.col("__t__") - F.col("__tb__")).over(wfull).alias("__na__"),
        F.sum("__tb__").over(wfull).alias("__nb__"),
    )
    gap = F.abs(
        F.col("__ca__").cast("double") / F.col("__na__").cast("double")
        - F.col("__cb__").cast("double") / F.col("__nb__").cast("double")
    )
    na = F.max("__na__").cast("double")
    nb = F.max("__nb__").cast("double")
    return cum.agg(
        F.max("__na__").cast("long").alias("n_a"),
        F.max("__nb__").cast("long").alias("n_b"),
        F.round(F.max(gap), round_to).alias("d_stat"),
        F.round(
            F.max(gap) * F.sqrt(na * nb / (na + nb)),
            round_to,
        ).alias("ks_scaled"),
    )

def chi2_independence(
    df: DataFrame,
    x_col: str,
    y_col: str,
    round_to: int = 4,
) -> DataFrame:
    """Pearson chi-squared test of independence between two
    categorical columns, plus Cramér's V effect size.

    One groupBy over the (x, y) cells (a single input-sized shuffle
    keyed on the pair), then row/column marginals as window sums over
    the tiny cell frame — the input is never scanned twice. Uses the
    algebraic identity χ² = N·(Σ o²/(rowtot·coltot)) − N so every
    per-cell term is a ratio of exact int64 counts (< 2^53, exact in
    double); only the final Σ over ≤|X|·|Y| cells is float.

    Returns one row: n, dof, chi2, cramers_v.
    """
    cells = df.groupBy(
        F.col(x_col).alias("__x__"), F.col(y_col).alias("__y__")
    ).agg(F.count(F.lit(1)).alias("__o__"))
    wx = Window.partitionBy("__x__")
    wy = Window.partitionBy("__y__")
    wall = Window.partitionBy()
    enriched = cells.select(
        "__o__",
        F.sum("__o__").over(wx).alias("__rt__"),
        F.sum("__o__").over(wy).alias("__ct__"),
        F.sum("__o__").over(wall).alias("__n__"),
        F.size(F.collect_set("__x__").over(wall)).alias("__nx__"),
        F.size(F.collect_set("__y__").over(wall)).alias("__ny__"),
    )
    term = (
        F.col("__o__").cast("double") * F.col("__o__").cast("double")
        / (F.col("__rt__").cast("double") * F.col("__ct__").cast("double"))
    )
    agg = enriched.agg(
        F.max("__n__").alias("n"),
        F.max("__nx__").alias("__r__"),
        F.max("__ny__").alias("__c__"),
        F.sum(term).alias("__s__"),
    )
    nn = F.col("n").cast("double")
    chi2 = nn * F.col("__s__") - nn
    mindim = F.least(F.col("__r__"), F.col("__c__")) - 1
    return agg.select(
        F.col("n").cast("long").alias("n"),
        ((F.col("__r__") - 1) * (F.col("__c__") - 1))
        .cast("long")
        .alias("dof"),
        F.round(chi2, round_to).alias("chi2"),
        F.round(
            F.sqrt(chi2 / (nn * mindim.cast("double"))), round_to
        ).alias("cramers_v"),
    )


def theil_sen_trend(
    df: DataFrame,
    group_col: str,
    x_col: Column,
    y_col: Column,
    min_points: int = 3,
    round_to: int = 6,
    max_group_size: int | None = 10_000,
) -> DataFrame:
    """Per-group Theil–Sen robust trend: the MEDIAN of all pairwise
    slopes (y_j−y_i)/(x_j−x_i), immune to outliers that wreck OLS.

    Pair generation is a per-group self-join — O(n²) rows per group —
    so the contract is BOUNDED GROUPS (per-entity series, n ≲ 10³;
    the same contract the reference-scale median-of-slopes estimator
    carries everywhere). The join is a single shuffle co-partitioned
    on the group key; cross-group pairs never materialize. Groups
    with fewer than ``min_points`` observations are dropped (a slope
    median over <3 points is noise).

    The contract is ENFORCED, not just documented: one cheap bounded
    probe (operators/guards.py) refuses with the offending key if any
    group exceeds ``max_group_size`` — the default 10⁴ caps the
    per-group pair stage at ~5·10⁷ rows, the last size a single task
    absorbs gracefully; one unguarded 10⁶-row hot group would build
    10¹² pairs. NOTE the probe is EAGER: one Spark job runs (and may
    raise) at DataFrame-CONSTRUCTION time, a deliberate departure
    from lazy-plan construction (since r6). ``max_group_size=None``
    disables the probe (and its one extra job) for callers who
    pre-bounded the input themselves or need a fully lazy plan
    (plan-dump tooling, foreachBatch bodies).

    Returns (group, n_points, n_pairs, ts_slope).
    """
    base = df.select(
        F.col(group_col).alias("__g__"),
        x_col.cast("double").alias("__x__"),
        y_col.cast("double").alias("__y__"),
    )
    if max_group_size is not None:
        from ..operators.guards import assert_bounded_groups

        assert_bounded_groups(
            df,
            [group_col],
            max_group_size,
            "theil_sen_trend",
            "Pre-aggregate the series per group (e.g. daily means) so "
            "group sizes stay bounded, or raise max_group_size / pass "
            "max_group_size=None if the blow-up is intended.",
        )
    a = base.alias("a")
    b = base.alias("b")
    pairs = a.join(b, on="__g__").where(
        F.col("a.__x__") < F.col("b.__x__")
    )
    slope = (F.col("b.__y__") - F.col("a.__y__")) / (
        F.col("b.__x__") - F.col("a.__x__")
    )
    out = pairs.groupBy("__g__").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.median(slope), round_to).alias("ts_slope"),
    )
    counts = base.groupBy("__g__").agg(
        F.count(F.lit(1)).alias("n_points")
    )
    return (
        counts.where(F.col("n_points") >= min_points)
        .join(out, on="__g__")
        .select(
            F.col("__g__").alias(group_col),
            "n_points",
            "n_pairs",
            "ts_slope",
        )
    )

def cuped_adjusted(
    df: DataFrame,
    user_col: str,
    variant_col: Column,
    value_col: str,
    ts_col: str,
    split: str,
    round_to: int = 4,
) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al., WSDM'13
    "Improving the Sensitivity of Online Controlled Experiments"):
    each user's pre-period mean is the covariate X, the post-period
    mean is the metric Y, and the adjusted metric
    Y − θ(X − X̄) with θ = cov(X,Y)/var(X) removes the variance X
    explains — tighter CIs from data the experiment already has.

    Plan shape: ONE conditional-aggregate pass to per-user
    (pre_sum, pre_n, post_sum, post_n), then the θ co-moments and the
    per-variant adjusted means as aggregates over the small user-level
    frame — two shuffles total (user key, then a scalar reduce), no
    join of pre against post.

    Determinism contract (same construction as user_trend_events):
    event values quantize to milli-units, user means quantize to
    integer millis via floor(sum/n + 0.5) — a single exact division —
    so every co-moment accumulates EXACTLY in int64 and θ, the means,
    and the variance-reduction ratio are bit-identical on any engine.
    Exactness holds through ~10⁴ users × values ≤ ~10³ (documented
    int64 bounds); beyond that, switch the final combination to
    centered double sums.

    Returns one row per variant: (variant, n_users, mean_post,
    mean_adjusted) plus the pooled theta and var_reduction = ρ²
    (fraction of metric variance the covariate removes).
    """
    pre = F.col(ts_col) < F.lit(split).cast("timestamp")
    vm = F.floor(F.col(value_col) * 1000 + F.lit(0.5))
    per_user = (
        df.groupBy(F.col(user_col))
        .agg(
            F.sum(F.when(pre, vm)).alias("__ps__"),
            F.count(F.when(pre, F.lit(1))).alias("__pn__"),
            F.sum(F.when(~pre, vm)).alias("__qs__"),
            F.count(F.when(~pre, F.lit(1))).alias("__qn__"),
        )
        .where((F.col("__pn__") > 0) & (F.col("__qn__") > 0))
    )
    ux = F.floor(
        F.col("__ps__").cast("double") / F.col("__pn__").cast("double")
        + F.lit(0.5)
    )
    uy = F.floor(
        F.col("__qs__").cast("double") / F.col("__qn__").cast("double")
        + F.lit(0.5)
    )
    users = per_user.select(
        F.col(user_col),
        ux.alias("__x__"),
        uy.alias("__y__"),
    )
    mom = users.agg(
        F.count(F.lit(1)).alias("__n__"),
        F.sum("__x__").alias("__sx__"),
        F.sum("__y__").alias("__sy__"),
        F.sum(F.col("__x__") * F.col("__y__")).alias("__sxy__"),
        F.sum(F.col("__x__") * F.col("__x__")).alias("__sxx__"),
        F.sum(F.col("__y__") * F.col("__y__")).alias("__syy__"),
    )
    cov_n = F.col("__n__") * F.col("__sxy__") - F.col("__sx__") * F.col("__sy__")
    var_x = F.col("__n__") * F.col("__sxx__") - F.col("__sx__") * F.col("__sx__")
    var_y = F.col("__n__") * F.col("__syy__") - F.col("__sy__") * F.col("__sy__")
    scalars = mom.select(
        (cov_n.cast("double") / var_x.cast("double")).alias("__theta__"),
        (
            (cov_n.cast("double") * cov_n.cast("double"))
            / (var_x.cast("double") * var_y.cast("double"))
        ).alias("__vr__"),
        (F.col("__sx__").cast("double") / F.col("__n__").cast("double"))
        .alias("__xbar__"),
    )
    per_variant = users.groupBy(
        (variant_col).alias("variant")
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("__x__").alias("__vsx__"),
        F.sum("__y__").alias("__vsy__"),
    )
    # mean_adj = ȳ_v − θ(x̄_v − x̄); milli-units → units at the end
    joined = per_variant.crossJoin(F.broadcast(scalars))
    ybar_v = F.col("__vsy__").cast("double") / F.col("n_users").cast("double")
    xbar_v = F.col("__vsx__").cast("double") / F.col("n_users").cast("double")
    adj = ybar_v - F.col("__theta__") * (xbar_v - F.col("__xbar__"))

    def _r(col, k):
        s = float(10 ** k)
        return F.floor(col * F.lit(s) + F.lit(0.5)) / F.lit(s)

    return joined.select(
        "variant",
        "n_users",
        _r(ybar_v / 1000.0, round_to).alias("mean_post"),
        _r(adj / 1000.0, round_to).alias("mean_adjusted"),
        _r(F.col("__theta__"), 6).alias("theta"),
        _r(F.col("__vr__"), 6).alias("var_reduction"),
    )

def emd_1d(
    df: DataFrame,
    variant_col: Column,
    value_col: str,
    round_to: int = 6,
    bins: int | None = None,
    max_distinct: int | None = ECDF_DISTINCT_CAP,
) -> DataFrame:
    """1-D earth-mover's (Wasserstein-1) distance between the
    ``variant_col`` == 0 and == 1 value distributions:
    W₁ = ∫|F_a − F_b| dv = Σ |F_a(vᵢ) − F_b(vᵢ)|·(vᵢ₊₁ − vᵢ).

    Where KS reports only the WORST ECDF gap, W₁ integrates the whole
    displacement — the drift magnitude in metric units, the right
    scalar for "how far did the distribution move". Same scale shape
    as :func:`ks_2samp`: one shuffle to the distinct-value frame,
    cumulative + lead windows over that small frame, one final sum.

    SCALE CONTRACT (same as :func:`ks_2samp`): the exact path's
    ordered window is unpartitioned, so ``value_col`` must have
    bounded distinct cardinality; for continuous columns pass
    ``bins`` to pre-quantize to fixed-width bin midpoints, capping
    the window frame at ``bins`` rows (W₁ error ≤ half a bin width).
    Like :func:`ks_2samp`, the contract refuses at runtime: an eager
    distinct-cardinality probe raises ``DistinctCardinalityExceeded``
    above ``max_distinct`` unless ``bins`` is set or
    ``max_distinct=None`` opts back into the lazy plan.
    """
    _guard_ecdf_distinct(df, value_col, bins, max_distinct, "emd_1d")
    per_val = df.where(F.col(value_col).isNotNull()).select(
        _maybe_binned(df, value_col, bins).alias("__v__"),
        F.when(variant_col == 1, 1).otherwise(0).alias("__isb__"),
    ).groupBy("__v__").agg(
        F.count(F.lit(1)).alias("__t__"),
        F.sum("__isb__").alias("__tb__"),
    )
    w = (
        Window.orderBy("__v__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wfull = Window.orderBy("__v__").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wlead = Window.orderBy("__v__")
    cum = per_val.select(
        F.col("__v__").cast("double").alias("__vd__"),
        (F.sum(F.col("__t__") - F.col("__tb__")).over(w)).alias("__ca__"),
        F.sum("__tb__").over(w).alias("__cb__"),
        F.sum(F.col("__t__") - F.col("__tb__")).over(wfull).alias("__na__"),
        F.sum("__tb__").over(wfull).alias("__nb__"),
        F.lead(F.col("__v__").cast("double")).over(wlead).alias("__vn__"),
    )
    gap = F.abs(
        F.col("__ca__").cast("double") / F.col("__na__").cast("double")
        - F.col("__cb__").cast("double") / F.col("__nb__").cast("double")
    )
    term = F.when(
        F.col("__vn__").isNotNull(),
        gap * (F.col("__vn__") - F.col("__vd__")),
    ).otherwise(F.lit(0.0))
    return cum.agg(
        F.max("__na__").cast("long").alias("n_a"),
        F.max("__nb__").cast("long").alias("n_b"),
        F.round(F.sum(term), round_to).alias("emd"),
    )

def mutual_information(
    df: DataFrame,
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Mutual information I(X;Y) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y)))
    between two categorical columns, in nats, plus the normalized
    variant I/min(H(X), H(Y)) ∈ [0,1] — the information-theoretic
    dependence measure next to :func:`chi2_independence`'s frequency
    test (MI sees nonlinear association chi-squared dilutes across
    cells).

    Same plan shape as chi2_independence: one shuffle to the
    contingency cells, marginals and entropies as window sums over the
    tiny cell frame — the input scans once. ln terms are IEEE-double;
    the round contract covers cross-engine ulp noise.
    """
    cells = df.groupBy(
        F.col(x_col).alias("__x__"), F.col(y_col).alias("__y__")
    ).agg(F.count(F.lit(1)).alias("__o__"))
    wx = Window.partitionBy("__x__")
    wy = Window.partitionBy("__y__")
    wall = Window.partitionBy()
    enr = cells.select(
        "__o__",
        "__x__",
        "__y__",
        F.sum("__o__").over(wx).alias("__rt__"),
        F.sum("__o__").over(wy).alias("__ct__"),
        F.sum("__o__").over(wall).alias("__n__"),
        F.count(F.lit(1)).over(wx).alias("__cx__"),
        F.count(F.lit(1)).over(wy).alias("__cy__"),
    )
    o = F.col("__o__").cast("double")
    rt = F.col("__rt__").cast("double")
    ct = F.col("__ct__").cast("double")
    nn = F.col("__n__").cast("double")
    mi_term = (o / nn) * F.log(o * nn / (rt * ct))
    # marginal entropies: sum each marginal term once (divide the
    # per-cell contribution by the number of cells sharing it)
    hx_term = (rt / nn) * F.log(nn / rt) / F.col("__cx__").cast("double")
    hy_term = (ct / nn) * F.log(nn / ct) / F.col("__cy__").cast("double")
    agg = enr.agg(
        F.max("__n__").alias("n"),
        F.sum(mi_term).alias("__mi__"),
        F.sum(hx_term).alias("__hx__"),
        F.sum(hy_term).alias("__hy__"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.round(F.col("__mi__"), round_to).alias("mi_nats"),
        F.round(
            F.col("__mi__") / F.least(F.col("__hx__"), F.col("__hy__")),
            round_to,
        ).alias("mi_normalized"),
    )

def population_stability_index(
    df: DataFrame,
    variant_col: Column,
    value_col: str,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Population Stability Index between the ``variant_col`` == 0
    (reference) and == 1 (probe) distributions:
    PSI = Σ (pᵢ − qᵢ)·ln(pᵢ/qᵢ) over equal-width bins spanning the
    combined min/max — the industry-standard drift score (rule of
    thumb: <0.1 stable, 0.1–0.25 shifting, >0.25 drifted).

    Equal-width binning keeps the bin edges an exact arithmetic
    function of (min, max, n_bins) — no quantile estimation — so both
    engines bin identically; empty bins get the standard +0.5
    pseudo-count on BOTH sides to keep ln finite without biasing the
    direction. Plan: one min/max aggregate (1-row broadcast), one
    binned groupBy, one scalar fold. Returns one row:
    (n_ref, n_probe, psi).
    """
    base = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("double").alias("__v__"),
        F.when(variant_col == 1, 1).otherwise(0).alias("__isb__"),
    )
    rng = base.agg(
        F.min("__v__").alias("__lo__"), F.max("__v__").alias("__hi__")
    )
    binned = base.crossJoin(F.broadcast(rng)).select(
        "__isb__",
        F.least(
            F.lit(n_bins - 1),
            F.floor(
                (F.col("__v__") - F.col("__lo__"))
                / (F.col("__hi__") - F.col("__lo__"))
                * n_bins
            ).cast("int"),
        ).alias("__bin__"),
    )
    cells = binned.groupBy("__bin__").agg(
        F.sum(1 - F.col("__isb__")).alias("__a__"),
        F.sum("__isb__").alias("__b__"),
    )
    wall = Window.partitionBy()
    enr = cells.select(
        "__a__",
        "__b__",
        F.sum("__a__").over(wall).alias("__na__"),
        F.sum("__b__").over(wall).alias("__nb__"),
    )
    # +0.5 pseudo-count keeps empty bins finite (standard smoothing);
    # note bins BOTH sides miss entirely are absent from the frame,
    # contributing exactly 0 — identical on both engines
    p = (F.col("__a__").cast("double") + 0.5) / (
        F.col("__na__").cast("double") + 0.5 * n_bins
    )
    q = (F.col("__b__").cast("double") + 0.5) / (
        F.col("__nb__").cast("double") + 0.5 * n_bins
    )
    term = (p - q) * F.log(p / q)
    return enr.agg(
        F.max("__na__").cast("long").alias("n_ref"),
        F.max("__nb__").cast("long").alias("n_probe"),
        F.round(F.sum(term), round_to).alias("psi"),
    )

def trimmed_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    trim: float = 0.05,
    round_to: int = 4,
) -> DataFrame:
    """Per-group trimmed and winsorized means — the robust metric pair
    for heavy-tailed KPIs (trimming DROPS the top/bottom ``trim``
    fraction; winsorizing CLAMPS values to the surviving boundary).

    One rank window per group (tiebreak column completes a total
    order, so the dropped set is deterministic), then a single
    conditional aggregate; k = floor(n·trim) rows come off EACH end —
    integer arithmetic, identical on every engine. At scale this is
    the same shuffle the group-by already pays; nothing input-sized
    is re-sorted globally.

    Returns (group, n, n_trimmed, mean, trimmed_mean,
    winsorized_mean).
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col), F.col(tiebreak_col)
    )
    wg = Window.partitionBy(group_col)
    ranked = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col),
        F.col(value_col).cast("double").alias("__v__"),
        F.row_number().over(w).alias("__rn__"),
        F.count(F.lit(1)).over(wg).alias("__n__"),
    )
    k = F.floor(F.col("__n__") * trim).cast("long")
    lo = k + 1
    hi = F.col("__n__") - k
    kept = (F.col("__rn__") >= lo) & (F.col("__rn__") <= hi)
    # winsorize: values below the kept range clamp to the lo-rank
    # value, above to the hi-rank value — carried via window max/min
    # over the kept flag
    lo_val = F.max(F.when(F.col("__rn__") == lo, F.col("__v__"))).over(wg)
    hi_val = F.max(F.when(F.col("__rn__") == hi, F.col("__v__"))).over(wg)
    enr = ranked.select(
        F.col(group_col),
        "__v__",
        kept.alias("__kept__"),
        F.least(F.greatest(F.col("__v__"), lo_val), hi_val)
        .alias("__wv__"),
    )
    return enr.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("__kept__").cast("long")).alias("n_trimmed"),
        F.round(F.avg("__v__"), round_to).alias("mean"),
        F.round(
            F.avg(F.when(F.col("__kept__"), F.col("__v__"))), round_to
        ).alias("trimmed_mean"),
        F.round(F.avg("__wv__"), round_to).alias("winsorized_mean"),
    )


def cohens_kappa(
    df: DataFrame,
    rater_a: Column | str,
    rater_b: Column | str,
    round_to: int = 6,
) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two
    categorical labelings: κ = (p_o − p_e) / (1 − p_e), with p_o the
    observed agreement and p_e = Σ_c p_a(c)·p_b(c) the agreement two
    independent raters with these marginals would reach by luck.

    [extension] The label-quality scalar a training-data pipeline
    needs once labels come from more than one source (annotator vs
    annotator, heuristic vs model, weak supervision vs gold) — the
    natural summary on top of a confusion matrix like
    ``langid_confusion_documents``.

    Same single-pass shape as :func:`chi2_independence`: one groupBy
    over (a, b) cells, marginals as window sums over the tiny cell
    frame, then scalar arithmetic. Returns one row:
    ``n, observed_agreement, expected_agreement, kappa``.
    """
    a = F.col(rater_a) if isinstance(rater_a, str) else rater_a
    b = F.col(rater_b) if isinstance(rater_b, str) else rater_b
    cells = df.groupBy(a.alias("__a__"), b.alias("__b__")).agg(
        F.count(F.lit(1)).alias("__o__")
    )
    # p_e needs one ma(c)·mb(c) term per CATEGORY, so fold the cell
    # frame to its two marginals and inner-join on the category —
    # a category absent from either rater contributes 0, which the
    # inner join encodes for free. Both sides are category-count-sized.
    marg_a = cells.groupBy("__a__").agg(F.sum("__o__").alias("ma"))
    marg_b = cells.groupBy("__b__").agg(F.sum("__o__").alias("mb"))
    pe_frame = marg_a.join(
        marg_b, marg_a["__a__"] == marg_b["__b__"], "inner"
    ).select((F.col("ma").cast("double") * F.col("mb")).alias("__pp__"))
    n_row = cells.agg(
        F.sum("__o__").alias("n"),
        F.sum(
            F.when(F.col("__a__") == F.col("__b__"), F.col("__o__"))
            .otherwise(0)
        ).alias("agree"),
    )
    pe_row = pe_frame.agg(F.sum("__pp__").alias("pp"))
    joined = n_row.crossJoin(pe_row)
    nn = F.col("n").cast("double")
    po = F.col("agree").cast("double") / nn
    pe = F.col("pp") / (nn * nn)
    return joined.select(
        F.col("n").cast("long").alias("n"),
        F.round(po, round_to).alias("observed_agreement"),
        F.round(pe, round_to).alias("expected_agreement"),
        F.round((po - pe) / (1.0 - pe), round_to).alias("kappa"),
    )
