"""welch_ttest / transition_matrix / top_paths."""

import math

from pyspark.sql import functions as F

from mydatalake_spark.functions.stats import welch_ttest
from mydatalake_spark.operators.sequences import top_paths, transition_matrix


def test_welch_ttest_matches_closed_form(spark):
    a = [1.0, 2.0, 3.0, 4.0]
    b = [2.0, 4.0, 6.0]
    df = spark.createDataFrame(
        [(0, v) for v in a] + [(1, v) for v in b], "variant int, v double"
    )
    row = welch_ttest(df, F.col("variant"), "v", round_to=6).collect()[0]
    ma, mb = sum(a) / 4, sum(b) / 3
    sa = sum((x - ma) ** 2 for x in a) / 3
    sb = sum((x - mb) ** 2 for x in b) / 2
    se2 = sa / 4 + sb / 3
    t = (mb - ma) / math.sqrt(se2)
    dof = se2**2 / ((sa / 4) ** 2 / 3 + (sb / 3) ** 2 / 2)
    assert (row.n_a, row.n_b) == (4, 3)
    assert row.mean_a == round(ma, 6) and row.mean_b == round(mb, 6)
    assert row.t_stat == round(t, 6)
    assert row.welch_df == round(dof, 6)


def test_welch_ttest_excludes_null_metric_rows(spark):
    df = spark.createDataFrame(
        [(0, 1.0), (0, None), (1, 2.0), (1, 3.0), (1, None)],
        "variant int, v double",
    )
    row = welch_ttest(df, F.col("variant"), "v").collect()[0]
    assert (row.n_a, row.n_b) == (1, 2)


def test_transition_matrix_counts_and_rowwise_probabilities(spark):
    # user 1: A B A B ; user 2: A B B
    rows = [
        (1, 1, "A"), (1, 2, "B"), (1, 3, "A"), (1, 4, "B"),
        (2, 1, "A"), (2, 2, "B"), (2, 3, "B"),
    ]
    df = spark.createDataFrame(rows, "u int, seq int, s string")
    got = {
        (r.prev_state, r.next_state): (r.n, r.p)
        for r in transition_matrix(df, "u", ["seq"], "s").collect()
    }
    # transitions: A->B x3, B->A x1, B->B x1
    assert got == {
        ("A", "B"): (3, 1.0),
        ("B", "A"): (1, 0.5),
        ("B", "B"): (1, 0.5),
    }


def test_transition_matrix_never_crosses_keys(spark):
    df = spark.createDataFrame(
        [(1, 1, "A"), (2, 2, "B")], "u int, seq int, s string"
    )
    assert transition_matrix(df, "u", ["seq"], "s").count() == 0


def test_top_paths_truncates_ranks_and_breaks_ties_by_path(spark):
    rows = (
        [(u, i, s) for u in (1, 2) for i, s in enumerate("ABCDEFG")]
        + [(3, 0, "Z"), (3, 1, "Z")]
        + [(4, 0, "A"), (4, 1, "A")]
    )
    df = spark.createDataFrame(rows, "u int, seq int, s string")
    got = [
        (r.path, r.n_keys, r.rank)
        for r in top_paths(df, "u", ["seq"], "s", max_steps=5, k=2)
        .orderBy("rank")
        .collect()
    ]
    # users 1,2 share the truncated 5-step path; A>A before Z>Z on tie
    assert got == [("A>B>C>D>E", 2, 1), ("A>A", 1, 2)]


def test_top_paths_order_is_data_not_arrival(spark):
    # rows arrive shuffled; the struct sort must reconstruct seq order
    rows = [(1, 3, "C"), (1, 1, "A"), (1, 2, "B")]
    df = spark.createDataFrame(rows, "u int, seq int, s string").repartition(4)
    got = top_paths(df, "u", ["seq"], "s", max_steps=5, k=1).collect()
    assert [(r.path, r.n_keys, r.rank) for r in got] == [("A>B>C", 1, 1)]


def test_poisson_weights_distribution_and_determinism(spark):
    from mydatalake_spark.functions.stats import poisson_weight

    df = spark.range(20000).select(
        poisson_weight(F.concat_ws("#", F.lit("s"), F.col("id").cast("string")))
        .alias("w")
    )
    stats = df.agg(
        F.avg("w").alias("mean"), F.var_samp("w").alias("var")
    ).collect()[0]
    # Poisson(1): mean ≈ 1, variance ≈ 1 (truncation at 6 shaves ~1e-4)
    assert abs(stats.mean - 1.0) < 0.03
    assert abs(stats.var - 1.0) < 0.06
    # deterministic: same keys → same weights
    again = spark.range(20000).select(
        poisson_weight(F.concat_ws("#", F.lit("s"), F.col("id").cast("string")))
        .alias("w")
    )
    assert df.exceptAll(again).count() == 0


def test_bootstrap_ci_covers_true_mean_on_synthetic(spark):
    from mydatalake_spark.functions.stats import poisson_bootstrap_ci

    # 5000 iid uniform(0, 100): mean 50, se ≈ 29/√5000 ≈ 0.41
    df = spark.range(5000).select(
        F.col("id").alias("rid"),
        (F.pmod(F.xxhash64(F.col("id")), 10000) / 100.0).alias("v"),
    )
    row = poisson_bootstrap_ci(df, "rid", "v", n_resamples=20).collect()[0]
    assert row.n == 5000
    assert row.ci_lo < row.mean < row.ci_hi
    assert 0.1 < row.boot_se < 1.5  # right order of magnitude
    assert row.ci_lo < 50.5 < row.ci_hi or abs(row.mean - 50) < 3


def test_bootstrap_grouped_matches_per_group_ungrouped(spark):
    from mydatalake_spark.functions.stats import poisson_bootstrap_ci

    df = spark.range(2000).select(
        F.col("id").alias("rid"),
        (F.col("id") % 2).cast("string").alias("g"),
        (F.pmod(F.xxhash64(F.col("id")), 1000) / 10.0).alias("v"),
    )
    grouped = {
        r.g: (r.n, r.mean, r.boot_se, r.ci_lo, r.ci_hi)
        for r in poisson_bootstrap_ci(
            df, "rid", "v", group_by=["g"]
        ).collect()
    }
    for g in ("0", "1"):
        solo = poisson_bootstrap_ci(
            df.where(F.col("g") == g), "rid", "v"
        ).collect()[0]
        # same ids → same deterministic weights → identical CI
        assert grouped[g] == (
            solo.n, solo.mean, solo.boot_se, solo.ci_lo, solo.ci_hi
        )


def test_gini_known_distributions_and_numpy_model(spark):
    import numpy as np

    from mydatalake_spark.functions.stats import gini_coefficient

    def gini_of(values):
        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(values)], "k long, v double"
        )
        row = gini_coefficient(df, "v", "k").collect()[0]
        return row.n, row.gini

    # perfect equality → 0
    assert gini_of([5.0] * 10) == (10, 0.0)
    # one holder of everything → (n-1)/n
    n, g = gini_of([0.0] * 9 + [100.0])
    assert (n, g) == (10, 0.9)
    # arbitrary sample matches the numpy mean-absolute-difference model
    rng = np.random.RandomState(3)
    vals = rng.gamma(2.0, 10.0, size=50)
    _, got = gini_of(vals)
    mad = np.abs(vals[:, None] - vals[None, :]).mean()
    expect = mad / (2 * vals.mean())
    # sort-formula Gini == MAD/2μ exactly (up to rounding)
    assert abs(got - round(expect * 50 / 50, 6)) < 2e-6

def test_mann_whitney_matches_numpy_model(spark):
    """U, tie-corrected z, and rank-biserial vs a direct numpy
    midrank implementation (the scipy formulas)."""
    import numpy as np
    from mydatalake_spark.functions.stats import mann_whitney_u

    rng = np.random.default_rng(7)
    a = np.round(rng.normal(10, 2, 40), 1)
    b = np.round(rng.normal(11, 2, 35), 1)
    rows = [(0, float(v)) for v in a] + [(1, float(v)) for v in b]
    df = spark.createDataFrame(rows, "variant int, v double")
    row = mann_whitney_u(df, F.col("variant"), "v", round_to=6).collect()[0]

    allv = np.concatenate([a, b])
    order = np.argsort(allv, kind="stable")
    ranks = np.empty(len(allv))
    # midranks
    sv = allv[order]
    r = np.arange(1, len(allv) + 1, dtype=float)
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        r[i:j + 1] = (i + 1 + j + 1) / 2.0
        i = j + 1
    ranks[order] = r
    rb = ranks[len(a):].sum()
    nb, na, n = float(len(b)), float(len(a)), float(len(allv))
    u = rb - nb * (nb + 1) / 2.0
    _, counts = np.unique(allv, return_counts=True)
    ties = float((counts ** 3 - counts).sum())
    sigma2 = na * nb / 12.0 * ((n + 1.0) - ties / (n * (n - 1.0)))
    z = (u - na * nb / 2.0) / np.sqrt(sigma2)
    assert row.n_a == 40 and row.n_b == 35
    assert row.u_stat == round(u, 1)
    assert abs(row.z_stat - z) < 1e-4
    assert abs(row.rank_biserial - (2.0 * u / (na * nb) - 1.0)) < 1e-4


def test_mann_whitney_symmetric_under_label_swap(spark):
    from mydatalake_spark.functions.stats import mann_whitney_u

    rows = [(0, 1.0), (0, 2.0), (0, 5.0), (1, 3.0), (1, 4.0), (1, 9.0)]
    df = spark.createDataFrame(rows, "variant int, v double")
    z1 = mann_whitney_u(df, F.col("variant"), "v").collect()[0]
    z2 = mann_whitney_u(df, 1 - F.col("variant"), "v").collect()[0]
    assert z1.z_stat == -z2.z_stat
    assert z1.rank_biserial == -z2.rank_biserial


def test_ks_2samp_matches_numpy_ecdf(spark):
    import numpy as np
    from mydatalake_spark.functions.stats import ks_2samp

    rng = np.random.default_rng(11)
    a = np.round(rng.normal(0, 1, 50), 2)
    b = np.round(rng.normal(0.7, 1, 45), 2)
    rows = [(0, float(v)) for v in a] + [(1, float(v)) for v in b]
    df = spark.createDataFrame(rows, "variant int, v double")
    row = ks_2samp(df, F.col("variant"), "v", round_to=6).collect()[0]

    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), grid, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), grid, side="right") / len(b)
    d = np.abs(fa - fb).max()
    assert row.n_a == 50 and row.n_b == 45
    assert abs(row.d_stat - d) < 1e-6
    assert abs(
        row.ks_scaled - d * np.sqrt(50 * 45 / 95.0)
    ) < 1e-5


def test_chi2_independence_perfect_and_independent(spark):
    from mydatalake_spark.functions.stats import chi2_independence

    # perfectly dependent: x determines y -> V = 1
    dep = spark.createDataFrame(
        [("a", "p")] * 10 + [("b", "q")] * 10, "x string, y string"
    )
    r = chi2_independence(dep, "x", "y").collect()[0]
    assert r.n == 20 and r.dof == 1
    assert r.cramers_v == 1.0
    assert r.chi2 == 20.0

    # exactly independent margins -> chi2 = 0
    ind = spark.createDataFrame(
        [("a", "p")] * 6 + [("a", "q")] * 2
        + [("b", "p")] * 3 + [("b", "q")] * 1,
        "x string, y string",
    )
    r2 = chi2_independence(ind, "x", "y").collect()[0]
    assert r2.chi2 == 0.0 and r2.cramers_v == 0.0


def test_chi2_matches_numpy_model(spark):
    import numpy as np
    from mydatalake_spark.functions.stats import chi2_independence

    rng = np.random.default_rng(3)
    xs = rng.choice(["a", "b", "c"], 200)
    ys = rng.choice(["p", "q"], 200)
    df = spark.createDataFrame(
        [(str(x), str(y)) for x, y in zip(xs, ys)], "x string, y string"
    )
    row = chi2_independence(df, "x", "y").collect()[0]
    cats_x = sorted(set(xs)); cats_y = sorted(set(ys))
    obs = np.array([[np.sum((xs == cx) & (ys == cy)) for cy in cats_y]
                    for cx in cats_x], dtype=float)
    exp = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / obs.sum()
    chi2 = ((obs - exp) ** 2 / exp).sum()
    assert row.dof == (len(cats_x) - 1) * (len(cats_y) - 1)
    assert abs(row.chi2 - chi2) < 1e-3
    v = np.sqrt(chi2 / (obs.sum() * (min(len(cats_x), len(cats_y)) - 1)))
    assert abs(row.cramers_v - v) < 1e-4


def test_theil_sen_robust_to_outlier(spark):
    from mydatalake_spark.functions.stats import theil_sen_trend

    # y = 2x + noiseless, with one wild outlier that wrecks OLS
    rows = [(1, float(x), 2.0 * x) for x in range(10)]
    rows[5] = (1, 5.0, 1000.0)
    # group 2: below min_points
    rows += [(2, 0.0, 0.0), (2, 1.0, 5.0)]
    df = spark.createDataFrame(rows, "g int, x double, y double")
    out = theil_sen_trend(
        df, "g", F.col("x"), F.col("y"), min_points=3
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.g == 1 and r.n_points == 10 and r.n_pairs == 45
    assert r.ts_slope == 2.0

def test_cuped_reduces_variance_on_correlated_metric(spark):
    """Synthetic experiment where post = pre + effect + noise: theta
    near 1, variance reduction substantial, adjusted lift preserved."""
    import numpy as np
    from mydatalake_spark.functions.stats import cuped_adjusted

    rng = np.random.default_rng(13)
    rows = []
    for u in range(200):
        base = float(rng.normal(100, 20))
        effect = 5.0 if u % 2 == 1 else 0.0
        for d in range(3):          # pre period
            rows.append((u, f"2024-01-0{d+1} 00:00:00",
                         base + float(rng.normal(0, 2))))
        for d in range(3):          # post period
            rows.append((u, f"2024-01-2{d+1} 00:00:00",
                         base + effect + float(rng.normal(0, 2))))
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, value double"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "value")
    out = {r.variant: r for r in cuped_adjusted(
        df, "user_id", F.col("user_id") % 2, "value", "ts",
        "2024-01-15").collect()}
    assert set(out) == {0, 1}
    r0, r1 = out[0], out[1]
    # covariate explains most of the metric variance
    assert r0.var_reduction > 0.9
    assert 0.9 < r0.theta < 1.1
    # the true +5 lift survives adjustment (and tightens toward it)
    raw_lift = r1.mean_post - r0.mean_post
    adj_lift = r1.mean_adjusted - r0.mean_adjusted
    assert abs(adj_lift - 5.0) < 1.0
    assert abs(adj_lift - 5.0) <= abs(raw_lift - 5.0) + 0.5


def test_cuped_requires_both_periods(spark):
    from mydatalake_spark.functions.stats import cuped_adjusted

    rows = [
        (1, "2024-01-01 00:00:00", 10.0),   # pre only -> dropped
        (2, "2024-01-20 00:00:00", 20.0),   # post only -> dropped
        (3, "2024-01-01 00:00:00", 30.0),
        (3, "2024-01-20 00:00:00", 31.0),
        (4, "2024-01-02 00:00:00", 40.0),
        (4, "2024-01-21 00:00:00", 39.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, value double"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "value")
    out = cuped_adjusted(
        df, "user_id", F.col("user_id") % 2, "value", "ts",
        "2024-01-15").collect()
    assert sum(r.n_users for r in out) == 2

def test_emd_1d_matches_scipy_style_model(spark):
    """W1 equals the mean-shift for a pure translation, and matches a
    numpy ECDF-integral on random data."""
    import numpy as np
    from mydatalake_spark.functions.stats import emd_1d

    # pure translation: W1(a, a + c) = c
    a = [1.0, 2.0, 3.0, 4.0]
    b = [v + 2.5 for v in a]
    rows = [(0, v) for v in a] + [(1, v) for v in b]
    df = spark.createDataFrame(rows, "variant int, v double")
    r = emd_1d(df, F.col("variant"), "v").collect()[0]
    assert r.emd == 2.5

    rng = np.random.default_rng(23)
    x = np.round(rng.normal(0, 1, 60), 2)
    y = np.round(rng.normal(0.5, 1.5, 50), 2)
    rows = [(0, float(v)) for v in x] + [(1, float(v)) for v in y]
    df2 = spark.createDataFrame(rows, "variant int, v double")
    r2 = emd_1d(df2, F.col("variant"), "v").collect()[0]
    grid = np.unique(np.concatenate([x, y]))
    fa = np.searchsorted(np.sort(x), grid, side="right") / len(x)
    fb = np.searchsorted(np.sort(y), grid, side="right") / len(y)
    w1 = float(np.sum(np.abs(fa[:-1] - fb[:-1]) * np.diff(grid)))
    assert abs(r2.emd - w1) < 1e-6

def test_grouped_mann_whitney_isolates_groups(spark):
    """A grouped run must equal per-group standalone runs — no rank
    leakage across the partition key."""
    from mydatalake_spark.functions.stats import mann_whitney_u

    rows = (
        [("m1", 0, float(v)) for v in (1, 2, 3, 4)]
        + [("m1", 1, float(v)) for v in (5, 6, 7, 8)]
        + [("m2", 0, float(v)) for v in (10, 20)]
        + [("m2", 1, float(v)) for v in (5, 15, 25)]
    )
    df = spark.createDataFrame(rows, "metric string, variant int, v double")
    grouped = {
        r.metric: r
        for r in mann_whitney_u(
            df, F.col("variant"), "v", group_by="metric"
        ).collect()
    }
    for m in ("m1", "m2"):
        solo = mann_whitney_u(
            df.where(F.col("metric") == m), F.col("variant"), "v"
        ).collect()[0]
        g = grouped[m]
        assert (g.n_a, g.n_b, g.u_stat, g.z_stat, g.rank_biserial) == (
            solo.n_a, solo.n_b, solo.u_stat, solo.z_stat,
            solo.rank_biserial,
        )

def test_mutual_information_known_cases(spark):
    import math
    from mydatalake_spark.functions.stats import mutual_information

    # perfect dependence: MI = H(X) = ln 2, normalized = 1
    dep = spark.createDataFrame(
        [("a", "p")] * 8 + [("b", "q")] * 8, "x string, y string"
    )
    r = mutual_information(dep, "x", "y").collect()[0]
    assert abs(r.mi_nats - math.log(2)) < 1e-6
    assert r.mi_normalized == 1.0

    # exact independence: MI = 0
    ind = spark.createDataFrame(
        [("a", "p")] * 6 + [("a", "q")] * 2
        + [("b", "p")] * 3 + [("b", "q")] * 1,
        "x string, y string",
    )
    r2 = mutual_information(ind, "x", "y").collect()[0]
    assert r2.mi_nats == 0.0 and r2.mi_normalized == 0.0


def test_psi_stable_vs_shifted(spark):
    from mydatalake_spark.functions.stats import (
        population_stability_index,
    )

    same = [(0, float(v)) for v in range(100)] + [
        (1, float(v)) for v in range(100)
    ]
    r = population_stability_index(
        spark.createDataFrame(same, "g int, v double"),
        F.col("g"), "v",
    ).collect()[0]
    assert r.psi < 0.01 and r.n_ref == 100 and r.n_probe == 100

    shifted = [(0, float(v)) for v in range(100)] + [
        (1, 1000.0 + v) for v in range(100)
    ]
    r2 = population_stability_index(
        spark.createDataFrame(shifted, "g int, v double"),
        F.col("g"), "v",
    ).collect()[0]
    assert r2.psi > 0.25

def test_trimmed_stats_drops_outliers_symmetrically(spark):
    from mydatalake_spark.functions.stats import trimmed_stats

    # 20 clean values 1..20 plus outliers at both ends
    rows = [("g", float(v), v) for v in range(1, 21)]
    rows += [("g", -1000.0, 100), ("g", 1000.0, 101)]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    r = trimmed_stats(df, "g", "v", "id", trim=0.05).collect()[0]
    # n=22, k=floor(22*0.05)=1: exactly the two outliers drop
    assert r.n == 22 and r.n_trimmed == 20
    assert r.trimmed_mean == 10.5
    # winsorized: outliers clamp to 1 and 20
    assert r.winsorized_mean == round((sum(range(1, 21)) + 1 + 20) / 22, 4)
    # raw mean is polluted
    assert r.mean == round((sum(range(1, 21))) / 22, 4)

def test_cusum_locates_injected_level_shift(spark):
    """A clean level shift at day 30 must put the CUSUM peak exactly
    at the break (query-shape mirror of the registry entry)."""
    rows = [(f"2024-01-{d:02d}" if d <= 31 else f"2024-02-{d-31:02d}",
             100.0 if d <= 30 else 200.0) for d in range(1, 61)]
    df = spark.createDataFrame(rows, "ds string, o_totalprice double") \
        .select(F.col("ds").cast("date").alias("o_orderdate"),
                "o_totalprice")
    daily = df.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)))
        .alias("c"))
    from pyspark.sql import Window
    w = Window.orderBy("d")
    wall = Window.partitionBy()
    cur = daily.select(
        "d", F.row_number().over(w).alias("t"),
        F.sum("c").over(w.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)).alias("cum"),
        F.sum("c").over(wall).alias("tot"),
        F.count(F.lit(1)).over(wall).alias("n"))
    s = (F.col("cum").cast("double")
         - F.col("t").cast("double")
         * (F.col("tot").cast("double") / F.col("n").cast("double")))
    peak = cur.select("d", F.abs(s).alias("a")) \
        .orderBy(F.col("a").desc(), "d").first()
    assert str(peak.d) == "2024-01-30"


def test_ks_emd_binned_path_close_to_exact(spark):
    """The bins= pre-quantization (ADVICE r5: continuous columns make
    the distinct frame ~row-sized) must stay within the documented
    error bounds of the exact statistic: |D_binned - D| ≲ 2/bins and
    |W1_binned - W1| ≤ half a bin width."""
    import random

    from pyspark.sql import functions as F

    from mydatalake_spark.functions.stats import emd_1d, ks_2samp

    rng = random.Random(99)
    rows = [(i % 2, rng.gauss(0.0, 1.0) + 0.3 * (i % 2))
            for i in range(4000)]
    df = spark.createDataFrame(rows, "variant int, v double")

    ks_exact = ks_2samp(df, F.col("variant"), "v").first()
    ks_binned = ks_2samp(df, F.col("variant"), "v", bins=500).first()
    assert ks_binned.n_a == ks_exact.n_a and ks_binned.n_b == ks_exact.n_b
    assert abs(ks_binned.d_stat - ks_exact.d_stat) < 0.01

    emd_exact = emd_1d(df, F.col("variant"), "v").first().emd
    span = 8.0  # ~±4σ; half a bin width at 500 bins ≪ 0.02
    emd_binned = emd_1d(df, F.col("variant"), "v", bins=500).first().emd
    assert abs(emd_binned - emd_exact) < span / 500

    # binned distinct frame really is capped at `bins` rows
    from mydatalake_spark.functions.stats import _maybe_binned
    n_distinct = (
        df.select(_maybe_binned(df, "v", 500).alias("b"))
        .distinct().count()
    )
    assert n_distinct <= 500


def test_theil_sen_refuses_hot_group(spark):
    """The bounded-groups contract is enforced: a group over
    max_group_size refuses BEFORE the pair join with the offending key
    in the message; compliant inputs are unchanged and None disables
    the probe (double opt-in for pre-bounded callers)."""
    import pytest

    from mydatalake_spark.functions.stats import theil_sen_trend
    from mydatalake_spark.operators.guards import GroupSizeExceeded

    rows = [(1, float(x), 2.0 * x) for x in range(30)]
    df = spark.createDataFrame(rows, "g int, x double, y double")
    with pytest.raises(GroupSizeExceeded, match="theil_sen_trend"):
        theil_sen_trend(
            df, "g", F.col("x"), F.col("y"), max_group_size=10
        )
    out = theil_sen_trend(
        df, "g", F.col("x"), F.col("y"), max_group_size=100
    ).collect()
    assert len(out) == 1 and out[0].ts_slope == 2.0
    out2 = theil_sen_trend(
        df, "g", F.col("x"), F.col("y"), max_group_size=None
    ).collect()
    assert out2[0].ts_slope == 2.0


def test_ks_emd_refuse_unbounded_distinct(spark):
    """ks_2samp/emd_1d's exact path serializes the distinct-value
    frame through ONE unpartitioned window task, so the bounded-
    distinct contract must refuse a distinct≈rows input — and stand
    down when bins= caps the frame or max_distinct=None opts into
    the lazy plan."""
    import pytest

    from mydatalake_spark.functions.stats import emd_1d, ks_2samp
    from mydatalake_spark.operators.guards import DistinctCardinalityExceeded

    rows = [(i % 2, i + i / 7919.0) for i in range(4000)]
    df = spark.createDataFrame(rows, "variant int, v double")
    with pytest.raises(DistinctCardinalityExceeded, match="ks_2samp"):
        ks_2samp(df, F.col("variant"), "v", max_distinct=1000)
    with pytest.raises(DistinctCardinalityExceeded, match="bins="):
        emd_1d(df, F.col("variant"), "v", max_distinct=1000)
    # bins= escape hatch: probe skipped, plan bounded, runs fine
    assert ks_2samp(
        df, F.col("variant"), "v", bins=100, max_distinct=1000
    ).first()["d_stat"] is not None
    # None escape hatch: fully lazy plan, no probe job
    assert emd_1d(
        df, F.col("variant"), "v", max_distinct=None
    ).first()["emd"] is not None
    # compliant input under the cap: unchanged
    small = spark.createDataFrame(
        [(i % 2, float(i % 50)) for i in range(400)], "variant int, v double"
    )
    assert ks_2samp(small, F.col("variant"), "v", max_distinct=1000).first()[
        "n_a"
    ] == 200


def test_bounded_groups_probe_ignores_null_keys(spark):
    """A hot NULL-key group must not refuse: the protected pair
    stages equi-join on the key and never build null-key pairs."""
    from mydatalake_spark.operators.guards import assert_bounded_groups

    rows = [(None, i) for i in range(500)] + [(1, 1), (1, 2)]
    df = spark.createDataFrame(rows, "g int, v int")
    # 500 null-key rows >> cap, but they are invisible to an equi-join
    assert_bounded_groups(df, ["g"], 10, "op", "remediate")
