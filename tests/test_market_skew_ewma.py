"""Round-5 operators: association rules, EWMA smoothing, key-skew
profile — numpy/python-model tested against hand-computable inputs."""

import math

import pytest
from pyspark.sql import functions as F


def test_association_rules_exact_counts(spark):
    from mydatalake_spark.caching import release
    from mydatalake_spark.operators.market import association_rules

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"), (4, "b"),          # duplicate item in basket: collapses
        (5, "d"),
    ]
    df = spark.createDataFrame(rows, "basket int, item string")
    out = association_rules(df, "basket", "item", min_pair_count=1)
    got = {(r.item_a, r.item_b): r for r in out.collect()}
    release(out)
    # items: a in {1,2,3}, b in {1,2,4}, c in {1,3}, d in {5}; 5 baskets
    ab = got[("a", "b")]
    assert ab.n_pair == 2
    assert ab.support == 2 / 5
    assert ab.conf_a_b == 2 / 3 and ab.conf_b_a == 2 / 3
    assert ab.lift == (2 * 5) / (3 * 3)
    assert got[("a", "c")].n_pair == 2
    assert got[("b", "c")].n_pair == 1
    assert ("a", "d") not in got     # never co-occurs


def test_association_rules_max_basket_cap(spark):
    from mydatalake_spark.caching import release
    from mydatalake_spark.operators.market import association_rules

    wide = [(1, f"i{k}") for k in range(20)] + [(2, "i0"), (2, "i1")]
    df = spark.createDataFrame(wide, "basket int, item string")
    out = association_rules(df, "basket", "item",
                            min_pair_count=1, max_basket=5)
    got = {(r.item_a, r.item_b): r.n_pair for r in out.collect()}
    release(out)
    # basket 1 (20 items) is dropped entirely; only basket 2 pairs
    assert got == {("i0", "i1"): 1}


def test_ewma_smoothed_matches_python_model(spark):
    from mydatalake_spark.operators.timeseries import ewma_smoothed

    vals = [10.0, 0.0, 4.0, 8.0, 2.0]
    rows = [("g", f"2024-01-0{i+1}", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "g string, day string, total double"
    ).select("g", F.col("day").cast("date").alias("day"), "total")
    out = {
        r.day.day: r.ewma
        for r in ewma_smoothed(df, "g", "day", "total",
                               window_days=3).collect()
    }

    def model(t):          # taps d=0..2, weight 2^-d, renormalized
        taps = [(d, vals[t - d]) for d in range(3) if t - d >= 0]
        num = sum(v * 0.5 ** d for d, v in taps)
        den = sum(0.5 ** d for d, _ in taps)
        return num / den

    for t in range(5):
        assert out[t + 1] == pytest.approx(model(t), rel=1e-12), t


def test_key_skew_profile_uniform_and_hot(spark):
    from mydatalake_spark.operators.profile import key_skew_profile

    uniform = spark.range(0, 1000).selectExpr("id % 10 AS k")
    u = key_skew_profile(uniform, "k", top_n=3).collect()[0]
    assert u.n_rows == 1000 and u.n_keys == 10
    assert u.top1_share == 0.1 and u.topn_share == pytest.approx(0.3)
    assert u.max_over_mean == pytest.approx(1.0)
    assert u.gini == pytest.approx(0.0)

    hot = spark.range(0, 1000).selectExpr(
        "CASE WHEN id < 910 THEN 0 ELSE 1 + id % 9 END AS k"
    )
    h = key_skew_profile(hot, "k", top_n=3).collect()[0]
    assert h.top1_share == pytest.approx(0.91)
    assert h.n_keys == 10
    assert h.max_over_mean == pytest.approx(910 / 100)
    assert h.gini > 0.7
