"""snapshot_diff: keyed reconciliation between table versions."""

import pytest

from mydatalake_spark.operators.diff import snapshot_diff


def _pair(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (3, "c", None),
            (4, "d", 40.0),
        ],
        "k bigint, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),        # unchanged → omitted
            (2, "B", 21.0),        # both columns changed
            (3, "c", None),        # null == null → unchanged
            (5, "e", 50.0),        # insert
        ],
        "k bigint, s string, v double",
    )
    return old, new


def test_snapshot_diff_ops_and_changed_cols(spark):
    old, new = _pair(spark)
    got = {
        r.k: (r.op, list(r.changed_cols))
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {
        2: ("update", ["s", "v"]),
        4: ("delete", []),
        5: ("insert", []),
    }


def test_snapshot_diff_null_transitions_are_changes(spark):
    old = spark.createDataFrame([(1, None), (2, 5.0)], "k bigint, v double")
    new = spark.createDataFrame([(1, 3.0), (2, None)], "k bigint, v double")
    got = {
        r.k: (r.op, list(r.changed_cols))
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {1: ("update", ["v"]), 2: ("update", ["v"])}


def test_snapshot_diff_compare_cols_prunes(spark):
    old, new = _pair(spark)
    got = {
        r.k: (r.op, list(r.changed_cols))
        for r in snapshot_diff(old, new, ["k"], compare_cols=["s"]).collect()
    }
    # v-only changes invisible when comparing s alone; k=2 still differs
    assert got == {2: ("update", ["s"]), 4: ("delete", []), 5: ("insert", [])}


def test_snapshot_diff_rejects_missing_compare_col(spark):
    old, new = _pair(spark)
    with pytest.raises(ValueError, match="absent"):
        snapshot_diff(old, new.drop("v"), ["k"], compare_cols=["v"])


def test_snapshot_diff_identical_snapshots_empty(spark):
    old, _ = _pair(spark)
    assert snapshot_diff(old, old, ["k"]).count() == 0


def test_snapshot_diff_null_keys_match_null_safely(spark):
    """r4 advice regression: NULL-keyed rows must diff as
    update/unchanged via the null-safe key join — not surface as a
    spurious delete+insert pair."""
    old = spark.createDataFrame(
        [(None, 1.0), (1, 5.0)], "k int, v double"
    )
    new = spark.createDataFrame(
        [(None, 2.0), (1, 5.0)], "k int, v double"
    )
    got = {
        (r.k, r.op, tuple(r.changed_cols))
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    # the NULL-keyed row changed value → ONE update; row k=1 unchanged
    assert got == {(None, "update", ("v",))}


def test_apply_snapshot_diff_replays_null_keyed_changes(spark):
    from mydatalake_spark.operators.diff import apply_snapshot_diff

    old = spark.createDataFrame(
        [(None, 1.0), (1, 5.0), (2, 7.0)], "k int, v double"
    )
    new = spark.createDataFrame(
        [(None, 2.0), (1, 5.0)], "k int, v double"
    )
    d = snapshot_diff(old, new, ["k"], include_new_values=True)
    rebuilt = apply_snapshot_diff(old, d, ["k"])
    assert sorted(
        ((r.k, r.v) for r in rebuilt.collect()),
        key=lambda t: (t[0] is None, t[0]),
    ) == [(1, 5.0), (None, 2.0)]
