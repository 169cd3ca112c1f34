"""Row-level DELETE/UPDATE DML (operators/dml.py): Delta DML parity on
the versioned parquet catalog — copy-on-write, partition-pruned,
version-composable, ANSI ternary WHERE semantics."""

import os

import pytest
from pyspark.sql import functions as F

from mydatalake_spark.catalog import Catalog, _leaf_partition_files
from mydatalake_spark.operators.dml import delete_where, update_where

TBL = "silver.sales.orders"


def _seed(spark, cat, partitioned=False):
    df = spark.createDataFrame(
        [
            (1, "EU", 10.0, "x"),
            (2, "EU", 20.0, None),
            (3, "US", 30.0, "x"),
            (4, "US", 40.0, "y"),
            (5, "AP", 50.0, "x"),
        ],
        "id int, region string, amount double, tag string",
    )
    cat.overwrite(df, TBL, partition_by=["region"] if partitioned else None)
    return df


def test_delete_whole_table(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"), keep_versions=2)
    _seed(spark, cat)
    n = delete_where(cat, TBL, "amount >= 30")
    assert n == 3
    assert sorted(r.id for r in cat.read(TBL).collect()) == [1, 2]
    # versioned: the pre-state is retained and time travel composes
    assert cat.read_version(TBL, version=cat.versions(TBL)[-1]).count() == 5


def test_delete_null_condition_rows_survive(spark, tmp_path):
    # ANSI WHERE: tag = 'x' is NULL for id=2 → row KEPT, not deleted
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat)
    n = delete_where(cat, TBL, "tag = 'x'")
    assert n == 3
    assert sorted(r.id for r in cat.read(TBL).collect()) == [2, 4]


def test_delete_zero_matches_is_versionless_noop(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"), keep_versions=2)
    _seed(spark, cat)
    before = cat.versions(TBL)
    assert delete_where(cat, TBL, "amount > 1000") == 0
    assert cat.versions(TBL) == before
    assert cat.read(TBL).count() == 5


def test_delete_everything_refused(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat)
    with pytest.raises(ValueError, match="truncate"):
        delete_where(cat, TBL, "amount > 0")
    assert cat.read(TBL).count() == 5


def test_delete_partitioned_prunes_and_empties_leaf(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat, partitioned=True)
    root = cat.path(TBL)
    before = _leaf_partition_files(root, ["region"])
    # AP leaf fully matched → removed; EU partially; US untouched
    n = delete_where(
        cat, TBL, "region = 'AP' OR id = 1", partition_cols=["region"]
    )
    assert n == 2
    after = _leaf_partition_files(root, ["region"])
    assert ("AP",) not in after  # emptied leaf directory removed
    # untouched leaf: never read, never rewritten — same inodes
    assert after[("US",)] == before[("US",)]
    assert after[("EU",)] != before[("EU",)]
    assert sorted(r.id for r in cat.read(TBL).collect()) == [2, 3, 4]


def test_delete_partitioned_checkpoints_pre_state(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"), keep_versions=2)
    _seed(spark, cat, partitioned=True)
    delete_where(cat, TBL, "id = 3", partition_cols=["region"])
    vs = cat.versions(TBL)
    assert len(vs) == 1
    assert cat.read_version(TBL, version=vs[-1]).count() == 5
    assert cat.read(TBL).count() == 4


def test_delete_partitioned_emptying_all_leaves_refused(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat, partitioned=True)
    with pytest.raises(ValueError, match="truncate"):
        delete_where(cat, TBL, "id <= 5", partition_cols=["region"])
    assert cat.read(TBL).count() == 5  # refused BEFORE any mutation


def test_delete_probe_refuses_high_cardinality_column(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat, partitioned=True)
    with pytest.raises(ValueError, match="max_partitions"):
        delete_where(
            cat, TBL, "amount > 0",
            partition_cols=["region"], max_partitions=2,
        )


def test_update_whole_table_preimage_semantics(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat)
    # both SETs read the PRE-update row: amount uses original tag rule
    n = update_where(
        cat, TBL,
        {"amount": "amount * 2", "tag": "upper(tag)"},
        F.col("region") == "EU",
    )
    assert n == 2
    got = {r.id: (r.amount, r.tag) for r in cat.read(TBL).collect()}
    assert got[1] == (20.0, "X")
    assert got[2] == (40.0, None)  # upper(NULL) stays NULL
    assert got[3] == (30.0, "x")  # unmatched row untouched


def test_update_null_condition_rows_unmodified(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat)
    n = update_where(cat, TBL, {"amount": "0.0"}, "tag = 'x'")
    assert n == 3
    got = {r.id: r.amount for r in cat.read(TBL).collect()}
    assert got[2] == 20.0 and got[4] == 40.0  # NULL / false → kept


def test_update_swap_does_not_chain(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([(1, 10.0, 99.0)], "id int, a double, b double")
    cat.overwrite(df, TBL)
    update_where(cat, TBL, {"a": "b", "b": "a"}, "id = 1")
    row = cat.read(TBL).first()
    assert (row.a, row.b) == (99.0, 10.0)


def test_update_unknown_column_refused(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat)
    with pytest.raises(ValueError, match="cannot add columns"):
        update_where(cat, TBL, {"nope": "1"}, "id = 1")


def test_update_partitioned_prunes_untouched_leaves(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"), keep_versions=2)
    _seed(spark, cat, partitioned=True)
    root = cat.path(TBL)
    before = _leaf_partition_files(root, ["region"])
    n = update_where(
        cat, TBL, {"amount": "amount + 1"},
        "region = 'EU'", partition_cols=["region"],
    )
    assert n == 2
    after = _leaf_partition_files(root, ["region"])
    assert after[("US",)] == before[("US",)]
    assert after[("AP",)] == before[("AP",)]
    got = {r.id: r.amount for r in cat.read(TBL).collect()}
    assert got == {1: 11.0, 2: 21.0, 3: 30.0, 4: 40.0, 5: 50.0}
    # in-place mutation checkpointed the pre-state as a version
    assert cat.read_version(TBL, version=cat.versions(TBL)[-1]).where(
        "id = 1"
    ).first().amount == 10.0


def test_update_partition_column_assignment_refused(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat, partitioned=True)
    with pytest.raises(ValueError, match="partition column"):
        update_where(
            cat, TBL, {"region": "'EU'"},
            "id = 3", partition_cols=["region"],
        )


def test_update_zero_matches_is_versionless_noop(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"), keep_versions=2)
    _seed(spark, cat, partitioned=True)
    before = cat.versions(TBL)
    assert update_where(
        cat, TBL, {"amount": "0.0"}, "id = 999",
        partition_cols=["region"],
    ) == 0
    assert cat.versions(TBL) == before


def test_dml_composes_with_change_feed(spark, tmp_path):
    # the Delta-parity composition that makes DML versioned DML:
    # snapshot → DELETE+UPDATE → table_changes sees exactly those rows
    cat = Catalog(spark, str(tmp_path / "wh"), keep_versions=4)
    _seed(spark, cat, partitioned=True)
    cat.snapshot(TBL)
    delete_where(cat, TBL, "id = 5", partition_cols=["region"])
    update_where(
        cat, TBL, {"amount": "amount * 10"},
        "id = 1", partition_cols=["region"],
    )
    cat.snapshot(TBL)
    vs = cat.versions(TBL)
    feed = cat.table_changes(
        TBL, ["id"],
        from_version=int(vs[0][1:]), to_version=int(vs[-1][1:]),
        partition_cols=["region"],
    )
    kinds = {(r.id, r._change_type) for r in feed.collect()}
    assert kinds == {
        (5, "delete"),
        (1, "update_preimage"),
        (1, "update_postimage"),
    }


def test_delete_partitioned_multi_level(spark, tmp_path):
    # hierarchical layout: emptied LEAF removed, sibling leaf under the
    # same first-level directory survives byte-identical
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [
            ("2024-01-01", "EU", 1),
            ("2024-01-01", "US", 2),
            ("2024-01-02", "EU", 3),
        ],
        "day string, region string, id int",
    )
    cat.overwrite(df, TBL, partition_by=["day", "region"])
    root = cat.path(TBL)
    before = _leaf_partition_files(root, ["day", "region"])
    n = delete_where(
        cat, TBL, "day = '2024-01-01' AND region = 'EU'",
        partition_cols=["day", "region"],
    )
    assert n == 1
    after = _leaf_partition_files(root, ["day", "region"])
    assert ("2024-01-01", "EU") not in after
    assert after[("2024-01-01", "US")] == before[("2024-01-01", "US")]
    assert after[("2024-01-02", "EU")] == before[("2024-01-02", "EU")]
    assert sorted(r.id for r in cat.read(TBL).collect()) == [2, 3]


def test_update_allow_partition_move(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat, partitioned=True)
    # default refuses by name with the escape hatch in the message
    with pytest.raises(ValueError, match="allow_partition_move"):
        update_where(
            cat, TBL, {"region": "'EU'"}, "region = 'AP'",
            partition_cols=["region"],
        )
    n = update_where(
        cat, TBL, {"region": "'EU'"}, "region = 'AP'",
        partition_cols=["region"], allow_partition_move=True,
    )
    assert n == 1
    assert {r.id: r.region for r in cat.read(TBL).collect()}[5] == "EU"
    assert ("AP",) not in _leaf_partition_files(cat.path(TBL), ["region"])


def test_dml_refused_on_delta_catalog():
    # Directory swaps behind a _delta_log would corrupt the table —
    # same capability split as merge_upsert vs merge_upsert_delta.
    # The guard fires before any read, so a bare stub suffices.
    from types import SimpleNamespace

    fake = SimpleNamespace(fmt="delta")
    with pytest.raises(ValueError, match="delta"):
        delete_where(fake, TBL, "id = 1")
    with pytest.raises(ValueError, match="delta"):
        update_where(fake, TBL, {"amount": "0"}, "id = 1")


def test_update_partitioned_failed_rewrite_commits_no_version(
    spark, tmp_path
):
    # A CHECK guard firing during the staged slice write must not burn
    # a keep_versions slot on a version identical to live (the
    # checkpoint now rides overwrite_partitions' pre_swap hook, which
    # only fires once staging succeeded) — matching delete_where.
    from pyspark.errors import SparkRuntimeException

    cat = Catalog(spark, str(tmp_path / "wh"), keep_versions=3)
    _seed(spark, cat, partitioned=True)
    cat.add_constraint(TBL, "amount_pos", "amount > 0")
    before = cat.versions(TBL)
    with pytest.raises(SparkRuntimeException, match="amount_pos"):
        update_where(
            cat, TBL, {"amount": "-1"}, "id = 1",
            partition_cols=["region"],
        )
    assert cat.versions(TBL) == before
    # live state intact
    assert {r.amount for r in cat.read(TBL).where("id = 1").collect()} == {
        10.0
    }
    # and a SUCCEEDING partitioned update still commits exactly one
    assert (
        update_where(
            cat, TBL, {"amount": "11.0"}, "id = 1",
            partition_cols=["region"],
        )
        == 1
    )
    assert len(cat.versions(TBL)) == len(before) + 1
