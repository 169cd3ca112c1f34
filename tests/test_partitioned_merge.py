"""Partition-scoped CDC merge: only touched partitions rewrite."""

import os

import pytest
from pyspark.sql import functions as F

from mydatalake_spark.catalog import Catalog
from mydatalake_spark.operators.merge import merge_upsert_partitioned


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "wh"))


def _prices(spark, rows):
    return spark.createDataFrame(
        rows, "sym string, day string, ts long, px double"
    )


BASE = [
    ("A", "2026-08-01", 1, 10.0),
    ("B", "2026-08-01", 1, 20.0),
    ("A", "2026-08-02", 1, 11.0),
    ("B", "2026-08-02", 1, 21.0),
]


def test_partitioned_merge_touches_only_source_partitions(spark, cat):
    merge_upsert_partitioned(
        cat, "silver.mkt.prices", _prices(spark, BASE),
        keys=["sym", "day"], partition_col="day", ts_col="ts",
    )
    p1 = cat.path("silver.mkt.prices") + "/day=2026-08-01"
    mtime_before = os.path.getmtime(p1)
    files_before = sorted(os.listdir(p1))

    # second batch touches only 2026-08-02 (update A, stale B, insert C)
    touched = merge_upsert_partitioned(
        cat, "silver.mkt.prices",
        _prices(spark, [
            ("A", "2026-08-02", 5, 99.0),
            ("B", "2026-08-02", 0, 1.0),     # stale: ts 0 < 1
            ("C", "2026-08-02", 2, 30.0),
        ]),
        keys=["sym", "day"], partition_col="day", ts_col="ts",
    )
    assert touched == ["2026-08-02"]

    # partition-column values come back type-inferred (date here) —
    # standard Spark partition discovery; normalize for comparison
    got = {
        (r.sym, str(r.day)): r.px
        for r in cat.read("silver.mkt.prices").collect()
    }
    assert got == {
        ("A", "2026-08-01"): 10.0,
        ("B", "2026-08-01"): 20.0,
        ("A", "2026-08-02"): 99.0,   # updated
        ("B", "2026-08-02"): 21.0,   # stale source ignored
        ("C", "2026-08-02"): 30.0,   # inserted
    }
    # untouched partition's files were not rewritten
    assert sorted(os.listdir(p1)) == files_before
    assert os.path.getmtime(p1) == mtime_before


def test_partition_col_must_be_in_keys(spark, cat):
    with pytest.raises(ValueError, match="partition column"):
        merge_upsert_partitioned(
            cat, "t.t.t", _prices(spark, BASE),
            keys=["sym"], partition_col="day", ts_col="ts",
        )


def test_first_write_bootstraps(spark, cat):
    touched = merge_upsert_partitioned(
        cat, "silver.mkt.p2", _prices(spark, BASE[:2]),
        keys=["sym", "day"], partition_col="day", ts_col="ts",
    )
    assert touched == ["2026-08-01"]
    assert cat.read("silver.mkt.p2").count() == 2


def test_high_cardinality_partition_col_refused(spark, cat):
    # a per-row id mistakenly used as the partition column must fail
    # fast (bounded probe), not collect a corpus-sized list to the
    # driver and OOM
    src = spark.range(500).select(
        F.col("id").cast("string").alias("sym"),
        F.col("id").cast("string").alias("day"),   # 500 distinct "partitions"
        F.lit(1).alias("ts"),
        F.lit(1.0).alias("px"),
    )
    with pytest.raises(ValueError, match="more than 100 distinct"):
        merge_upsert_partitioned(
            cat, "silver.mkt.p4", src,
            keys=["sym", "day"], partition_col="day", ts_col="ts",
            max_partitions=100,
        )
    assert not cat.exists("silver.mkt.p4")


def test_empty_source_is_noop(spark, cat):
    empty = _prices(spark, [])
    touched = merge_upsert_partitioned(
        cat, "silver.mkt.p3", empty,
        keys=["sym", "day"], partition_col="day", ts_col="ts",
    )
    assert touched == []
    assert not cat.exists("silver.mkt.p3")
