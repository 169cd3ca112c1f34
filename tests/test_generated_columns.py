"""Generated columns (Delta GENERATED ALWAYS AS analogue): declared
once, computed in-plan on every write path when omitted, validated
per row when supplied; backfilled as a versioned rewrite when new."""

import pytest
from pyspark.errors import SparkRuntimeException
from pyspark.sql import functions as F

from mydatalake_spark.catalog import Catalog, _leaf_partition_files, \
    detect_partition_cols

TBL = "silver.ev.events"


def _seed(spark, cat):
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-02 11:00:00")],
        "id int, ts string",
    )
    cat.overwrite(df, TBL)
    return df


def test_backfill_then_autocompute_on_writes(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"), keep_versions=2)
    _seed(spark, cat)
    cat.set_generated_column(TBL, "day", "CAST(ts AS DATE)")
    # backfill was a versioned rewrite: pre-state retained, new col live
    assert "day" in cat.read(TBL).columns
    old = cat.read_version(TBL, version=cat.versions(TBL)[-1])
    assert "day" not in old.columns
    assert {str(r.day) for r in cat.read(TBL).collect()} == {
        "2024-01-01", "2024-01-02",
    }
    # an append OMITTING the column gets it computed
    batch = spark.createDataFrame(
        [(3, "2024-01-03 09:00:00")], "id int, ts string"
    )
    assert cat.append(batch, TBL) == 1
    got = {r.id: str(r.day) for r in cat.read(TBL).collect()}
    assert got[3] == "2024-01-03"
    # an overwrite SUPPLYING a divergent value is refused per row
    bad = spark.createDataFrame(
        [(9, "2024-01-09 09:00:00", "1999-01-01")],
        "id int, ts string, day string",
    ).select("id", "ts", F.col("day").cast("date"))
    with pytest.raises(SparkRuntimeException, match="generated column"):
        cat.overwrite_via_staging(bad, TBL)
    assert 9 not in {r.id for r in cat.read(TBL).collect()}  # intact
    # a consistent supplied value passes
    good = cat.read(TBL)
    cat.overwrite_via_staging(good.where("id <= 2"), TBL)
    assert cat.read(TBL).count() == 2


def test_generated_partition_column_pattern(spark, tmp_path):
    # the common Delta pattern: partition on a generated date column
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat)
    cat.set_generated_column(TBL, "day", "CAST(ts AS DATE)")
    cat.overwrite(
        cat.read(TBL).drop("day"), TBL + "_p", partition_by=None
    )
    # declare on the new table, then write partitioned by it — the
    # write path computes the column before partitionBy needs it
    cat.set_generated_column(TBL + "_p", "day", "CAST(ts AS DATE)")
    src = cat.read(TBL + "_p").drop("day")
    cat.overwrite_via_staging(src, TBL + "_p", partition_by=["day"])
    assert detect_partition_cols(cat.path(TBL + "_p")) == ["day"]
    assert len(
        _leaf_partition_files(cat.path(TBL + "_p"), ["day"])
    ) == 2


def test_declare_on_existing_column_validates(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(1, 2), (2, 4)], "id int, double_id int"
    )
    cat.overwrite(df, TBL)
    cat.set_generated_column(TBL, "double_id", "id * 2")  # consistent
    bad = spark.createDataFrame(
        [(5, 3), (6, 12)], "id int, double_id int"
    )
    cat.overwrite(bad, TBL + "2")
    with pytest.raises(ValueError, match="violate"):
        cat.set_generated_column(TBL + "2", "double_id", "id * 2")
    # drop removes the declaration, not the column
    cat.drop_generated_column(TBL, "double_id")
    assert cat.generated_columns(TBL) == {}
    assert "double_id" in cat.read(TBL).columns
    with pytest.raises(ValueError, match="no generated column"):
        cat.drop_generated_column(TBL, "double_id")


def test_clone_carries_generated_declarations(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat)
    cat.set_generated_column(TBL, "day", "CAST(ts AS DATE)")
    cat.clone(TBL, TBL + "_c")
    assert cat.generated_columns(TBL + "_c") == {"day": "CAST(ts AS DATE)"}
    # the clone enforces on ITS writes too
    batch = spark.createDataFrame(
        [(7, "2024-02-01 00:00:00")], "id int, ts string"
    )
    cat.append(batch, TBL + "_c")
    got = {r.id: str(r.day) for r in cat.read(TBL + "_c").collect()}
    assert got[7] == "2024-02-01"
