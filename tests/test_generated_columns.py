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


def test_yaml_declared_generated_through_ingestor(spark, tmp_path):
    import json as _json

    from mydatalake_spark.ingest import Ingestor

    meta_root = tmp_path / "meta" / "events"
    meta_root.mkdir(parents=True)
    (meta_root / "events.yml").write_text(
        """
catalog: bronze
schema: ev
table: events
fields:
  - name: id
    type: string
  - name: ts
    type: string
generated:
  day: CAST(ts AS DATE)
"""
    )
    src = tmp_path / "rows.json"
    src.write_text(
        _json.dumps({"id": "1", "ts": "2024-03-01 08:00:00"})
    )
    cat = Catalog(spark, str(tmp_path / "wh"))
    ing = Ingestor(
        spark, cat, str(tmp_path / "meta"), "events",
        input_format="json", input_path=str(src),
    )
    ing.run()  # first run: write, then declare + backfill
    t = "bronze.ev.events"
    assert cat.generated_columns(t) == {"day": "CAST(ts AS DATE)"}
    assert {str(r.day) for r in cat.read(t).collect()} == {"2024-03-01"}
    # second run: the declared column rides the write automatically
    src.write_text(_json.dumps({"id": "2", "ts": "2024-03-02 08:00:00"}))
    ing.input_path = str(src)
    ing.run()
    assert {str(r.day) for r in cat.read(t).collect()} == {"2024-03-02"}
    # a YAML with no generated block leaves the declaration alone
    (meta_root / "events.yml").write_text(
        """
catalog: bronze
schema: ev
table: events
fields:
  - name: id
    type: string
  - name: ts
    type: string
"""
    )
    Ingestor(
        spark, cat, str(tmp_path / "meta"), "events",
        input_format="json", input_path=str(src),
    ).run()
    assert cat.generated_columns(t) == {"day": "CAST(ts AS DATE)"}


def test_per_commit_cdf_across_schema_evolving_commit(spark, tmp_path):
    # a generated-column backfill (or ADD COLUMNS / evolving MERGE)
    # inside a per-commit CDF range makes hop schemas differ — the
    # feed reads with the union of schemas, NULL-filling older
    # commits' rows (Delta CDF's latest-schema read)
    from mydatalake_spark.operators.dml import update_where

    cat = Catalog(spark, str(tmp_path / "wh"), keep_versions=4)
    _seed(spark, cat)
    cat.snapshot(TBL)  # v1: pre-generated schema
    cat.set_generated_column(TBL, "day", "CAST(ts AS DATE)")  # v2
    update_where(cat, TBL, {"ts": "'2024-06-01 00:00:00'"}, "id = 1")
    feed = cat.table_changes(
        TBL, ["id"], from_version=1, granularity="commit"
    )
    assert "day" in feed.columns
    rows = [(r._change_type, r.id) for r in feed.collect()]
    assert ("update_postimage", 1) in rows


def test_update_recomputes_generated_column(spark, tmp_path):
    # Delta semantics: an UPDATE touching a generation's source column
    # recomputes the generated column (a stale carried value would
    # otherwise trip the write guard)
    from mydatalake_spark.operators.dml import update_where

    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat)
    cat.set_generated_column(TBL, "day", "CAST(ts AS DATE)")
    n = update_where(
        cat, TBL, {"ts": "'2024-12-25 09:00:00'"}, "id = 1"
    )
    assert n == 1
    got = {r.id: str(r.day) for r in cat.read(TBL).collect()}
    assert got[1] == "2024-12-25"
    assert got[2] == "2024-01-02"  # unmatched row untouched


def test_partitioned_update_on_generated_source_is_a_move(spark, tmp_path):
    # a generated PARTITION column whose expression references a SET
    # column means rows may move between leaves — refused like SETting
    # the partition column itself, whole-table fallback on opt-in
    from mydatalake_spark.operators.dml import update_where

    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-02 11:00:00")],
        "id int, ts string",
    ).selectExpr("id", "ts", "CAST(ts AS DATE) AS day")
    cat.overwrite(df, TBL, partition_by=["day"])
    cat.set_generated_column(TBL, "day", "CAST(ts AS DATE)")
    with pytest.raises(ValueError, match="partition column"):
        update_where(
            cat, TBL, {"ts": "'2024-02-01 00:00:00'"}, "id = 1",
            partition_cols=["day"],
        )
    n = update_where(
        cat, TBL, {"ts": "'2024-02-01 00:00:00'"}, "id = 1",
        partition_cols=["day"], allow_partition_move=True,
    )
    assert n == 1
    got = {r.id: str(r.day) for r in cat.read(TBL).collect()}
    assert got[1] == "2024-02-01"  # row moved leaf, value recomputed
    assert detect_partition_cols(cat.path(TBL)) == ["day"]
