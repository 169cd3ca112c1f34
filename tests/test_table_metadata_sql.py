"""SHOW COLUMNS / COMMENT ON / SET-UNSET-SHOW TBLPROPERTIES (VERDICT
r12 ask #5): metadata statements rounding out the DESCRIBE family.
Comments and properties persist in the version-root book beside the
constraint/generated/identity declarations, print in SHOW CREATE TABLE
(keeping its round-trip property), move with RENAME, copy with CLONE,
and drop with CREATE OR REPLACE."""

import pytest
from pyspark.sql import functions as F

from mydatalake_spark.catalog import Catalog
from mydatalake_spark.plans.table_sql import (
    UnsupportedStatement,
    run_table_sql,
)

TBL = "silver.sales.orders"


def _seed(spark, cat):
    df = spark.createDataFrame(
        [(1, "EU", 10.0), (2, "US", 20.0)],
        "id int, region string, amount double",
    )
    cat.overwrite(df, TBL)
    return df


def test_show_columns(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat)
    for kw in ("IN", "FROM"):
        got = [r.col_name for r in
               run_table_sql(cat, f"SHOW COLUMNS {kw} {TBL}").collect()]
        assert got == ["id", "region", "amount"]
    with pytest.raises(ValueError, match="does not exist"):
        run_table_sql(cat, "SHOW COLUMNS IN silver.sales.nope")
    with pytest.raises(UnsupportedStatement, match="IN|FROM"):
        run_table_sql(cat, f"SHOW COLUMNS {TBL}")


def test_comment_on_table_and_column(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat)
    run_table_sql(cat, f"COMMENT ON TABLE {TBL} IS 'order facts'")
    run_table_sql(
        cat, f"COMMENT ON COLUMN {TBL}.amount IS 'gross, EUR'"
    )
    assert cat.table_comment(TBL) == "order facts"
    assert cat.column_comments(TBL) == {"amount": "gross, EUR"}
    # escaped quote round-trips
    run_table_sql(cat, f"COMMENT ON TABLE {TBL} IS 'it''s gross'")
    assert cat.table_comment(TBL) == "it's gross"
    # DESCRIBE shows them
    desc = run_table_sql(cat, f"DESCRIBE EXTENDED {TBL}").collect()
    by_name = {r.col_name: r for r in desc}
    assert by_name["amount"].comment == "gross, EUR"
    # detail rows carry their value in the data_type position, like
    # Location/Provider
    assert by_name["Comment"].data_type == "it's gross"
    # NULL clears
    run_table_sql(cat, f"COMMENT ON TABLE {TBL} IS NULL")
    run_table_sql(cat, f"COMMENT ON COLUMN {TBL}.amount IS NULL")
    assert cat.table_comment(TBL) is None
    assert cat.column_comments(TBL) == {}
    # unknown column refused by name
    with pytest.raises(ValueError, match="nope"):
        run_table_sql(cat, f"COMMENT ON COLUMN {TBL}.nope IS 'x'")


def test_tblproperties_set_unset_show(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat)
    run_table_sql(
        cat,
        f"ALTER TABLE {TBL} SET TBLPROPERTIES "
        "('quality' = 'gold', 'owner' = 'data-eng')",
    )
    got = {r.key: r.value for r in
           run_table_sql(cat, f"SHOW TBLPROPERTIES {TBL}").collect()}
    assert got == {"quality": "gold", "owner": "data-eng"}
    # single-key form
    one = run_table_sql(
        cat, f"SHOW TBLPROPERTIES {TBL} ('owner')"
    ).collect()
    assert [(r.key, r.value) for r in one] == [("owner", "data-eng")]
    with pytest.raises(ValueError, match="not set"):
        run_table_sql(cat, f"SHOW TBLPROPERTIES {TBL} ('nope')")
    # SET upserts
    run_table_sql(
        cat, f"ALTER TABLE {TBL} SET TBLPROPERTIES ('quality' = 'silver')"
    )
    assert cat.table_properties(TBL)["quality"] == "silver"
    # UNSET: missing key refused without IF EXISTS, ignored with
    with pytest.raises(ValueError, match="IF EXISTS"):
        run_table_sql(
            cat, f"ALTER TABLE {TBL} UNSET TBLPROPERTIES ('nope')"
        )
    run_table_sql(
        cat,
        f"ALTER TABLE {TBL} UNSET TBLPROPERTIES IF EXISTS "
        "('nope', 'owner')",
    )
    assert cat.table_properties(TBL) == {"quality": "silver"}


def test_show_create_table_round_trips_comments_and_props(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    run_table_sql(
        cat,
        f"CREATE TABLE {TBL} ("
        "id BIGINT GENERATED ALWAYS AS IDENTITY, "
        "region STRING COMMENT 'ISO region', "
        "amount DOUBLE COMMENT 'it''s gross') "
        "COMMENT 'order facts' "
        "TBLPROPERTIES ('quality' = 'gold')",
    )
    stmt = run_table_sql(cat, f"SHOW CREATE TABLE {TBL}").first()[0]
    assert "COMMENT 'ISO region'" in stmt
    assert "COMMENT 'it''s gross'" in stmt
    assert "COMMENT 'order facts'" in stmt
    assert "TBLPROPERTIES ('quality' = 'gold')" in stmt
    # the printed DDL is runnable and reproduces the declared surface
    stmt2 = stmt.replace(TBL, "silver.sales.o2")
    for piece in stmt2.split(";\n"):
        run_table_sql(cat, piece)
    assert cat.table_comment("silver.sales.o2") == "order facts"
    assert cat.column_comments("silver.sales.o2") == {
        "region": "ISO region", "amount": "it's gross",
    }
    assert cat.table_properties("silver.sales.o2") == {
        "quality": "gold"
    }
    assert "id" in cat.identity_columns("silver.sales.o2")


def test_metadata_moves_with_rename_and_clone_drops_with_replace(
    spark, tmp_path
):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat)
    run_table_sql(cat, f"COMMENT ON TABLE {TBL} IS 'keep me'")
    run_table_sql(
        cat, f"ALTER TABLE {TBL} SET TBLPROPERTIES ('k' = 'v')"
    )
    # CLONE copies
    run_table_sql(cat, f"CREATE TABLE silver.sales.c DEEP CLONE {TBL}")
    assert cat.table_comment("silver.sales.c") == "keep me"
    assert cat.table_properties("silver.sales.c") == {"k": "v"}
    # RENAME moves (the book lives in the version root)
    run_table_sql(cat, f"ALTER TABLE {TBL} RENAME TO silver.sales.r")
    assert cat.table_comment("silver.sales.r") == "keep me"
    # CREATE OR REPLACE drops (definition-scoped metadata)
    run_table_sql(
        cat,
        "CREATE OR REPLACE TABLE silver.sales.r (x INT)",
    )
    assert cat.table_comment("silver.sales.r") is None
    assert cat.table_properties("silver.sales.r") == {}


def test_show_tblproperties_missing_table_errors_by_name(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    for stmt in (
        "SHOW TBLPROPERTIES silver.sales.nope",
        "SHOW TBLPROPERTIES silver.sales.nope ('k')",
    ):
        with pytest.raises(ValueError, match="does not exist"):
            run_table_sql(cat, stmt)
