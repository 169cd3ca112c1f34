"""Table-level CHECK constraints (catalog.py add_constraint/
drop_constraint/_with_check_guards): Delta ``ALTER TABLE ADD
CONSTRAINT`` parity — validated at add time, enforced per row inside
every write path's own pass, carried by CLONE, dropped with the table."""

import pytest
from pyspark.errors import SparkRuntimeException

from mydatalake_spark.catalog import Catalog
from mydatalake_spark.operators.dml import update_where
from mydatalake_spark.operators.merge import merge_upsert_partitioned

TBL = "silver.mkt.prices"


def _seed(spark, cat, partitioned=False):
    df = spark.createDataFrame(
        [(1, "EU", 10.0), (2, "US", 20.0), (3, "EU", None)],
        "id int, region string, price double",
    )
    cat.overwrite(df, TBL, partition_by=["region"] if partitioned else None)
    return df


def test_add_list_drop_roundtrip(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat)
    cat.add_constraint(TBL, "price_pos", "price > 0")
    assert cat.constraints(TBL) == {"price_pos": "price > 0"}
    with pytest.raises(ValueError, match="already exists"):
        cat.add_constraint(TBL, "price_pos", "price > 1")
    cat.drop_constraint(TBL, "price_pos")
    assert cat.constraints(TBL) == {}
    with pytest.raises(ValueError, match="no constraint"):
        cat.drop_constraint(TBL, "price_pos")


def test_add_validates_existing_data(spark, tmp_path):
    # Delta ADD CONSTRAINT fails when current rows violate; NULL rows
    # SATISFY a CHECK (ANSI ternary), so price > 0 over a NULL passes
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat)
    cat.add_constraint(TBL, "price_pos", "price > 0")  # NULL row ok
    with pytest.raises(ValueError, match="existing rows"):
        cat.add_constraint(TBL, "price_big", "price > 15")


def test_add_requires_table(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="does not exist"):
        cat.add_constraint("silver.mkt.nope", "c", "1 = 1")


def test_write_enforces_and_aborts_cleanly(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat)
    cat.add_constraint(TBL, "price_pos", "price > 0")
    bad = spark.createDataFrame(
        [(4, "AP", -1.0)], "id int, region string, price double"
    )
    with pytest.raises(SparkRuntimeException, match="price_pos"):
        cat.overwrite_via_staging(bad, TBL)
    # the failed write aborted into staging: live table intact
    assert sorted(r.id for r in cat.read(TBL).collect()) == [1, 2, 3]
    # conforming write (NULL satisfies CHECK) goes through
    ok = spark.createDataFrame(
        [(5, "AP", None)], "id int, region string, price double"
    )
    cat.overwrite_via_staging(ok, TBL)
    assert [r.id for r in cat.read(TBL).collect()] == [5]


def test_partitioned_write_and_merge_enforce(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat, partitioned=True)
    cat.add_constraint(TBL, "price_pos", "price > 0")
    change = spark.createDataFrame(
        [(2, "US", -5.0)], "id int, region string, price double"
    )
    with pytest.raises(SparkRuntimeException, match="price_pos"):
        merge_upsert_partitioned(
            cat, TBL, change, keys=["id", "region"],
            partition_col="region",
        )
    assert {r.id: r.price for r in cat.read(TBL).collect()}[2] == 20.0


def test_dml_update_enforces(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat)
    cat.add_constraint(TBL, "price_pos", "price > 0")
    with pytest.raises(SparkRuntimeException, match="price_pos"):
        update_where(cat, TBL, {"price": "-price"}, "id = 1")
    assert {r.id: r.price for r in cat.read(TBL).collect()}[1] == 10.0


def test_clone_carries_constraints_drop_removes(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat)
    cat.add_constraint(TBL, "price_pos", "price > 0")
    cat.clone(TBL, "silver.mkt.copy")
    assert cat.constraints("silver.mkt.copy") == {"price_pos": "price > 0"}
    bad = spark.createDataFrame(
        [(9, "EU", -1.0)], "id int, region string, price double"
    )
    with pytest.raises(SparkRuntimeException, match="price_pos"):
        cat.overwrite_via_staging(bad, "silver.mkt.copy")
    # constraints are table metadata: dropped with the table
    cat.drop(TBL)
    _seed(spark, cat)
    assert cat.constraints(TBL) == {}


def test_multiple_constraints_name_the_violated_one(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat)
    cat.add_constraint(TBL, "price_pos", "price > 0")
    cat.add_constraint(TBL, "region_known", "region IN ('EU','US','AP')")
    bad = spark.createDataFrame(
        [(7, "XX", 5.0)], "id int, region string, price double"
    )
    with pytest.raises(SparkRuntimeException, match="region_known"):
        cat.overwrite_via_staging(bad, TBL)


def test_sync_constraints_reconciles(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed(spark, cat)
    cat.add_constraint(TBL, "stale", "id > 0")
    cat.add_constraint(TBL, "kept", "price > 0")
    res = cat.sync_constraints(
        TBL, {"kept": "price > 0", "tight": "id < 100"}
    )
    assert res == {"added": ["tight"], "dropped": ["stale"], "changed": []}
    assert set(cat.constraints(TBL)) == {"kept", "tight"}
    # changed expression re-validates BEFORE anything is written:
    # a rejected sync leaves the previous set fully in force — never
    # a window where the old constraint is simply gone
    with pytest.raises(ValueError, match="existing rows"):
        cat.sync_constraints(TBL, {"kept": "price > 0", "tight": "id < 2"})
    assert cat.constraints(TBL) == {"kept": "price > 0", "tight": "id < 100"}
    # steady state is a metadata-only no-op
    res = cat.sync_constraints(TBL, {"kept": "price > 0", "tight": "id < 100"})
    assert res == {"added": [], "dropped": [], "changed": []}


def test_yaml_declared_constraints_through_ingestor(spark, tmp_path):
    import json as _json
    import os

    from mydatalake_spark.ingest import Ingestor

    meta_root = tmp_path / "meta" / "quotes"
    meta_root.mkdir(parents=True)
    (meta_root / "quotes.yml").write_text(
        """
catalog: bronze
schema: mkt
table: quotes
fields:
  - name: symbol
    type: string
  - name: price
    type: double
constraints:
  price_pos: price > 0
  symbol_nonempty: length(symbol) > 0
"""
    )
    good = tmp_path / "good.json"
    good.write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"symbol": "AAPL", "price": 10.0},
                {"symbol": "MSFT", "price": 20.0},
            ]
        )
    )
    cat = Catalog(spark, str(tmp_path / "wh"))
    ing = Ingestor(
        spark, cat, str(tmp_path / "meta"), "quotes",
        input_format="json", input_path=str(good),
    )
    # first run: write, then validate + attach the declared contract
    ing.run()
    assert set(cat.constraints("bronze.mkt.quotes")) == {
        "price_pos", "symbol_nonempty",
    }
    # second run with a violating row fails IN-PLAN during the write
    bad = tmp_path / "bad.json"
    bad.write_text(_json.dumps({"symbol": "EVIL", "price": -1.0}))
    ing.input_path = str(bad)
    with pytest.raises(SparkRuntimeException, match="price_pos"):
        ing.run()
    # the failed run aborted into staging: table intact
    assert sorted(
        r.symbol for r in cat.read("bronze.mkt.quotes").collect()
    ) == ["AAPL", "MSFT"]


def test_vacuum_preserves_constraints_metadata(spark, tmp_path):
    # the constraints file lives in the version root; a vacuum on a
    # versionless table must not silently delete the write contract
    cat = Catalog(spark, str(tmp_path / "wh"))  # keep_versions=0
    _seed(spark, cat)
    cat.add_constraint(TBL, "price_pos", "price > 0")
    cat.vacuum(TBL)
    assert cat.constraints(TBL) == {"price_pos": "price > 0"}
    bad = spark.createDataFrame(
        [(9, "EU", -1.0)], "id int, region string, price double"
    )
    with pytest.raises(SparkRuntimeException, match="price_pos"):
        cat.overwrite_via_staging(bad, TBL)


def test_vacuum_reclaims_dml_staging_and_list_tables_hides_husks(
    spark, tmp_path
):
    import os

    cat = Catalog(spark, str(tmp_path / "wh"))
    df = _seed(spark, cat)
    # simulate a crashed delete_where: its staging dirs survive
    for suffix in ("__dmlstaging", "__dmltouched"):
        df.limit(1).write.parquet(cat.path(TBL) + suffix)
    assert cat.list_tables() == [TBL]  # husks are never tables
    freed = cat.vacuum(TBL, staging_grace_seconds=0)
    assert freed > 0
    assert not os.path.isdir(cat.path(TBL) + "__dmlstaging")
    assert not os.path.isdir(cat.path(TBL) + "__dmltouched")


def test_yaml_without_constraints_key_preserves_out_of_band(
    spark, tmp_path
):
    # A YAML with NO constraints key takes no position: a constraint
    # added via add_constraint / ALTER TABLE must survive the next
    # ingest run. An explicitly EMPTY block ({}) DOES reconcile and
    # drops the set — the YAML then declares "this table has none".
    import json as _json

    from mydatalake_spark.ingest import Ingestor

    meta_root = tmp_path / "meta" / "quotes"
    meta_root.mkdir(parents=True)
    yml = meta_root / "quotes.yml"
    yml.write_text(
        """
catalog: bronze
schema: mkt
table: quotes
fields:
  - name: symbol
    type: string
  - name: price
    type: double
"""
    )
    src = tmp_path / "rows.json"
    src.write_text(_json.dumps({"symbol": "AAPL", "price": 10.0}))
    cat = Catalog(spark, str(tmp_path / "wh"))
    ing = Ingestor(
        spark, cat, str(tmp_path / "meta"), "quotes",
        input_format="json", input_path=str(src),
    )
    ing.run()
    cat.add_constraint("bronze.mkt.quotes", "price_pos", "price > 0")
    # re-run with a constraint-less YAML: out-of-band contract survives
    Ingestor(
        spark, cat, str(tmp_path / "meta"), "quotes",
        input_format="json", input_path=str(src),
    ).run()
    assert set(cat.constraints("bronze.mkt.quotes")) == {"price_pos"}
    # explicitly empty block → reconciled away
    yml.write_text(yml.read_text() + "constraints: {}\n")
    Ingestor(
        spark, cat, str(tmp_path / "meta"), "quotes",
        input_format="json", input_path=str(src),
    ).run()
    assert cat.constraints("bronze.mkt.quotes") == {}
