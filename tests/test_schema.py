"""Schema compiler tests — shapes mirror the reference's YAMLs
(flat stringly assets.yml; nested tickers.yml with array<struct> and
struct<...array<string>> — reference bronze/tickers/tickers.yml:82-135).
"""

from pyspark.sql import types as T

from mydatalake_spark.schema import (
    SchemaError,
    compile_schema,
    parse_table_meta,
    parse_type,
)

import pytest


def test_flat_stringly_schema():
    fields = [
        {"name": "stocks", "type": "string", "key": True},
        {"name": "close", "type": "string"},
        {"name": "loaded_at", "type": "string", "date_predicate": True},
    ]
    st = compile_schema(fields)
    assert st == T.StructType(
        [
            T.StructField("stocks", T.StringType(), True),
            T.StructField("close", T.StringType(), True),
            T.StructField("loaded_at", T.StringType(), True),
        ]
    )


def test_nested_array_of_struct():
    # historicalDataPrice shape (reference bronze/tickers/tickers.yml:82-100)
    spec = {
        "name": "historicalDataPrice",
        "type": "array",
        "element_type": {
            "type": "struct",
            "fields": [
                {"name": "date", "type": "string"},
                {"name": "open", "type": "double"},
                {"name": "volume", "type": "long"},
            ],
        },
    }
    dt = parse_type(spec)
    assert isinstance(dt, T.ArrayType)
    assert isinstance(dt.elementType, T.StructType)
    assert dt.elementType["open"].dataType == T.DoubleType()


def test_bare_array_defaults_to_string_elements():
    # companyOfficers/executiveTeam (reference bronze/tickers/tickers.yml:133-135)
    dt = parse_type({"name": "companyOfficers", "type": "array"})
    assert dt == T.ArrayType(T.StringType())


def test_struct_with_nested_array():
    # summaryProfile shape (reference bronze/tickers/tickers.yml:102-135)
    spec = {
        "name": "summaryProfile",
        "type": "struct",
        "fields": [
            {"name": "city", "type": "string"},
            {"name": "companyOfficers", "type": "array"},
        ],
    }
    dt = parse_type(spec)
    assert isinstance(dt, T.StructType)
    assert dt["companyOfficers"].dataType == T.ArrayType(T.StringType())


def test_extended_scalars_and_decimal():
    assert parse_type({"type": "bigint"}) == T.LongType()
    assert parse_type({"type": "float"}) == T.FloatType()
    assert parse_type({"type": "date"}) == T.DateType()
    assert parse_type({"type": "binary"}) == T.BinaryType()
    assert parse_type({"type": "decimal(12,2)"}) == T.DecimalType(12, 2)


def test_unknown_type_raises():
    with pytest.raises(SchemaError):
        parse_type({"type": "geometry"})


def test_table_meta_keys_and_cdc():
    doc = {
        "catalog": "bronze",
        "schema": "brapi",
        "table_name": "assets",
        "fields": [
            {"name": "stocks", "type": "string", "key": True,
             "tests": [{"test": "missing"}]},
            {"name": "close", "type": "string"},
            {"name": "loaded_at", "type": "string", "date_predicate": True},
        ],
    }
    meta = parse_table_meta(doc)
    assert meta.full_name == "bronze.brapi.assets"
    assert meta.key_columns == ["stocks"]
    assert meta.cdc_timestamp_column == "loaded_at"
    assert meta.tests_by_column() == {"stocks": [{"test": "missing"}]}
    assert len(meta.spark_schema.fields) == 3
