"""Declarative table metadata → Spark schema compiler.

Reference parity: the reference compiles per-table YAML field specs to
a ``StructType`` in ``Ingestor._set_schema.parse_field``
(reference lib/ingestors.py:41-73) supporting string/double/long/
integer/timestamp plus recursive struct and array types, and reads
column annotations ``key``/``date_predicate``/``mandate``/``tests``
(reference bronze/assets/assets.yml, silver/prices/prices.yml).

This module is a clean rebuild of that compiler with a wider type
lattice (the reference reaches bigint/float/date only via SQL CAST —
reference bronze/tickers/tickers.sql:15, silver/prices/prices.sql:4-11
— and we admit them declaratively), plus binary + decimal for the
multimodal/extension columns.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

try:  # PyYAML is optional in the runtime image; metadata may be dicts.
    import yaml  # type: ignore

    _HAVE_YAML = True
except Exception:  # pragma: no cover
    _HAVE_YAML = False

# Scalar type lattice. Reference supports the first five
# (lib/ingestors.py:58-64); the rest are reachable in its SQL or are
# [extension] types for multimodal/embedding columns.
_SCALARS: dict[str, T.DataType] = {
    "string": T.StringType(),
    "double": T.DoubleType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "integer": T.IntegerType(),
    "int": T.IntegerType(),
    "timestamp": T.TimestampType(),
    "float": T.FloatType(),
    "date": T.DateType(),
    "boolean": T.BooleanType(),
    "binary": T.BinaryType(),
    "short": T.ShortType(),
    "byte": T.ByteType(),
}


class SchemaError(ValueError):
    """Bad declarative field spec."""


def parse_type(spec: dict[str, Any]) -> T.DataType:
    """Compile one field spec's type (recursive for struct/array).

    Mirrors reference lib/ingestors.py:45-64 semantics:
    - ``type: struct`` with nested ``fields``
    - ``type: array`` with ``element_type`` (dict spec or scalar name);
      element defaults to string when unspecified
      (reference lib/ingestors.py:50-56)
    - scalar names per the lattice above
    - ``decimal(p,s)`` admitted as an extension
    """
    type_name = str(spec.get("type", "string")).strip().lower()
    if type_name == "struct":
        nested = spec.get("fields", [])
        return T.StructType([compile_field(f) for f in nested])
    if type_name == "array":
        element = spec.get("element_type", "string")
        if isinstance(element, dict):
            element_type = parse_type(element)
        else:
            element_type = _scalar(str(element))
        return T.ArrayType(element_type)
    if type_name.startswith("decimal"):
        inner = type_name[len("decimal"):].strip("() ")
        if inner:
            p, _, s = inner.partition(",")
            return T.DecimalType(int(p), int(s or 0))
        return T.DecimalType(38, 18)
    return _scalar(type_name)


def _scalar(name: str) -> T.DataType:
    try:
        return _SCALARS[name.strip().lower()]
    except KeyError:
        raise SchemaError(f"unsupported declared type: {name!r}") from None


def compile_field(spec: dict[str, Any]) -> T.StructField:
    """One YAML field dict → StructField (name, type, nullable)."""
    if "name" not in spec:
        raise SchemaError(f"field spec missing 'name': {spec!r}")
    nullable = bool(spec.get("nullable", True))
    return T.StructField(str(spec["name"]), parse_type(spec), nullable)


def compile_schema(fields: list[dict[str, Any]]) -> T.StructType:
    """List of field specs → StructType (reference lib/ingestors.py:66-73)."""
    return T.StructType([compile_field(f) for f in fields])


@dataclass
class ColumnMeta:
    """Column annotations beyond type (reference YAML surface).

    ``key`` marks (composite) primary-key membership
    (reference silver/prices/prices.yml:6,17); ``date_predicate`` marks
    the CDC ordering column (reference lib/ingestors.py:35-39);
    ``mandate`` and ``tests`` feed the data-quality engine
    (reference lib/checker.py:58-104).
    """

    name: str
    type: str = "string"
    key: bool = False
    date_predicate: bool = False
    nullable: bool = True
    mandate: str = "local_optional"
    tests: list[dict[str, Any]] = field(default_factory=list)


@dataclass
class TableMeta:
    """Parsed per-table metadata document.

    The reference names these ``{table}.yml`` next to ``{table}.sql``
    (reference lib/ingestors.py:16-33); we accept the same shape.
    """

    catalog: str
    schema: str
    table: str
    columns: list[ColumnMeta]
    raw: dict[str, Any] = field(default_factory=dict)

    @property
    def full_name(self) -> str:
        return f"{self.catalog}.{self.schema}.{self.table}"

    @property
    def spark_schema(self) -> T.StructType:
        return compile_schema(self.raw_fields)

    @property
    def raw_fields(self) -> list[dict[str, Any]]:
        # The reference names the field list 'schema'
        # (reference silver/prices/prices.yml:1); we accept both.
        fields = self.raw.get("fields")
        if fields is None:
            sch = self.raw.get("schema")
            fields = sch if isinstance(sch, list) else []
        return list(fields or [])

    @property
    def key_columns(self) -> list[str]:
        return [c.name for c in self.columns if c.key]

    @property
    def partition_by(self) -> list[str]:
        """Declared sink partitioning (``partition_by:`` in the table
        YAML) — the 100 TB layout lever the reference lacks
        (SURVEY.md §7.4(8)); empty = unpartitioned, reference behavior."""
        cols = self.raw.get("partition_by") or []
        return [str(c) for c in cols] if isinstance(cols, list) else [str(cols)]

    @property
    def cdc_timestamp_column(self) -> str | None:
        for c in self.columns:
            if c.date_predicate:
                return c.name
        return None

    def tests_by_column(self) -> dict[str, list[dict[str, Any]]]:
        return {c.name: c.tests for c in self.columns if c.tests}

    @property
    def generated(self) -> dict[str, str]:
        """Declared generated columns — ``generated:`` in the table
        YAML, a mapping ``column: sql_expr``. **[extension]** Delta
        GENERATED ALWAYS AS parity driven from the same metadata
        document as schema/keys/constraints: the ingestors reconcile
        the catalog's declarations to this block every run (absent
        block = no position, the constraints rule)."""
        raw = self.raw.get("generated") or {}
        if not isinstance(raw, dict):
            raise ValueError(
                "generated: must be a mapping of column -> sql_expr"
            )
        return {str(k): str(v) for k, v in raw.items()}

    @property
    def constraints(self) -> dict[str, str]:
        """Declared table CHECK constraints — ``constraints:`` in the
        table YAML, either a mapping ``name: sql_expr`` or a list of
        ``{name, check}`` items. **[extension]** Delta ``ALTER TABLE
        ADD CONSTRAINT`` parity driven from the same metadata document
        as schema/keys/tests: the ingestors reconcile the catalog's
        constraint set to this declaration every run
        (Catalog.sync_constraints), so the YAML is the source of truth
        for the table's write-time contract."""
        raw = self.raw.get("constraints") or {}
        if isinstance(raw, dict):
            return {str(k): str(v) for k, v in raw.items()}
        out: dict[str, str] = {}
        for item in raw:
            expr = item.get("check", item.get("expr"))
            if expr is None:
                raise ValueError(
                    f"constraint item {item!r} needs a 'check' (or "
                    "'expr') SQL expression"
                )
            out[str(item["name"])] = str(expr)
        return out


def parse_table_meta(doc: dict[str, Any]) -> TableMeta:
    """Dict (already YAML-loaded) → TableMeta."""
    # The reference's table YAML uses the key 'schema' for the FIELD
    # LIST (reference silver/prices/prices.yml:1); catalog/schema names
    # arrive from job metadata (reference bronze/job_metadata.yml:6-8).
    # Accept both layouts: 'schema' as a string = namespace name,
    # 'schema' as a list = field specs.
    sch = doc.get("schema")
    fields = doc.get("fields")
    if fields is None:
        fields = sch if isinstance(sch, list) else []
    schema_name = sch if isinstance(sch, str) else str(doc.get("schema_name", "default"))
    cols = []
    for f in fields or []:
        cols.append(
            ColumnMeta(
                name=str(f["name"]),
                type=str(f.get("type", "string")),
                key=bool(f.get("key", False)),
                date_predicate=bool(f.get("date_predicate", False)),
                nullable=bool(f.get("nullable", True)),
                mandate=str(f.get("mandate", "local_optional")),
                tests=list(f.get("tests", []) or []),
            )
        )
    return TableMeta(
        catalog=str(doc.get("catalog", "default")),
        schema=schema_name,
        table=str(doc.get("table_name", doc.get("table", "table"))),
        columns=cols,
        raw=doc,
    )


def load_table_meta(path: str) -> TableMeta:
    """YAML file → TableMeta (requires PyYAML)."""
    if not _HAVE_YAML:  # pragma: no cover
        raise RuntimeError("PyYAML not available; pass dicts to parse_table_meta")
    with open(path) as fh:
        return parse_table_meta(yaml.safe_load(fh))
