"""File / table scans with explicit declared schemas.

Reference parity: ``Ingestor.load`` reads
``spark.read.format(fmt).schema(st).load(f'{path}/*.json')`` for
json/parquet and stamps ``loaded_at = current_timestamp()``
(reference lib/ingestors.py:78-80); ``input_format='delta'`` means
"read from the catalog via the transform SQL instead"
(reference lib/ingestors.py:82-85).

Explicit schemas matter doubly at scale: they skip the JSON
schema-inference pre-scan (a full extra read of the raw zone) and they
make the scan's ReadSchema exactly the declared columns, so Catalyst
column pruning has a stable base to prune *from*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# lowercase name -> Spark DataSource format string. text yields one
# 'value' string row per line; binaryfile (Spark's binaryFile) yields
# (path, modificationTime, length, content) for opaque payloads — the
# multimodal ingestion front door (its fixed schema ignores a user
# schema, so read_source skips the .schema() call there).
_FILE_FORMATS = {
    "json": "json",
    "parquet": "parquet",
    "csv": "csv",
    "orc": "orc",
    "text": "text",
    "binaryfile": "binaryFile",
}


def nanos_to_timestamp(col):
    """ns-since-epoch long → µs timestamp (truncating, matching DuckDB's
    TIMESTAMP_NS→TIMESTAMP cast). Used with
    ``spark.sql.legacy.parquet.nanosAsLong`` for parquet TIMESTAMP(NANOS)
    columns. Integer ``div`` — a double division would lose precision
    above 2^53 ns (~1970+104 days)."""
    c = F.col(col) if isinstance(col, str) else col
    # Decimal division keeps exactness: double division of an ~1.7e18 ns
    # value rounds (>2^53) and can land 1 µs off after truncation.
    us = F.floor(c.cast("decimal(38,0)") / F.lit(1000)).cast("long")
    return F.timestamp_micros(us)


def read_source(
    spark: SparkSession,
    fmt: str,
    path: str | None = None,
    schema: T.StructType | None = None,
    stamp_loaded_at: bool = True,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Scan a raw source with an explicit schema; stamp ``loaded_at``.

    (reference lib/ingestors.py:75-81)
    """
    if fmt.lower() not in _FILE_FORMATS:
        raise ValueError(
            f"unsupported file format: {fmt!r} (supported: "
            f"{sorted(_FILE_FORMATS)})"
        )
    fmt = _FILE_FORMATS[fmt.lower()]
    reader = spark.read.format(fmt)
    if schema is not None and fmt != "binaryFile":
        reader = reader.schema(schema)
    if options:
        reader = reader.options(**options)
    df = reader.load(path)
    if stamp_loaded_at and "loaded_at" not in df.columns:
        # The reference stamps unconditionally
        # (reference lib/ingestors.py:80), silently clobbering a
        # declared loaded_at data column — which then makes its
        # dedup-latest windows order by an ingestion-constant
        # (SURVEY.md §7.4(4)). We only stamp when absent.
        df = df.withColumn("loaded_at", F.current_timestamp())
    return df
