"""Stats-driven planning: turn persisted ANALYZE output into plan
choices without probe jobs.

**[extension, 100 TB hardening]** ``Catalog.analyze`` persists per-
column NDVs and row counts with a live file-set fingerprint, and
``table_stats`` reports honestly whether they are still FRESH (any
write since flips the fingerprint). This module is the consumer side:
planners ask for a number, get it from metadata when it can be
trusted, and fall back to the runtime probe when it cannot — stale
stats are never silently used (the failure mode Spark's own CBO is
notorious for after un-refreshed writes).

Two decisions benefit at 100 TB:

- **Bloom filter sizing** (``operators/bloomjoin.py`` ``m_bits=
  "auto"``): the sizing probe is one approx-count-distinct job over
  the build side. With fresh stats it is free — ``fresh_ndv`` feeds
  ``resolve_auto_m_bits(n_keys_hint=...)`` and the build side is
  never evaluated for sizing. An undersized filter only degrades the
  false-positive rate (the bloom superset guarantee keeps results
  identical), which is why a metadata hint is safe where, say, a
  stale row count justifying a broadcast would not be.

- **Broadcast eligibility** (``broadcast_if_small``): decided from
  the live directory's byte size — ALWAYS current metadata (one stat
  walk, no stats file needed), matching how Spark's own
  ``autoBroadcastJoinThreshold`` reasons about plain files. The
  persisted row count is reported alongside when fresh, for callers
  that gate on rows instead of bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "fresh_ndv",
    "fresh_row_count",
    "bloom_join_with_stats",
    "broadcast_if_small",
    "touched_partitions_from_layout",
]


def touched_partitions_from_layout(
    catalog,
    source_table: str,
    pcols: list[str],
    max_partitions: int = 10_000,
) -> list | None:
    """Touched-partition tuples for a MERGE whose changeset is itself
    a hive-partitioned CATALOG table covering the target's partition
    columns — read straight from the source's leaf DIRECTORIES (one
    os.walk + a driver-local cast of the dirname strings to the read
    types, the OPTIMIZE-WHERE discipline), so the changeset-wide
    distinct-partitions probe JOB is skipped entirely. Directory
    names are always current (same never-stale economics as
    :func:`broadcast_if_small`), and a leaf that exists but holds no
    rows only OVERESTIMATES the touched set — extra leaves are read
    and rewritten unchanged, never dropped, so the hint is sound.

    Returns None (caller runs the ordinary probe) when the source is
    not a catalog table with a layout covering ``pcols``, or when the
    leaf count exceeds ``max_partitions`` (the probe owns the refusal
    message)."""
    from .catalog import _leaf_partition_files, detect_partition_cols

    if not catalog.exists(source_table):
        return None
    src_path = catalog.path(source_table)
    src_cols = detect_partition_cols(src_path)
    if not src_cols or not set(pcols) <= set(src_cols):
        return None
    leaves = _leaf_partition_files(src_path, src_cols)
    idx = [src_cols.index(c) for c in pcols]
    raw = sorted({tuple(v[i] for i in idx) for v in leaves})
    if not raw:
        return []
    if len(raw) > max_partitions:
        return None
    types = {
        f.name: f.dataType
        for f in catalog.read(source_table).select(*pcols).schema.fields
    }
    str_df = catalog.spark.createDataFrame(
        raw, ", ".join(f"{c} string" for c in pcols)
    )
    rows = str_df.select(
        *[F.col(c).cast(types[c]).alias(c) for c in pcols]
    ).collect()
    return [tuple(r[c] for c in pcols) for r in rows]


def fresh_ndv(catalog, full_name: str, column: str) -> int | None:
    """Distinct-value estimate for ``column`` from the table's
    persisted ANALYZE stats — or None when the table was never
    analyzed, the stats predate the current files (stale
    fingerprint), or the column wasn't profiled. None means "run the
    probe", never "guess"."""
    stats = catalog.table_stats(full_name)
    if not stats or not stats.get("fresh"):
        return None
    col = stats.get("columns", {}).get(column)
    if col is None:
        return None
    return int(col["n_distinct"])


def fresh_row_count(catalog, full_name: str) -> int | None:
    """Row count from fresh persisted stats, else None (same honesty
    contract as :func:`fresh_ndv`)."""
    stats = catalog.table_stats(full_name)
    if not stats or not stats.get("fresh"):
        return None
    return int(stats["n_rows"])


def bloom_join_with_stats(
    catalog,
    probe: DataFrame,
    build_table: str,
    probe_key: str,
    build_key: str | None = None,
    **kwargs,
) -> DataFrame:
    """:func:`~mydatalake_spark.operators.bloomjoin.bloom_filtered_join`
    with the build side read from the catalog and its ``m_bits="auto"``
    sizing fed from fresh ANALYZE stats when available — zero sizing
    job on the fresh path, the ordinary approx-count probe otherwise.
    ``kwargs`` pass through (how/k/family/m_bits)."""
    from .operators.bloomjoin import bloom_filtered_join

    key = build_key or probe_key
    hint = fresh_ndv(catalog, build_table, key)
    return bloom_filtered_join(
        probe,
        catalog.read(build_table),
        probe_key,
        build_key=build_key,
        n_keys_hint=hint,
        **kwargs,
    )


def broadcast_if_small(
    catalog,
    full_name: str,
    max_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """Read a catalog table, adding the broadcast hint when its LIVE
    on-disk size is under ``max_bytes`` (64 MB default ≈ a generous
    multiple of Spark's 10 MB autoBroadcast default — parquet
    decompresses, but a dimension this small is still far cheaper to
    ship than to shuffle a 100 TB fact against). The size comes from
    the directory walk (``describe_detail``'s fingerprint source), so
    the decision always reflects the current files — no staleness
    window, no probe job, no reliance on Spark having fresh relation
    statistics for a path-based table."""
    size = catalog._data_file_fingerprint(full_name)["size_bytes"]
    df = catalog.read(full_name)
    return F.broadcast(df) if size <= max_bytes else df
