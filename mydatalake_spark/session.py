"""SparkSession factory tuned for the engine.

The reference runs on Databricks and never builds its own session; we
target OSS Spark, so session construction (warehouse location, AQE,
shuffle sizing, Arrow) lives here. Defaults are chosen for the
100 TB design point and scale *down* to local[...] test runs:

- AQE on (runtime coalescing, skew-join splitting) so plans re-shape
  themselves as data volume grows 1000x.
- Arrow enabled so any Pandas-UDF path is vectorized batch transfer.
- ``spark.sql.shuffle.partitions`` defaults small locally but is an
  explicit knob — on a real cluster you size it to ~2-3x total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At 100 TB these are cluster-level settings; locally they keep tests fast.
_DEFAULT_CONF: dict[str, str] = {
    # Adaptive execution: runtime partition coalescing, skew-join splits,
    # dynamic broadcast decisions. The single most important scale knob.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow-batched Pandas UDF transfer (similarity / multimodal paths).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Broadcast threshold: dimension tables (region/nation/supplier …)
    # broadcast instead of shuffling the fact side.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Read-side split sizing: at 100 TB this bounds scan-task memory.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Timestamps in test parquet are ns-precision; keep semantics stable.
    "spark.sql.session.timeZone": "UTC",
    # The engine's cast-late pattern (stringly bronze → typed silver,
    # reference bronze/assets/assets.yml + assets.sql) needs
    # null-on-malformed CAST semantics; Spark 4 defaults to ANSI
    # (throw). Library code uses try_cast explicitly where it means it;
    # this keeps user transform SQL (reference dialect) running.
    "spark.sql.ansi.enabled": "false",
    # Don't let codegen fall back silently while iterating.
    "spark.sql.shuffle.partitions": "32",
    # Parquet TIMESTAMP(NANOS) (the events table) is unreadable by
    # Spark's vectorized reader; surface it as a long (ns since epoch)
    # and convert explicitly (see sources/readers.py:nanos_to_timestamp).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(
    app_name: str = "mydatalake_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    warehouse_dir: str | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or
    ``local[*]``. On a real cluster, pass ``master=None`` and submit
    via spark-submit — the builder then respects the external config.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = builder.master(master)

    conf = dict(_DEFAULT_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if warehouse_dir is not None:
        conf["spark.sql.warehouse.dir"] = warehouse_dir
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
