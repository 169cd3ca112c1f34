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
import tempfile
import zipfile

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
    # Rows per Arrow batch crossing the JVM↔Python boundary. The
    # default 10000 is an OOM vector for wide binary rows (10 MB
    # media × 10k rows = 100 GB per batch); 2048 keeps batches
    # vectorization-friendly while bounding row-count amplification.
    # Media operators additionally re-chunk BY BYTES python-side
    # (functions/multimodal.py:bounded_payload_chunks).
    "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
    # Broadcast threshold: dimension tables (region/nation/supplier …)
    # broadcast instead of shuffling the fact side.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Read-side split sizing: at 100 TB this bounds scan-task memory.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Timestamps in test parquet are ns-precision; keep semantics stable.
    "spark.sql.session.timeZone": "UTC",
    # Local-mode default driver heap is 1g; with 32 task threads in one
    # JVM that means constant GC on wide shuffles. Only honored at JVM
    # launch (ignored by getOrCreate on a live session), and irrelevant
    # on a real cluster where spark-submit sizes the driver.
    "spark.driver.memory": "16g",
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
    # Streaming state store: RocksDB, not the default HDFS-backed
    # in-memory map. At 100 TB of keyed state (streaming dedup, CDC
    # guards, session windows) the JVM-heap provider OOMs executors;
    # RocksDB spills to local disk and bounds heap by block cache.
    # Verified working in this env (local[32], Spark 4.1.2).
    "spark.sql.streaming.stateStore.providerClass":
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    # Changelog checkpointing uploads per-batch deltas instead of
    # full RocksDB snapshots — checkpoint cost stops scaling with
    # total state size (the difference between minutes and seconds
    # per micro-batch on large stateful topologies).
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing"
    ".enabled": "true",
    # Unload inactive state store providers from executors instead of
    # holding every partition's store open forever.
    "spark.sql.streaming.stateStore.maintenanceInterval": "60s",
    # The \r-rewriting console progress bar corrupts line-oriented
    # stdout captures (BENCH_r03.json lost its JSON head to it) and is
    # useless in batch/CI runs.
    "spark.ui.showConsoleProgress": "false",
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
    spark = builder.getOrCreate()
    ensure_package_shipped(spark)
    return spark


def ensure_package_shipped(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via ``addPyFile``.

    Pandas-UDF / ``mapInPandas`` closures pickle module functions *by
    reference*, so every Python worker must be able to
    ``import mydatalake_spark``. On a driver whose working directory is
    the repo that happens by accident; anywhere else (and on a real
    multi-node cluster, where executors share nothing with the driver
    filesystem) it does not. Zipping the package once and registering
    it with ``SparkContext.addPyFile`` is the standard Spark mechanism:
    workers download the file and prepend it to ``sys.path``.

    Idempotent per SparkContext; safe to call on a session we did not
    create (the driver harness passes us its own).
    """
    sc = spark.sparkContext
    if getattr(sc, "_mydatalake_pkg_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"mydatalake_spark_pkg_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fname in files:
                if fname.endswith(".py"):
                    full = os.path.join(root, fname)
                    zf.write(full, os.path.relpath(full, parent))
    sc.addPyFile(zpath)
    sc._mydatalake_pkg_shipped = True
