"""Job orchestration: metadata-driven multi-table pipeline runs.

Reference parity: ``{layer}/job_metadata.yml`` declares jobs
(name, type ∈ {full, cdc}, table list with table_name / input_format /
catalog / schema — reference bronze/job_metadata.yml:1-26; [extension]
type ``append`` file-move-appends key-less event feeds via
IngestorAppend — O(new files), never O(table); type ``copy_into``
drains a landing zone with per-file exactly-once loads);
``find_job`` resolves a (job_type, job_name) pair
(reference lib/utils.py:11-24); ``job.ipynb`` then launches one child
notebook per table via ``dbutils.notebook.run``
(reference bronze/job.ipynb cell 3).

Rebuild: a plain in-process runner — each table's ingestion is one
Spark job on the shared session (no notebook/process boundary; on a
real cluster, per-table isolation comes from the scheduler above this
layer — Airflow/spark-submit — not from the engine). The reference's
``input_format='delta'`` ("run the transform SQL against catalog
tables", reference lib/ingestors.py:82-85) maps to ``table``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from .catalog import Catalog
from .ingest import Ingestor, IngestorAppend, IngestorCDC

try:
    import yaml  # type: ignore
except Exception:  # pragma: no cover
    yaml = None


class JobNotFound(LookupError):
    pass


def parse_yaml(path: str) -> dict[str, Any]:
    """(reference lib/utils.py:2-8) — but raising instead of printing
    and returning None on a missing file."""
    if yaml is None:  # pragma: no cover
        raise RuntimeError("PyYAML unavailable")
    with open(path) as fh:
        return yaml.safe_load(fh)


def find_job(metadata_root: str, job_type: str, job_name: str) -> dict[str, Any]:
    """Resolve a job declaration from ``{layer}/job_metadata.yml``
    (reference lib/utils.py:11-24). The layer dir is the job-name
    prefix (``bronze_full`` → ``bronze/``)."""
    layer = job_name.split("_")[0]
    path = os.path.join(metadata_root, layer, "job_metadata.yml")
    data = parse_yaml(path)
    for job in data.get("jobs", []):
        if job.get("name") == job_name and job.get("type") == job_type:
            return job
    raise JobNotFound(f"no job name={job_name!r} type={job_type!r} in {path}")


@dataclass
class JobRunner:
    """Run every table of a declared job (reference job.ipynb loop).

    ``input_paths`` maps table_name → raw file path for file-format
    tables (the reference derives these from its /Volumes layout,
    reference lib/ingestors.py:15; here they are explicit).
    """

    spark: SparkSession
    catalog: Catalog
    metadata_root: str
    input_paths: dict[str, str] = field(default_factory=dict)
    partition_by: dict[str, list[str]] = field(default_factory=dict)

    def run(self, job_type: str, job_name: str) -> list[str]:
        """Execute the job; returns the full table names written."""
        job = find_job(self.metadata_root, job_type, job_name)
        layer = job_name.split("_")[0]
        if job_type == "quality":
            return self._run_quality(job, layer)
        if job_type == "wap":
            return self._run_wap(job, layer)
        if job_type == "streaming":
            return self._run_streaming(job, layer)
        if job_type == "reconcile":
            return self._run_reconcile(job)
        if job_type == "copy_into":
            return self._run_copy_into(job)
        if job_type == "cdf_subscribe":
            return self._run_cdf_subscribe(job)
        if job_type == "sql":
            return self._run_sql(job, layer)
        written: list[str] = []
        for tbl in job.get("tables", []):
            name = tbl["table_name"]
            fmt = tbl.get("input_format", "json")
            if fmt == "delta":  # reference dialect for "from catalog"
                fmt = "table"
            cls = {
                "cdc": IngestorCDC,
                "append": IngestorAppend,
            }.get(job_type, Ingestor)
            kwargs: dict[str, Any] = {}
            if job_type == "cdc":
                # per-table merge strategy (join | bloom) — declared in
                # job metadata like everything else about the table
                kwargs["merge_strategy"] = tbl.get("merge_strategy", "join")
            if job_type == "append":
                # optional replay token (Delta txnAppId analogue):
                # declared per table in job metadata; a re-run with
                # the same token is an exactly-once no-op
                kwargs["txn_id"] = tbl.get("txn_id")
            ing = cls(
                spark=self.spark,
                catalog=self.catalog,
                metadata_root=os.path.join(self.metadata_root, layer),
                table=name,
                input_format=fmt,
                input_path=self.input_paths.get(name),
                partition_by=self.partition_by.get(name, []),
                catalog_name=tbl.get("catalog"),
                schema_name=tbl.get("schema"),
                **kwargs,
            )
            ing.run()
            written.append(ing.meta.full_name)
        return written

    def _run_sql(self, job: dict[str, Any], layer: str) -> list[str]:
        """``type: sql`` jobs — the DLT "run all transformations"
        shape (reference Pipelines/Test: every dataset is a .sql file
        under transformations/, and 'Run pipeline' executes them all):
        each ``scripts:`` entry is a ``path:`` to a .sql file
        (resolved against the job's LAYER dir — where its job_metadata.yml lives — unless absolute) or an inline
        ``sql:`` block, executed through run_table_script — so MV
        definitions, DDL, DML, MERGE and COPY INTO statements all
        work, with the same dialect shims as every transform. Scripts
        run in declared order, fail-fast (Databricks cell semantics).
        Returns the executed script identifiers."""
        from .plans.table_sql import run_table_script

        executed: list[str] = []
        for item in job.get("scripts", []):
            if "sql" in item:
                run_table_script(self.catalog, item["sql"])
                executed.append(item.get("name", "<inline>"))
                continue
            p = item["path"]
            full = (
                p
                if os.path.isabs(p)
                else os.path.join(self.metadata_root, layer, p)
            )
            with open(full) as fh:
                run_table_script(self.catalog, fh.read())
            executed.append(full)
        return executed

    def _run_copy_into(self, job: dict[str, Any]) -> list[str]:
        """``type: copy_into`` jobs: per-table file-level idempotent
        batch loads (ingest.copy_into — the Databricks COPY INTO
        analogue). Each table entry declares ``table`` (full dotted
        name of an EXISTING catalog table), ``path`` (directory or
        glob; the runner's ``input_paths`` override by short name
        wins, matching the other job types), and optional
        ``file_format`` (default json). Re-running the job loads only
        files that landed since the last run — the scheduled shape of
        a landing-zone drain."""
        written: list[str] = []
        from .ingest import copy_into

        for tbl in job.get("tables", []):
            full = tbl["table"]
            short = full.split(".")[-1]
            path = self.input_paths.get(short, tbl.get("path"))
            if not path:
                raise ValueError(
                    f"copy_into job: table {full} needs a 'path' (or "
                    "a runner input_paths entry)"
                )
            copy_into(
                self.catalog, full, path,
                file_format=tbl.get("file_format", "json"),
            )
            written.append(full)
        return written

    def _run_cdf_subscribe(self, job: dict[str, Any]) -> list[str]:
        """``type: cdf_subscribe`` jobs: subscribe a downstream
        replica to a source table's own commits (streaming/cdf.py) —
        each run is one drain: export the commits landed since the
        feed's token, then consume them through the availableNow
        stream into the replica, tokens committed atomically at both
        hops. Per table the YAML declares ``source_table``, ``keys``,
        ``replica`` (destination full name), and optionally
        ``feed_dir`` / ``checkpoint_dir`` (defaulted under the
        warehouse beside the streaming-ingest checkpoints)."""
        from .streaming.cdf import export_table_changes, subscribe_replica

        written: list[str] = []
        for tbl in job.get("tables", []):
            src, dst = tbl["source_table"], tbl["replica"]
            feed_dir = tbl.get("feed_dir") or os.path.join(
                self.catalog.warehouse, "_cdf", src
            )
            ckpt = tbl.get("checkpoint_dir") or os.path.join(
                self.catalog.warehouse, "_checkpoints", "cdf", dst
            )
            export_table_changes(
                self.catalog, src, list(tbl["keys"]), feed_dir,
                partition_cols=tbl.get("partition_cols"),
            )
            subscribe_replica(self.spark, feed_dir, self.catalog, dst, ckpt)
            written.append(dst)
        return written

    def _run_reconcile(self, job: dict[str, Any]) -> list[str]:
        """``type: reconcile`` jobs: snapshot-diff two catalog tables
        (operators/diff.py) and persist the changeset as an audit
        table — the replication-validation / publish-verification job
        of a lakehouse. Per table the YAML declares ``source_table``,
        ``target_table``, ``keys``, optional ``compare_cols``,
        ``include_values`` (carry new_row structs so the changeset is
        replayable via apply_snapshot_diff), and ``output_table``
        (default: ``{target_table}_diff``)."""
        from .operators.diff import snapshot_diff

        written: list[str] = []
        for tbl in job.get("tables", []):
            src = self.catalog.read(tbl["source_table"])
            tgt = self.catalog.read(tbl["target_table"])
            diff = snapshot_diff(
                src,
                tgt,
                keys=list(tbl["keys"]),
                compare_cols=tbl.get("compare_cols"),
                include_new_values=bool(tbl.get("include_values", False)),
            )
            out_name = tbl.get(
                "output_table", f"{tbl['target_table']}_diff"
            )
            self.catalog.overwrite(diff, out_name)
            written.append(out_name)
        return written

    def _run_streaming(self, job: dict[str, Any], layer: str) -> list[str]:
        """``type: streaming`` jobs: the raw zone consumed as a
        file-source stream, each micro-batch CDC-merged under the same
        table metadata (ingest.py:IngestorStreaming). availableNow
        drain per run — rerunning the job picks up only files the
        checkpoint hasn't seen."""
        from .ingest import IngestorStreaming

        written: list[str] = []
        for tbl in job.get("tables", []):
            name = tbl["table_name"]
            ing = IngestorStreaming(
                spark=self.spark,
                catalog=self.catalog,
                metadata_root=os.path.join(self.metadata_root, layer),
                table=name,
                input_format=tbl.get("input_format", "json"),
                input_path=self.input_paths.get(name),
                partition_by=self.partition_by.get(name, []),
                catalog_name=tbl.get("catalog"),
                schema_name=tbl.get("schema"),
            )
            ing.run()
            written.append(ing.meta.full_name)
        return written

    def _run_wap(self, job: dict[str, Any], layer: str) -> list[str]:
        """``type: wap`` jobs: full-load ingestion GATED by the table's
        own YAML-declared checks (quality/wap.py) — clean rows publish,
        failing rows quarantine, and a batch below the per-table
        ``min_clean_fraction`` (job metadata, default 1.0) aborts that
        table's publish entirely. The checks-as-gate composition of the
        reference's two separate entry points."""
        from .quality.checks import specs_from_meta
        from .quality.wap import write_audit_publish
        from .schema import load_table_meta

        written: list[str] = []
        for tbl in job.get("tables", []):
            name = tbl["table_name"]
            fmt = tbl.get("input_format", "json")
            if fmt == "delta":
                fmt = "table"
            ing = Ingestor(
                spark=self.spark,
                catalog=self.catalog,
                metadata_root=os.path.join(self.metadata_root, layer),
                table=name,
                input_format=fmt,
                input_path=self.input_paths.get(name),
                partition_by=self.partition_by.get(name, []),
                catalog_name=tbl.get("catalog"),
                schema_name=tbl.get("schema"),
            )
            meta = ing.meta
            report = write_audit_publish(
                self.catalog,
                meta.full_name,
                ing.load(),
                specs_from_meta(meta),
                meta.key_columns,
                min_clean_fraction=float(
                    tbl.get("min_clean_fraction", 1.0)
                ),
                mode="overwrite",
            )
            written.append(report.table)
        return written

    def _run_quality(self, job: dict[str, Any], layer: str) -> list[str]:
        """``type: quality`` jobs: run the declared YAML checks of every
        listed table against its CATALOG table and persist results +
        history (the reference's third entry point, tests.ipynb →
        CheckerHandler.execute, reference lib/checker_handler.py:209-221
        — orchestrated from job metadata instead of a notebook)."""
        from .quality.runner import CheckRunner, TableCheck
        from .schema import load_table_meta

        checks: list[TableCheck] = []
        for tbl in job.get("tables", []):
            name = tbl["table_name"]
            meta = load_table_meta(
                os.path.join(self.metadata_root, layer, name, f"{name}.yml")
            )
            if tbl.get("catalog"):
                meta.catalog = tbl["catalog"]
            if tbl.get("schema"):
                meta.schema = tbl["schema"]
            checks.append(
                TableCheck(
                    df=self.catalog.read(meta.full_name),
                    meta=meta,
                    layer=layer,
                )
            )
        runner = CheckRunner(self.spark, self.catalog)
        runner.execute(checks)
        return [runner.results_table, runner.history_table]
