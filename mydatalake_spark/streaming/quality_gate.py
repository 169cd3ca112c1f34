"""Streaming data-quality gate: per-micro-batch WAP with quarantine.

[extension] Composes the two subsystems the reference keeps separate
(batch DQ checks, reference lib/checker.py; ingestion) into the
streaming production pattern: every micro-batch is audited with the
declarative check suite (quality/checks.py:annotate — ONE pass), clean
rows publish to the production table, failing rows land in quarantine
tagged with what they violated, and the whole split is idempotent
under foreachBatch's at-least-once replay because the underlying
write_audit_publish de-duplicates on the batch id.

At scale the audit adds one column-pruned pass over the micro-batch
(not the table); the quarantine is failure-sized. This engine's
parquet catalog appends by staged rewrite (O(table) per batch — the
env has no ACID table format); on Delta/Iceberg the same gate appends
transactionally, which is the deployment shape.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from ..catalog import Catalog
from ..quality.wap import write_audit_publish


def stream_quality_gate(
    stream_df: DataFrame,
    catalog: Catalog,
    table: str,
    column_tests: list[dict[str, Any]],
    key_cols: list[str],
    checkpoint_dir: str,
    min_clean_fraction: float = 0.0,
    quarantine_table: str | None = None,
    run_date: str | None = None,
    as_of: str | None = None,
    trigger_available_now: bool = True,
):
    """Start a streaming query that audits each micro-batch and splits
    it clean→``table`` / failing→quarantine (default
    ``{table}_quarantine``), with the failing rows carrying a
    ``failed_tests`` array naming the violated checks.

    ``min_clean_fraction`` defaults to 0.0 — the streaming gate SPLITS
    rather than aborts, because raising fails the whole query. Setting
    it higher turns the gate fail-stop: a micro-batch dirtier than the
    bar raises AuditFailed, the query dies with nothing written for
    that batch, and the checkpoint replays it after the upstream fix —
    poison-batch detection with exactly-once accounting.

    Returns the started StreamingQuery (caller awaits/stops)."""

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_audit_publish(
            catalog,
            table,
            batch_df,
            column_tests,
            key_cols,
            min_clean_fraction=min_clean_fraction,
            quarantine_table=quarantine_table,
            mode="append",
            run_date=run_date,
            as_of=as_of,
            batch_id=f"stream-{batch_id}",
        )

    writer = (
        stream_df.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
