"""Write-Audit-Publish: the DQ engine as a publish gate.

[extension] The reference RECORDS check results (reference
lib/checker_handler.py:116-194) but publishes data regardless; the
modern lakehouse pattern gates the publish itself: stage the batch,
audit it with the declarative checks, and only rows that pass reach
the production table — failing rows land in a quarantine table with
their failure reasons, and a batch whose clean fraction falls below
``min_clean_fraction`` aborts entirely (publishes NOTHING) so a bad
upstream can't poison the table.

Scale shape: one check pass over the staged batch (annotate's
single-scan compilation), one distinct over failing keys, and two
anti/semi joins on the record key — all hash-shuffles on the same key.
The production write is all-or-nothing via the catalog's staging swap,
so readers never observe a half-published batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import Catalog
from .checks import annotate


class AuditFailed(Exception):
    """Batch rejected: clean fraction below the publish threshold."""


@dataclass
class AuditReport:
    table: str
    rows_total: int
    rows_clean: int
    rows_quarantined: int
    clean_fraction: float
    published: bool


def write_audit_publish(
    catalog: Catalog,
    table: str,
    batch: DataFrame,
    column_tests: list[dict[str, Any]],
    key_cols: list[str],
    min_clean_fraction: float = 1.0,
    quarantine_table: str | None = None,
    mode: str = "append",
    run_date: str | None = None,
    as_of: str | None = None,
    batch_id: str | None = None,
) -> AuditReport:
    """Audit ``batch`` with the declarative checks and publish only if
    the clean fraction meets the bar.

    - clean rows → ``table`` (``mode`` 'append' or 'overwrite');
    - failing rows → ``quarantine_table`` (default ``{table}_quarantine``)
      together with a ``failed_tests`` array naming what they violated;
    - clean fraction < ``min_clean_fraction`` → :class:`AuditFailed`,
      nothing is written anywhere (the quarantine write also waits —
      an aborted batch should be retried upstream, not half-recorded).

    Failure-ordering contract: the PRODUCTION table publishes first,
    quarantine second. A crash between the two leaves production
    correct and quarantine missing a batch (recoverable by re-running
    the audit), never the reverse — the old quarantine-first order let
    a failed production write strand quarantine rows with nothing
    published, and a retry duplicated them. With ``batch_id`` set the
    quarantine append is additionally idempotent: rows are tagged
    ``__wap_batch__ = batch_id`` and any prior rows with the same tag
    are dropped before the append, so retries never double-record a
    batch. (The production append itself is at-least-once under
    caller retries — retry with mode='overwrite', or pass a key-unique
    table where a MERGE-style upsert applies.)
    """
    if not 0.0 <= min_clean_fraction <= 1.0:
        raise ValueError("min_clean_fraction must be in [0, 1]")
    quarantine_table = quarantine_table or f"{table}_quarantine"

    keyed = batch
    keyed.cache()
    try:
        rows_total = keyed.count()
        # keep_key_cols: routing joins on the RAW key columns with
        # null-safe equality. The display df_key ('_'-joined, reference
        # scheme) is NOT collision-free — it skips nulls and admits
        # separator injection (('a_b','c') == ('a','b_c')) — and a
        # collision here would quarantine a CLEAN row that merely
        # collides with a failed one.
        results = annotate(
            batch, column_tests, key_cols, run_date=run_date, as_of=as_of,
            keep_key_cols=True,
        )
        kcols = [f"__k_{c}__" for c in key_cols]
        failures = (
            results.filter(F.col("check_result") == "failed")
            .groupBy(*kcols)
            .agg(F.sort_array(F.collect_set("test_name"))
                 .alias("failed_tests"))
        )
        on = None
        for c in key_cols:
            term = keyed[c].eqNullSafe(failures[f"__k_{c}__"])
            on = term if on is None else on & term
        dirty = keyed.join(failures, on).drop(*kcols)
        clean = keyed.join(failures.select(*kcols), on, "left_anti")

        rows_quarantined = dirty.count()
        rows_clean = rows_total - rows_quarantined
        frac = 1.0 if rows_total == 0 else rows_clean / rows_total
        if frac < min_clean_fraction:
            raise AuditFailed(
                f"batch for {table} is {frac:.3%} clean, below the "
                f"{min_clean_fraction:.3%} publish bar "
                f"({rows_quarantined}/{rows_total} rows failed checks)"
            )

        if mode == "overwrite" or not catalog.exists(table):
            catalog.overwrite(clean, table)
        elif mode == "append":
            existing = catalog.read(table)
            catalog.overwrite_via_staging(
                existing.unionByName(clean), table
            )
        else:
            raise ValueError(f"unknown mode {mode!r}")

        if rows_quarantined:
            quarantined = dirty
            if batch_id is not None:
                quarantined = quarantined.withColumn(
                    "__wap_batch__", F.lit(batch_id)
                )
            if catalog.exists(quarantine_table):
                existing_q = catalog.read(quarantine_table)
                if (
                    batch_id is not None
                    and "__wap_batch__" in existing_q.columns
                ):
                    existing_q = existing_q.filter(
                        F.col("__wap_batch__") != F.lit(batch_id)
                    )
                catalog.overwrite_via_staging(
                    existing_q.unionByName(
                        quarantined, allowMissingColumns=True
                    ),
                    quarantine_table,
                )
            else:
                catalog.overwrite(quarantined, quarantine_table)

        return AuditReport(
            table=table,
            rows_total=rows_total,
            rows_clean=rows_clean,
            rows_quarantined=rows_quarantined,
            clean_fraction=frac,
            published=True,
        )
    finally:
        keyed.unpersist()
