"""Streaming distribution-drift monitor: per-micro-batch KS / EMD
against a static reference.

[extension] The continuous sibling of the drift queries
(ks_test_events / emd_events): production pipelines don't re-test a
static split, they watch TODAY'S data against a frozen reference
window. Each micro-batch is compared to the reference distribution
with the two-sample KS statistic (worst ECDF gap) and the 1-D
earth-mover's distance (drift magnitude in metric units), and one
monitor row per batch appends to a catalog table — a time series of
drift that downstream DQ gates or dashboards consume.

Scale shape: the reference is persisted once and reduced to its
distinct-value frame per comparison (functions/stats.py:ks_2samp /
emd_1d — one shuffle at value cardinality); the micro-batch side is
batch-sized. The monitor row is O(1). foreachBatch is at-least-once:
replays overwrite the same ``batch_id`` key, so the monitor table
stays idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.stats import ECDF_DISTINCT_CAP, emd_1d, ks_2samp


def drift_report(
    reference_df: DataFrame,
    batch_df: DataFrame,
    value_col: str,
    bins: int | None = None,
    max_distinct: int | None = ECDF_DISTINCT_CAP,
) -> DataFrame:
    """One-row drift comparison of ``batch_df`` vs ``reference_df``:
    (n_ref, n_batch, d_stat, ks_scaled, emd). Batch-usable directly;
    the streaming monitor calls it per micro-batch.

    ``bins`` / ``max_distinct`` pass through to the underlying
    :func:`~..functions.stats.ks_2samp` / :func:`~..functions.stats.
    emd_1d` scale contract — for continuous high-cardinality metrics
    pass ``bins`` (quantized ECDF, bounded state, no cardinality
    probe). ``max_distinct`` is delegated to ks_2samp ONLY — both
    stats share the distinct-value frame of the same combined input,
    so one refusal probe covers both and emd never pays a second
    one."""
    combined = reference_df.select(
        F.lit(0).alias("__side__"), F.col(value_col).alias("__val__")
    ).unionByName(
        batch_df.select(
            F.lit(1).alias("__side__"), F.col(value_col).alias("__val__")
        )
    )
    if bins is not None:
        # quantize ONCE here instead of letting each stat run its own
        # eager min/max bin-edge pass over the same combined frame —
        # halves the per-call (and per-micro-batch) driver jobs; both
        # stats then see a ≤bins-distinct column and need no probe
        from ..functions.stats import _maybe_binned

        combined = combined.select(
            "__side__", _maybe_binned(combined, "__val__", bins).alias(
                "__val__"
            )
        )
    ks = ks_2samp(
        combined, F.col("__side__"), "__val__",
        max_distinct=None if bins is not None else max_distinct,
    )
    emd = emd_1d(
        combined, F.col("__side__"), "__val__", max_distinct=None,
    )
    return (
        ks.select(
            F.col("n_a").alias("n_ref"),
            F.col("n_b").alias("n_batch"),
            "d_stat",
            "ks_scaled",
        )
        .crossJoin(emd.select("emd"))
    )


def stream_drift_monitor(
    stream_df: DataFrame,
    reference_df: DataFrame,
    value_col: str,
    catalog: Catalog,
    monitor_table: str,
    checkpoint_dir: str,
    d_alert: float = 0.2,
    trigger_available_now: bool = True,
    bins: int | None = None,
    max_distinct: int | None = ECDF_DISTINCT_CAP,
):
    """Start a streaming query appending one drift row per micro-batch
    to ``monitor_table``: (batch_id, n_ref, n_batch, d_stat,
    ks_scaled, emd, drifted). ``drifted`` flags d_stat ≥ ``d_alert``
    — the hook a paging rule or a WAP gate keys on.

    For a CONTINUOUS high-cardinality metric, pass ``bins`` (e.g.
    256): the ECDFs quantize, per-batch state stays bounded, and the
    cardinality refusal probe is skipped entirely — a monitor must not
    be able to die mid-stream because today's values got more diverse.
    With the default exact path, one probe per micro-batch guards the
    unpartitioned ECDF window (``DistinctCardinalityExceeded`` inside
    ``foreachBatch`` ends the query — the loud failure mode; pass
    ``bins`` or ``max_distinct=None`` to choose otherwise).

    Idempotent under replay: the row is keyed by batch_id and
    re-merged, not blindly appended. Returns the started
    StreamingQuery."""
    ref = reference_df.select(F.col(value_col)).persist()

    def monitor(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        row = drift_report(
            ref, batch_df, value_col,
            bins=bins, max_distinct=max_distinct,
        ).select(
            F.lit(int(batch_id)).alias("batch_id"),
            "n_ref",
            "n_batch",
            "d_stat",
            "ks_scaled",
            "emd",
            (F.col("d_stat") >= d_alert).alias("drifted"),
        )
        from ..operators.merge import merge_upsert

        if catalog.exists(monitor_table):
            current = catalog.read(monitor_table)
            merged = merge_upsert(
                current, row, keys=["batch_id"], ts_col=None
            )
            catalog.overwrite_via_staging(merged, monitor_table)
        else:
            catalog.overwrite(row, monitor_table)

    writer = (
        stream_df.writeStream.foreachBatch(monitor)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
