"""Event-stream operators: tumbling / sliding / session windows.

[extension] The reference has no streaming (SURVEY.md §2.9) — its
incremental path is batch CDC with a ``new.ts >= old.ts`` guard
(reference lib/ingestors.py:123), the batch analogue of a watermark.
These operators provide the streaming-shaped surface over the
``events`` table and work identically on batch AND streaming
DataFrames (Structured Streaming's unified model): the same
``tumbling_agg(df)`` call compiles to an incremental stateful plan
when ``df`` is a stream.

Late data: pass ``watermark=`` on streams — mirroring the reference's
stale-update suppression semantics (SURVEY.md §7.4(7)). At scale,
state cleanup via watermark is what keeps the session-window state
store bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    group_by: list[str] | None = None,
    aggs: dict[str, str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Fixed windows: groupBy(window(ts, duration), *group_by).

    Output flattens window.start/end to ``window_start``/``window_end``.
    """
    aggs = aggs or {"*": "count"}
    df = _maybe_watermark(df, ts_col, watermark)
    exprs = _agg_exprs(aggs)
    out = df.groupBy(F.window(ts_col, duration), *(group_by or [])).agg(*exprs)
    return _flatten_window(out)


def sliding_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "15 minutes",
    group_by: list[str] | None = None,
    aggs: dict[str, str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: window(ts, duration, slide)."""
    aggs = aggs or {"*": "count"}
    df = _maybe_watermark(df, ts_col, watermark)
    out = df.groupBy(
        F.window(ts_col, duration, slide), *(group_by or [])
    ).agg(*_agg_exprs(aggs))
    return _flatten_window(out)


def session_agg(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    group_by: list[str] | None = None,
    aggs: dict[str, str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: dynamic extent, closed after ``gap`` of
    inactivity per group (``F.session_window``). On streams this is a
    stateful merge-able aggregation; the watermark bounds state."""
    aggs = aggs or {"*": "count"}
    df = _maybe_watermark(df, ts_col, watermark)
    out = df.groupBy(
        F.session_window(ts_col, gap), *(group_by or [])
    ).agg(*_agg_exprs(aggs))
    return _flatten_window(out, window_col="session_window")


def _agg_exprs(aggs: dict[str, str]):
    exprs = []
    for col, fn in aggs.items():
        if fn == "count":
            exprs.append(F.count(F.lit(1)).alias("n_events"))
        else:
            exprs.append(getattr(F, fn)(col).alias(f"{fn}_{col}"))
    return exprs


def _flatten_window(df: DataFrame, window_col: str = "window") -> DataFrame:
    others = [c for c in df.columns if c != window_col]
    return df.select(
        F.col(f"{window_col}.start").alias("window_start"),
        F.col(f"{window_col}.end").alias("window_end"),
        *others,
    )


def stream_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key delivery over an at-least-once stream:
    drop duplicate events by ``keys`` arriving within the watermark
    horizon (``dropDuplicatesWithinWatermark``, the streaming analogue
    of exact dedup — at-least-once sources like Kafka replays or
    file-redelivery become effectively-once downstream).

    Scale: state is one entry per key seen within the watermark, and
    the watermark EVICTS state — unbounded-time dedup on a stream
    would grow state forever, so the horizon is the contract: a
    duplicate arriving later than ``watermark`` after the first copy
    is not suppressed. Batch frames fall back to plain
    ``dropDuplicates`` (full-history dedup, the batch semantics of
    the same contract)."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark) \
            .dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "10 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: pair each left event with right
    events of the same ``key`` whose timestamp falls in
    (left_ts − within, left_ts] — e.g. attribute a click to the views
    that preceded it. Structured Streaming keeps BOTH sides' state;
    the time-bound condition plus the watermarks is what lets it evict
    (an unbounded stream-stream join would grow state forever — the
    interval is the contract that makes 100 TB/day joinable). On
    batch frames the same call degrades to a plain range-condition
    join (no watermark needed)."""
    lts, rts = f"__l_{left_ts}", f"__r_{right_ts}"
    l = left.withColumnRenamed(left_ts, lts)
    r = right.select(
        F.col(key).alias("__rkey"),
        F.col(right_ts).alias(rts),
        *[c for c in right.columns if c not in (key, right_ts)],
    )
    if left.isStreaming:
        l = l.withWatermark(lts, watermark)
    if right.isStreaming:
        r = r.withWatermark(rts, watermark)
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (F.col(rts) <= F.col(lts))
        & (F.col(rts) > F.col(lts) - F.expr(f"INTERVAL {within}"))
    )
    return (
        l.join(r, cond, how)
        .drop("__rkey")
        .withColumnRenamed(lts, left_ts)
        .withColumnRenamed(rts, f"right_{right_ts}")
    )


def stream_from_json_dir(spark, path: str, schema) -> DataFrame:
    """File-source stream (the natural OSS stand-in for the reference's
    raw-zone JSON drops, reference lib/ingestors.py:78-79):
    ``readStream`` over a directory; new files become micro-batches."""
    return spark.readStream.schema(schema).json(path)


def stream_into_view(
    stream_df: DataFrame,
    view,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Continuously maintain an incremental view from a stream: every
    micro-batch folds into the stored gold table via ``foreachBatch``
    — streaming incremental-view maintenance, the DLT "streaming
    table feeds a materialized view" shape on OSS Spark. ``view`` is
    anything with an append-only ``apply(batch)`` fold —
    ``IncrementalAggView`` (SUM/COUNT partials) and
    ``SketchDistinctView`` (mergeable HLL distinct sketches) both
    qualify.

    Exactly-once composition: foreachBatch is at-least-once under
    retries, so the fold passes the batch_id as the view's
    ``batch_token`` — the token commits ATOMICALLY with the fold (a
    marker file riding the staged directory swap) and a replayed
    batch_id is skipped, making the non-idempotent fold idempotent
    per batch (ADVICE r9). The checkpoint must still outlive the view
    table; for a re-baseline, drop BOTH the view table and this
    checkpoint, then replay history.
    Returns the started StreamingQuery (caller awaits/stops)."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            view.apply(batch_df, batch_token=batch_id)

    writer = (
        stream_df.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_changes_into_view(
    stream_df: DataFrame,
    view,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """The retraction-aware sibling of :func:`stream_into_view`: the
    stream carries Delta-CDF-shaped change rows (``_change_type`` ∈
    insert/delete/update_preimage/update_postimage — a CDC topic, a
    Delta change feed, or operators/diff.py:change_feed output landed
    on a queue) and every micro-batch folds into the view through
    ``IncrementalAggView.apply_changes``, so UPDATES and DELETES
    maintain the gold table continuously — no re-baseline. Same
    exactly-once composition as stream_into_view — and the
    ``batch_token`` idempotency matters MORE here (ADVICE r9): a
    replayed change batch double-applies retractions, which corrupts
    (groups wrongly vanishing) rather than merely inflates. Returns
    the started StreamingQuery."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            view.apply_changes(batch_df, batch_token=batch_id)

    writer = (
        stream_df.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def enrich_stream(
    stream_df: DataFrame,
    dim_df: DataFrame,
    keys: list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static dimension enrichment — the bread-and-butter
    streaming join Structured Streaming supports natively: each
    micro-batch of the stream joins against the (batch) dimension
    table, re-read per batch so slowly-changing dims stay current
    without restarting the query.

    ``broadcast_dim=True`` hints the dim side broadcast (the right
    call for catalog-sized dims at any scale — the stream side never
    shuffles); pass False for a dim too big to broadcast and let AQE
    decide per batch. ``how`` follows Spark's stream-static support
    matrix (inner/left from the stream side)."""
    dim = F.broadcast(dim_df) if broadcast_dim else dim_df
    return stream_df.join(dim, keys, how)
