"""Custom stateful streaming operators via applyInPandasWithState.

[extension] The reference's only incremental mechanism is batch CDC
with a ts guard (reference lib/ingestors.py:123); this module provides
the streaming-native analogue: arbitrary per-key state evolved across
micro-batches. Example operator: ``running_latest`` — for every key,
maintain the latest (ts, value) seen, emitting an update when a newer
event arrives and suppressing stale ones — the exact
``new.ts >= old.ts`` merge semantics, applied per-record in a stream.

At scale the state store is partitioned by key (one shuffle on the
grouping key); the watermark bounds retained state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_TYPE = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("latest_ts", T.TimestampType()),
        T.StructField("latest_value", T.DoubleType()),
        T.StructField("n_updates", T.LongType()),
        T.StructField("n_stale_dropped", T.LongType()),
    ]
)

STATE_TYPE = T.StructType(
    [
        T.StructField("latest_ts_us", T.LongType()),
        T.StructField("latest_value", T.DoubleType()),
        T.StructField("n_updates", T.LongType()),
        T.StructField("n_stale_dropped", T.LongType()),
    ]
)


def _with_key_type(
    base: T.StructType, key_type: "T.DataType"
) -> T.StructType:
    """Rebind the ``key`` field of a schema to the caller's actual key
    column type — the templates below default to LongType, but key_col
    is a free parameter (string user ids must not hit an Arrow
    output-schema mismatch at runtime)."""
    return T.StructType(
        [
            T.StructField("key", key_type)
            if f.name == "key"
            else f
            for f in base.fields
        ]
    )


def _concat_sorted(pdf_iter: Iterator["object"], sort_cols_from=None):
    """Concatenate ALL Arrow chunks of a group and sort ONCE: Spark
    may split a large group across chunks, and sorting each chunk
    independently would process in-watermark out-of-order events in
    arrival order whenever they span a chunk boundary — making
    results depend on chunk size. Returns None for an empty group
    (e.g. a timeout-only invocation)."""
    import pandas as pd

    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    if not chunks:
        return None
    pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
    cols = [
        c
        for c in (sort_cols_from or ("ts", "event_id"))
        if c in pdf.columns
    ]
    return pdf.sort_values(cols, kind="stable") if cols else pdf


def _update_latest(
    key: tuple[Any, ...],
    pdf_iter: Iterator["object"],
    state: GroupState,
) -> Iterator["object"]:
    """CDC-guard state update (reference semantics: new.ts >= old.ts
    wins, stale suppressed — reference lib/ingestors.py:123)."""
    import pandas as pd

    if state.exists:
        ts_us, value, n_up, n_stale = state.get
    else:
        ts_us, value, n_up, n_stale = -1, None, 0, 0

    pdf = _concat_sorted(pdf_iter, ("ts",))
    if pdf is not None:
        for _, row in pdf.iterrows():
            row_us = int(row["ts"].value // 1000)  # pandas ns → µs
            if row_us >= ts_us:
                ts_us, value = row_us, float(row["value"])
                n_up += 1
            else:
                n_stale += 1

    state.update((ts_us, value, n_up, n_stale))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "latest_ts": [pd.Timestamp(ts_us, unit="us")],
            "latest_value": [value],
            "n_updates": [n_up],
            "n_stale_dropped": [n_stale],
        }
    )


def running_latest(
    df: DataFrame, key_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Stateful latest-wins per key over a stream (or batch test feed).

    Works on a streaming DataFrame grouped by key; output mode
    'update' emits one row per touched key per micro-batch.
    """
    renamed = df.withColumnRenamed(key_col, "key").withColumnRenamed(
        ts_col, "ts"
    )
    return renamed.groupBy("key").applyInPandasWithState(
        _update_latest,
        outputStructType=_with_key_type(
            OUTPUT_TYPE, renamed.schema["key"].dataType
        ),
        stateStructType=STATE_TYPE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TRANSITION_OUTPUT_TYPE = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("prev_state", T.StringType()),
        T.StructField("next_state", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)

TRANSITION_STATE_TYPE = T.StructType(
    [
        T.StructField("last_state", T.StringType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _update_transitions(
    key: tuple[Any, ...],
    pdf_iter: Iterator["object"],
    state: GroupState,
) -> Iterator["object"]:
    """Per-key last-state carry: count consecutive (prev, next) pairs
    within the batch, seeded by the state's carried last state so the
    transition ACROSS a micro-batch boundary is never lost."""
    import pandas as pd

    last_state, last_ts_us = state.get if state.exists else (None, -1)

    counts: dict[tuple[str, str], int] = {}
    pdf_all = _concat_sorted(pdf_iter)
    if pdf_all is not None:
        for _, row in pdf_all.iterrows():
            cur = row["state"]
            if last_state is not None:
                pair = (last_state, cur)
                counts[pair] = counts.get(pair, 0) + 1
            last_state = cur
            last_ts_us = int(row["ts"].value // 1000)

    state.update((last_state, last_ts_us))
    if counts:
        pairs = sorted(counts)
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(pairs),
                "prev_state": [p for p, _ in pairs],
                "next_state": [n for _, n in pairs],
                "n": [counts[p] for p in pairs],
            }
        )


def stream_transitions(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
) -> DataFrame:
    """Streaming first-order transition counts — the incremental
    sibling of operators/sequences.py:transition_matrix. Emits per
    micro-batch the (key, prev_state, next_state, n) increments
    observed in that batch; the per-key state carries only the LAST
    seen state (a few bytes per key), so cross-batch transitions
    count exactly and state never grows with history. Summing the
    increments over a drain sequence equals the batch operator's
    counts on the concatenated input (batch-parity tested, including
    the boundary transition) PROVIDED micro-batches partition each
    key's stream in event-time order — the append-only file-source
    pattern; an event older than the carried state counts in arrival
    order instead (the state keeps last_ts_us so such regressions are
    detectable, but a few-bytes state cannot re-sort history — feed
    from a watermark-ordered source when strict event-time parity
    matters). Downstream, fold the increments with a grouped sum
    (update mode) or stream_into_view."""
    renamed = (
        df.withColumnRenamed(key_col, "key")
        .withColumnRenamed(ts_col, "ts")
        .withColumnRenamed(state_col, "state")
    )
    return renamed.groupBy("key").applyInPandasWithState(
        _update_transitions,
        outputStructType=_with_key_type(
            TRANSITION_OUTPUT_TYPE, renamed.schema["key"].dataType
        ),
        stateStructType=TRANSITION_STATE_TYPE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT_TYPE = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_STATE_TYPE = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _closed_session_updater(gap_ms: int):
    def update(
        key: tuple[Any, ...],
        pdf_iter: Iterator["object"],
        state: GroupState,
    ) -> Iterator["object"]:
        import pandas as pd

        closed: list[tuple[int, int, int]] = []
        if state.hasTimedOut:
            # the watermark passed last_event + gap with no new data:
            # the open session IS closed — emit and clear
            if state.exists:
                closed.append(state.get)
            state.remove()
        else:
            start_us, end_us, n = state.get if state.exists else (
                None, None, 0,
            )
            pdf_all = _concat_sorted(pdf_iter)
            if pdf_all is not None:
                for _, row in pdf_all.iterrows():
                    t_us = int(row["ts"].value // 1000)
                    if start_us is None:
                        start_us, end_us, n = t_us, t_us, 1
                    elif t_us - end_us > gap_ms * 1000:
                        closed.append((start_us, end_us, n))
                        start_us, end_us, n = t_us, t_us, 1
                    else:
                        end_us, n = max(end_us, t_us), n + 1
            if start_us is not None:
                state.update((start_us, end_us, n))
                # fire when the EVENT-TIME watermark passes the open
                # session's end + gap — late stragglers inside the gap
                # (and the watermark slack) still extend it
                state.setTimeoutTimestamp(end_us // 1000 + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(closed),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _ in closed
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="us") for _, e, _ in closed
                    ],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return update


def closed_sessions(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Closed-session detection via EVENT-TIME TIMEOUTS — the state
    API surface none of the other stateful operators use: a session
    stays open in state while events keep arriving within ``gap``;
    when the event-time watermark passes the last event + gap, Spark
    calls the function with ``hasTimedOut`` and the session emits as
    CLOSED — exactly once, without waiting for the key's next event
    (the failure mode of purely data-driven sessionization: a user
    who never returns never flushes).

    Complements ``events.session_agg`` (session_window): that emits
    per-window aggregates under append mode; this one owns its state,
    so sessions can carry arbitrary custom payloads and the close
    event itself is a first-class record. State per key = 3 longs;
    the watermark bounds how long a straggler can still extend a
    session.
    """
    from pyspark.sql import functions as F

    gap_ms = _duration_ms(gap)
    renamed = (
        df.withColumnRenamed(key_col, "key")
        .withColumnRenamed(ts_col, "ts")
        .withWatermark("ts", watermark)
    )
    return renamed.groupBy("key").applyInPandasWithState(
        _closed_session_updater(gap_ms),
        outputStructType=_with_key_type(
            SESSION_OUTPUT_TYPE, renamed.schema["key"].dataType
        ),
        stateStructType=SESSION_STATE_TYPE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def closed_sessions_batch(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Batch twin of :func:`closed_sessions` — the SAME close semantics
    replayed declaratively over a bounded frame, so the stateful
    streaming operator has an oracle-checkable (and unit-diffable)
    reference: sessions split where consecutive events sit STRICTLY
    more than ``gap`` apart (the updater's ``t - end > gap``), and a
    session is CLOSED iff either a later same-key event exists beyond
    the gap (the inline data-driven close) or the end-of-input
    watermark — ``max(ts) − watermark`` — strictly passed its
    ``session_end + gap`` timeout (the EventTimeTimeout close). Each
    key's final session stays open unless the watermark caught it,
    exactly as the state store would hold it.

    Plan shape: one key-partitioned window pass (lag → break flags →
    running session ids), one groupBy to session rows, the global max
    ts as a one-row broadcast scalar join — no collect, no
    unpartitioned window over event rows.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    gap_iv = F.expr(f"INTERVAL {gap}")
    wm_iv = F.expr(f"INTERVAL {watermark}")
    renamed = df.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).alias("key"), F.col(ts_col).alias("ts")
    )
    w = Window.partitionBy("key").orderBy("ts")
    prev = F.lag(F.col("ts")).over(w)
    brk = F.when(
        prev.isNull() | (F.col("ts") > prev + gap_iv), 1
    ).otherwise(0)
    grouped = renamed.withColumn(
        "__grp__",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sess = grouped.groupBy("key", "__grp__").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
    last_grp = F.max("__grp__").over(Window.partitionBy("key"))
    bounds = df.agg(F.max(F.col(ts_col)).alias("__maxts__"))
    return (
        sess.withColumn("__last__", F.col("__grp__") == last_grp)
        .crossJoin(F.broadcast(bounds))
        .where(
            (~F.col("__last__"))
            | (F.col("session_end") + gap_iv < F.col("__maxts__") - wm_iv)
        )
        .select("key", "session_start", "session_end", "n_events")
    )


def _duration_ms(spec: str) -> int:
    qty, unit = spec.split()
    factor = {
        "millisecond": 1, "milliseconds": 1,
        "second": 1000, "seconds": 1000,
        "minute": 60_000, "minutes": 60_000,
        "hour": 3_600_000, "hours": 3_600_000,
    }[unit]
    return int(qty) * factor


# ---------------------------------------------------------------------
# Evolvable state: restart a checkpoint under a NEWER operator version
# ---------------------------------------------------------------------
#
# applyInPandasWithState freezes the state store's physical value
# schema at first checkpoint — Spark's state-schema compatibility check
# rejects a restart whose stateStructType differs. The engine therefore
# keeps the PHYSICAL state schema fixed at (version int, payload json
# string) and evolves the LOGICAL schema inside the payload: a new
# operator version reads any older payload and defaults its new fields.
# This is the standard pre-Spark-4 production pattern for long-lived
# streaming topologies (state outlives code).
#
# Spark 4's transformWithStateInPandas + Avro state encoding
# (spark.sql.streaming.stateStore.encodingFormat=avro) is the fully
# built-in successor — named state variables with nullable-field
# evolution. Its Python runner needs the google.protobuf package,
# which this container lacks (probe below), so that path is
# capability-gated exactly like delta-spark.

EVOLVABLE_STATE_TYPE = T.StructType(
    [
        T.StructField("version", T.IntegerType()),
        T.StructField("payload", T.StringType()),
    ]
)

EVOLVABLE_OUTPUT_V1 = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("latest_ts", T.TimestampType()),
        T.StructField("latest_value", T.DoubleType()),
        T.StructField("n_updates", T.LongType()),
    ]
)

# v2 adds the stale-drop counter column to the CDC guard.
EVOLVABLE_OUTPUT_V2 = T.StructType(
    EVOLVABLE_OUTPUT_V1.fields
    + [T.StructField("n_stale_dropped", T.LongType())]
)


def _evolvable_update(version: int):
    def update(key, pdf_iter, state: GroupState):
        import json

        import pandas as pd

        if state.exists:
            _ver, payload = state.get
            st = json.loads(payload)
        else:
            st = {}
        ts_us = st.get("ts_us", -1)
        value = st.get("value")
        n_up = st.get("n_updates", 0)
        # field added in v2: absent from v1 payloads, defaults to 0
        n_stale = st.get("n_stale_dropped", 0)

        pdf_all = _concat_sorted(pdf_iter, ("ts",))
        if pdf_all is not None:
            for _, row in pdf_all.iterrows():
                row_us = int(row["ts"].value // 1000)
                if row_us >= ts_us:
                    ts_us, value = row_us, float(row["value"])
                    n_up += 1
                else:
                    n_stale += 1

        payload = {"ts_us": ts_us, "value": value, "n_updates": n_up}
        if version >= 2:
            payload["n_stale_dropped"] = n_stale
        state.update((version, json.dumps(payload)))
        out = {
            "key": [key[0]],
            "latest_ts": [pd.Timestamp(ts_us, unit="us")],
            "latest_value": [value],
            "n_updates": [n_up],
        }
        if version >= 2:
            out["n_stale_dropped"] = [n_stale]
        yield pd.DataFrame(out)

    return update


def running_latest_evolvable(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    version: int = 2,
) -> DataFrame:
    """CDC-guard stateful operator with an upgrade-stable state layout.

    ``version=1`` is the frozen previous release (no stale counter);
    ``version=2`` adds the ``n_stale_dropped`` column. Both share the
    same physical state schema, so a v1 checkpoint restarts cleanly
    under v2 with the new field defaulted — asserted by
    tests/test_streaming.py::test_restart_with_evolved_state_schema.
    """
    renamed = df.withColumnRenamed(key_col, "key").withColumnRenamed(
        ts_col, "ts"
    )
    return renamed.groupBy("key").applyInPandasWithState(
        _evolvable_update(version),
        outputStructType=_with_key_type(
            EVOLVABLE_OUTPUT_V2 if version >= 2 else EVOLVABLE_OUTPUT_V1,
            renamed.schema["key"].dataType,
        ),
        stateStructType=EVOLVABLE_STATE_TYPE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def transform_with_state_available() -> bool:
    """Capability probe for Spark 4's transformWithStateInPandas: its
    streaming Python runner imports google.protobuf at startup; without
    it the driver worker crashes (verified in this container). Gate any
    TWS-based operator on this, like delta_available() gates MERGE."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False
