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

    for pdf in pdf_iter:
        for _, row in pdf.sort_values("ts").iterrows():
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
        outputStructType=OUTPUT_TYPE,
        stateStructType=STATE_TYPE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
