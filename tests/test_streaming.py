"""Structured Streaming: file-source stream → windowed aggregations →
memory sink; custom stateful operator. Mirrors batch semantics of the
same operators (unified model)."""

import json
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mydatalake_spark.streaming.events import (
    session_agg,
    stream_from_json_dir,
    tumbling_agg,
)
from mydatalake_spark.streaming.stateful import running_latest

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

ROWS = [
    (1, "2024-01-01T00:05:00", 1, "view", 1.0),
    (2, "2024-01-01T00:20:00", 1, "click", 2.0),
    (3, "2024-01-01T01:10:00", 1, "view", 3.0),   # new hour, new session
    (4, "2024-01-01T00:30:00", 2, "view", 4.0),
    (5, "2024-01-01T00:10:00", 2, "click", 0.5),  # late for user 2
]


def _write_batch(path, rows):
    with open(path, "w") as fh:
        for r in rows:
            fh.write(
                json.dumps(
                    dict(zip(["event_id", "ts", "user_id", "event_type", "value"], r))
                )
                + "\n"
            )


def _run_stream(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_tumbling_stream_matches_batch(spark, tmp_path):
    src = tmp_path / "stream_in"
    src.mkdir()
    _write_batch(src / "a.json", ROWS)

    stream = stream_from_json_dir(spark, str(src), EVENT_SCHEMA)
    assert stream.isStreaming
    agg = tumbling_agg(
        stream, "ts", "1 hour", group_by=["user_id"],
        aggs={"*": "count", "value": "sum"}, watermark="2 hours",
    )
    _run_stream(agg, "tumbling_t")
    got = {
        (r.window_start.isoformat(), r.user_id): (r.n_events, r.sum_value)
        for r in spark.table("tumbling_t").collect()
    }
    assert got == {
        ("2024-01-01T00:00:00", 1): (2, 3.0),
        ("2024-01-01T01:00:00", 1): (1, 3.0),
        ("2024-01-01T00:00:00", 2): (2, 4.5),
    }

    # unified model: identical call on the batch frame gives same rows
    batch = spark.createDataFrame(
        [(a, F.lit(None), c, d, e) for a, b, c, d, e in ROWS],
        EVENT_SCHEMA,
    ) if False else spark.read.schema(EVENT_SCHEMA).json(str(src))
    bagg = tumbling_agg(batch, "ts", "1 hour", group_by=["user_id"],
                        aggs={"*": "count", "value": "sum"})
    bgot = {
        (r.window_start.isoformat(), r.user_id): (r.n_events, r.sum_value)
        for r in bagg.collect()
    }
    assert bgot == got


def test_session_stream(spark, tmp_path):
    src = tmp_path / "sess_in"
    src.mkdir()
    _write_batch(src / "a.json", ROWS)
    stream = stream_from_json_dir(spark, str(src), EVENT_SCHEMA)
    agg = session_agg(
        stream, "ts", "30 minutes", group_by=["user_id"],
        aggs={"*": "count"}, watermark="2 hours",
    )
    _run_stream(agg, "session_t")
    got = {
        (r.user_id, r.window_start.isoformat()): r.n_events
        for r in spark.table("session_t").collect()
    }
    # user 1: events at 00:05 + 00:20 merge (gap 15m), 01:10 separate;
    # user 2: 00:10 + 00:30 merge (gap 20m)
    assert got == {
        (1, "2024-01-01T00:05:00"): 2,
        (1, "2024-01-01T01:10:00"): 1,
        (2, "2024-01-01T00:10:00"): 2,
    }


def test_stateful_running_latest(spark, tmp_path):
    src = tmp_path / "state_in"
    src.mkdir()
    _write_batch(src / "a.json", ROWS)
    stream = stream_from_json_dir(spark, str(src), EVENT_SCHEMA)
    out = running_latest(stream, key_col="user_id", ts_col="ts")
    q = (
        out.writeStream.format("memory")
        .queryName("latest_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.key: r for r in spark.table("latest_t").collect()}
    # user 1: latest is 01:10 value 3.0 (3 in-order updates)
    assert got[1].latest_value == 3.0
    assert got[1].n_updates == 3 and got[1].n_stale_dropped == 0
    # user 2: the 00:10 event sorts before 00:30 within the batch, so
    # both apply in order (batch-internal sort); latest is 4.0
    assert got[2].latest_value == 4.0
    assert got[2].n_updates == 2


def test_stateful_suppresses_stale_across_batches(spark, tmp_path):
    """One continuous query, two micro-batches: a stale event in the
    second batch must not overwrite the state from the first — the
    streaming analogue of the CDC ts guard."""
    src = tmp_path / "state2_in"
    src.mkdir()
    _write_batch(src / "a.json", [(1, "2024-01-01T02:00:00", 7, "view", 9.0)])
    stream = stream_from_json_dir(spark, str(src), EVENT_SCHEMA)
    out = running_latest(stream, key_col="user_id", ts_col="ts")
    q = (
        out.writeStream.format("memory")
        .queryName("latest2_t")
        .outputMode("update")
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if any(r.key == 7 for r in spark.table("latest2_t").collect()):
                break
            time.sleep(0.2)
        # second micro-batch: stale event (ts < state) — must be dropped
        _write_batch(src / "b.json",
                     [(2, "2024-01-01T01:00:00", 7, "view", 1.0)])
        deadline = time.time() + 60
        seen_stale = None
        while time.time() < deadline:
            rows = [r for r in spark.table("latest2_t").collect()
                    if r.n_stale_dropped == 1]
            if rows:
                seen_stale = rows[-1]
                break
            time.sleep(0.2)
    finally:
        q.stop()
    assert seen_stale is not None, "second micro-batch never surfaced"
    assert seen_stale.latest_value == 9.0  # stale event did not overwrite
    assert seen_stale.n_updates == 1


def test_stream_dedup_suppresses_redelivery_across_batches(spark, tmp_path):
    from mydatalake_spark.streaming.events import stream_dedup

    src = tmp_path / "dedup_in"
    src.mkdir()
    # batch 1: events 1,2; batch 2 redelivers event 1 (same key) within
    # the watermark plus a genuinely new event 3
    _write_batch(src / "a.json", [
        (1, "2024-01-01T00:05:00", 1, "view", 1.0),
        (2, "2024-01-01T00:06:00", 1, "click", 2.0),
    ])
    _write_batch(src / "b.json", [
        (1, "2024-01-01T00:05:00", 1, "view", 1.0),   # duplicate
        (3, "2024-01-01T00:07:00", 2, "view", 3.0),
    ])

    stream = stream_from_json_dir(spark, str(src), EVENT_SCHEMA)
    dedup = stream_dedup(stream, ["event_id"], "ts", watermark="1 hour")
    q = (
        dedup.writeStream.format("memory")
        .queryName("dedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("dedup_t").collect()
    assert sorted(r.event_id for r in rows) == [1, 2, 3]

    # batch fallback: same call on a batch frame, full-history dedup
    batch = spark.read.schema(EVENT_SCHEMA).json(str(src))
    assert sorted(
        r.event_id for r in stream_dedup(batch, ["event_id"]).collect()
    ) == [1, 2, 3]


def test_rocksdb_state_store_is_default(spark):
    """session.py pins the RocksDB provider + changelog checkpointing:
    keyed state lives off-heap/on-disk, so stateful topologies don't
    OOM the JVM as state grows — the 100 TB requirement."""
    assert "RocksDBStateStoreProvider" in spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass"
    )
    assert spark.conf.get(
        "spark.sql.streaming.stateStore.rocksdb"
        ".changelogCheckpointing.enabled"
    ) == "true"


def test_restart_with_evolved_state_schema(spark, tmp_path):
    """Upgrade path: a checkpoint written by operator v1 restarts under
    v2, which adds a column (n_stale_dropped) to the CDC guard. The
    physical state schema is version+payload (stateful.py), so the
    state-schema compatibility check passes and v1 state carries over
    with the new field defaulted — state outlives code."""
    from mydatalake_spark.streaming.stateful import running_latest_evolvable

    src = tmp_path / "evolve_in"
    src.mkdir()
    ckpt = str(tmp_path / "evolve_ckpt")

    # --- run 1: operator v1 (no stale counter) establishes state ---
    _write_batch(src / "a.json", [(1, "2024-01-01T02:00:00", 7, "view", 9.0)])
    out = running_latest_evolvable(
        stream_from_json_dir(spark, str(src), EVENT_SCHEMA),
        key_col="user_id", ts_col="ts", version=1,
    )
    assert "n_stale_dropped" not in out.columns
    rows1: list = []
    q = (
        out.writeStream.foreachBatch(
            lambda df, _id: rows1.extend(df.collect())
        )
        .outputMode("update").trigger(availableNow=True)
        .option("checkpointLocation", ckpt).start()
    )
    q.awaitTermination(120)
    got1 = {r.key: r for r in rows1}
    assert got1[7].latest_value == 9.0 and got1[7].n_updates == 1

    # --- run 2: SAME checkpoint, operator v2 (adds the column); the
    # new batch carries one stale event (ts < state) and one fresh ---
    _write_batch(src / "b.json", [
        (2, "2024-01-01T01:00:00", 7, "view", 1.0),   # stale vs state
        (3, "2024-01-01T03:00:00", 7, "view", 5.0),   # fresh
    ])
    out2 = running_latest_evolvable(
        stream_from_json_dir(spark, str(src), EVENT_SCHEMA),
        key_col="user_id", ts_col="ts", version=2,
    )
    rows2: list = []
    q2 = (
        out2.writeStream.foreachBatch(
            lambda df, _id: rows2.extend(df.collect())
        )
        .outputMode("update").trigger(availableNow=True)
        .option("checkpointLocation", ckpt).start()
    )
    q2.awaitTermination(120)
    got2 = {r.key: r for r in rows2}
    # v1 state survived: n_updates continues from 1 → 2; the stale
    # event hit the carried-over CDC guard (ts from run 1), and the
    # NEW column counted it starting from its default
    assert got2[7].latest_value == 5.0
    assert got2[7].n_updates == 2
    assert got2[7].n_stale_dropped == 1


def test_stream_stream_interval_join(spark, tmp_path):
    from mydatalake_spark.streaming.events import stream_interval_join

    clicks_dir = tmp_path / "clicks"
    views_dir = tmp_path / "views"
    clicks_dir.mkdir(); views_dir.mkdir()
    _write_batch(clicks_dir / "c.json", [
        (10, "2024-01-01T00:10:00", 1, "click", 1.0),
        (11, "2024-01-01T01:00:00", 1, "click", 1.0),   # no view within 10m
        (12, "2024-01-01T00:12:00", 2, "click", 1.0),
    ])
    _write_batch(views_dir / "v.json", [
        (20, "2024-01-01T00:05:00", 1, "view", 5.0),    # 5m before click 10
        (21, "2024-01-01T00:09:00", 2, "view", 7.0),    # 3m before click 12
        (22, "2024-01-01T02:00:00", 2, "view", 9.0),    # after every click
    ])

    clicks = stream_from_json_dir(spark, str(clicks_dir), EVENT_SCHEMA) \
        .filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    views = stream_from_json_dir(spark, str(views_dir), EVENT_SCHEMA) \
        .filter(F.col("event_type") == "view") \
        .select("user_id", "ts", F.col("value").alias("view_value"))
    joined = stream_interval_join(
        clicks, views, "user_id", within="10 minutes", watermark="2 hours"
    )
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory").queryName("ssj")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r.event_id, r.view_value) for r in spark.table("ssj").collect()}
    assert got == {(10, 5.0), (12, 7.0)}

    # batch degradation: same call on batch frames, same rows
    bclicks = spark.read.schema(EVENT_SCHEMA).json(str(clicks_dir)) \
        .filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    bviews = spark.read.schema(EVENT_SCHEMA).json(str(views_dir)) \
        .filter(F.col("event_type") == "view") \
        .select("user_id", "ts", F.col("value").alias("view_value"))
    bj = stream_interval_join(bclicks, bviews, "user_id", within="10 minutes")
    assert {(r.event_id, r.view_value) for r in bj.collect()} == got


def test_stream_into_incremental_view(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.streaming.events import (
        stream_from_json_dir,
        stream_into_view,
    )
    from mydatalake_spark.views import IncrementalAggView

    src = tmp_path / "stream_src"
    src.mkdir()
    _write_batch(str(src / "b1.json"), ROWS[:3])

    cat = Catalog(spark, str(tmp_path / "wh"))
    view = IncrementalAggView(
        spark, cat, "gold.ev.by_user",
        keys=["user_id"], measures={"value_sum": "value"},
    )
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    ckpt = str(tmp_path / "ckpt")
    q = stream_into_view(
        stream_from_json_dir(spark, str(src), schema), view, ckpt
    )
    q.awaitTermination(120)

    got = {r.user_id: (r.value_sum, r.n_rows) for r in view.read().collect()}
    assert got == {1: (6.0, 3)}

    # second file → second micro-batch folds in incrementally
    _write_batch(str(src / "b2.json"), ROWS[3:])
    q2 = stream_into_view(
        stream_from_json_dir(spark, str(src), schema), view, ckpt
    )
    q2.awaitTermination(120)
    got = {r.user_id: (r.value_sum, r.n_rows) for r in view.read().collect()}
    assert got == {1: (6.0, 3), 2: (4.5, 2)}


def test_stream_transitions_batch_parity_across_batches(spark, tmp_path):
    """Two availableNow drains over a growing directory: summed
    transition increments must equal the batch transition_matrix on
    the concatenated input — including the transition that SPANS the
    batch boundary (carried by the per-key last-state)."""
    from mydatalake_spark.operators.sequences import transition_matrix
    from mydatalake_spark.streaming.stateful import stream_transitions

    batch1 = [
        (1, "2024-01-01T00:05:00", 1, "view", 1.0),
        (2, "2024-01-01T00:20:00", 1, "click", 2.0),
        (3, "2024-01-01T00:30:00", 2, "view", 4.0),
    ]
    batch2 = [
        # user 1 continues: click(b1) -> purchase is the BOUNDARY pair
        (4, "2024-01-01T01:00:00", 1, "purchase", 3.0),
        (5, "2024-01-01T01:10:00", 2, "view", 0.5),
        (6, "2024-01-01T01:20:00", 2, "error", 0.1),
    ]
    src = tmp_path / "trans_in"
    src.mkdir()
    ckpt = str(tmp_path / "trans_ckpt")

    collected: list = []

    def drain():
        stream = stream_from_json_dir(spark, str(src), EVENT_SCHEMA)
        out = stream_transitions(stream)
        q = (
            out.writeStream.foreachBatch(
                lambda bdf, _bid: collected.extend(bdf.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_batch(src / "a.json", batch1)
    drain()
    _write_batch(src / "b.json", batch2)
    drain()
    rows = collected

    got: dict = {}
    for r in rows:
        got[(r.prev_state, r.next_state)] = (
            got.get((r.prev_state, r.next_state), 0) + r.n
        )

    all_rows = [
        {"u": r[2], "seq": r[0], "s": r[3]} for r in batch1 + batch2
    ]
    batch_df = spark.createDataFrame(
        [(d["u"], d["seq"], d["s"]) for d in all_rows],
        "u long, seq long, s string",
    )
    expect = {
        (r.prev_state, r.next_state): r.n
        for r in transition_matrix(batch_df, "u", ["seq"], "s").collect()
    }
    assert got == expect
    # the boundary pair specifically
    assert got[("click", "purchase")] == 1


def test_stream_into_sketch_view(spark, tmp_path):
    """Streaming distinct-IVM: micro-batches fold into the stored
    per-day HLL sketches; a second drain merges with (not replaces)
    the first batch's sketches — cross-batch dedup included."""
    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.streaming.events import (
        stream_from_json_dir,
        stream_into_view,
    )
    from mydatalake_spark.views import SketchDistinctView

    import pyspark.sql.functions as F

    src = tmp_path / "skv_in"
    src.mkdir()
    ckpt = str(tmp_path / "skv_ckpt")
    cat = Catalog(spark, str(tmp_path / "skv_wh"))
    view = SketchDistinctView(
        spark, cat, "gold.metrics.daily_users", keys=["day"], col="user_id"
    )

    class DayView:
        def apply(self, batch, batch_token=None):
            view.apply(
                batch.select(
                    F.col("ts").cast("date").alias("day"),
                    F.col("user_id").cast("string").alias("user_id"),
                ),
                batch_token=batch_token,
            )

    def drain():
        stream = stream_from_json_dir(spark, str(src), EVENT_SCHEMA)
        q = stream_into_view(stream, DayView(), ckpt)
        q.awaitTermination(120)

    _write_batch(src / "a.json", [
        (1, "2024-01-01T01:00:00", 7, "view", 1.0),
        (2, "2024-01-01T02:00:00", 8, "view", 1.0),
    ])
    drain()
    _write_batch(src / "b.json", [
        (3, "2024-01-01T03:00:00", 7, "view", 1.0),   # user 7 again
        (4, "2024-01-02T01:00:00", 9, "view", 1.0),
    ])
    drain()
    got = {
        r.day.isoformat(): r.distinct_estimate
        for r in view.estimates().collect()
    }
    assert got == {"2024-01-01": 2.0, "2024-01-02": 1.0}


def test_closed_sessions_event_time_timeout(spark, tmp_path):
    """EventTimeTimeout session closing: drain 1 opens a session for
    user 7; drain 2 carries only OTHER-user events whose timestamps
    advance the watermark past user 7's last event + gap — the state
    times out and the closed session emits WITHOUT user 7 ever
    returning. In-batch gap splits also close sessions inline."""
    from mydatalake_spark.streaming.stateful import closed_sessions

    src = tmp_path / "sess_close_in"
    src.mkdir()
    ckpt = str(tmp_path / "sess_close_ckpt")
    collected: list = []

    def drain():
        stream = stream_from_json_dir(spark, str(src), EVENT_SCHEMA)
        out = closed_sessions(
            stream, gap="30 minutes", watermark="10 minutes"
        )
        q = (
            out.writeStream.foreachBatch(
                lambda bdf, _bid: collected.extend(bdf.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_batch(src / "a.json", [
        (1, "2024-01-01T00:00:00", 7, "view", 1.0),
        (2, "2024-01-01T00:10:00", 7, "click", 1.0),
        # same batch, >30 min later: first session closes INLINE
        (3, "2024-01-01T01:00:00", 7, "view", 1.0),
    ])
    drain()
    inline = [(r.key, r.session_start.isoformat(),
               r.session_end.isoformat(), r.n_events) for r in collected]
    assert inline == [(7, "2024-01-01T00:00:00", "2024-01-01T00:10:00", 2)]

    # drain 2: other-user traffic pushes the watermark far past
    # 01:00 + 30min gap → user 7's open session times out
    _write_batch(src / "b.json", [
        (4, "2024-01-01T03:00:00", 8, "view", 1.0),
    ])
    drain()
    _write_batch(src / "c.json", [
        (5, "2024-01-01T05:00:00", 8, "view", 1.0),
    ])
    drain()
    got = {(r.key, r.session_start.isoformat(), r.n_events)
           for r in collected}
    assert (7, "2024-01-01T01:00:00", 1) in got, got


def test_concat_sorted_merges_chunks_before_sorting():
    """Regression (r4 advice): chunks of one group must be sorted as a
    WHOLE — per-chunk sorting processes boundary-spanning out-of-order
    events in arrival order, making results depend on Arrow chunk
    size."""
    import pandas as pd

    from mydatalake_spark.streaming.stateful import _concat_sorted

    c1 = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 00:20"]),
                       "event_id": [2], "state": ["click"]})
    c2 = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 00:05"]),
                       "event_id": [1], "state": ["view"]})
    merged = _concat_sorted(iter([c1, c2]))
    assert list(merged["state"]) == ["view", "click"]
    # empty group (timeout-only invocation) → None
    assert _concat_sorted(iter([])) is None
    assert _concat_sorted(iter([c1.iloc[0:0]])) is None


def test_update_transitions_chunk_boundary_order():
    """_update_transitions with a multi-chunk iterator whose events
    arrive out of event-time order ACROSS the chunk boundary: counts
    must follow event time, not arrival order."""
    import pandas as pd

    from mydatalake_spark.streaming.stateful import _update_transitions

    class FakeState:
        exists = False
        hasTimedOut = False

        def update(self, v):
            self.exists, self._v = True, v

        @property
        def get(self):
            return self._v

    # event-time order: view(00:05) -> click(00:10) -> buy(00:20)
    # arrival order across chunks: click, buy | view
    c1 = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 00:10",
                                             "2024-01-01 00:20"]),
                       "event_id": [2, 3], "state": ["click", "buy"]})
    c2 = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01 00:05"]),
                       "event_id": [1], "state": ["view"]})
    out = list(_update_transitions((1,), iter([c1, c2]), FakeState()))
    got = {(p, n): c for p, n, c in zip(out[0]["prev_state"],
                                        out[0]["next_state"], out[0]["n"])}
    assert got == {("view", "click"): 1, ("click", "buy"): 1}


def test_stateful_operators_accept_string_keys(spark, tmp_path):
    """key_col is a free parameter: non-long keys (string user ids)
    must not hit an Arrow output-schema mismatch (r4 advice — the
    output templates hardcoded LongType)."""
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("uid", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    src = tmp_path / "strkey_in"
    src.mkdir()
    with open(src / "a.json", "w") as fh:
        for r in [(1, "2024-01-01T00:05:00", "alice", "view", 1.0),
                  (2, "2024-01-01T00:10:00", "alice", "click", 2.0),
                  (3, "2024-01-01T00:20:00", "bob", "view", 7.0)]:
            fh.write(json.dumps(dict(zip(
                ["event_id", "ts", "uid", "event_type", "value"], r))) + "\n")
    stream = stream_from_json_dir(spark, str(src), schema)
    out = running_latest(stream, key_col="uid", ts_col="ts")
    q = (out.writeStream.format("memory").queryName("strkey_t")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.key: r.latest_value for r in spark.table("strkey_t").collect()}
    assert got == {"alice": 2.0, "bob": 7.0}

    from mydatalake_spark.streaming.stateful import stream_transitions

    stream2 = stream_from_json_dir(spark, str(src), schema)
    out2 = stream_transitions(stream2, key_col="uid")
    q2 = (out2.writeStream.format("memory").queryName("strkey_tr")
          .outputMode("update").trigger(availableNow=True).start())
    q2.awaitTermination(120)
    rows = spark.table("strkey_tr").collect()
    assert {(r.key, r.prev_state, r.next_state, r.n) for r in rows} == {
        ("alice", "view", "click", 1)
    }


def test_stream_quality_gate_splits_and_replays_idempotently(
    spark, tmp_path
):
    """Two availableNow drains over a growing directory: clean rows
    accumulate in production, failing rows in quarantine with their
    failed_tests; quarantine batch tags make replay idempotent."""
    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.streaming.quality_gate import stream_quality_gate

    src = tmp_path / "gate_in"
    src.mkdir()
    ckpt = str(tmp_path / "gate_ckpt")
    cat = Catalog(spark, str(tmp_path / "gate_wh"))
    tests = [
        {"column": "value", "test_type": "outside_of_rules",
         "kwargs": {"expression": "value < 100"}},
        {"column": "event_type", "test_type": "missing"},
    ]

    def drain():
        stream = stream_from_json_dir(spark, str(src), EVENT_SCHEMA)
        q = stream_quality_gate(
            stream, cat, "silver.ev.clean", tests, ["event_id"],
            checkpoint_dir=ckpt,
        )
        q.awaitTermination(120)

    _write_batch(src / "a.json", [
        (1, "2024-01-01T00:05:00", 1, "view", 1.0),
        (2, "2024-01-01T00:06:00", 1, "click", 500.0),   # fails rule
        (3, "2024-01-01T00:07:00", 2, None, 2.0),        # missing type
    ])
    drain()
    _write_batch(src / "b.json", [
        (4, "2024-01-01T01:00:00", 2, "view", 3.0),
    ])
    drain()

    clean = {r.event_id for r in cat.read("silver.ev.clean").collect()}
    assert clean == {1, 4}
    quarantined = {
        r.event_id: set(r.failed_tests)
        for r in cat.read("silver.ev.clean_quarantine").collect()
    }
    assert set(quarantined) == {2, 3}
    assert quarantined[2] == {"outside_of_rules"}
    assert quarantined[3] == {"missing"}


def test_enrich_stream_static_dim(spark, tmp_path):
    from mydatalake_spark.streaming.events import enrich_stream

    src = tmp_path / "enrich_in"
    src.mkdir()
    _write_batch(src / "a.json", ROWS)
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "basic")], "user_id long, tier string"
    )
    stream = stream_from_json_dir(spark, str(src), EVENT_SCHEMA)
    out = enrich_stream(stream, dim, ["user_id"])
    q = (out.writeStream.format("memory").queryName("enrich_t")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.event_id, r.tier) for r in spark.table("enrich_t").collect()}
    assert got == {(1, "gold"), (2, "gold"), (3, "gold"),
                   (4, "basic"), (5, "basic")}


def test_stream_drift_monitor_flags_shifted_batch(spark, tmp_path):
    """Two micro-batch drains: an in-distribution batch then a shifted
    one — monitor rows must match the batch drift_report exactly and
    flag only the shifted batch."""
    import json

    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.streaming.drift import (
        drift_report,
        stream_drift_monitor,
    )
    from mydatalake_spark.streaming.events import stream_from_json_dir

    ref_rows = [(i, float(v)) for i, v in enumerate(
        [10, 11, 12, 13, 14, 15, 16, 17, 18, 19])]
    ref = spark.createDataFrame(ref_rows, "id long, value double")

    src = tmp_path / "drift_in"
    src.mkdir()
    cat = Catalog(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, values):
        with open(src / name, "w") as fh:
            for i, v in enumerate(values):
                fh.write(json.dumps({
                    "event_id": i, "ts": "2024-01-01 00:00:00",
                    "user_id": i, "event_type": "x", "value": v,
                }) + "\n")

    # batch 0: same distribution; batch 1: shifted by +50
    write_batch("b0.json", [10.5, 12.5, 14.5, 16.5, 18.5])
    q = stream_drift_monitor(
        stream_from_json_dir(spark, str(src), EVENT_SCHEMA),
        ref, "value", cat, "catalog.monitor.drift", ckpt,
        d_alert=0.5,
    )
    q.awaitTermination(120)
    write_batch("b1.json", [60.5, 62.5, 64.5, 66.5, 68.5])
    q2 = stream_drift_monitor(
        stream_from_json_dir(spark, str(src), EVENT_SCHEMA),
        ref, "value", cat, "catalog.monitor.drift", ckpt,
        d_alert=0.5,
    )
    q2.awaitTermination(120)

    rows = {r.batch_id: r for r in
            cat.read("catalog.monitor.drift").collect()}
    assert len(rows) == 2
    flags = sorted(r.drifted for r in rows.values())
    assert flags == [False, True]
    shifted = next(r for r in rows.values() if r.drifted)
    clean = next(r for r in rows.values() if not r.drifted)
    assert shifted.d_stat == 1.0      # disjoint supports
    assert clean.d_stat < 0.5
    assert shifted.emd > clean.emd

    # batch parity: monitor row == drift_report on the same data
    b1 = spark.createDataFrame(
        [(float(v),) for v in [60.5, 62.5, 64.5, 66.5, 68.5]],
        "value double",
    )
    rep = drift_report(ref, b1, "value").collect()[0]
    assert (rep.d_stat, rep.emd) == (shifted.d_stat, shifted.emd)
    assert rep.n_ref == 10 and rep.n_batch == 5


def test_closed_sessions_batch_twin_parity(spark, tmp_path):
    """The batch twin (closed_sessions_batch) replays the stateful
    operator's close semantics exactly: inline data-driven closes,
    EventTimeTimeout closes once the watermark passes end + gap, and
    each key's final session stays OPEN unless the watermark caught
    it. Same inputs through both paths must agree row-for-row."""
    from mydatalake_spark.streaming.stateful import (
        closed_sessions,
        closed_sessions_batch,
    )

    src = tmp_path / "sess_twin_in"
    src.mkdir()
    ckpt = str(tmp_path / "sess_twin_ckpt")
    collected: list = []

    def drain():
        stream = stream_from_json_dir(spark, str(src), EVENT_SCHEMA)
        out = closed_sessions(
            stream, gap="30 minutes", watermark="10 minutes"
        )
        q = (
            out.writeStream.foreachBatch(
                lambda bdf, _bid: collected.extend(bdf.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_batch(src / "a.json", [
        (1, "2024-01-01T00:00:00", 7, "view", 1.0),
        (2, "2024-01-01T00:10:00", 7, "click", 1.0),
        (3, "2024-01-01T01:00:00", 7, "view", 1.0),   # closes 1st inline
        (4, "2024-01-01T00:05:00", 9, "view", 1.0),
    ])
    drain()
    # far-future single event: watermark 04:50 times out user 7's
    # 01:00 session and user 9's; user 8's own session stays open
    _write_batch(src / "b.json", [
        (5, "2024-01-01T05:00:00", 8, "view", 1.0),
    ])
    drain()

    streamed = {
        (r.key, r.session_start, r.session_end, r.n_events)
        for r in collected
    }
    batch_df = spark.read.schema(EVENT_SCHEMA).json(str(src))
    twinned = {
        (r.key, r.session_start, r.session_end, r.n_events)
        for r in closed_sessions_batch(
            batch_df, gap="30 minutes", watermark="10 minutes"
        ).collect()
    }
    assert streamed == twinned
    assert len(twinned) == 3             # user 8's session stays open
    assert {k for k, *_ in twinned} == {7, 9}


def test_stream_drift_monitor_bins_path_probe_free(spark, tmp_path):
    """The continuous-metric configuration: bins= quantizes the ECDFs,
    skips the per-batch cardinality probe, and still flags an obvious
    shift — and the binned monitor row matches the binned batch
    drift_report (parity holds per configuration)."""
    import json
    from unittest import mock

    from mydatalake_spark import functions as _  # noqa: F401
    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.functions import stats as stats_mod
    from mydatalake_spark.streaming.drift import (
        drift_report,
        stream_drift_monitor,
    )
    from mydatalake_spark.streaming.events import stream_from_json_dir

    ref = spark.createDataFrame(
        [(i, 10.0 + i * 0.9) for i in range(10)], "id long, value double"
    )
    src = tmp_path / "drift_bins"
    src.mkdir()
    with open(src / "b0.json", "w") as fh:
        for i, v in enumerate([60.5, 62.5, 64.5]):
            fh.write(json.dumps({
                "event_id": i, "ts": "2024-01-01 00:00:00",
                "user_id": i, "event_type": "x", "value": v,
            }) + "\n")
    cat = Catalog(spark, str(tmp_path / "wh_bins"))

    # bins= must never reach the refusal probe: wrap the guard and
    # assert every call arrives with bins set (its probe-free arm)
    real_guard = stats_mod._guard_ecdf_distinct

    def guard_spy(df, value_col, bins, max_distinct, caller):
        # probe-free means the guard's short-circuit arm: either the
        # frame is pre-binned (bins set) or the probe is waived
        # (max_distinct=None, as drift_report does after binning once)
        assert bins is not None or max_distinct is None, (
            f"{caller} probed on the bins path"
        )
        return real_guard(df, value_col, bins, max_distinct, caller)

    with mock.patch.object(
        stats_mod, "_guard_ecdf_distinct", side_effect=guard_spy
    ):
        q = stream_drift_monitor(
            stream_from_json_dir(spark, str(src), EVENT_SCHEMA),
            ref, "value", cat, "catalog.monitor.drift_bins",
            str(tmp_path / "ckpt_bins"), d_alert=0.5, bins=64,
        )
        q.awaitTermination(120)
    rows = cat.read("catalog.monitor.drift_bins").collect()
    assert len(rows) == 1 and rows[0].drifted
    b0 = spark.createDataFrame(
        [(v,) for v in [60.5, 62.5, 64.5]], "value double"
    )
    rep = drift_report(ref, b0, "value", bins=64).collect()[0]
    assert (rep.d_stat, rep.emd) == (rows[0].d_stat, rows[0].emd)


def test_stream_changes_into_view_retractions(spark, tmp_path):
    """CDC stream → gold view maintenance: two availableNow drains of
    a growing change-feed directory fold inserts, then an update pair
    + a delete, through IncrementalAggView.apply_changes — the view
    must track the net state exactly and drop fully-retracted
    groups."""
    import json as _json

    from pyspark.sql import types as T

    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.streaming.events import (
        stream_from_json_dir,
        stream_changes_into_view,
    )
    from mydatalake_spark.views import IncrementalAggView

    src = tmp_path / "cdc_src"
    src.mkdir()

    def write(path, rows):
        with open(path, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    write(str(src / "b1.json"), [
        {"k": 1, "g": "a", "v": 10.0, "_change_type": "insert"},
        {"k": 2, "g": "a", "v": 20.0, "_change_type": "insert"},
        {"k": 3, "g": "b", "v": 30.0, "_change_type": "insert"},
    ])
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("g", T.StringType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("_change_type", T.StringType()),
    ])
    cat = Catalog(spark, str(tmp_path / "wh"))
    view = IncrementalAggView(
        spark, cat, "gold.cdc.by_g", keys=["g"], measures={"total": "v"}
    )
    ckpt = str(tmp_path / "ckpt")
    q = stream_changes_into_view(
        stream_from_json_dir(spark, str(src), schema), view, ckpt
    )
    q.awaitTermination(120)
    got = {r.g: (r.total, r.n_rows) for r in view.read().collect()}
    assert got == {"a": (30.0, 2), "b": (30.0, 1)}

    # batch 2: update k=1 (10 -> 15) and fully retract group b
    write(str(src / "b2.json"), [
        {"k": 1, "g": "a", "v": 10.0, "_change_type": "update_preimage"},
        {"k": 1, "g": "a", "v": 15.0, "_change_type": "update_postimage"},
        {"k": 3, "g": "b", "v": 30.0, "_change_type": "delete"},
    ])
    q2 = stream_changes_into_view(
        stream_from_json_dir(spark, str(src), schema), view, ckpt
    )
    q2.awaitTermination(120)
    got = {r.g: (r.total, r.n_rows) for r in view.read().collect()}
    assert got == {"a": (35.0, 2)}
