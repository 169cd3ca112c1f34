"""Streaming CDC merge sink: micro-batches upsert into a table with
latest-wins semantics across batches."""

import json
import time

from pyspark.sql import types as T

from mydatalake_spark.catalog import Catalog
from mydatalake_spark.streaming.cdc_sink import StreamingMergeSink
from mydatalake_spark.streaming.events import stream_from_json_dir

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _write(path, rows):
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(dict(zip(["id", "ts", "v"], r))) + "\n")


def _run_batch(spark, src, cat, ckpt):
    sink = StreamingMergeSink(cat, "silver.cdc.t", keys=["id"], ts_col="ts")
    q = sink.start(
        stream_from_json_dir(spark, str(src), SCHEMA), checkpoint=str(ckpt)
    )
    q.awaitTermination(120)


def test_streaming_merge_sink(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    cat = Catalog(spark, str(tmp_path / "wh"))
    ckpt = tmp_path / "ckpt"

    _write(src / "b1.json", [(1, 10, "a"), (2, 10, "b")])
    _run_batch(spark, src, cat, ckpt)
    assert {(r.id, r.v) for r in cat.read("silver.cdc.t").collect()} == {
        (1, "a"), (2, "b")
    }

    # batch 2: newer update for 1, STALE update for 2, new key 3
    _write(src / "b2.json", [(1, 20, "a2"), (2, 5, "stale"), (3, 1, "c")])
    _run_batch(spark, src, cat, ckpt)
    got = {(r.id, r.v) for r in cat.read("silver.cdc.t").collect()}
    assert got == {(1, "a2"), (2, "b"), (3, "c")}


EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_events(path, rows):
    with open(path, "w") as fh:
        for r in rows:
            fh.write(
                json.dumps(dict(zip(
                    ["event_id", "ts", "user_id", "value"], r))) + "\n"
            )


def test_windowed_cdc_sink_late_data_watermark(spark, tmp_path):
    """stream_from_json_dir → watermarked tumbling_agg → CDC merge
    sink, across TWO restarts with late data:

    - late-but-within-watermark rows update their (already merged)
      window in the table (stateful agg state survives the restart via
      the checkpoint);
    - rows whose window fell behind the watermark are dropped by the
      engine and never reach the sink;
    - final table state equals the BATCH tumbling agg over exactly the
      non-dropped rows (stream/batch parity for stateful shapes).
    """
    from mydatalake_spark.streaming.events import tumbling_agg

    src = tmp_path / "ev_in"
    src.mkdir()
    ckpt = str(tmp_path / "ev_ckpt")
    cat = Catalog(spark, str(tmp_path / "ev_wh"))
    sink = StreamingMergeSink(
        cat, "silver.ev.counts", keys=["window_start", "user_id"]
    )

    def run_once():
        stream = stream_from_json_dir(spark, str(src), EVENT_SCHEMA)
        agg = tumbling_agg(
            stream, "ts", "1 hour", group_by=["user_id"],
            aggs={"*": "count", "value": "sum"}, watermark="1 hour",
        )
        q = sink.start(agg, ckpt)
        q.awaitTermination(120)

    batch1 = [
        (1, "2024-01-01T00:05:00", 1, 1.0),
        (2, "2024-01-01T00:20:00", 1, 2.0),
        (3, "2024-01-01T01:10:00", 1, 3.0),
        (4, "2024-01-01T02:50:00", 2, 4.0),  # advances watermark to 01:50
    ]
    _write_events(src / "b1.json", batch1)
    run_once()
    t1 = {
        (r.window_start.isoformat(), r.user_id): (r.n_events, r.sum_value)
        for r in cat.read("silver.ev.counts").collect()
    }
    assert t1 == {
        ("2024-01-01T00:00:00", 1): (2, 3.0),
        ("2024-01-01T01:00:00", 1): (1, 3.0),
        ("2024-01-01T02:00:00", 2): (1, 4.0),
    }

    batch2 = [
        (5, "2024-01-01T02:10:00", 1, 5.0),   # on-time, new window group
        (6, "2024-01-01T01:55:00", 2, 0.5),   # late, within watermark
        (7, "2024-01-01T00:30:00", 1, 9.0),   # window end 01:00 <= 01:50 -> DROPPED
    ]
    _write_events(src / "b2.json", batch2)
    run_once()
    got = {
        (r.window_start.isoformat(), r.user_id): (r.n_events, r.sum_value)
        for r in cat.read("silver.ev.counts").collect()
    }

    # batch parity over exactly the rows the stream must include
    included = batch1 + batch2[:2]
    bdf = spark.createDataFrame(
        [(a, __import__("datetime").datetime.fromisoformat(b), c, d)
         for a, b, c, d in included],
        EVENT_SCHEMA,
    )
    expected = {
        (r.window_start.isoformat(), r.user_id): (r.n_events, r.sum_value)
        for r in tumbling_agg(
            bdf, "ts", "1 hour", group_by=["user_id"],
            aggs={"*": "count", "value": "sum"},
        ).collect()
    }
    assert got == expected
    # the dropped row's window kept its batch-1 value
    assert got[("2024-01-01T00:00:00", 1)] == (2, 3.0)
    # the late-within-watermark row created/updated its window
    assert got[("2024-01-01T01:00:00", 2)] == (1, 0.5)
