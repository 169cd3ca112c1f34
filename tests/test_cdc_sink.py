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
