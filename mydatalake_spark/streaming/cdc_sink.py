"""Streaming CDC sink: continuous upsert of a stream into a table.

[extension] Bridges the reference's batch CDC (reference
lib/ingestors.py:117-129) with Structured Streaming: each micro-batch
merges into the target with the same key + ts-guard semantics
(``foreachBatch`` + operators/merge.py). This is the OSS equivalent of
a Delta streaming MERGE sink and the natural landing path for a Kafka/
file CDC feed.

Exactly-once notes: foreachBatch gives at-least-once; the merge is
idempotent (latest-wins keyed upsert — property-tested in
tests/test_properties.py), so replayed batches converge to the same
table state. At scale, pair with ``merge_upsert_partitioned`` so each
micro-batch only rewrites the partitions it touches.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..catalog import Catalog
from ..operators.merge import merge_upsert, merge_upsert_partitioned


@dataclass
class StreamingMergeSink:
    catalog: Catalog
    table: str
    keys: list[str]
    ts_col: str | None = None
    partition_col: str | None = None

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch callback: merge one micro-batch."""
        if self.partition_col is not None:
            merge_upsert_partitioned(
                self.catalog, self.table, batch_df, self.keys,
                self.partition_col, self.ts_col,
            )
            return
        if not self.catalog.exists(self.table):
            self.catalog.overwrite(batch_df, self.table)
            return
        target = self.catalog.read(self.table)
        merged = merge_upsert(
            target, batch_df.select(*target.columns), self.keys, self.ts_col
        )
        self.catalog.overwrite_via_staging(merged, self.table)

    def start(self, stream_df: DataFrame, checkpoint: str, **trigger):
        """Attach to a streaming DataFrame; returns the StreamingQuery."""
        if not trigger:
            trigger = {"availableNow": True}
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
            .trigger(**trigger)
            .start()
        )
