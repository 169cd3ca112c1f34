"""Materialized views: declared SQL, recomputed into a stored table.

Reference parity: the gold layer is a DLT materialized view
(``CREATE MATERIALIZED VIEW gold.brapi.prices AS SELECT …``,
reference Pipelines/Test/transformations/test.sql:3-14). OSS Spark has
no MV object, so the equivalent is a declared query + a refresh job
that recomputes it into a table (SURVEY.md §4.2) — which is exactly
what DLT does under the hood on a schedule.

``refresh`` is a full recompute; at 100 TB the win is partition-scoped
refresh: pass ``partition_by`` + ``refresh_predicate`` so only changed
partitions rewrite (dynamic partition overwrite semantics).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .catalog import Catalog
from .plans.qualify import run_sql


@dataclass
class MaterializedView:
    """A named SQL definition materialized into a warehouse table."""

    spark: SparkSession
    catalog: Catalog
    name: str                      # catalog.schema.table to materialize
    sql: str                       # reference-dialect SELECT (QUALIFY ok)
    partition_by: list[str] = field(default_factory=list)

    def dataframe(self) -> DataFrame:
        """The view's current definition as a (lazy) DataFrame —
        dotted table references resolve against the warehouse."""
        return run_sql(
            self.spark, self.sql, table_mapping=self.catalog.register_all()
        )

    def refresh(self) -> None:
        """Recompute and persist (the scheduled-job equivalent of the
        DLT refresh)."""
        self.catalog.overwrite(
            self.dataframe(), self.name,
            partition_by=self.partition_by or None,
        )

    def read(self) -> DataFrame:
        return self.catalog.read(self.name)
