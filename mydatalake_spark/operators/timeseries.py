"""Time-series regularization: calendar gap-fill + forward fill.

[extension] Event/orders tables are sparse in calendar time — most
(group, day) cells have no rows — but downstream consumers (trend
models, rolling joins, charting, feature stores) want a dense regular
grid. The two fill semantics differ by metric class and both are
needed:

- **additive** metrics (revenue, counts): a missing day genuinely
  means zero — fill with 0;
- **gauge** metrics (last known price, account state): a missing day
  means "unchanged" — forward-fill the last observation (the batch
  analogue of last-observation-carried-forward).

Spark-first shape: aggregate to one row per (group, day) first
(shrinks the data before any widening), derive each group's [min,max]
day bounds in the same aggregation pass, then ``sequence()`` +
``explode`` the calendar per group and left-join the daily rows back.
The forward fill is ``last(value, ignorenulls=True)`` over a
rows-unbounded-preceding window — a single sort-within-partition, no
self-join, no UDF.

At 100 TB: only the initial daily rollup shuffles input-sized data —
map-side partial aggregation collapses each partition to its
(group, day) cells before anything moves. Every later step (bounds,
grid explode, grid join, window sort) operates on the day-level grid,
which is output-sized: |groups| × |days|, orders of magnitude smaller
than the input. Degenerate calendars (millions of groups spanning
decades) stay linear in the grid; the window partitions by group, so
no single task ever sorts more than one group's calendar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..caching import adopt


def resample_daily(
    df: DataFrame,
    group_col: str,
    date_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Dense daily grid per group between that group's first and last
    observed day.

    Returns ``(group_col, day, total, n_rows, gauge)`` where
    ``total`` is the day's summed value (0 on gap days), ``n_rows``
    the day's row count (0 on gaps), and ``gauge`` the day's mean
    value forward-filled across gaps (null until the group's first
    observation — which cannot happen here since the grid starts at
    it). Sums/means round to ``round_to`` decimals *before* the
    forward fill so the carried value is bit-identical across engines
    (the cross-engine float contract, as in stats_lineitem).
    """
    day = F.col(date_col).cast("date")
    # daily feeds two plan branches (the bounds chain and the grid
    # join); without its own persist the input-sized rollup would
    # execute twice. It is grid-sized — safe to cache at any input
    # scale; the caller owns release (caching.release), as with the
    # iterative graph operators.
    daily = df.groupBy(F.col(group_col), day.alias("day")).agg(
        F.round(F.sum(value_col), round_to).alias("__total__"),
        F.count(F.lit(1)).alias("__n__"),
        F.round(F.avg(value_col), round_to).alias("__gauge__"),
    ).persist()
    bounds = daily.groupBy(group_col).agg(
        F.min("day").alias("__lo__"), F.max("day").alias("__hi__")
    )
    grid = bounds.select(
        group_col,
        F.explode(
            F.sequence("__lo__", "__hi__", F.expr("interval 1 day"))
        ).alias("day"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        grid.join(daily, [group_col, "day"], "left")
        .select(
            group_col,
            "day",
            F.coalesce(F.col("__total__"), F.lit(0.0)).alias("total"),
            F.coalesce(F.col("__n__"), F.lit(0)).alias("n_rows"),
            F.last("__gauge__", ignorenulls=True).over(w).alias("gauge"),
        )
    )
    return adopt(out, daily)
