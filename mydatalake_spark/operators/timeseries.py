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

from pyspark.sql import Column, DataFrame, Window
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


def ewma_smoothed(
    df: DataFrame,
    group_col: str,
    date_col: str,
    value_col: str,
    window_days: int = 14,
) -> DataFrame:
    """Exponentially weighted moving average over a DENSE daily series
    (compose after :func:`resample_daily`, whose gap-fill makes row
    offsets equal calendar-day offsets): for each day,

        ewma = Σ_d value(t−d)·2^−d / Σ_d 2^−d,  d = 0..window_days−1

    — a half-life-of-one-day decay truncated at ``window_days`` taps
    and renormalized over the taps actually present, so the series
    head (fewer than window_days rows) is unbiased rather than
    zero-padded.

    Contract: the series must be DENSE and NON-NULL per (group, day)
    — ``collect_list`` skips nulls, which would silently misalign the
    decay exponents; ``resample_daily`` guarantees both (gap days fill
    with 0.0).

    Spark-first shape: ONE window ``collect_list`` over a rows-frame
    (the frame is tap-count bounded — window_days doubles per row, not
    history-sized state), then the weighted sum is per-row array
    arithmetic (``zip_with`` + ``aggregate``) inside codegen; the
    normalizer collapses to the closed form 2·(1−2^−s), exact in
    binary floating point. No self-join, no UDF; one shuffle on the
    group key that the downstream day-ordered window reuses.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(date_col)
        .rowsBetween(-(window_days - 1), 0)
    )
    arr = F.collect_list(F.col(value_col).cast("double")).over(w)

    def weighted(a: Column) -> Column:
        s = F.size(a)
        num = F.aggregate(
            F.zip_with(
                a,
                F.sequence(F.lit(1), s),
                lambda x, i: x * F.pow(F.lit(0.5), (s - i).cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        den = F.lit(2.0) * (
            F.lit(1.0) - F.pow(F.lit(0.5), s.cast("double"))
        )
        return num / den

    from ..functions.text import let as _let

    return df.select(
        F.col(group_col),
        F.col(date_col),
        F.col(value_col),
        _let(arr, weighted).alias("ewma"),
    )
