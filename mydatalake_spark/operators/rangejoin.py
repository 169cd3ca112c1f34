"""Range join: points-in-interval matching without a cross join.

[extension] Not in the reference (its only join is the CDC MERGE —
SURVEY.md §2.3); added because interval matching (event ∈ incident
window, reading ∈ validity period) is a standard analytics shape that
OSS Spark only plans as BroadcastNestedLoopJoin/CartesianProduct —
quadratic and fatal at scale.

Strategy — the classic bin-and-verify rewrite:

1. pick a bin width; every interval EXPLODES to the bins it covers
   (``sequence(floor(start/w), floor(end/w))``), every point maps to
   exactly ONE bin;
2. equi-join on (bin [, extra keys]) — a plain shuffle/broadcast hash
   join Catalyst can optimize, never a cross product;
3. exact range predicate verifies each candidate pair.

Cost: interval side inflates by ≈ (interval_len / bin_width + 1); a
point meets each interval in exactly one bin (the point's own), so no
dedup pass is needed. Pick ``bin_width`` near the typical interval
length: wider bins → fewer interval replicas but more false candidates
per bin; narrower → the reverse. At 100 TB both sides shuffle once on
(bin, keys) — the same asymptotics as any keyed join — and AQE splits
hot bins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _epoch(col: Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_width: str = "5 minutes",
    on: list[str] | None = None,
    end_inclusive: bool = False,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point_ts < end`` (or ``<= end`` when
    ``end_inclusive``), optionally ANDed with equi-keys ``on``.

    Column names must be disjoint apart from ``on`` (select/alias
    first, as with any join). Returns point columns + interval
    columns for every qualifying pair.
    """
    on = on or []
    secs = _bin_seconds(bin_width)

    p_bin = F.floor(F.unix_timestamp(F.col(point_ts)) / secs)
    i_lo = F.floor(F.unix_timestamp(F.col(start_col)) / secs)
    i_hi = F.floor(F.unix_timestamp(F.col(end_col)) / secs)

    p = points.withColumn("__bin__", p_bin)
    i = intervals.withColumn(
        "__bin__", F.explode(F.sequence(i_lo, i_hi))
    )
    cond = F.col(point_ts) >= F.col(start_col)
    cond = cond & (
        (F.col(point_ts) <= F.col(end_col))
        if end_inclusive
        else (F.col(point_ts) < F.col(end_col))
    )
    return (
        p.join(i, on + ["__bin__"], "inner")
        .filter(cond)
        .drop("__bin__")
    )


def _bin_seconds(bin_width: str) -> int:
    """Parse '5 minutes' / '1 hour' / '30 seconds' / '2 days'."""
    parts = bin_width.strip().split()
    if len(parts) != 2:
        raise ValueError(f"bad bin_width: {bin_width!r}")
    n = int(parts[0])
    unit = parts[1].rstrip("s")
    mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
    if unit not in mult:
        raise ValueError(f"bad bin_width unit: {bin_width!r}")
    if n <= 0:
        raise ValueError(f"bin_width must be positive: {bin_width!r}")
    return n * mult[unit]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: str = "5 minutes",
    on: list[str] | None = None,
) -> DataFrame:
    """Interval-overlap join: every (left, right) pair whose half-open
    windows intersect (``l_start < r_end AND r_start < l_end``),
    optionally ANDed with equi-keys ``on``. Column names must be
    disjoint apart from ``on``.

    Same bin-and-verify rewrite as :func:`range_join`, with one twist:
    two overlapping intervals co-occupy every bin their overlap spans,
    so a plain bin equi-join would emit the pair once per shared bin.
    Instead of a dedup shuffle, each pair is claimed by exactly ONE
    bin — the later of the two start bins (the first bin where both
    intervals exist) — via a post-join equality predicate. Output
    stays exactly one row per overlapping pair, and the join remains a
    hash equi-join on (keys, bin): no cross product, no
    dropDuplicates pass, AQE splits hot bins.
    """
    on = on or []
    secs = _bin_seconds(bin_width)

    def bins(s: str, e: str) -> Column:
        return F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(s)) / secs),
                F.floor(F.unix_timestamp(F.col(e)) / secs),
            )
        )

    l = left.withColumn("__bin__", bins(l_start, l_end))
    r = right.withColumn("__bin__", bins(r_start, r_end))
    overlap = (F.col(l_start) < F.col(r_end)) & (
        F.col(r_start) < F.col(l_end)
    )
    claimed = F.col("__bin__") == F.greatest(
        F.floor(F.unix_timestamp(F.col(l_start)) / secs),
        F.floor(F.unix_timestamp(F.col(r_start)) / secs),
    )
    return (
        l.join(r, on + ["__bin__"], "inner")
        .filter(overlap & claimed)
        .drop("__bin__")
    )
