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
