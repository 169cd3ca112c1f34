"""Dedup-latest and duplicate-flagging window operators.

Reference parity: every transform ends with
``QUALIFY ROW_NUMBER() OVER (PARTITION BY <key> ORDER BY <ts> DESC) = 1``
(reference bronze/assets/assets.sql:11, bronze/tickers/tickers.sql:31,
silver/prices/prices.sql:14) and the DQ engine flags duplicates with
``row_number > 1`` (reference lib/checker.py:163-165).

Scale notes (100 TB):
- The ``rn = 1`` filter triggers Catalyst's InferWindowGroupLimit
  (Spark ≥ 3.5): a partial group-top-1 runs map-side before the
  shuffle, so the shuffle carries ~|groups| rows, not |input| rows.
- The reference orders two of its dedups non-deterministically
  (ORDER BY current_timestamp() — reference
  silver/summary_profile/summary_profile.sql:15; ordering key ⊂
  partition key — reference silver/prices/prices.sql:14). We require
  a real ordering and always append a stable tiebreaker so results
  are reproducible (SURVEY.md §7.4(4)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ordering(order_by: list[str | Column], tiebreakers: list[str]) -> list[Column]:
    cols: list[Column] = []
    for c in order_by:
        cols.append(F.col(c).desc() if isinstance(c, str) else c)
    # Stable tiebreak: without it, ties pick an arbitrary row per run
    # and per partition layout — fatal for oracle hash-matching and
    # for idempotent re-runs at scale.
    cols.extend(F.col(t).asc() for t in tiebreakers)
    return cols


def dedup_latest(
    df: DataFrame,
    keys: list[str],
    order_by: list[str | Column],
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Keep exactly one row per key group: first under the ordering.

    ``order_by`` strings are interpreted as DESC (latest-wins), matching
    the reference's ``ORDER BY loaded_at DESC`` convention; pass Column
    expressions for full control.
    """
    w = Window.partitionBy(*keys).orderBy(*_ordering(order_by, tiebreakers or []))
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def flag_duplicates(df: DataFrame, cols: list[str]) -> DataFrame:
    """Append boolean ``is_duplicate``: true for every row after the
    first occurrence of its value-tuple (reference lib/checker.py:163-165).

    Ordering inside a value group uses the group columns themselves —
    any row beyond the first is a duplicate regardless of which is
    "first", so the flag set is deterministic even though the survivor
    identity is not. Callers needing a deterministic survivor should
    use :func:`dedup_latest`.
    """
    w = Window.partitionBy(*cols).orderBy(*[F.col(c) for c in cols])
    return df.withColumn(
        "is_duplicate", F.row_number().over(w) > F.lit(1)
    )
