"""As-of (most-recent-at-or-before) join — a custom operator Spark lacks.

Not present in the reference (its only join-shaped op is the CDC MERGE,
SURVEY.md §2.3); included as a first-class [extension] operator because
time-series enrichment ("latest dimension state as of the fact's
timestamp") is the natural generalization of the reference's
``new.ts >= old.ts`` merge guard (reference lib/ingestors.py:123).

Implementation: the classic scalable union-window rewrite, NOT a range
cross-join:

    tag left rows (side=1) and right rows (side=0), union on the key +
    time axis, and for every row take the last side-0 value at or
    before it via ``last(col, ignorenulls=True)`` over
    (partition key, order ts/side, rows unbounded-preceding..current).

Cost: one shuffle on the key (same as any keyed join) + one sort —
no range explosion, skew handled by AQE. This is how as-of joins are
done at 100 TB; a per-key loop or a ``t1.ts <= t2.ts`` theta-join
would be quadratic in hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_values: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` key group.

    Right value columns are appended with ``suffix`` if they collide
    with left columns. Left rows with no prior right row get nulls
    (left-outer as-of semantics).
    """
    right_values = right_values or [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in right_values
    }

    # The right values travel as ONE struct so the window fill picks a
    # single whole right row — filling each column independently would
    # stitch non-null values from DIFFERENT right rows together when the
    # matched row has nulls (true as-of semantics, like DuckDB ASOF
    # JOIN, must return the matched row's nulls as-is).
    rrow_type = StructType(
        [
            StructField(out_names[c], right.schema[c].dataType, True)
            for c in right_values
        ]
    )
    l_tag = left.select(
        *on,
        F.col(left_ts).alias("__ts__"),
        F.lit(1).alias("__side__"),
        F.struct(*left.columns).alias("__lrow__"),
        F.lit(None).cast(rrow_type).alias("__rrow__"),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("__ts__"),
        F.lit(0).alias("__side__"),
        F.lit(None).cast(
            l_tag.schema["__lrow__"].dataType
        ).alias("__lrow__"),
        F.struct(
            *[F.col(c).alias(out_names[c]) for c in right_values]
        ).cast(rrow_type).alias("__rrow__"),
    )

    unioned = l_tag.unionByName(r_tag)
    # side 0 sorts before side 1 at equal ts ⇒ "at or before" inclusive.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts__").asc(), F.col("__side__").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        F.last("__rrow__", ignorenulls=True).over(w).alias("__frow__"),
    ).filter(F.col("__side__") == 1)

    return filled.select(
        F.col("__lrow__.*"),
        *[
            F.col("__frow__")[out_names[c]].alias(out_names[c])
            for c in right_values
        ],
    )
