"""Runtime refusal guards for bounded-group pair generators.

[extension] Several operators generate O(n²) rows PER GROUP by design
(Theil–Sen pairwise slopes, winnowing fingerprint self-joins) under a
documented bounded-groups contract. A contract in a docstring does not
stop a hot key: one group with 10⁶ members quietly builds 10¹² pairs
and takes the cluster down with it. This module is the contract made
executable — the same refusal pattern ``merge_upsert_partitioned``
uses for its partition probe (operators/merge.py): one CHEAP bounded
probe before the expensive plan, and a clear, remediated error instead
of a silent quadratic.

Probe cost model (why this is safe to run eagerly at 100 TB): a
``groupBy(key).count()`` is a map-side partial aggregate whose output
is group-count sized, the ``filter(n > cap)`` usually kills everything
at the exchange, and ``limit(1)`` bounds the driver transfer to ONE
row — the probe never collects a group listing, only the existence of
a violation (plus one example key for the error message).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class GroupSizeExceeded(ValueError):
    """A group exceeds the operator's bounded-groups contract cap.

    Raised BEFORE the quadratic plan is built, with the offending key
    and size in the message — the alternative is an unkillable
    shuffle-write explosion discovered hours into the job.
    """


def assert_bounded_groups(
    df: DataFrame,
    key_cols: list[str | Column],
    cap: int,
    op_name: str,
    remediation: str,
) -> None:
    """Refuse (raise :class:`GroupSizeExceeded`) if any group of
    ``df`` keyed by ``key_cols`` has more than ``cap`` rows.

    One partial-aggregate probe job, ``limit(1)`` driver transfer —
    cheap at any scale relative to the pair join it protects.

    Rows with a NULL in any key column are EXCLUDED from the probe:
    every protected pair stage equi-joins on the group key, and an
    equi-join drops null keys, so a hot null-key group (e.g. many
    events with no user id) would refuse a job that never builds
    those pairs.
    """
    if cap <= 0:
        raise ValueError(f"{op_name}: guard cap must be positive, got {cap}")
    names = [c if isinstance(c, str) else f"k{i}" for i, c in enumerate(key_cols)]
    keyed = df.select(
        *[
            F.col(c).alias(n) if isinstance(c, str) else c.alias(n)
            for c, n in zip(key_cols, names)
        ]
    )
    for n in names:
        keyed = keyed.where(F.col(n).isNotNull())
    hot = (
        keyed.groupBy(*names)
        .agg(F.count(F.lit(1)).alias("__n__"))
        .filter(F.col("__n__") > cap)
        .limit(1)
        .collect()
    )
    if hot:
        row = hot[0]
        key_repr = ", ".join(f"{n}={row[n]!r}" for n in names)
        raise GroupSizeExceeded(
            f"{op_name}: group ({key_repr}) has {row['__n__']} rows, over "
            f"the bounded-groups cap of {cap}; the pairwise stage would "
            f"build ~{row['__n__'] ** 2:,} rows for this group alone. "
            + remediation
        )


class DistinctCardinalityExceeded(ValueError):
    """A column's distinct cardinality exceeds an operator's
    bounded-distinct contract cap.

    Raised BEFORE the plan whose cost is distinct-value-frame sized is
    built (e.g. an unpartitioned ordered window over the distinct
    values) — the alternative is one task quietly sorting a
    rows-sized frame on a single executor.
    """


def assert_bounded_distinct(
    df: DataFrame,
    value_col: str | Column,
    cap: int,
    op_name: str,
    remediation: str,
) -> None:
    """Refuse (raise :class:`DistinctCardinalityExceeded`) if
    ``value_col`` has (approximately) more than ``cap`` distinct
    values.

    One ``approx_count_distinct`` probe job (HLL partial aggregate —
    map-side, constant memory, one row to the driver). The 5% relative
    error is fine for a refusal guard: the cap is an order-of-magnitude
    contract, not an exact budget, and compliant inputs sit far below
    it.
    """
    if cap <= 0:
        raise ValueError(f"{op_name}: guard cap must be positive, got {cap}")
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    n = df.agg(
        F.approx_count_distinct(col, rsd=0.05).alias("__nd__")
    ).first()["__nd__"]
    if n > cap:
        raise DistinctCardinalityExceeded(
            f"{op_name}: ~{n:,} distinct values (cap {cap:,}); the "
            f"distinct-value frame would be serialized through one "
            f"unpartitioned window task. " + remediation
        )
