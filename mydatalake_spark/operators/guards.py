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
