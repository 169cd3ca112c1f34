"""Snapshot reconciliation: keyed diff between two table versions.

[extension] The lakehouse maintenance sibling of merge.py: given two
snapshots of a keyed table (yesterday's publish vs today's, source vs
migrated copy, prod vs staging), emit exactly what changed — inserts,
deletes, and updates with the list of changed columns. This is the
audit/validation half of every CDC pipeline (does applying the ops
reproduce the target?) and the standard cross-engine migration check.

Spark-first shape: ONE full outer join on the key — no collect, no
per-column subqueries. Row comparison is null-safe per column
(``eqNullSafe``), and the changed-column list is built as an array
expression (filter over a names/flags zip), so the whole comparator
is codegen'd column arithmetic on the joined row.

At 100 TB: both sides shuffle once on the key (co-partitioned/bucketed
snapshots make even that shuffle-free); unchanged rows — the vast
majority — are dropped before the result materializes, so output is
change-sized. For very wide tables pass ``compare_cols`` to prune the
comparison (and let column pruning shrink the scans to match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed diff ``old → new``.

    Returns ``(keys..., op, changed_cols)`` where op ∈
    {'insert','delete','update'} and ``changed_cols`` is the sorted
    array of differing column names (empty for insert/delete).
    Unchanged rows are omitted. Key sets must be unique per side —
    the standard snapshot contract (enforce upstream with
    dedup_latest); comparison is null-safe, so NULL→NULL is
    "unchanged" and NULL→value is a change.
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]
    missing = [c for c in compare_cols if c not in new.columns]
    if missing:
        raise ValueError(f"compare_cols absent from new side: {missing}")

    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
    )
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"__ko_{k}") == F.col(f"__kn_{k}"))
    joined = o.join(n, cond, "full_outer")

    in_old = F.col(f"__ko_{keys[0]}").isNotNull()
    in_new = F.col(f"__kn_{keys[0]}").isNotNull()
    changed_flags = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                (~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))).alias(
                    "chg"
                ),
            )
            for c in compare_cols
        ]
    )
    changed_cols = F.sort_array(
        F.transform(
            F.filter(changed_flags, lambda s: s.getField("chg")),
            lambda s: s.getField("col"),
        )
    )
    op = (
        F.when(in_old & ~in_new, F.lit("delete"))
        .when(~in_old & in_new, F.lit("insert"))
        .otherwise(F.lit("update"))
    )
    key_out = [
        F.coalesce(F.col(f"__kn_{k}"), F.col(f"__ko_{k}")).alias(k)
        for k in keys
    ]
    return (
        joined.select(
            *key_out,
            op.alias("op"),
            F.when(in_old & in_new, changed_cols)
            .otherwise(F.array().cast("array<string>"))
            .alias("changed_cols"),
        )
        .where(
            (F.col("op") != "update") | (F.size("changed_cols") > 0)
        )
    )
