"""Slowly-changing-dimension (type 2) builds and op-aware CDC apply.

[extension] The two lakehouse maintenance shapes one step up from the
reference's type-1 CDC merge (operators/merge.py, reference
lib/ingestors.py:113-126):

- ``scd2_build`` — turn an append-only change stream into a versioned
  dimension: one row per (key, attribute-state run) with
  ``valid_from / valid_to / is_current / version``. This is the
  standard warehouse history table (Kimball SCD type 2), derived
  *functionally* from the raw stream rather than maintained by
  imperative row updates — re-runnable, audit-friendly, and exactly
  reproducible from bronze.
- ``apply_cdc_ops`` — apply an insert/update/delete-flagged CDC batch
  (Debezium-style ``op`` column) to a snapshot: the latest change per
  key wins; a terminal delete removes the key. Delta's
  ``WHEN MATCHED AND op='D' THEN DELETE`` clause expressed as pure
  DataFrame algebra.

Scale shape: both operators are a single hash shuffle on the business
key. ``scd2_build`` runs its change-detection lag, validity lead and
version number inside ONE window partitioning (the exchange is reused
across the window functions); ``apply_cdc_ops`` is one key-partitioned
anti join plus a union — no fact-side broadcast needed, and AQE
handles skewed keys like any join. At 100 TB the change stream is
typically ≪ the snapshot, so the anti join's build side is the deduped
batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import dedup_latest


def scd2_build(
    changes: DataFrame,
    key: str,
    ts: str,
    attrs: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Versioned dimension from a change stream.

    Ordering per key is ``(ts, tiebreak)`` — ``tiebreak`` is required
    to be a total order within (key, ts) for the output to be
    deterministic (SURVEY.md §7.4(4)); pass the change's unique id.
    Consecutive changes with identical ``attrs`` collapse into one
    validity run (no-op updates produce no version). Output columns:
    key, *attrs, valid_from, valid_to (null = open), is_current,
    version (1-based per key in time order).
    """
    order = [F.col(ts).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w_all = Window.partitionBy(key).orderBy(*order)
    state = F.struct(*[F.col(a) for a in attrs])
    changed = changes.withColumn(
        "__prev__", F.lag(state).over(w_all)
    ).where(
        F.col("__prev__").isNull() | (state != F.col("__prev__"))
    )
    w_kept = Window.partitionBy(key).orderBy(*order)
    return (
        changed.select(
            key,
            *attrs,
            F.col(ts).alias("valid_from"),
            F.lead(F.col(ts)).over(w_kept).alias("valid_to"),
            F.row_number().over(w_kept).alias("version"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def apply_cdc_ops(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    ts: str,
    op_col: str = "op",
    delete_op: str = "D",
    tiebreak: str | None = None,
) -> DataFrame:
    """Apply an op-flagged CDC batch to a snapshot; returns the new
    snapshot with the target's exact schema.

    The latest change per key (by ``ts`` then ``tiebreak``) is
    authoritative: a terminal ``delete_op`` removes the key, anything
    else replaces/inserts the row. Target rows with no change pass
    through untouched. ``changes`` must contain every target column
    plus ``op_col``."""
    missing = [c for c in target.columns if c not in changes.columns]
    if missing:
        raise ValueError(
            f"changes is missing target columns: {missing}; "
            "op-aware apply needs full row images"
        )
    latest = dedup_latest(
        changes, keys=[key], order_by=[ts],
        tiebreakers=[tiebreak] if tiebreak else None,
    )
    untouched = target.join(
        latest.select(key), key, "left_anti"
    )
    upserts = latest.where(F.col(op_col) != delete_op).select(
        *target.columns
    )
    return untouched.unionByName(upserts)


def pit_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    fact_ts: str,
    dim_key: str | None = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time join: each fact row picks the dimension version
    whose half-open validity window [valid_from, valid_to) covers the
    fact timestamp — THE consumer of an SCD2 dimension ("what was the
    customer's state when this event happened").

    Shape: an equi-join on the key with the interval predicate as a
    join filter — evaluated during the hash-join probe, so the
    per-fact fan-out is bounded by the key's *version count* (small
    by construction) and at most one row survives: ``scd2_build``'s
    versions tile each key's timeline without overlap (zero-length
    windows from same-timestamp changes can match nothing under the
    half-open contract). Never a range cross-product, and unlike an
    as-of join it honors explicit validity ends. ``how='left'`` keeps
    facts predating the first version (null dimension columns).
    """
    dim_key = dim_key or fact_key
    clash = [
        c for c in dim.columns
        if c != dim_key and c in fact.columns
    ]
    if clash:
        raise ValueError(
            f"dim columns collide with fact columns: {clash}; "
            "rename or pre-select the dim side"
        )
    d = dim.withColumnRenamed(dim_key, "__pit_pk__")
    cond = (
        (F.col(fact_key) == F.col("__pit_pk__"))
        & (F.col(fact_ts) >= F.col(valid_from))
        & (F.col(valid_to).isNull() | (F.col(fact_ts) < F.col(valid_to)))
    )
    return fact.join(d, cond, how).drop("__pit_pk__")
