"""Explicit ownership for operator-internal caches.

Some operators (winnow_pairs, cosine_neardup_pairs,
incremental_dedup_pipeline) must ``cache()`` an intermediate that
feeds multiple branches of the returned plan — unpersisting it before
returning would either triple-recompute the expensive expression or,
for the incremental pipeline, silently change results (the plan would
re-read a signature table that the pipeline itself just mutated).

So the cache has to outlive the function call, and in a long-lived
session that is a storage-memory leak unless someone releases it.
These helpers make the ownership transfer explicit: the operator
``adopt()``s its intermediates onto the returned DataFrame, and the
caller calls ``release(df)`` once it has finished its actions.
Releasing is idempotent; forgetting to release degrades to the old
behavior (bounded by executor storage eviction, but don't rely on it
in a server process).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_OWNED_ATTR = "_mydatalake_owned_caches"


def adopt(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Attach ``cached`` intermediates to ``result`` so the caller can
    ``release`` them after consuming the result."""
    existing = list(getattr(result, _OWNED_ATTR, []))
    setattr(result, _OWNED_ATTR, existing + list(cached))
    return result


def release(df: DataFrame) -> None:
    """Unpersist every cache an operator attached to ``df`` (and stop
    tracking them). Safe to call on any DataFrame; idempotent."""
    for c in getattr(df, _OWNED_ATTR, []):
        try:
            c.unpersist()
        except Exception:  # pragma: no cover — session already stopped
            pass
    setattr(df, _OWNED_ATTR, [])
