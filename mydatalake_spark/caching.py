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

#: Every cache any operator has adopted and nobody has released yet.
#: The per-DataFrame attribute is the precise ownership channel, but
#: it only survives as long as the caller keeps the EXACT returned
#: object — ``pairs.select(...)`` silently orphans it. The ledger is
#: the backstop: :func:`release_all` at a quiesce point (between bench
#: queries, between driver runs) unpersists whatever fell through.
_LEDGER: list[DataFrame] = []


def adopt(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Attach ``cached`` intermediates to ``result`` so the caller can
    ``release`` them after consuming the result."""
    existing = list(getattr(result, _OWNED_ATTR, []))
    setattr(result, _OWNED_ATTR, existing + list(cached))
    _LEDGER.extend(cached)
    return result


def transfer(src: DataFrame, dst: DataFrame) -> DataFrame:
    """Move ``src``'s adopted caches onto ``dst`` and return ``dst``.

    For composers that call a cache-adopting operator and then DERIVE
    a new frame from its result (select/join/agg): the ownership
    attribute lives on the exact returned object, so without a
    transfer the final frame the caller releases carries nothing and
    the cache leaks until :func:`release_all` or eviction."""
    owned = list(getattr(src, _OWNED_ATTR, []))
    if owned:
        setattr(src, _OWNED_ATTR, [])
        existing = list(getattr(dst, _OWNED_ATTR, []))
        setattr(dst, _OWNED_ATTR, existing + owned)
    return dst


def _forget(caches: list[DataFrame]) -> None:
    for c in caches:
        for i, live in enumerate(_LEDGER):
            if live is c:
                del _LEDGER[i]
                break


def release(df: DataFrame) -> None:
    """Unpersist every cache an operator attached to ``df`` (and stop
    tracking them). Safe to call on any DataFrame; idempotent."""
    owned = list(getattr(df, _OWNED_ATTR, []))
    for c in owned:
        try:
            c.unpersist()
        except Exception:  # pragma: no cover — session already stopped
            pass
    _forget(owned)
    setattr(df, _OWNED_ATTR, [])


def release_all() -> None:
    """Unpersist EVERY outstanding operator cache (the ledger) —
    the quiesce-point API for session loops that run many queries
    (bench, the oracle gate, a driver harness). Only call between
    queries: a cache still feeding a live, un-acted-on plan would
    recompute. Idempotent."""
    while _LEDGER:
        c = _LEDGER.pop()
        try:
            c.unpersist()
        except Exception:  # pragma: no cover — session already stopped
            pass
