"""Exact frequent-items (heavy hitters) at scale.

[extension] Corpus-curation primitive: find every item (token, n-gram,
URL, domain …) whose global frequency is at least ``threshold_frac``
of the stream — exactly, without ever shuffling the full item stream.

Two-pass shape (Misra–Gries candidates → exact recount), the classic
distributed heavy-hitters recipe built from mergeable summaries
(Agarwal et al., "Mergeable Summaries", PODS'12; Misra & Gries 1982):

1. **Candidate pass** — ``mapInPandas`` keeps a Misra–Gries summary of
   capacity ``k`` per partition (vectorized: pandas ``value_counts``
   per Arrow batch, Counter-merge, then one subtract-the-(k+1)-th
   prune). A partition summary underestimates any item's count by at
   most ``n_p/(k+1)``, so an item with global count > ``n/(k+1)``
   must survive in at least one partition. With
   ``k + 1 > 1/threshold_frac`` the union of per-partition survivors
   is a superset of the true answer. Each partition also emits one
   sentinel row carrying its row count, so the global ``n`` comes out
   of the same single pass.
2. **Recount pass** — the candidate set (≤ ``partitions × k`` rows —
   tiny) broadcast-semi-joins the stream, and only matching items are
   counted exactly. The final ``HAVING count ≥ ceil(frac·n)`` filter
   makes the output exactly equal to the naive full
   ``GROUP BY … HAVING`` — which is the oracle.

At 100 TB this is the difference between shuffling ~10^12 token rows
(naive groupBy) and shuffling only the few thousand candidate-matched
groups: the first pass is map-only, the second shuffles a stream
pre-filtered to candidates. Nothing is ever collected to the driver —
the candidate set flows as a broadcast DataFrame and ``n`` as a one-row
broadcast join (same pattern as functions/text.py:bm25_scores).
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PASS1_SCHEMA = "item string, part_rows bigint"


def _mg_partition(capacity: int):
    """Build the per-partition Misra–Gries generator for mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: Counter = Counter()
        n_rows = 0
        for pdf in batches:
            col = pdf["item"].dropna()
            n_rows += len(col)
            # vectorized batch count, then one summary merge
            counters.update(col.value_counts().to_dict())
            if len(counters) > capacity:
                # subtract the (capacity+1)-th largest from everything
                # and prune ≤0 — the mergeable-summaries MG prune
                kth = sorted(counters.values(), reverse=True)[capacity]
                counters = Counter(
                    {i: c - kth for i, c in counters.items() if c > kth}
                )
        out = pd.DataFrame(
            {"item": list(counters.keys()), "part_rows": None}
        )
        sentinel = pd.DataFrame({"item": [None], "part_rows": [n_rows]})
        yield pd.concat([out, sentinel], ignore_index=True).astype(
            {"part_rows": "Int64"}
        )

    return run


def heavy_hitters(
    df: DataFrame,
    item: Column | str,
    threshold_frac: float | None = None,
    capacity: int | None = None,
    min_count: int | None = None,
) -> DataFrame:
    """Items whose frequency ≥ ``threshold_frac`` of all rows (or,
    with ``min_count``, whose absolute count ≥ ``min_count``), with
    exact counts: ``(token string, cnt long)``. Equivalent to
    ``SELECT item, count(*) FROM df GROUP BY item HAVING count(*) >=
    ceil(threshold_frac * n)`` (resp. ``>= min_count``) but never
    shuffles the full stream (see module docstring).

    ``capacity`` defaults to ``floor(1/threshold_frac) + 2`` — the
    smallest size for which the Misra–Gries candidate superset
    guarantee holds strictly.

    ``min_count`` mode (exactly one of the two thresholds): an
    ABSOLUTE support level, the scale-stable way to phrase "frequent"
    when the stream length grows with the corpus but per-entity rates
    don't (e.g. ``ceil(r × n_docs)`` occurrences of an n-gram). The
    stream length is unknown until the pass runs, so the MG
    completeness condition ``min_count × (capacity+1) > n`` is
    enforced IN-PLAN: if the stream outgrows the caller's ``capacity``
    sizing, the query raises instead of silently dropping hitters.
    ``capacity`` is required in this mode.
    """
    if (threshold_frac is None) == (min_count is None):
        raise ValueError(
            "pass exactly one of threshold_frac / min_count"
        )
    if min_count is not None:
        if capacity is None:
            raise ValueError("min_count mode requires explicit capacity")
        if min_count < 1:
            raise ValueError("min_count must be >= 1")
        k = capacity
    else:
        if not 0 < threshold_frac < 1:
            raise ValueError("threshold_frac must be in (0, 1)")
        k = capacity or int(math.floor(1.0 / threshold_frac)) + 2
        if k + 1 <= 1.0 / threshold_frac:
            raise ValueError(
                f"capacity {k} too small for threshold {threshold_frac}: "
                f"need capacity + 1 > 1/threshold"
            )
    c = F.col(item) if isinstance(item, str) else item
    items = df.select(c.cast("string").alias("item")).where(c.isNotNull())

    pass1 = items.mapInPandas(_mg_partition(k), schema=_PASS1_SCHEMA)
    # one tiny frame holds both outputs of the single pass
    summary = pass1.agg(
        F.sum("part_rows").alias("n_total"),
        F.collect_set(F.when(F.col("part_rows").isNull(), F.col("item"))).alias(
            "cands"
        ),
    )
    candidates = summary.select(
        F.explode("cands").alias("item"), "n_total"
    )
    counted = (
        items.join(F.broadcast(candidates), "item")
        .groupBy("item", "n_total")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if min_count is not None:
        # In-plan completeness guard: MG guarantees every item with
        # count > n/(k+1) survives, so absolute-threshold mode is
        # complete iff min_count × (k+1) > n. The stream length is
        # only known here — raise loudly rather than silently drop
        # hitters if the corpus outgrew the caller's capacity sizing.
        guard = F.when(
            F.col("n_total") < F.lit(int(min_count) * (k + 1)),
            F.lit(True),
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"heavy_hitters: capacity {k} too small for "
                        f"min_count {min_count} at stream length "
                    ),
                    F.col("n_total").cast("string"),
                )
            )
        )
        threshold = F.lit(int(min_count))
    else:
        guard = F.lit(True)
        threshold = F.ceil(F.col("n_total") * threshold_frac)
    return (
        counted.where(guard & (F.col("cnt") >= threshold))
        .select(F.col("item").alias("token"), F.col("cnt"))
    )
