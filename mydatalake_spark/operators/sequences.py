"""Event-sequence mining: transition matrices and top journey paths.

[extension] The sequence view of the events table that funnel /
retention / sessionize queries don't cover: what do users actually DO
next (first-order Markov transition matrix), and which whole journeys
are most common (top-k path strings)? Both are the standard product-
analytics primitives behind "user flow" diagrams, and both are
oracle-expressible — LAG + GROUP BY, and ordered STRING_AGG.

Spark-first shapes:

- ``transition_matrix``: one window pass (lag over the per-key
  ordered stream) + one count aggregate; row-normalization is a
  window sum over the aggregated |states|² matrix — no join, no
  second pass over the input. Exactly one input-sized shuffle (the
  key partitioning); the matrix itself is trivially small however
  big the input.
- ``top_paths``: per-key ordered states collapse to a single path
  string via sort_array over structs (deterministic regardless of
  partition order — the array sorts on the order columns, not on
  arrival), then a count + rank. Paths truncate at ``max_steps`` so
  row width stays bounded no matter how long a session runs.

At 100 TB both shuffle once on the sequence key, and their outputs
(state matrix, top-k paths) are constants in size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_matrix(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    state_col: str,
    round_to: int = 6,
) -> DataFrame:
    """First-order transition counts and probabilities between
    consecutive states within each key's ordered stream.

    Returns ``(prev_state, next_state, n, p)`` where ``p`` is
    row-normalized per ``prev_state`` (rounded). ``order_cols`` must
    be a deterministic total order within each key (pass a tiebreaker
    column, e.g. the event id) — otherwise ties make lag() pick an
    arbitrary predecessor and the result isn't reproducible.
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    steps = (
        df.select(
            F.col(key_col),
            F.col(state_col).alias("next_state"),
            F.lag(state_col).over(w).alias("prev_state"),
        )
        .where(F.col("prev_state").isNotNull())
        .groupBy("prev_state", "next_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Normalize with a window sum over the aggregated matrix — a
    # totals-join would re-derive the lag/count branch a second time
    # (two input passes); the window sees only |states|² rows.
    tot = F.sum("n").over(Window.partitionBy("prev_state"))
    return steps.select(
        "prev_state",
        "next_state",
        "n",
        F.round(F.col("n") / tot, round_to).alias("p"),
    )


def top_paths(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    state_col: str,
    max_steps: int = 5,
    k: int = 20,
    sep: str = ">",
) -> DataFrame:
    """Top-``k`` most common journey prefixes: each key's first
    ``max_steps`` states (in ``order_cols`` order) joined into a path
    string, counted across keys, ranked by (count desc, path) — the
    path tiebreak keeps the top-k deterministic through count ties.

    The per-key collapse is ``sort_array`` over (order..., state)
    structs — deterministic under any partitioning, no window sort —
    then a slice to ``max_steps``; collect_list feeds the sort, so
    the only input-sized shuffle is the groupBy on the key. The final
    rank window is unpartitioned by design: it runs on the *distinct
    path* frame, bounded by |states|^max_steps regardless of input
    rows (and pre-aggregated before it, so the single task sees one
    row per path, not per key).
    """
    order_fields = [F.col(c) for c in order_cols]
    packed = df.groupBy(key_col).agg(
        F.collect_list(
            F.struct(*order_fields, F.col(state_col).alias("__s__"))
        ).alias("__evs__")
    )
    path = F.array_join(
        F.slice(
            F.transform(
                F.sort_array("__evs__"), lambda s: s.getField("__s__")
            ),
            1,
            max_steps,
        ),
        sep,
    )
    counted = (
        packed.select(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )
    w = Window.orderBy(F.desc("n_keys"), F.asc("path"))
    return (
        counted.select("*", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
    )
