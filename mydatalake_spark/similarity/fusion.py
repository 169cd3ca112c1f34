"""Hybrid-retrieval rank fusion (Reciprocal Rank Fusion).

[extension] The standard way to combine a lexical ranker (BM25) with a
semantic ranker (embedding cosine) without score calibration: RRF
(Cormack, Clarke & Büttcher, SIGIR 2009) scores each document
``Σ_r 1/(k + rank_r(d))`` over the rankings it appears in — rank-based,
so the two rankers' incomparable score scales never need normalizing.
This is the retrieval shape of a curation pipeline that probes a
corpus with both topic keywords and an embedding query.

Spark-first shape: each ranker reduces to a top-N via global
sort-limit (``TakeOrderedAndProject`` — no full sort at scale), ranks
are assigned by a window over that N-row frame (driver-bounded, not
corpus-bounded), and fusion is union + ONE groupBy on the id — never
a join between rankings, so f rankings cost one (f·N)-row shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rank_top_n(
    df: DataFrame,
    score: Column,
    id_col: str,
    n: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Deterministic top-``n`` ranking by ``score`` descending with the
    id as total-order tiebreak: global sort-limit first (planner emits
    TakeOrderedAndProject — heap-select per partition, merge of ≤n
    rows), then row_number over the n-row result. Pre-round the score
    expression if it is float-valued so ranks are engine-portable."""
    w = Window.orderBy(F.desc("__score__"), id_col)
    return (
        df.select(F.col(id_col), score.alias("__score__"))
        .orderBy(F.desc("__score__"), id_col)
        .limit(n)
        .withColumn(rank_col, F.row_number().over(w))
        .drop("__score__")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str,
    rank_col: str = "rank",
    k: int = 60,
    round_to: int = 6,
) -> DataFrame:
    """Fuse rankings: one row per document appearing in ≥1 ranking,
    with ``in_lists`` (how many rankings contain it) and ``rrf_score``
    = Σ 1/(k + rank). Union + single groupBy on the id — scales as the
    sum of the ranking sizes, independent of corpus size. The sum
    folds over a sorted per-doc contribution array so the float adds
    happen in a deterministic order on any engine."""
    parts = [
        r.select(
            F.col(id_col),
            (1.0 / (F.lit(k) + F.col(rank_col).cast("double"))).alias(
                "__c__"
            ),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("in_lists"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list("__c__")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            round_to,
        ).alias("rrf_score"),
    )
