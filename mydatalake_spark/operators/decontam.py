"""Benchmark decontamination + intra-document repetition scoring.

[extension] Training-data pipeline operators with no reference
analogue (the reference is a market-data lake, reference
lib/ingestors.py / lib/checker.py): before pretraining, a corpus must
be (a) scrubbed of evaluation-benchmark text — any document sharing a
long token n-gram with a held-out benchmark leaks test data into
training (the GPT-3/Pile 13-gram protocol) — and (b) filtered for
degenerate repetition (Gopher's duplicate-n-gram fractions).

100 TB shape:
- ``decontaminate``: the benchmark side is tiny (MBs of eval sets) —
  its distinct n-grams BROADCAST, so the corpus-side probe is a
  map-only hash lookup fused into the scan; the corpus never shuffles
  to discover contamination. Only the (small) per-doc hit counts
  aggregate. Set ``broadcast_holdout=False`` if the holdout is
  genuinely large and a shuffle equi-join on the gram is preferable.
- ``repetition_stats``: pure Column expressions (tokenize → sliding
  index n-grams → distinct-vs-total), whole-stage codegen, zero
  shuffles, scales embarrassingly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import let, normalize_text, shingles, tokens


def decontaminate(
    corpus: DataFrame,
    holdout: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    broadcast_holdout: bool = True,
) -> DataFrame:
    """Flag corpus documents sharing ≥ 1 token ``n``-gram with the
    holdout (benchmark) set.

    Returns ``(id_col, n_contaminated_ngrams, contaminated)`` — one
    row per corpus document, counting its DISTINCT n-grams that occur
    anywhere in the holdout. Untouched documents report 0/false, so
    the output is a full decision column, not just a hit list.
    """
    hold_grams = holdout.select(
        F.explode(shingles(F.col(text_col), n)).alias("gram")
    ).distinct()
    if broadcast_holdout:
        hold_grams = F.broadcast(hold_grams)
    corp_grams = corpus.select(
        id_col, F.explode(shingles(F.col(text_col), n)).alias("gram")
    )
    hits = (
        corp_grams.join(hold_grams, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return corpus.join(hits, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
        .alias("n_contaminated_ngrams"),
        (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
    )


def _all_ngrams(toks: Column, n: int) -> Column:
    """All token n-grams WITH duplicates (shingles() dedups; the
    repetition signal lives in the duplicates)."""
    k = F.size(toks) - F.lit(n - 1)
    idx = F.when(k > 0, F.sequence(F.lit(0), k - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)],
        ),
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Per-document repetition metrics (Gopher-style quality filter):
    token count, total/distinct ``n``-gram counts, and the duplicated
    n-gram fraction ``1 - distinct/total`` (0.0 for docs too short to
    have any n-gram). Pure expressions — no UDF, no shuffle."""

    def build(toks: Column) -> Column:
        grams = _all_ngrams(toks, n)
        total = F.size(grams)
        distinct = F.size(F.array_distinct(grams))
        return F.struct(
            F.size(toks).cast("long").alias("n_tokens"),
            total.cast("long").alias("n_ngrams"),
            distinct.cast("long").alias("n_distinct_ngrams"),
            F.when(
                total > 0,
                F.round(
                    F.lit(1.0) - distinct.cast("double") / total.cast("double"),
                    6,
                ),
            ).otherwise(F.lit(0.0)).alias("dup_ngram_frac"),
        )

    # null text → empty token array (size(NULL) is -1 under legacy
    # sizeOfNull; a null doc has 0 tokens, not -1)
    stats = let(
        F.coalesce(
            tokens(normalize_text(F.col(text_col))),
            F.array().cast("array<string>"),
        ),
        build,
    )
    return df.select(id_col, stats.alias("s")).select(
        id_col,
        F.col("s.n_tokens").alias("n_tokens"),
        F.col("s.n_ngrams").alias("n_ngrams"),
        F.col("s.n_distinct_ngrams").alias("n_distinct_ngrams"),
        F.col("s.dup_ngram_frac").alias("dup_ngram_frac"),
    )
