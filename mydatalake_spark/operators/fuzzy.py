"""Edit-distance near-duplicate verification (fuzzy matching).

[extension] Shingle-Jaccard (neardup.py) treats documents as bags of
n-grams — robust to reordering but blind to character-level edits.
Edit distance is the complementary metric: it catches the
OCR-noise / template-variable / small-patch duplicate class where
token sets diverge but the byte streams stay close. The classic
entity-resolution pipeline is block → verify: a cheap blocking join
proposes candidate pairs, and the expensive quadratic-per-pair edit
distance runs only on candidates.

Spark-first shape: candidates come from the existing shingle
equi-join (never all-pairs); verification is the built-in JVM
``levenshtein`` with its *threshold* short-circuit — Spark's
implementation abandons the DP matrix once the distance provably
exceeds the threshold, turning the per-pair cost from O(p²) to
O(p·t). Distances are computed on a fixed-length prefix so per-pair
cost is bounded no matter how large documents get; the prefix length
is part of the operator contract (and of the oracle).

At 100 TB: cost = candidate count × O(prefix·threshold). The
candidate generator is the knob that keeps the pair set linear
(banding / DF-capped shingles, same as the minhash and winnow
paths); verification adds two broadcast-able id-equi-joins to attach
prefixes and a codegen'd per-row function — no extra shuffle beyond
the candidate join itself.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .neardup import ngram_jaccard_pairs


def edit_ratio_pairs(
    df: DataFrame,
    candidates: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    candidate_threshold: float = 0.2,
    prefix_len: int = 200,
    max_ratio: float = 0.3,
) -> DataFrame:
    """Candidate pairs whose prefix edit *ratio* — levenshtein over
    the longer prefix length — is ≤ ``max_ratio``.

    ``candidates`` is any frame with (id_a, id_b); by default the
    exact shingle-Jaccard pairs at ``candidate_threshold`` (swap in
    ``minhash_candidates`` at scale — the verification half is
    identical). Returns ``(id_a, id_b, edit_ratio)`` rounded to 6.

    The levenshtein threshold is ``floor(max_ratio · prefix_len)``:
    any distance beyond it implies ratio > max_ratio for every
    possible prefix length ≤ prefix_len, so the short-circuit -1
    sentinel can only drop pairs the ratio filter would drop anyway.
    """
    if candidates is None:
        candidates = ngram_jaccard_pairs(
            df, text_col, id_col, n, candidate_threshold
        ).select("id_a", "id_b")
    lev_cap = int(math.floor(max_ratio * prefix_len))
    pre = df.select(
        F.col(id_col),
        F.substring(F.col(text_col), 1, prefix_len).alias("__pre__"),
    )
    a = pre.select(
        F.col(id_col).alias("id_a"), F.col("__pre__").alias("__pa__")
    )
    b = pre.select(
        F.col(id_col).alias("id_b"), F.col("__pre__").alias("__pb__")
    )
    d = F.levenshtein("__pa__", "__pb__", lev_cap)
    ratio = d / F.greatest(F.length("__pa__"), F.length("__pb__"))
    return (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .where((d >= 0) & (ratio <= max_ratio))
        .select("id_a", "id_b", F.round(ratio, 6).alias("edit_ratio"))
    )
