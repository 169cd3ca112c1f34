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


def _one_deletions(s):
    """Array of the |s| strings reachable by deleting exactly one
    character — codegen arithmetic (transform over a position
    sequence + column-position substr), no Python per row."""
    return F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substr(s, F.lit(1), i - 1),
            F.substr(s, i + 1, F.length(s)),
        ),
    )


def _deletion_variants(col, max_distance: int):
    """All strings reachable from ``col`` by deleting up to
    ``max_distance`` characters (the FastSS deletion neighborhood),
    duplicates removed. d=1: {s} ∪ the n one-deletions; d=2 composes
    the one-deletion map with itself (deletions commute, so two
    passes enumerate every ≤2-deletion string)."""
    if max_distance not in (1, 2):
        raise ValueError(
            f"fastss supports max_distance 1 or 2, got {max_distance} "
            "(the neighborhood is C(n,d)-sized — beyond d=2 use the "
            "blocking+verify path, edit_ratio_pairs)"
        )
    del1 = _one_deletions(col)
    variants = F.concat(F.array(col), del1)
    if max_distance == 2:
        variants = F.concat(
            variants, F.flatten(F.transform(del1, _one_deletions))
        )
    return F.array_distinct(variants)


def fastss_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_col: str,
    right_col: str,
    max_distance: int = 1,
    max_len: int = 64,
    max_candidates: int = 50_000_000,
) -> DataFrame:
    """Exact edit-distance similarity join (FastSS, Bocek et al. 2007
    — public algorithm): every (left, right) pair with
    ``levenshtein ≤ max_distance``, COMPLETE by construction — unlike
    the shingle-blocking path (:func:`edit_ratio_pairs`), which can
    miss pairs whose n-gram sets diverge, the deletion-neighborhood
    signature is a *guarantee*: ed(a,b) ≤ d ⟹ some ≤d-deletion
    variant of a equals one of b. Candidates come from ONE equi-join
    on the variant string; the exact ``levenshtein`` (with its
    threshold short-circuit) then removes false positives.

    Returns ``(left_id + "_l", right_id + "_r", distance)``. Rows with
    a NULL string drop out (a NULL has no edit distance to anything);
    empty strings participate normally. Self-pairs are the caller's
    concern (filter on the ids for a self-join).

    ``left_id``/``right_id`` must be UNIQUE per side (the same
    contract as change_feed's snapshot keys, ADVICE r9): the
    candidate dedup is on the id pair, so a duplicated id collapses
    distinct strings at the candidate stage and then re-multiplies
    through the verify joins — duplicate (id_l, id_r) output rows
    with whichever distances the colliding strings produce. Dedup
    upstream (dedup_latest) or key on (id, string) yourself.

    At 100 TB: per-row fan-out is bounded (≤ n+1 variants at d=1,
    O(n²) at d=2 — ``max_len`` refuses strings where that stops being
    small); the join is a hash equi-join on the variant key, never
    all-pairs; candidate blow-up through hot variants is bounded by a
    pre-join Σ(df_left·df_right) probe that REFUSES past
    ``max_candidates`` instead of launching a runaway shuffle (same
    contract as the neardup band joins). Pair dedup happens on the
    (id, id) key before verification so each pair pays the DP cost
    once.
    """
    too_long = left.where(F.length(left_col) > max_len).limit(1).count()
    too_long += right.where(F.length(right_col) > max_len).limit(1).count()
    if too_long:
        raise ValueError(
            f"fastss_join: strings longer than max_len={max_len} present"
            " — the deletion neighborhood grows O(n^d); raise max_len"
            " only if the fan-out stays acceptable, or truncate/key the"
            " strings upstream"
        )
    lv = left.select(
        F.col(left_id).alias("__lid__"),
        F.explode(
            _deletion_variants(F.col(left_col), max_distance)
        ).alias("__var__"),
    )
    rv = right.select(
        F.col(right_id).alias("__rid__"),
        F.explode(
            _deletion_variants(F.col(right_col), max_distance)
        ).alias("__var__"),
    )
    # Blow-up probe: candidate pairs = Σ_variant df_l(v)·df_r(v). Two
    # cheap count aggs + an equi-join on the (already tiny) distinct
    # variant histograms — refuses BEFORE the real join can explode.
    # The probe recomputes lv/rv (scan-shaped derivations: recompute ≈
    # one pruned scan + explode) — deliberately uncached, same policy
    # as bloomjoin's scan-shaped build sides.
    ldf = lv.groupBy("__var__").agg(F.count(F.lit(1)).alias("__dfl__"))
    rdf = rv.groupBy("__var__").agg(F.count(F.lit(1)).alias("__dfr__"))
    est = (
        ldf.join(rdf, "__var__")
        .select(F.sum(F.col("__dfl__") * F.col("__dfr__")).alias("n"))
        .collect()[0]["n"]
    )
    if est is not None and est > max_candidates:
        raise ValueError(
            f"fastss_join: candidate estimate {est:,} exceeds "
            f"max_candidates={max_candidates:,} — hot variants are "
            "fanning out (short or highly repetitive strings); "
            "pre-dedup the string columns or raise the bound knowingly"
        )
    cand = (
        lv.join(rv, "__var__")
        .select("__lid__", "__rid__")
        .distinct()
    )
    a = left.select(
        F.col(left_id).alias("__lid__"), F.col(left_col).alias("__ls__")
    )
    b = right.select(
        F.col(right_id).alias("__rid__"), F.col(right_col).alias("__rs__")
    )
    d = F.levenshtein("__ls__", "__rs__", max_distance)
    return (
        cand.join(a, "__lid__")
        .join(b, "__rid__")
        .where(d >= 0)
        .select(
            F.col("__lid__").alias(left_id + "_l"),
            F.col("__rid__").alias(right_id + "_r"),
            d.alias("distance"),
        )
    )
