"""Text-analysis column functions for training-data pipelines.

[extension] Beyond the reference surface (SURVEY.md §2 extensions):
token counting, quality scoring, language ID, and document
fingerprinting over a ``documents(text string)`` table.

Everything here is pure ``pyspark.sql.functions`` expressions —
JVM-side, whole-stage-codegen-able, no Python in the hot path. At
100 TB these run as a narrow map stage fused with the parquet scan:
no shuffle, no UDF serialization boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword
# heuristic language guesser. Deliberately small and public-knowledge;
# real pipelines plug in fastText/CLD3 via a Pandas UDF instead.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "es": ["el", "la", "de", "que", "es"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["的", "是", "了", "在", "我"],
}


def let(value: Column, body) -> Column:
    """Evaluate ``value`` once and bind it as a lambda variable for
    ``body`` — Catalyst does NOT share common subexpressions across
    references inside higher-order lambdas, so e.g. three
    ``element_at(expensive_array, …)`` calls re-evaluate the array
    three times *per element*. Wrapping the value in a single-element
    array and transforming binds it once (measured ~20× on the shingle
    pipeline at sf0.1)."""
    return F.element_at(F.transform(F.array(value), body), 1)


def normalize_text(col: Column | str) -> Column:
    """Whitespace-collapse + trim + lowercase — the canonical form used
    by fingerprinting and exact dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization → array<string> (empty array for empty
    text, not [''])."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")) \
        .otherwise(F.split(trimmed, r"\s+"))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col))).cast("long")


def char_class_count(col: Column | str, pattern: str) -> Column:
    """#chars matching a regex class = len(text) - len(text minus class)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(c) - F.length(F.regexp_replace(c, pattern, ""))).cast("long")


def text_quality(col: Column | str, round_to: int = 4) -> dict[str, Column]:
    """Quality-signal bundle: length, token stats, punctuation/digit/
    whitespace ratios, mean token length. Returned as named Columns so
    callers project exactly what they need (column pruning stays
    effective)."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("long")
    n_tok = token_count(c)
    safe_chars = F.greatest(n_chars, F.lit(1))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "n_distinct_tokens": distinct_token_count(c),
        "punct_ratio": F.round(
            char_class_count(c, r"[.!?,;:]") / safe_chars, round_to
        ),
        "digit_ratio": F.round(
            char_class_count(c, r"[0-9]") / safe_chars, round_to
        ),
        "space_ratio": F.round(
            char_class_count(c, r" ") / safe_chars, round_to
        ),
        "mean_token_len": F.round(
            (n_chars - char_class_count(c, r"\s")) /
            F.greatest(n_tok, F.lit(1)).cast("double"),
            round_to,
        ),
    }


def lang_marker_score(col: Column | str, lang: str) -> Column:
    """#tokens that are marker stopwords of ``lang``."""
    toks = tokens(normalize_text(col))
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t))).cast("long")


def lang_guess(col: Column | str, order: list[str] | None = None) -> Column:
    """Argmax language over marker scores; ties resolve by the fixed
    ``order`` (deterministic — required for oracle matching, see
    SURVEY.md §7.4(4)). Zero markers anywhere → 'und'."""
    langs = order or list(LANG_MARKERS)
    scores = {lang: lang_marker_score(col, lang) for lang in langs}
    best = F.greatest(*scores.values()) if len(scores) > 1 else next(iter(scores.values()))
    expr = F.lit("und")
    # build right-to-left so earlier langs in `order` win ties
    for lang in reversed(langs):
        expr = F.when(
            (scores[lang] > 0) & (scores[lang] == best), F.lit(lang)
        ).otherwise(expr)
    return expr


def doc_fingerprint(col: Column | str) -> Column:
    """Deterministic content fingerprint: md5 of the normalized text.
    Stable across engines (md5 is standard), used for exact dedup."""
    return F.md5(normalize_text(col))


# Ordered PII patterns — kept to syntax that Java regex (Spark) and
# RE2 (DuckDB, Go tooling) interpret identically: no backrefs, no
# lookaround. Email first so its digit runs can't be half-eaten by the
# phone pattern; SSN before phone (3-2-4 vs 3-3-4 grouping).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def redact_pii(col: Column | str) -> Column:
    """Replace email / SSN / phone / IPv4 literals with typed
    placeholder tags. A chain of JVM-side ``regexp_replace`` calls —
    codegen-fused with the scan, no UDF, replaces ALL occurrences.
    The pattern list is deliberately RE2-compatible so the exact same
    redaction can run (and be oracle-verified) on other engines."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pattern, tag in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, tag)
    return c


def chunk_text(
    df,
    text_col: str = "text",
    size: int = 512,
    stride: int = 384,
    chunk_col: str = "chunk",
    index_col: str = "chunk_id",
):
    """Split documents into overlapping fixed-width character windows —
    the tokenize-ready unit for LLM training shards. One chunk row per
    window: ``chunk_id`` = 0..⌈(len−size)/stride⌉, window i covers
    chars [i·stride, i·stride+size). Empty/short docs yield exactly
    one (possibly short) chunk, so no document silently disappears.

    Implementation is ``explode(sequence(...))`` + ``substring`` —
    pure JVM expressions fused with the scan. The explode multiplies
    rows ~len/stride× but never shuffles; at 100 TB chunking is
    map-only and the output can be written back partition-aligned
    with the input."""
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    c = F.col(text_col)
    n_chunks = F.greatest(
        (F.ceil((F.length(c) - F.lit(size)) / F.lit(float(stride))) + 1)
        .cast("long"),
        F.lit(1).cast("long"),
    )
    return (
        df.withColumn(
            index_col, F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1))
        )
        .withColumn(
            chunk_col,
            F.substring(
                c,
                (F.col(index_col) * stride + 1).cast("int"),
                F.lit(size),
            ),
        )
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Token n-gram shingles as array<string> (distinct). Built from a
    sliding index sequence — pure SQL expressions, no UDF. The token
    array is let-bound so the tokenizer runs once per row, not once
    per element_at reference."""

    def build(toks: Column) -> Column:
        k = F.size(toks) - F.lit(n - 1)
        idx = F.when(k > 0, F.sequence(F.lit(0), k - 1)).otherwise(
            F.array().cast("array<int>")
        )
        return F.array_distinct(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)],
                ),
            )
        )

    return let(tokens(normalize_text(col)), build)


# Default stop-word markers for the Gopher quality rules (the paper's
# "must contain ≥2 of a small stop-word list" rule, Rae et al. 2021
# §A1.1); real corpora tune the list per language.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    col: Column | str,
    *,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_token_len: float = 3.0,
    max_mean_token_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stopword_hits: int = 2,
    stopwords: list[str] | None = None,
) -> dict[str, Column]:
    """Gopher-style document quality rules as named boolean Columns
    plus the composed ``keep`` flag.

    [extension] The standard pre-training corpus filter (Gopher §A1.1 /
    C4): token-count bounds, mean-token-length bounds, symbol-to-token
    ratio (# and … as junk markers), fraction of tokens containing an
    alphabetic character, and a minimum stop-word hit count.

    Every rule is a pure ``pyspark.sql.functions`` expression over one
    tokenization (let-bound so it evaluates once), so the whole filter
    is a narrow map fused with the scan — zero shuffles, zero UDFs; at
    100 TB it streams at scan speed and the per-rule booleans let a
    curation pipeline report *why* documents were dropped without a
    second pass."""
    c = F.col(col) if isinstance(col, str) else col
    words = stopwords or GOPHER_STOPWORDS
    toks = tokens(normalize_text(c))

    def build(t: Column) -> Column:
        n_tok = F.size(t).cast("long")
        safe_tok = F.greatest(n_tok, F.lit(1)).cast("double")
        mean_len = F.aggregate(
            t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).cast("double") / safe_tok
        n_symbol = char_class_count(c, r"[#…]") + (
            F.length(c) - F.length(F.regexp_replace(c, r"\.\.\.", ""))
        ) / F.lit(3)
        n_alpha_tok = F.size(F.filter(t, lambda x: x.rlike("[a-z]")))
        marker = F.array(*[F.lit(w) for w in words])
        n_stop = F.size(F.filter(t, lambda x: F.array_contains(marker, x)))
        return F.struct(
            n_tok.alias("n_tokens"),
            F.round(mean_len, 4).alias("mean_token_len"),
            ((n_tok >= min_tokens) & (n_tok <= max_tokens)).alias("ok_tokens"),
            (
                (mean_len >= min_mean_token_len)
                & (mean_len <= max_mean_token_len)
            ).alias("ok_mean_len"),
            (n_symbol / safe_tok <= max_symbol_ratio).alias("ok_symbols"),
            (n_alpha_tok / safe_tok >= min_alpha_frac).alias("ok_alpha"),
            (n_stop >= min_stopword_hits).alias("ok_stopwords"),
        )

    s = let(toks, build)
    flags = {
        name: s.getField(name)
        for name in (
            "n_tokens",
            "mean_token_len",
            "ok_tokens",
            "ok_mean_len",
            "ok_symbols",
            "ok_alpha",
            "ok_stopwords",
        )
    }
    flags["keep"] = (
        flags["ok_tokens"]
        & flags["ok_mean_len"]
        & flags["ok_symbols"]
        & flags["ok_alpha"]
        & flags["ok_stopwords"]
    )
    return flags


def lm_perplexity(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.5,
    round_to: int = 4,
) -> "DataFrame":
    """Corpus-trained bigram language-model perplexity per document —
    the CCNet-style quality signal (train an n-gram LM, keep documents
    the model finds unsurprising; real pipelines use KenLM, the math
    here is the same with add-k smoothing).

    Per document: ``ppl = exp(−mean log P(wᵢ | wᵢ₋₁))`` with
    ``P(w|h) = (c(h,w) + k) / (c(h) + k·V)`` over corpus-global bigram
    and unigram counts and vocabulary size V. Documents with no bigram
    (< 2 tokens) report null.

    Scale shape: the LM itself is two aggregations over the exploded
    token stream (bigram and unigram counts — partial-agg shuffles of
    at most |vocab²| and |vocab| groups), joined back to the per-doc
    bigram stream on the bigram key; the V and token-total constants
    ride a one-row broadcast. At web scale the vocabulary is pruned to
    top-K first (heavy_hitters is exactly that operator), which also
    bounds the LM join's build side to broadcastable size."""
    from pyspark.sql import functions as F

    toks = tokens(normalize_text(F.col(text_col)))

    def grams(t: Column) -> Column:
        k = F.size(t) - 1
        idx = F.when(k > 0, F.sequence(F.lit(0), k - 1)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(t, (i + 1).cast("int")).alias("h"),
                F.element_at(t, (i + 2).cast("int")).alias("w"),
            ),
        )

    doc_bigrams = df.select(
        F.col(id_col), F.explode(let(toks, grams)).alias("g")
    ).select(id_col, F.col("g.h").alias("h"), F.col("g.w").alias("w"))

    bigram_c = doc_bigrams.groupBy("h", "w").agg(
        F.count(F.lit(1)).alias("__cbg__")
    )
    unigram_c = (
        df.select(F.explode(toks).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("__cug__"))
    )
    vocab = unigram_c.agg(
        F.count(F.lit(1)).cast("double").alias("__v__")
    )

    lm = bigram_c.join(unigram_c, "h")
    scored = (
        doc_bigrams.join(lm, ["h", "w"])
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.log(
                (F.col("__cbg__") + F.lit(add_k))
                / (F.col("__cug__") + F.lit(add_k) * F.col("__v__"))
            ).alias("__lp__"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.round(F.exp(-F.avg("__lp__")), round_to).alias("perplexity"),
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
    )
    # short docs (no bigram) keep a row with null perplexity
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "perplexity",
            F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long"))
            .alias("n_bigrams"),
        )
    )


def bm25_scores(
    df: "DataFrame",
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> "DataFrame":
    """Okapi BM25 relevance of every document against a fixed query
    (Robertson/Spärck Jones; the Lucene ``ln(1 + (N-df+0.5)/(df+0.5))``
    idf form, which keeps idf positive).

    [extension] Retrieval primitive for training-data curation (score
    corpora against topic probes). Two-step shape that scales:

    1. ONE corpus aggregate computes N, avg document length, and each
       query term's document frequency (a single partial-agg shuffle
       producing ONE row);
    2. that row broadcasts back (cross join of a 1-row frame) and the
       per-doc score is a pure projection — term frequencies via
       ``size(filter(tokens, ...))``, no explode, no second shuffle.

    Scores round to ``round_to`` decimals: ln/division are IEEE-double
    but not bit-specified across engines; 4 decimals is far above ulp
    noise (the cross-engine precision contract, like stats_lineitem).
    """
    toks = F.coalesce(
        tokens(normalize_text(F.col(text_col))),
        F.array().cast("array<string>"),
    )
    base = df.select(F.col(id_col), toks.alias("__toks__"))

    stats = base.agg(
        F.count(F.lit(1)).alias("__n__"),
        F.avg(F.size("__toks__")).alias("__avgdl__"),
        *[
            F.sum(
                F.array_contains("__toks__", t).cast("int")
            ).alias(f"__df_{i}__")
            for i, t in enumerate(query_terms)
        ],
    )

    dl = F.size("__toks__").cast("double")
    parts = []
    for i, t in enumerate(query_terms):
        tf = F.size(
            F.filter("__toks__", lambda x: x == F.lit(t))
        ).cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n__") - F.col(f"__df_{i}__") + F.lit(0.5))
            / (F.col(f"__df_{i}__") + F.lit(0.5))
        )
        parts.append(
            idf * (tf * (k1 + 1))
            / (tf + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * dl / F.col("__avgdl__")))
        )
    score = parts[0]
    for p in parts[1:]:
        score = score + p
    return base.crossJoin(F.broadcast(stats)).select(
        F.col(id_col), F.round(score, round_to).alias("bm25")
    )

def tfidf_keywords(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 5,
    round_to: int = 6,
) -> "DataFrame":
    """Per-document top-k keywords by smoothed TF-IDF
    tf · ln((N+1)/(df+1)) — the classic content-descriptor extraction
    (the per-document dual of vocab_topk's corpus view).

    Shape: explode to (doc, term) once, aggregate term frequency (one
    input-sized shuffle on the pair), derive document frequency from
    the SAME aggregated frame (a term-keyed shuffle of distinct pairs,
    not a second scan), broadcast the 1-row corpus count, and rank
    with a per-doc window over the scored frame. Ranking is on the
    ROUNDED score (ties broken by term): mathematically-equal scores
    computed via different expressions (2·ln 2.25 = 4·ln 1.5) can
    differ in the last ulp across engines, and rounding first makes
    the order — not just the values — engine-deterministic.
    """
    from pyspark.sql import Window

    base = df.where(
        F.col(text_col).isNotNull()
        & (F.length(F.trim(F.col(text_col))) > 0)
    )
    ex = base.select(
        F.col(id_col),
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("term"),
    )
    tf = ex.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df__"))
    n = df.agg(F.count(F.lit(1)).alias("__n__"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col),
            "term",
            "tf",
            F.round(
                F.col("tf").cast("double")
                * F.log(
                    (F.col("__n__") + 1).cast("double")
                    / (F.col("__df__") + 1).cast("double")
                ),
                round_to,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(id_col, "term", "tf", "tfidf", "rank")
    )


def bpe_pair_counts(seqs: DataFrame, sep: str = "\x01") -> DataFrame:
    """Adjacent-symbol pair frequencies over ``sep``-joined token
    sequences (column ``s``) — ONE explode + groupBy count, the
    map-reduce heart of a distributed BPE round. Pairs come back as
    ``left + "\\x02" + right`` in column ``pair`` with count ``n``.

    Fully-merged words (ONE symbol left) contribute no pairs and are
    filtered before the explode — ``sequence(1, size-1)`` would
    otherwise DESCEND to index 0 for them (Spark's sequence reverses
    when stop < start) and fault the whole round."""
    toks = F.split(F.col("s"), sep)
    return (
        seqs.where(F.size(F.split(F.col("s"), sep)) >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.concat_ws(
                        "\x02",
                        F.element_at(toks, i.cast("int")),
                        F.element_at(toks, (i + 1).cast("int")),
                    ),
                )
            ).alias("pair")
        )
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_train(
    words: DataFrame,
    word_col: str,
    n_merges: int,
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Distributed BPE training: ``n_merges`` greedy rounds, each ONE
    pair-count aggregate over the corpus + ONE broadcast-free merge
    substitution — the loop ``bpe_merge_candidates`` (one round) and
    ``bpe_two_rounds`` (two rounds, oracle-proven) generalize to.
    Returns the learned merges in order as (left, right) tuples — the
    merges TABLE is driver-side by nature (n_merges rows, the
    artifact a tokenizer ships).

    Faithful to sequential BPE (Sennrich et al. 2016, the public
    algorithm): each round merges the single most-frequent adjacent
    symbol pair (count desc, then lexicographic pair for a
    deterministic tie — the same total order the oracle queries pin),
    rewriting every word's symbol sequence left-to-right without
    overlap (Spark ``replace`` replaces non-overlapping occurrences
    left-to-right, exactly the sequential semantics). Training stops
    early when no pair reaches ``min_count`` (merging singletons
    creates tokens no second word shares).

    Scale shape: the corpus NEVER collects — each round is a
    partial-agg pair count (map-side combine), a 1-row ``limit(1)``
    collect of the winner, and a codegen'd ``replace`` projection.
    Lineage is cut with ``localCheckpoint`` every few rounds so round
    k's plan doesn't stack k REPLACE nodes (at 1000 merges an
    uncheckpointed plan would be the bottleneck, not the data).

    Symbols are joined with ``\\x01`` (sequence separator) and pairs
    with ``\\x02``; words containing either control char are refused
    by name rather than silently mis-tokenized.
    """
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    sep = "\x01"
    bad = (
        words.where(F.col(word_col).rlike("[\x01\x02]")).limit(1).count()
    )
    if bad:
        raise ValueError(
            f"bpe_train: column {word_col!r} contains reserved control "
            "chars \\x01/\\x02 — strip them first (normalize_text does "
            "not; they would corrupt the symbol encoding)"
        )
    seqs = words.where(F.col(word_col).isNotNull()).select(
        F.array_join(F.split(F.col(word_col), ""), sep).alias("s")
    )
    merges: list[tuple[str, str]] = []
    for round_no in range(n_merges):
        top = (
            bpe_pair_counts(seqs, sep)
            .where(F.col("n") >= min_count)
            .orderBy(F.col("n").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right = top[0]["pair"].split("\x02")
        merges.append((left, right))
        seqs = seqs.select(
            F.replace(
                F.col("s"),
                F.lit(f"{left}{sep}{right}"),
                F.lit(f"{left}{right}"),
            ).alias("s")
        )
        # cut lineage so round k's plan holds O(1) REPLACE nodes, not
        # O(k); every 4 rounds amortizes the materialization
        if (round_no + 1) % 4 == 0 and round_no + 1 < n_merges:
            seqs = seqs.localCheckpoint(eager=False)
    return merges


def bpe_encode(
    col: Column | str,
    merges: list[tuple[str, str]],
) -> Column:
    """Tokenize a word column with a trained BPE merge list (the
    output of :func:`bpe_train`, applied in training order) —
    returns an ``array<string>`` token column. This is the APPLY side
    of the tokenizer story: train once (n driver-side merges), encode
    a 100 TB corpus as a pure expression chain — one ``replace`` per
    merge inside whole-stage codegen, zero UDFs, zero shuffles (the
    encode is row-local by definition).

    Faithful to sequential BPE application: merges apply in training
    order, each replacing non-overlapping occurrences left-to-right
    (Spark ``replace`` semantics — the same equivalence
    :func:`bpe_train`'s tests pin on the training side). Words
    containing the reserved ``\\x01`` separator would corrupt the
    symbol encoding; bpe_train refuses them at training time and the
    encode inherits that contract (garbage-in tokens, never a wrong
    merge on clean input).
    """
    sep = "\x01"
    c = F.col(col) if isinstance(col, str) else col
    out = F.array_join(F.split(c, ""), sep)
    for left, right in merges:
        out = F.replace(
            out, F.lit(f"{left}{sep}{right}"), F.lit(f"{left}{right}")
        )
    return F.split(out, sep)
