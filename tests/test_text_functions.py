"""Text-analysis function tests (functions/text.py)."""

from pyspark.sql import functions as F

from mydatalake_spark.functions.text import (
    doc_fingerprint,
    lang_guess,
    normalize_text,
    shingles,
    text_quality,
    token_count,
    tokens,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(
        col.alias("v")
    ).first().v


def test_tokens_and_counts(spark):
    assert _one(spark, "a  b\tc", tokens("text")) == ["a", "b", "c"]
    assert _one(spark, "   ", token_count("text")) == 0
    assert _one(spark, "", token_count("text")) == 0
    assert _one(spark, "x", token_count("text")) == 1


def test_normalize(spark):
    assert _one(spark, "  A  B\t C ", normalize_text("text")) == "a b c"


def test_quality_ratios(spark):
    q = text_quality("text")
    row = spark.createDataFrame([("ab, cd! e5",)], "text string").select(
        q["punct_ratio"].alias("p"), q["digit_ratio"].alias("d"),
        q["n_tokens"].alias("t"), q["mean_token_len"].alias("m"),
    ).first()
    assert row.p == 0.2   # ',' and '!' of 10 chars
    assert row.d == 0.1   # '5'
    assert row.t == 3
    assert row.m == round(8 / 3, 4)


def test_lang_guess_markers_and_ties(spark):
    assert _one(spark, "the cat and the dog", lang_guess("text")) == "en"
    assert _one(spark, "der hund und die katze", lang_guess("text")) == "de"
    assert _one(spark, "xyzzy blorp", lang_guess("text")) == "und"
    # 'la' appears in both es and fr marker sets; es wins by order
    assert _one(spark, "la la", lang_guess("text")) == "es"


def test_fingerprint_normalization_invariance(spark):
    a = _one(spark, "Hello   World", doc_fingerprint("text"))
    b = _one(spark, "  hello world ", doc_fingerprint("text"))
    assert a == b and len(a) == 32


def test_shingles(spark):
    got = _one(spark, "a b c d", shingles("text", 3))
    assert sorted(got) == ["a b c", "b c d"]
    assert _one(spark, "a b", shingles("text", 3)) == []


def test_bm25_scores_match_reference_formula(spark):
    import math

    from mydatalake_spark.functions.text import bm25_scores

    rows = [(1, "data data spark"), (2, "table"), (3, "other words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.bm25 for r in bm25_scores(df, ["data"]).collect()}

    # independent computation of Okapi BM25 (Lucene idf form)
    n, dfq, avgdl, k1, b = 3, 1, 7 / 3, 1.2, 0.75
    idf = math.log(1 + (n - dfq + 0.5) / (dfq + 0.5))

    def score(tf, dl):
        return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert got[1] == round(score(2, 3), 4)
    assert got[2] == 0.0 and got[3] == 0.0          # term absent
    # multi-term query adds per-term contributions
    got2 = {r.doc_id: r.bm25
            for r in bm25_scores(df, ["data", "table"]).collect()}
    assert got2[2] > 0.0
    assert got2[1] == got[1]                        # no 'table' in doc 1


def test_lm_perplexity_prefers_predictable_text(spark):
    from pyspark.sql import Row

    from mydatalake_spark.functions.text import lm_perplexity

    # corpus dominated by "a b a b ..." — the repetitive doc must score
    # LOWER perplexity than the one breaking the pattern
    rows = [Row(doc_id=i, text="a b " * 10) for i in range(9)]
    rows.append(Row(doc_id=99, text="a q b z a m"))
    out = {
        r.doc_id: r.perplexity
        for r in lm_perplexity(spark.createDataFrame(rows)).collect()
    }
    assert out[0] < out[99]


def test_lm_perplexity_short_docs_get_null_row(spark):
    from pyspark.sql import Row

    from mydatalake_spark.functions.text import lm_perplexity

    df = spark.createDataFrame(
        [Row(doc_id=1, text="hello"), Row(doc_id=2, text="hello world")]
    )
    out = {r.doc_id: (r.perplexity, r.n_bigrams)
           for r in lm_perplexity(df).collect()}
    assert out[1] == (None, 0)       # <2 tokens: row kept, null ppl
    assert out[2][1] == 1


def test_tfidf_keywords_ranks_distinctive_terms(spark):
    from mydatalake_spark.functions.text import tfidf_keywords

    rows = [
        (1, "common common common unique1 unique1"),
        (2, "common common unique2"),
        (3, "common unique3 unique3 unique3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_keywords(df, top_k=2).collect()
    top = {r.doc_id: [x.term for x in sorted(
        [q for q in out if q.doc_id == r.doc_id], key=lambda q: q.rank)]
        for r in out}
    # the doc-specific term must outrank the corpus-wide one
    assert top[1][0] == "unique1"
    assert top[2][0] == "unique2"
    assert top[3][0] == "unique3"
    # 'common' appears in every doc -> idf = ln(4/4) = 0 -> score 0
    for r in out:
        if r.term == "common":
            assert r.tfidf == 0.0


def test_tfidf_keywords_skips_empty_and_null_docs(spark):
    from mydatalake_spark.functions.text import tfidf_keywords

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    out = tfidf_keywords(df, top_k=5).collect()
    assert {r.doc_id for r in out} == {1}


def _sequential_bpe(words, n_merges, min_count=2):
    """Reference sequential BPE (Sennrich-style): the Python model the
    distributed loop must reproduce merge-for-merge."""
    seqs = [list(w) for w in words]
    merges = []
    for _ in range(n_merges):
        counts = {}
        for s in seqs:
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        eligible = {p: n for p, n in counts.items() if n >= min_count}
        if not eligible:
            break
        # count desc, then lexicographic pair — the engine's tie order
        best = min(eligible.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        out = []
        for s in seqs:
            t, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    t.append(a + b)
                    i += 2
                else:
                    t.append(s[i])
                    i += 1
            out.append(t)
        seqs = out
    return merges


def test_bpe_train_matches_sequential_model(spark):
    from mydatalake_spark.functions.text import bpe_train

    words = [
        "lower", "lowest", "newer", "newest", "wider", "widest",
        "low", "new", "wide", "lower", "newer", "newer", "lowest",
    ]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    for n in (1, 4, 6, 10):
        got = bpe_train(df, "w", n)
        want = _sequential_bpe(words, n)
        assert got == want, (n, got, want)


def test_bpe_train_stops_when_no_pair_repeats(spark):
    from mydatalake_spark.functions.text import bpe_train

    df = spark.createDataFrame([("ab",), ("cd",)], "w string")
    # every adjacent pair occurs once: no merge reaches min_count=2
    assert bpe_train(df, "w", 5) == []


def test_bpe_train_refuses_reserved_control_chars(spark):
    import pytest

    from mydatalake_spark.functions.text import bpe_train

    df = spark.createDataFrame([("a\x01b",)], "w string")
    with pytest.raises(ValueError, match="control"):
        bpe_train(df, "w", 1)


def test_bpe_encode_matches_sequential_application(spark):
    from pyspark.sql import functions as F

    from mydatalake_spark.functions.text import bpe_encode, bpe_train

    words = [
        "lower", "lowest", "newer", "newest", "low", "new",
        "lower", "newer", "newer", "lowest",
    ]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    merges = bpe_train(df, "w", 6)
    assert merges  # something was learned

    def seq_encode(w):
        s = list(w)
        for a, b in merges:
            t, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    t.append(a + b)
                    i += 2
                else:
                    t.append(s[i])
                    i += 1
            s = t
        return s

    got = {
        r.w: list(r.toks)
        for r in df.select(
            "w", bpe_encode("w", merges).alias("toks")
        ).collect()
    }
    for w in set(words):
        assert got[w] == seq_encode(w), (w, got[w], seq_encode(w))
    # encode plan is pure projection: no shuffle, no UDF
    plan = (
        df.select(bpe_encode("w", merges).alias("t"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
