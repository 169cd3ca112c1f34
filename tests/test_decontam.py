"""Benchmark decontamination + repetition scoring (training-data ops)."""

from pyspark.sql import functions as F

from mydatalake_spark.operators.decontam import (
    decontaminate,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_shared_ngrams(spark):
    holdout = _docs(spark, [(100, "the quick brown fox jumps over")])
    corpus = _docs(spark, [
        (1, "something about the quick brown fox jumps here"),   # 5-gram hit
        (2, "entirely different words with no overlap at all"),
        (3, None),                                               # null text
    ])
    got = {r.doc_id: (r.n_contaminated_ngrams, r.contaminated)
           for r in decontaminate(corpus, holdout, n=5).collect()}
    assert got[1] == (1, True)      # "the quick brown fox jumps"
    assert got[2] == (0, False)
    assert got[3] == (0, False)     # null text → clean, not dropped


def test_decontaminate_counts_distinct_hits(spark):
    holdout = _docs(spark, [(100, "a b c d e f")])   # grams: abcde, bcdef
    corpus = _docs(spark, [(1, "a b c d e f"), (2, "x a b c d e")])
    got = {r.doc_id: r.n_contaminated_ngrams
           for r in decontaminate(corpus, holdout, n=5).collect()}
    assert got == {1: 2, 2: 1}


def test_decontaminate_shuffle_join_path_same_result(spark):
    holdout = _docs(spark, [(100, "one two three four five six")])
    corpus = _docs(spark, [(1, "zzz one two three four five"), (2, "nope")])
    a = sorted(map(tuple, decontaminate(
        corpus, holdout, n=5, broadcast_holdout=True).collect()))
    b = sorted(map(tuple, decontaminate(
        corpus, holdout, n=5, broadcast_holdout=False).collect()))
    assert a == b


def test_decontaminate_broadcasts_holdout(spark):
    """The 100 TB property: the holdout side reaches the corpus probe
    as a broadcast — no corpus shuffle to find contamination."""
    holdout = _docs(spark, [(100, "one two three four five six")])
    corpus = _docs(spark, [(1, "one two three four five six")])
    plan = decontaminate(corpus, holdout, n=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_repetition_stats(spark):
    df = _docs(spark, [
        (1, "a b a b a b"),       # 2-grams: ab ba ab ba ab → 5 total, 2 distinct
        (2, "all words unique here now"),
        (3, "single"),            # no 2-grams
        (4, ""),                  # empty
        (5, None),                # null
    ])
    got = {r.doc_id: r for r in repetition_stats(df, n=2).collect()}
    assert (got[1].n_tokens, got[1].n_ngrams, got[1].n_distinct_ngrams) \
        == (6, 5, 2)
    assert abs(got[1].dup_ngram_frac - 0.6) < 1e-9
    assert got[2].dup_ngram_frac == 0.0
    assert got[2].n_ngrams == got[2].n_distinct_ngrams == 4
    assert got[3].n_ngrams == 0 and got[3].dup_ngram_frac == 0.0
    assert got[4].n_tokens == 0 and got[4].dup_ngram_frac == 0.0
    assert got[5].n_tokens == 0


def test_repetition_no_shuffle(spark):
    """Pure map-side: the plan must contain no Exchange."""
    df = _docs(spark, [(1, "a b c")])
    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
