"""Round-4 corpus-curation operators: quality filter, heavy hitters,
paragraph dedup, SemDeDup, PageRank."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mydatalake_spark.caching import release
from mydatalake_spark.functions.text import gopher_quality_flags
from mydatalake_spark.operators.graphs import pagerank
from mydatalake_spark.operators.heavyhitters import heavy_hitters
from mydatalake_spark.operators.paradedup import paragraph_dedup
from mydatalake_spark.similarity.semdedup import semantic_dedup


# ---------------------------------------------------------------- quality

def _flags_row(spark, text, **kw):
    df = spark.createDataFrame([Row(text=text)])
    flags = gopher_quality_flags("text", **kw)
    return df.select(*[flags[k].alias(k) for k in flags]).collect()[0]


def test_quality_empty_text_fails_closed(spark):
    r = _flags_row(spark, "", min_tokens=1)
    assert r.n_tokens == 0
    assert not r.ok_tokens and not r.keep


def test_quality_good_doc_keeps(spark):
    r = _flags_row(
        spark,
        "the quick brown fox jumps over the lazy dog and runs home",
        min_tokens=5,
        min_mean_token_len=2.0,
        max_mean_token_len=10.0,
        stopwords=["the", "and"],
    )
    assert r.keep
    assert r.ok_stopwords  # "the" ×2 + "and"


def test_quality_symbol_ratio_drops(spark):
    r = _flags_row(
        spark,
        "alpha # beta # gamma # delta ... epsilon",
        min_tokens=1,
        min_mean_token_len=1.0,
        min_stopword_hits=0,
    )
    assert not r.ok_symbols and not r.keep


def test_quality_mean_len_bounds(spark):
    r = _flags_row(spark, "aa bb cc", min_tokens=1, min_stopword_hits=0)
    assert r.mean_token_len == 2.0
    assert not r.ok_mean_len  # below the default 3.0 floor


# ----------------------------------------------------------- heavy hitters

def test_heavy_hitters_exact_vs_naive(spark):
    # skewed stream: item i appears 2^i times, i in 0..9
    rows = [Row(item=f"t{i}") for i in range(10) for _ in range(2 ** i)]
    df = spark.createDataFrame(rows).repartition(7)  # force multi-partition
    frac = 0.1
    got = {
        r.token: r.cnt
        for r in heavy_hitters(df, "item", threshold_frac=frac).collect()
    }
    n = len(rows)
    want = {
        r["item"]: r["cnt"]
        for r in df.groupBy("item").agg(F.count("*").alias("cnt")).collect()
        if r["cnt"] >= -(-n * frac // 1)  # ceil
    }
    assert got == want
    assert got  # non-degenerate


def test_heavy_hitters_tiny_capacity_still_exact(spark):
    # capacity barely above 1/frac: the MG guarantee is the whole story
    rows = [Row(item=str(i % 13)) for i in range(1000)]
    df = spark.createDataFrame(rows).repartition(5)
    got = heavy_hitters(df, "item", threshold_frac=0.05, capacity=21).count()
    assert got == 13  # uniform: every residue is ≥5%


def test_heavy_hitters_rejects_bad_capacity(spark):
    df = spark.createDataFrame([Row(item="x")])
    with pytest.raises(ValueError):
        heavy_hitters(df, "item", threshold_frac=0.01, capacity=50)


# --------------------------------------------------------- paragraph dedup

def test_paragraph_dedup_invariants(spark, documents):
    out = paragraph_dedup(documents, "text", "doc_id", size=48)
    res = out.collect()
    assert len(res) == documents.count()  # one row per input doc, always
    assert all(0 <= r.kept_chunks <= r.total_chunks for r in res)
    # something was actually deduped in this corpus
    assert any(r.kept_chunks < r.total_chunks for r in res)


def test_paragraph_dedup_identical_docs_keep_first_only(spark):
    txt = "x" * 96  # exactly two 48-char segments
    df = spark.createDataFrame(
        [Row(doc_id=1, text=txt), Row(doc_id=2, text=txt)]
    )
    res = {r.doc_id: r for r in paragraph_dedup(df, size=48).collect()}
    # doc 1 keeps one segment ("xxxx..." dedups against itself too —
    # both its segments are the same 48 bytes), doc 2 keeps none
    assert res[1].kept_chunks == 1
    assert res[2].kept_chunks == 0
    assert res[2].total_chunks == 2


# ---------------------------------------------------------------- semdedup

def test_semantic_dedup_survivor_policy(spark):
    # two exact-duplicate groups + one singleton
    rows = [
        Row(vec_id=1, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=2, embedding=[2.0, 0.0, 0.0]),   # same direction as 1
        Row(vec_id=3, embedding=[0.0, 1.0, 0.0]),
        Row(vec_id=4, embedding=[0.0, 3.0, 0.0]),   # same direction as 3
        Row(vec_id=5, embedding=[0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows)
    res = {r.vec_id: r.is_dup
           for r in semantic_dedup(df, n_clusters=2, threshold=0.99).collect()}
    assert len(res) == 5  # every vector classified
    # lowest id of each duplicate direction survives
    assert res[2] or res[1]  # one of the pair flagged…
    assert not (res[1] and res[2])  # …but never both
    dup_count = sum(res.values())
    assert dup_count == 2  # exactly one loser per duplicate pair


def test_semantic_dedup_threshold_1_means_no_dups_across_angles(spark):
    rows = [
        Row(vec_id=i, embedding=[1.0, float(i) / 10.0]) for i in range(6)
    ]
    df = spark.createDataFrame(rows)
    res = semantic_dedup(df, n_clusters=2, threshold=1.1)
    assert res.where("is_dup").count() == 0


# ---------------------------------------------------------------- pagerank

def test_pagerank_mass_conserved_on_symmetric_graph(spark):
    # undirected triangle + pendant: stochastic after symmetrization
    und = [(1, 2), (2, 3), (1, 3), (3, 4)]
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in und]
        + [Row(src=b, dst=a) for a, b in und]
    )
    out = pagerank(edges, iters=5, round_to=7)
    rows = out.collect()
    release(out)
    assert len(rows) == 4
    total = sum(r["rank"] for r in rows)
    assert abs(total - 1.0) < 1e-5  # no dangling leak
    ranks = {r["node"]: r["rank"] for r in rows}
    assert ranks[3] == max(ranks.values())  # degree-3 hub wins
    assert ranks[4] == min(ranks.values())  # pendant loses


def test_pagerank_dangling_leaks_mass_as_documented(spark):
    edges = spark.createDataFrame([Row(src=1, dst=2)])  # 2 dangles
    out = pagerank(edges, iters=3)
    total = sum(r["rank"] for r in out.collect())
    release(out)
    assert total < 1.0  # textbook uncorrected power iteration


def test_pagerank_rejects_zero_iters(spark):
    edges = spark.createDataFrame([Row(src=1, dst=2)])
    with pytest.raises(ValueError):
        pagerank(edges, iters=0)


# ------------------------------------------------------------------- scd2

def test_scd2_collapses_noop_changes(spark):
    from mydatalake_spark.operators.scd2 import scd2_build

    rows = [
        Row(k=1, ts=1, v="a", cid=1),
        Row(k=1, ts=2, v="a", cid=2),   # no-op: collapses
        Row(k=1, ts=3, v="b", cid=3),
        Row(k=1, ts=4, v="a", cid=4),   # back to a: NEW version
        Row(k=2, ts=1, v="x", cid=5),
    ]
    out = scd2_build(
        spark.createDataFrame(rows), key="k", ts="ts", attrs=["v"],
        tiebreak="cid",
    ).collect()
    k1 = sorted([r for r in out if r.k == 1], key=lambda r: r.version)
    assert [(r.v, r.valid_from, r.valid_to) for r in k1] == [
        ("a", 1, 3), ("b", 3, 4), ("a", 4, None)
    ]
    assert [r.is_current for r in k1] == [False, False, True]
    (k2,) = [r for r in out if r.k == 2]
    assert k2.version == 1 and k2.is_current


def test_scd2_tiebreak_orders_same_ts_changes(spark):
    from mydatalake_spark.operators.scd2 import scd2_build

    rows = [
        Row(k=1, ts=1, v="b", cid=2),
        Row(k=1, ts=1, v="a", cid=1),   # same ts: cid breaks the tie
    ]
    out = sorted(
        scd2_build(
            spark.createDataFrame(rows), key="k", ts="ts",
            attrs=["v"], tiebreak="cid",
        ).collect(),
        key=lambda r: r.version,
    )
    assert [r.v for r in out] == ["a", "b"]
    assert out[1].is_current


def test_apply_cdc_ops_delete_update_insert(spark):
    from mydatalake_spark.operators.scd2 import apply_cdc_ops

    target = spark.createDataFrame(
        [Row(k=1, val="old1"), Row(k=2, val="old2"), Row(k=3, val="old3")]
    )
    changes = spark.createDataFrame(
        [
            Row(k=1, val="new1", ts=1, op="U"),   # update
            Row(k=2, val="x", ts=1, op="U"),
            Row(k=2, val="x", ts=2, op="D"),      # terminal delete wins
            Row(k=4, val="new4", ts=1, op="U"),   # insert
        ]
    )
    out = {r.k: r.val
           for r in apply_cdc_ops(target, changes, "k", "ts").collect()}
    assert out == {1: "new1", 3: "old3", 4: "new4"}


def test_apply_cdc_ops_requires_full_row_images(spark):
    from mydatalake_spark.operators.scd2 import apply_cdc_ops

    target = spark.createDataFrame([Row(k=1, val="old")])
    partial = spark.createDataFrame([Row(k=1, ts=1, op="U")])  # no val
    with pytest.raises(ValueError, match="val"):
        apply_cdc_ops(target, partial, "k", "ts")


# ------------------------------------------------- interval join / sampling

def test_interval_join_emits_each_pair_once(spark):
    import datetime as dt

    from mydatalake_spark.operators.rangejoin import interval_join

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    # long overlap spanning MANY 5-minute bins: the claimed-bin trick
    # must still emit the pair exactly once
    left = spark.createDataFrame(
        [Row(lid=1, ls=ts(0), le=ts(120)), Row(lid=2, ls=ts(200), le=ts(210))]
    )
    right = spark.createDataFrame(
        [
            Row(rid=10, rs=ts(30), re=ts(90)),    # inside lid=1
            Row(rid=11, rs=ts(119), re=ts(125)),  # tail overlap lid=1
            Row(rid=12, rs=ts(120), re=ts(130)),  # touches end: half-open, no
            Row(rid=13, rs=ts(300), re=ts(310)),  # disjoint
        ]
    )
    out = interval_join(
        left, right, "ls", "le", "rs", "re", bin_width="5 minutes"
    ).select("lid", "rid").collect()
    pairs = sorted((r.lid, r.rid) for r in out)
    assert pairs == [(1, 10), (1, 11)]  # each exactly once


def test_weighted_sample_extremes_and_monotonicity(spark):
    from mydatalake_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([Row(k=i) for i in range(500)])
    assert weighted_sample(df, "k", F.lit(0.0)).count() == 0
    assert weighted_sample(df, "k", F.lit(1.0)).count() == 500
    assert weighted_sample(df, "k", F.lit(2.0)).count() == 500  # clamped
    n_low = weighted_sample(df, "k", F.lit(0.2), salt="s").count()
    n_high = weighted_sample(df, "k", F.lit(0.8), salt="s").count()
    assert 0 < n_low < n_high < 500
    # nested property: raising the weight only ADDS rows (same salt)
    low_ids = {
        r.k for r in weighted_sample(df, "k", F.lit(0.2), salt="s").collect()
    }
    high_ids = {
        r.k for r in weighted_sample(df, "k", F.lit(0.8), salt="s").collect()
    }
    assert low_ids <= high_ids


def test_semantic_dedup_backends_agree(spark, embeddings_df=None):
    from mydatalake_spark.similarity.semdedup import semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    blas = {
        (r.vec_id, r.cell, r.is_dup)
        for r in semantic_dedup(
            emb, n_clusters=4, threshold=0.35, pair_backend="blas"
        ).collect()
    }
    expr = {
        (r.vec_id, r.cell, r.is_dup)
        for r in semantic_dedup(
            emb, n_clusters=4, threshold=0.35, pair_backend="expr"
        ).collect()
    }
    assert blas == expr
    assert any(d for _, _, d in blas)  # non-degenerate


def test_semantic_dedup_rejects_unknown_backend(spark):
    from mydatalake_spark.similarity.semdedup import semantic_dedup

    df = spark.createDataFrame([Row(vec_id=1, embedding=[1.0, 0.0])])
    with pytest.raises(ValueError):
        semantic_dedup(df, pair_backend="gpu")


def test_paragraph_dedup_null_text_keeps_doc_row(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text=None), Row(doc_id=2, text="hello world")]
    )
    res = {r.doc_id: r for r in paragraph_dedup(df, size=48).collect()}
    assert set(res) == {1, 2}  # the null-text doc still has a row
    assert res[1].total_chunks == 1  # one empty chunk


def test_heavy_hitters_empty_input(spark):
    df = spark.createDataFrame([], "item string")
    assert heavy_hitters(df, "item", threshold_frac=0.1).count() == 0


def test_cosine_neardup_auto_plan_scales_bits(spark):
    from mydatalake_spark.operators.neardup import cosine_neardup_pairs
    from mydatalake_spark.similarity.search import lsh_plan

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # auto-planned LSH path must still find the exact pairs at this
    # size; design recall 0.99 — with only ~7 qualifying pairs the
    # empirical rate carries heavy binomial noise, so assert ≥ 0.85
    auto = cosine_neardup_pairs(
        emb, threshold=0.45, exact=False, dim=64,
        auto_plan=True, auto_recall=0.99,
    )
    exact = cosine_neardup_pairs(emb, threshold=0.45, exact=True)
    a = {(r.id_a, r.id_b) for r in auto.collect()}
    e = {(r.id_a, r.id_b) for r in exact.collect()}
    assert e, "fixture corpus must contain qualifying pairs"
    assert len(a & e) / len(e) >= 0.85
    # and the planner gives more bits to a bigger corpus
    _, bits_small = lsh_plan(0.45, 0.95, 1_000)
    _, bits_big = lsh_plan(0.45, 0.95, 1_000_000)
    assert bits_big > bits_small


def test_heavy_hitters_min_count_mode_exact(spark):
    """Absolute-support mode: equals the naive GROUP BY ... HAVING
    cnt >= min_count, and the API enforces exactly-one-threshold."""
    import pytest
    from pyspark.sql import functions as F

    df = spark.range(0, 1000).select(
        F.concat(F.lit("w"), (F.col("id") % 37).cast("string")).alias("item")
    )
    naive = {
        (r.item, r.c)
        for r in df.groupBy("item").agg(F.count("*").alias("c"))
        .where(F.col("c") >= 28).collect()
    }
    got = {
        (r.token, r.cnt)
        for r in heavy_hitters(df, "item", min_count=28, capacity=64)
        .collect()
    }
    assert got == naive and got

    with pytest.raises(ValueError, match="exactly one"):
        heavy_hitters(df, "item", threshold_frac=0.1, min_count=5)
    with pytest.raises(ValueError, match="exactly one"):
        heavy_hitters(df, "item")
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(df, "item", min_count=5)


def test_heavy_hitters_min_count_guard_raises_when_capacity_outgrown(spark):
    """The in-plan completeness guard: a stream longer than
    min_count*(capacity+1) would break the MG superset guarantee —
    the query must raise, never silently drop hitters."""
    import pytest
    from pyspark.sql import functions as F

    df = spark.range(0, 2000).select(
        (F.col("id") % 3).cast("string").alias("item")
    )
    # n=2000, min_count=2, capacity=3 → guard bound 2*4=8 < 2000
    with pytest.raises(Exception, match="capacity 3 too small"):
        heavy_hitters(df, "item", min_count=2, capacity=3).collect()


def test_dedup_summary_fed_path_matches_recompute(spark, tmp_path):
    """dedup_summary: the signature-fed path (persisted minhash table
    -> band candidates -> exact verify) reports the same exact-dup
    stats and, on this corpus, the same near-dup membership as the
    full-recall recompute path (32-hash/8-band signatures at
    threshold 0.2 recall every true pair here)."""
    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.operators.neardup import (
        dedup_summary,
        incremental_dedup_pipeline,
    )
    from mydatalake_spark.caching import release

    base = "the quick brown fox jumps over the lazy dog again and again "
    docs = spark.createDataFrame(
        [
            (1, base * 4),
            (2, base * 4),                      # exact dup of 1
            (3, base * 4 + "with a tail of different words here"),
            (4, "completely unrelated text about spark shuffles"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    recompute = dedup_summary(docs, jaccard_threshold=0.2).collect()[0]

    cat = Catalog(spark, str(tmp_path / "wh_dsum"))
    pairs = incremental_dedup_pipeline(
        cat, "silver.dedup.sigs", docs, verify_threshold=0.2
    )
    release(pairs)
    fed = dedup_summary(
        docs, jaccard_threshold=0.2,
        catalog=cat, sig_table="silver.dedup.sigs",
    ).collect()[0]

    assert fed.n_docs == recompute.n_docs == 5
    assert fed.n_exact_dup_rows == recompute.n_exact_dup_rows == 1
    assert fed.n_near_docs == recompute.n_near_docs == 3
    assert fed.near_dup_ratio == recompute.near_dup_ratio


def test_cache_transfer_and_ledger_backstop(spark):
    """The ownership protocol end-to-end: (a) transfer() moves adopted
    caches onto the frame the caller actually releases — deriving a
    new frame from an adopting operator's result must not orphan the
    cache; (b) release_all() unpersists whatever fell through anyway."""
    from mydatalake_spark import caching
    from mydatalake_spark.caching import (
        adopt,
        release,
        release_all,
        transfer,
    )

    base = spark.range(0, 10).cache()
    base.count()
    out = adopt(spark.range(0, 5), base)
    derived = out.selectExpr("id * 2 AS x")  # orphans the attribute
    final = transfer(out, derived)
    assert getattr(out, caching._OWNED_ATTR) == []
    release(final)
    assert all(c is not base for c in caching._LEDGER)

    # ledger backstop: adopt, lose the reference, release_all cleans up
    b2 = spark.range(0, 10).cache()
    b2.count()
    adopt(spark.range(0, 3), b2)  # result discarded -> orphaned
    assert any(c is b2 for c in caching._LEDGER)
    release_all()
    assert not caching._LEDGER

    # the real composed query: canonical_by_quality's pair generator
    # cache must reach the returned frame
    from mydatalake_spark.operators.neardup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g"), (3, "x y z w v u")],
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.1)
    joined = transfer(pairs, pairs.selectExpr("id_a"))
    owned = getattr(joined, caching._OWNED_ATTR)
    assert owned, "pair-generator cache did not transfer"
    release(joined)
    assert not caching._LEDGER
