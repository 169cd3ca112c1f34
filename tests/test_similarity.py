"""Similarity search + near-dup operator tests."""

import pytest
from pyspark.sql import functions as F

from mydatalake_spark.functions.vectors import cosine_similarity, dot, l2_norm
from mydatalake_spark.operators.neardup import (
    exact_dedup,
    incremental_minhash_candidates,
    minhash_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    winnow_pairs,
)
from mydatalake_spark.similarity.search import brute_force_topk, lsh_topk


def test_vector_math(spark):
    row = spark.createDataFrame(
        [([1.0, 2.0, 2.0], [2.0, 0.0, 0.0])], "a array<double>, b array<double>"
    ).select(
        dot("a", "b").alias("d"),
        l2_norm("a").alias("n"),
        cosine_similarity("a", "b").alias("c"),
    ).first()
    assert row.d == 2.0
    assert row.n == 3.0
    assert abs(row.c - 2.0 / (3.0 * 2.0)) < 1e-12


def test_cosine_zero_vector_is_null(spark):
    c = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 1.0])], "a array<double>, b array<double>"
    ).select(cosine_similarity("a", "b").alias("c")).first().c
    assert c is None


def test_brute_force_topk_finds_identical_vector(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),     # identical to 1
        (3, [0.0, 1.0, 0.0]),
        (4, [0.9, 0.1, 0.0]),
        (5, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = brute_force_topk(df, df.filter("vec_id = 1"), k=2)
    got = [(r.neighbor_id, round(r.score, 6)) for r in out.collect()]
    assert got[0] == (2, 1.0)           # exact duplicate first
    assert got[1][0] == 4               # then the near vector
    assert out.count() == 2


def test_lsh_topk_recovers_exact_duplicate(spark):
    rows = [(i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(8)])
            for i in range(20)]
    rows.append((100, rows[5][1]))      # duplicate of vec 5
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = lsh_topk(df, df.filter("vec_id = 100"), dim=8, k=3,
                   n_bands=4, bits_per_band=4)
    top = out.orderBy(F.desc("score")).first()
    assert top.neighbor_id == 5 and abs(top.score - 1.0) < 1e-9


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
    (3, "THE  QUICK brown fox jumps over the lazy dog"),  # exact dup of 1
    (4, "completely different words appear in this text here"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark):
    out = exact_dedup(_docs(spark))
    rows = {r.keep_id: r.n_copies for r in out.collect()}
    assert rows[1] == 2          # docs 1+3 share a normalized fingerprint
    assert rows[2] == 1 and rows[4] == 1


def test_ngram_jaccard_pairs(spark):
    out = ngram_jaccard_pairs(_docs(spark), n=3, threshold=0.4)
    pairs = {(r.id_a, r.id_b): r.jaccard for r in out.collect()}
    assert pairs[(1, 3)] == 1.0          # identical after normalization
    assert 0.4 <= pairs[(1, 2)] < 1.0    # near-dup
    assert (1, 4) not in pairs


def test_minhash_candidates_surface_near_dups(spark):
    sigs = minhash_signatures(_docs(spark), num_hashes=32, shingle_n=3)
    srows = dict((r.doc_id, r.signature) for r in sigs.collect())
    assert srows[1] == srows[3]          # identical docs → identical sigs
    assert len(srows[1]) == 32
    cands = {(r.id_a, r.id_b) for r in minhash_candidates(sigs, n_bands=8).collect()}
    assert (1, 3) in cands
    # empty doc → null signature, excluded
    empty = minhash_signatures(
        spark.createDataFrame([(9, " ")], "doc_id long, text string")
    ).first()
    assert empty.signature is None


def test_incremental_candidates_match_full_self_join(spark):
    """Splitting the corpus into (corpus, increment) and running the
    incremental band join must surface exactly the full self-join's
    pairs that touch the increment — the invariant that makes daily
    incremental dedup equivalent to a full re-run for new docs."""
    docs = _docs(spark)
    sigs = minhash_signatures(docs, num_hashes=32, shingle_n=3)
    full = {
        (r.id_a, r.id_b)
        for r in minhash_candidates(sigs, n_bands=8).collect()
    }
    new_ids = {3, 4}
    new_sigs = sigs.filter(F.col("doc_id").isin(*new_ids))
    corpus_sigs = sigs.filter(~F.col("doc_id").isin(*new_ids))
    inc = {
        (r.id_a, r.id_b)
        for r in incremental_minhash_candidates(
            new_sigs, corpus_sigs, n_bands=8
        ).collect()
    }
    expected = {p for p in full if p[0] in new_ids or p[1] in new_ids}
    assert inc == expected
    assert all(a < b for a, b in inc)            # canonicalized


def test_winnow_pairs_df_cap_drops_stop_fingerprints(spark):
    """A fingerprint present in every doc must not manufacture pairs:
    docs sharing ONLY the ubiquitous boilerplate line pair up without
    the cap and stop pairing once the cap excludes it."""
    boiler = "common boilerplate header line shared by every document"
    rows = [
        (1, boiler + " alpha beta gamma delta"),
        (2, boiler + " epsilon zeta eta theta"),
        (3, boiler + " iota kappa lamda mu"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = winnow_pairs(df, min_shared=5, max_df=None).collect()
    capped = winnow_pairs(df, min_shared=5, max_df=2).collect()
    assert len(uncapped) == 3            # boilerplate pairs everyone
    assert capped == []                  # cap kills popularity pairs


def test_simhash_properties(spark):
    out = {r.doc_id: r.simhash for r in simhash(_docs(spark)).collect()}
    assert out[1] == out[3]              # normalization-invariant
    ham_near = bin((out[1] ^ out[2]) & ((1 << 64) - 1)).count("1")
    ham_far = bin((out[1] ^ out[4]) & ((1 << 64) - 1)).count("1")
    assert ham_near < ham_far            # near-dup closer in Hamming space


def test_ivf_topk_recovers_exact_duplicate(spark):
    import random
    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(60)]
    rows.append((100, rows[5][1]))      # duplicate of vec 5
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from mydatalake_spark.similarity.search import ivf_topk
    out = ivf_topk(df, df.filter("vec_id = 100"), dim=8, k=3,
                   n_centroids=4, n_probe=2, sample_size=60)
    top = out.orderBy(F.desc("score")).first()
    assert top.neighbor_id == 5 and abs(top.score - 1.0) < 1e-9


def test_cosine_neardup_exact_and_lsh(spark, sf_dir):
    from mydatalake_spark.operators.neardup import cosine_neardup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = cosine_neardup_pairs(emb, threshold=0.40)
    exact_pairs = {(r.id_a, r.id_b) for r in exact.collect()}
    assert exact_pairs, "threshold should surface at least one pair"
    # symmetric input -> canonical orientation
    assert all(a < b for a, b in exact_pairs)

    lsh = cosine_neardup_pairs(
        emb, threshold=0.40, exact=False, dim=64,
        n_bands=16, bits_per_band=2,
    )
    lsh_pairs = {(r.id_a, r.id_b) for r in lsh.collect()}
    # LSH blocking prunes candidates, never invents them (exact cosine
    # verify runs after the bucket join)
    assert lsh_pairs <= exact_pairs
    assert len(lsh_pairs) >= len(exact_pairs) * 0.5, (
        f"recall too low: {len(lsh_pairs)}/{len(exact_pairs)}"
    )


def test_brute_force_topk_string_ids_both_paths(spark):
    # ids are not assumed integral: string doc ids must work in the
    # BLAS path (schema derived from the id column) and the
    # expression path, with identical results.
    corpus = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.9, 0.1]), ("c", [0.0, 1.0])],
        "doc string, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [("q", [1.0, 0.0])], "doc string, embedding array<double>"
    )
    for vec in (True, False):
        out = brute_force_topk(
            corpus, queries, k=2, id_col="doc", vectorized=vec
        )
        rows = {(r.query_id, r.neighbor_id) for r in out.collect()}
        assert rows == {("q", "a"), ("q", "b")}, (vec, rows)
        assert dict(out.dtypes)["neighbor_id"] == "string"


def test_brute_force_topk_zero_norm_excluded_both_paths(spark):
    # zero-norm corpus vectors have undefined cosine: they must never
    # be candidates — not NaN-ranked-first (BLAS) nor null-ranked-last
    # (expression path).
    corpus = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.8, 0.2])],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    for vec in (True, False):
        out = brute_force_topk(corpus, queries, k=3, vectorized=vec)
        rows = {(r.query_id, r.neighbor_id) for r in out.collect()}
        # query 11 (zero-norm) gets NO neighbors; corpus 1 never appears
        assert rows == {(10, 2), (10, 3)}, (vec, rows)


def test_lsh_topk_exact_parity_on_fixture(spark, sf_dir):
    # Hard recall gate: at 32 bands x 3 bits the banded path must
    # reproduce exact brute-force top-5 on the fixture corpus.
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(emb, q, k=5).collect()}
    got = {(r.query_id, r.neighbor_id)
           for r in lsh_topk(emb, q, dim=64, k=5, n_bands=32,
                             bits_per_band=3).collect()}
    assert got == exact, f"sym_diff={got ^ exact}"


def test_ivf_recall_floor_per_query(spark, sf_dir):
    from collections import defaultdict
    from mydatalake_spark.similarity.search import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    exact, got = defaultdict(set), defaultdict(set)
    for r in brute_force_topk(emb, q, k=5).collect():
        exact[r.query_id].add(r.neighbor_id)
    for r in ivf_topk(emb, q, dim=64, k=5, n_centroids=16,
                      n_probe=12).collect():
        got[r.query_id].add(r.neighbor_id)
    recalls = {qi: len(exact[qi] & got[qi]) / len(exact[qi])
               for qi in exact}
    assert all(v >= 0.6 for v in recalls.values()), recalls


def test_minhash_candidates_contain_all_true_pairs(spark, sf_dir):
    # Containment gate: every pair with true shingle-Jaccard >= 0.2
    # must surface as a banding candidate (recall = 1.0 over the
    # threshold with 32 hashes / 8 bands on the seeded corpus).
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    true_pairs = {(r.id_a, r.id_b)
                  for r in ngram_jaccard_pairs(docs, n=3,
                                               threshold=0.2).collect()}
    sigs = minhash_signatures(docs, num_hashes=32, shingle_n=3)
    cand = {(r.id_a, r.id_b)
            for r in minhash_candidates(sigs, n_bands=8).collect()}
    assert true_pairs <= cand, f"missed={true_pairs - cand}"


def test_simhash_near_far_separation(spark, sf_dir):
    # Locality gate both ways: token-set near-dups land within
    # hamming 24; dissimilar pairs center near 32 — the means must
    # separate clearly, else the fingerprint lost its signal.
    from mydatalake_spark.operators.neardup import simhash_hamming_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = simhash(docs)
    near = ngram_jaccard_pairs(docs, n=1, threshold=0.9)
    near_h = [r.hamming
              for r in simhash_hamming_pairs(near, fp).collect()]
    assert near_h and max(near_h) <= 24, max(near_h)

    mid = ngram_jaccard_pairs(docs, n=1, threshold=0.3).filter(
        F.col("jaccard") < 0.5
    )
    far_h = [r.hamming
             for r in simhash_hamming_pairs(mid, fp).collect()]
    assert far_h
    mean_near = sum(near_h) / len(near_h)
    mean_far = sum(far_h) / len(far_h)
    assert mean_far > mean_near + 8, (mean_near, mean_far)


def test_cosine_neardup_auto_switch_and_dim_probe(spark, sf_dir):
    # exact=None (default): small corpus -> exact path; forcing a tiny
    # max_exact_rows must route to the LSH path (dim auto-probed) and,
    # with generous banding, still reproduce the exact pair set.
    from mydatalake_spark.operators.neardup import cosine_neardup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact_pairs = {(r.id_a, r.id_b)
                   for r in cosine_neardup_pairs(emb, 0.45).collect()}
    lsh_auto = cosine_neardup_pairs(
        emb, 0.45, max_exact_rows=10, n_bands=32, bits_per_band=3
    )
    lsh_pairs = {(r.id_a, r.id_b) for r in lsh_auto.collect()}
    assert lsh_pairs == exact_pairs, exact_pairs ^ lsh_pairs


def test_incremental_dedup_pipeline_two_batches(spark, tmp_path):
    """Daily cadence e2e: batch 1 bootstraps the signature table;
    batch 2 computes only ITS signatures, finds its near-dups against
    the persisted corpus, and appends. The union of per-batch pairs
    equals a from-scratch full run over all docs."""
    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.operators.neardup import (
        incremental_dedup_pipeline,
        minhash_candidates,
        minhash_signatures,
        verify_candidates_jaccard,
    )

    cat = Catalog(spark, str(tmp_path / "wh"))
    all_docs = _docs(spark)                  # ids 1..4; (1,3) identical
    b1 = all_docs.filter(F.col("doc_id") <= 2)
    b2 = all_docs.filter(F.col("doc_id") >= 3)

    p1 = {(r.id_a, r.id_b) for r in incremental_dedup_pipeline(
        cat, "silver.dedup.sigs", b1, corpus_docs=all_docs,
        verify_threshold=0.4).collect()}
    assert cat.read("silver.dedup.sigs").count() == 2    # bootstrap

    p2 = {(r.id_a, r.id_b) for r in incremental_dedup_pipeline(
        cat, "silver.dedup.sigs", b2, corpus_docs=all_docs,
        verify_threshold=0.4).collect()}
    assert cat.read("silver.dedup.sigs").count() == 4    # appended

    full_sigs = minhash_signatures(all_docs)
    full = {(r.id_a, r.id_b) for r in verify_candidates_jaccard(
        minhash_candidates(full_sigs, n_bands=8), all_docs,
        threshold=0.4).collect()}
    assert p1 | p2 == full
    assert (1, 3) in p2                       # cross-batch pair found


def test_lsh_plan_scales_bits_with_corpus_and_caps_bands():
    from mydatalake_spark.similarity.search import lsh_plan

    r1, b1 = lsh_plan(0.8, 0.95, 1_000)
    r2, b2 = lsh_plan(0.8, 0.95, 1_000_000)
    assert b2 > b1          # buckets stay bounded as n grows
    assert r2 >= r1         # extra bands pay the recall back
    r, b = lsh_plan(0.6, 0.99, 10**9, max_bands=64)
    assert r <= 64          # feasibility cap honored
    import pytest as _pt
    with _pt.raises(ValueError):
        lsh_plan(1.5)
    with _pt.raises(ValueError):
        lsh_plan(0.5, target_recall=1.0)


def test_lsh_plan_hits_recall_empirically(spark):
    from mydatalake_spark.similarity.search import (
        brute_force_topk,
        lsh_plan,
        lsh_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    theta, target = 0.4, 0.95
    n = emb.count()
    n_bands, bits = lsh_plan(theta, target, n, target_bucket_rows=32)

    # whole corpus as the query set: enough θ-qualified pairs (132)
    # for the recall estimate to be meaningful
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, emb, k=5).collect()
        if r.score >= theta
    }
    assert exact  # the fixture corpus has qualifying pairs
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(
            emb, emb, dim=64, k=5,
            n_bands=n_bands, bits_per_band=bits,
        ).collect()
    }
    hit = len(exact & approx) / len(exact)
    # the S-curve guarantee is per-pair AT the threshold; pairs barely
    # above θ sit exactly at the design point, so the empirical mean
    # over ~130 pairs carries binomial noise (σ≈0.02) — assert the
    # design target minus sampling slack
    assert hit >= target - 0.05, (n_bands, bits, hit, len(exact))


def test_mean_pool_matches_numpy(spark):
    import numpy as np

    from mydatalake_spark.functions.vectors import mean_pool

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = {
        r.label: list(r.centroid)
        for r in mean_pool(emb, ["label"], round_to=6).collect()
    }
    rows = emb.collect()
    by_label: dict = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(
            [float(x) for x in r.embedding]
        )
    for label, vecs in by_label.items():
        want = np.round(np.mean(np.array(vecs), axis=0), 6)
        assert np.allclose(got[label], want, atol=1e-9), label


def test_cosine_neardup_auto_plan_default_full_recall(spark):
    """auto_plan is now the LSH-path DEFAULT: an unpinned exact=False
    call plans (bands, bits) from corpus size and must reproduce the
    exact pair set on this corpus (the planner's quartered miss budget
    covers single-draw variance — the r4 calibration gap)."""
    from mydatalake_spark.operators.neardup import cosine_neardup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    truth = {(r.id_a, r.id_b)
             for r in cosine_neardup_pairs(emb, 0.45, exact=True).collect()}
    planned = cosine_neardup_pairs(emb, 0.45, exact=False, dim=64)
    got = {(r.id_a, r.id_b) for r in planned.collect()}
    assert truth and got == truth, truth ^ got
    # pinning both band params disables the planner (reproducibility)
    pinned = cosine_neardup_pairs(
        emb, 0.45, exact=False, dim=64, n_bands=32, bits_per_band=3
    )
    assert {(r.id_a, r.id_b) for r in pinned.collect()} == truth


def test_persisted_ivf_index_build_search_append(spark, tmp_path):
    """Index build/search separation: searching the persisted index
    matches the per-query ivf_topk with identical parameters (same
    seeded quantizer), the cells table is partitioned by cell id, and
    an appended increment is discoverable WITHOUT retraining."""
    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.similarity.index import (
        append_to_ivf_index,
        build_ivf_index,
        search_ivf_index,
    )
    from mydatalake_spark.similarity.search import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.limit(10)
    cat = Catalog(spark, str(tmp_path / "ivf_wh"))
    build_ivf_index(cat, "silver.ann.docs", emb, n_centroids=8)

    # physical layout: partitioned by cell
    import os
    cells_dir = cat.path("silver.ann.docs_cells")
    assert any(d.startswith("cell=") for d in os.listdir(cells_dir))

    got = {
        (r.query_id, r.neighbor_id)
        for r in search_ivf_index(
            cat, "silver.ann.docs", queries, k=3, n_probe=3
        ).collect()
    }
    expect = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(
            emb, queries, dim=64, k=3, n_centroids=8, n_probe=3
        ).collect()
    }
    assert got == expect and got

    # append an obvious near-duplicate of query vector 0, then search:
    # the new id must surface as that query's top neighbor
    q0 = queries.orderBy("vec_id").first()
    newbie = spark.createDataFrame(
        [(99999, [float(x) * 2.0 for x in q0.embedding], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    append_to_ivf_index(cat, "silver.ann.docs", newbie)
    after = search_ivf_index(
        cat, "silver.ann.docs",
        queries.where(F.col("vec_id") == q0.vec_id), k=1, n_probe=2,
    ).collect()
    assert after[0].neighbor_id == 99999
    assert after[0].score == 1.0   # scaled copy: cosine exactly 1

def test_portable_minhash_estimates_track_exact_jaccard(spark):
    """est is an unbiased k-sample estimate: identical docs -> 1.0,
    disjoint docs -> 0.0, and a known-overlap pair lands within the
    binomial envelope for k=16."""
    from mydatalake_spark.operators.neardup import minhash_calibration

    base = "the quick brown fox jumps over the lazy dog again and again"
    overlap = base + " with a small tail of extra words appended here"
    rows = [
        (1, base),
        (2, base),                      # exact duplicate: jaccard 1.0
        (3, overlap),                   # high overlap
        (4, "completely different text about spark shuffles and joins"
            " at massive scale with no shared shingles at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.id_a, r.id_b): r for r in minhash_calibration(
        df, num_hashes=16, shingle_n=3, threshold=0.1).collect()}
    dup = out[(1, 2)]
    assert dup.jaccard == 1.0 and dup.est_jaccard == 1.0
    assert dup.abs_err == 0.0
    hi = out[(1, 3)]
    # k=16 binomial: se = sqrt(j(1-j)/16) <= 0.125; allow 4 se
    assert abs(hi.est_jaccard - hi.jaccard) <= 0.5
    assert (4, 1) not in out and (1, 4) not in out


def test_portable_minhash_signature_is_deterministic(spark):
    from mydatalake_spark.operators.neardup import (
        portable_minhash_signatures,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    s1 = portable_minhash_signatures(df).collect()[0].signature
    s2 = portable_minhash_signatures(df).collect()[0].signature
    assert s1 == s2 and len(s1) == 16
    # empty doc -> null signature
    e = portable_minhash_signatures(
        spark.createDataFrame([(1, "")], "doc_id long, text string")
    ).collect()[0]
    assert e.signature is None

def test_quantize_int8_codes_and_zero_vector(spark):
    from mydatalake_spark.similarity.quantize import quantize_int8

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in quantize_int8(df).collect()}
    # scale = 1.0/127 -> codes = round(x*127)
    assert rows[1].qvec == [127, -63, 32, 0]
    import math
    assert abs(rows[1].qnorm
               - math.sqrt(127**2 + 63**2 + 32**2)) < 1e-9
    assert rows[2].qvec is None


def test_quantized_recall_perfect_on_separable_corpus(spark):
    import numpy as np
    from mydatalake_spark.similarity.quantize import quantized_recall
    from mydatalake_spark.similarity.search import brute_force_topk

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(30, 8)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    exact = brute_force_topk(
        df, df.filter(F.col("vec_id") < 3), k=5
    ).select("query_id", "neighbor_id")
    out = quantized_recall(df, exact, k=5).collect()
    assert len(out) == 3
    assert all(r.recall >= 0.6 for r in out)   # int8 on 8 dims is coarse
    assert all(0 <= r.n_overlap <= 5 for r in out)

def test_duplicate_span_stats_flags_shared_spans_only(spark):
    from mydatalake_spark.operators.neardup import duplicate_span_stats

    shared = "x" * 20 + "the exact same forty character span here!!" + "y" * 20
    rows = [
        (1, shared),
        (2, "prefix differs a lot " + shared[15:]),   # shares the span
        (3, "entirely unrelated text " + "z" * 60),   # no overlap
        (4, "ab " * 10),                               # shorter than window
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # stride=1: windowed detection only matches stride-ALIGNED copies
    # (the suffix-array-free tradeoff); unit stride removes alignment
    # from the test
    out = {r.doc_id: r for r in duplicate_span_stats(
        df, window=40, stride=1).collect()}
    # doc 4 too short -> absent
    assert set(out) == {1, 2, 3}
    assert out[1].n_dup > 0 and out[2].n_dup > 0
    assert out[3].n_dup == 0 and out[3].frac_dup == 0.0
    for r in out.values():
        assert 0 <= r.n_dup <= r.n_windows


def test_duplicate_span_internal_repeat_not_cross_doc(spark):
    from mydatalake_spark.operators.neardup import duplicate_span_stats

    rep = ("q" * 50) + ("q" * 50)       # internal repetition only
    df = spark.createDataFrame(
        [(1, rep), (2, "totally different content " + "w" * 40)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in duplicate_span_stats(
        df, window=40, stride=10).collect()}
    assert out[1].n_dup == 0            # repeats within one doc don't count

def test_hard_negatives_excludes_same_label_and_self(spark):
    from mydatalake_spark.similarity.search import hard_negatives_topk

    # anchor 0 (label A); 1 is an identical same-label vector (the
    # positive — must be excluded); 2 is a near-identical different
    # label (the hard negative — must rank first); 3 is a far negative
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 1),
        (1, [1.0, 0.0, 0.0, 0.0], 1),
        (2, [0.99, 0.1, 0.0, 0.0], 2),
        (3, [0.0, 0.0, 1.0, 0.0], 2),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = hard_negatives_topk(
        df, df.filter(F.col("vec_id") == 0), k=2
    ).collect()
    ids = [r.neighbor_id for r in sorted(out, key=lambda r: -r.score)]
    assert ids == [2, 3]
    assert all(r.neighbor_label != 1 for r in out)
    assert all(r.neighbor_id != 0 for r in out)

def test_centroid_accuracy_on_separated_clusters(spark):
    """Well-separated clusters -> near-perfect nearest-centroid
    accuracy; the query-shape mirror of the registry entry."""
    import numpy as np
    from mydatalake_spark.functions.vectors import (
        cosine_similarity, mean_pool,
    )
    from pyspark.sql import Window

    rng = np.random.default_rng(9)
    rows = []
    vid = 0
    for lab in range(3):
        center = np.zeros(8); center[lab] = 10.0
        for _ in range(20):
            v = center + rng.normal(0, 0.5, 8)
            rows.append((vid, [float(x) for x in v], lab))
            vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    cents = mean_pool(df, ["label"], "embedding", round_to=6).select(
        F.col("label").alias("clab"), "centroid"
    )
    scored = df.join(F.broadcast(cents)).select(
        "vec_id", "label", "clab",
        cosine_similarity("embedding", "centroid").alias("s"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("s").desc(), "clab")
    pred = scored.withColumn("rn", F.row_number().over(w)) \
        .where(F.col("rn") == 1)
    correct = pred.where(F.col("clab") == F.col("label")).count()
    assert correct == 60


def test_cosine_neardup_rejects_half_pinned_banding(spark):
    """Supplying exactly ONE of n_bands/bits_per_band with the default
    auto_plan=True used to be silently overridden by the planner — now
    it raises (ADVICE r5: surprising behavior change for callers
    pinning just n_bands)."""
    import pytest

    from mydatalake_spark.operators.neardup import cosine_neardup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="BOTH n_bands and"):
        cosine_neardup_pairs(emb, 0.45, exact=False, dim=64, n_bands=16)
    with pytest.raises(ValueError, match="BOTH n_bands and"):
        cosine_neardup_pairs(
            emb, 0.45, exact=False, dim=64, bits_per_band=4
        )
    # auto_plan=False keeps the old fixed-default completion behavior
    df = cosine_neardup_pairs(
        emb, 0.45, exact=False, dim=64, n_bands=16, auto_plan=False
    )
    assert df.columns == ["id_a", "id_b", "score"]


def test_pq_encode_shape_and_determinism(spark):
    from mydatalake_spark.similarity.pq import pq_encode, train_pq

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = train_pq(emb, m_subspaces=8, n_codes=16)
    assert len(books) == 8 and books[0].shape == (16, 8)
    c1 = {r.vec_id: tuple(r.codes) for r in pq_encode(emb, books).collect()}
    c2 = {r.vec_id: tuple(r.codes) for r in pq_encode(emb, books).collect()}
    assert c1 == c2
    assert all(len(v) == 8 and all(0 <= x < 16 for x in v)
               for v in c1.values())


def test_pq_rerank_beats_raw_adc_recall(spark):
    """The ADC shortlist + exact rerank must recover most of the recall
    raw ADC ranks lose to quantization error."""
    from pyspark.sql import functions as F

    from mydatalake_spark.similarity.pq import (
        pq_adc_topk,
        pq_encode,
        pq_search_rerank,
        train_pq,
    )
    from mydatalake_spark.similarity.search import brute_force_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    books = train_pq(emb, m_subspaces=16, n_codes=16)
    exact = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(emb, q, k=5).collect()}
    codes = pq_encode(emb, books)
    raw = {(r.query_id, r.neighbor_id)
           for r in pq_adc_topk(codes, q, books, k=5).collect()}
    rr = {(r.query_id, r.neighbor_id)
          for r in pq_search_rerank(emb, q, books, k=5,
                                    shortlist=50).collect()}
    raw_recall = len(raw & exact) / len(exact)
    rr_recall = len(rr & exact) / len(exact)
    assert rr_recall >= 0.6
    assert rr_recall > raw_recall


def test_winnow_unbounded_escape_hatch_is_guarded(spark):
    """max_df=None no longer silently quadratics: a fingerprint hotter
    than guard_max_df refuses at call time; guard_max_df=None is the
    explicit double opt-in that really runs unbounded."""
    import pytest

    from mydatalake_spark.operators.guards import GroupSizeExceeded

    boiler = "common boilerplate header line shared by every document"
    rows = [
        (i, boiler + f" unique tail {i} alpha beta gamma")
        for i in range(1, 6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(GroupSizeExceeded, match="winnow_pairs"):
        winnow_pairs(df, min_shared=5, max_df=None, guard_max_df=4)
    pairs = winnow_pairs(
        df, min_shared=5, max_df=None, guard_max_df=None
    )
    assert pairs.count() == 10           # boilerplate pairs all 5 docs


def test_ivfpq_degrades_to_pq_rerank_and_keeps_recall(spark):
    """IVF-PQ with every cell probed must equal plain PQ+rerank
    exactly (same candidates, same tiebreaks); with half the cells
    probed it keeps most of the recall at half the ADC scan — the
    honest trade on unstructured synthetic vectors (measured 0.76 vs
    the 0.6 floor; real clustered embeddings do better)."""
    from mydatalake_spark.similarity.pq import (
        ivfpq_topk,
        pq_search_rerank,
        train_pq,
    )
    from mydatalake_spark.similarity.search import brute_force_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    books = train_pq(emb, m_subspaces=16, n_codes=16)
    full = sorted(map(tuple, ivfpq_topk(
        emb, q, books, k=5, shortlist=50, n_centroids=8, n_probe=8
    ).collect()))
    plain = sorted(map(tuple, pq_search_rerank(
        emb, q, books, k=5, shortlist=50
    ).collect()))
    assert full == plain
    exact = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(emb, q, k=5).collect()}
    probed = {(r.query_id, r.neighbor_id)
              for r in ivfpq_topk(
                  emb, q, books, k=5, shortlist=50,
                  n_centroids=8, n_probe=4,
              ).collect()}
    assert len(probed & exact) / len(exact) >= 0.6


def test_persisted_ivfpq_index_codes_search_append(spark, tmp_path):
    """IVF-PQ persisted index: codebooks stored as a third table, the
    cells table carries codes, ADC search with full probe + corpus-
    sized shortlist degrades EXACTLY to the exact-cosine path, the
    probed search keeps a recall floor, and an appended increment is
    encoded against the STORED codebooks and discoverable."""
    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.similarity.index import (
        append_to_ivf_index,
        build_ivf_index,
        search_ivf_index,
        search_ivfpq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.limit(10)
    cat = Catalog(spark, str(tmp_path / "ivfpq_wh"))
    build_ivf_index(
        cat, "silver.ann.pq", emb, n_centroids=8, pq_subspaces=16
    )
    assert cat.exists("silver.ann.pq_pq")
    assert "codes" in cat.read("silver.ann.pq_cells").columns

    exact_full = {
        (r.query_id, r.neighbor_id)
        for r in search_ivf_index(
            cat, "silver.ann.pq", queries, k=3, n_probe=8
        ).collect()
    }
    adc_full = {
        (r.query_id, r.neighbor_id)
        for r in search_ivfpq_index(
            cat, "silver.ann.pq", queries, k=3, n_probe=8,
            shortlist=1000,
        ).collect()
    }
    assert adc_full == exact_full and adc_full

    probed = {
        (r.query_id, r.neighbor_id)
        for r in search_ivfpq_index(
            cat, "silver.ann.pq", queries, k=3, n_probe=4,
            shortlist=50,
        ).collect()
    }
    assert len(probed & exact_full) / len(exact_full) >= 0.5

    q0 = queries.orderBy("vec_id").first()
    newbie = spark.createDataFrame(
        [(99999, [float(x) * 2.0 for x in q0.embedding], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    append_to_ivf_index(cat, "silver.ann.pq", newbie)
    assert (
        cat.read("silver.ann.pq_cells")
        .where(F.col("vec_id") == 99999)
        .first()
        .codes
        is not None
    )
    after = search_ivfpq_index(
        cat, "silver.ann.pq",
        queries.where(F.col("vec_id") == q0.vec_id),
        k=1, n_probe=2, shortlist=20,
    ).collect()
    assert after[0].neighbor_id == 99999
    assert after[0].score == 1.0


def test_ngram_jaccard_refuses_hot_shingle(spark):
    """A shingle hotter than guard_max_df refuses at call time (exact
    Jaccard cannot silently drop it like winnow's stop-fingerprints);
    compliant corpora and the opt-out behave unchanged."""
    import pytest

    from mydatalake_spark.operators.guards import GroupSizeExceeded
    from mydatalake_spark.operators.neardup import ngram_jaccard_pairs

    rows = [(i, "alpha beta gamma " + f"tail{i} x{i} y{i}")
            for i in range(1, 7)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(GroupSizeExceeded, match="ngram_jaccard_pairs"):
        ngram_jaccard_pairs(df, n=1, threshold=0.1, guard_max_df=5)
    ok = ngram_jaccard_pairs(
        df, n=1, threshold=0.1, guard_max_df=50
    ).count()
    off = ngram_jaccard_pairs(
        df, n=1, threshold=0.1, guard_max_df=None
    ).count()
    assert ok == off == 15          # C(6,2): every pair shares 3 words


def test_pq_adc_refuses_large_query_batch(spark):
    """pq_adc_topk broadcasts the per-query ADC lookup tables and
    crossJoins the full code table — a queries x corpus frame. The
    bounded-batch contract must refuse above max_queries (pointing at
    the ivfpq probed-cell path), leave small batches' plan unchanged,
    and let max_queries=None opt out."""
    import pytest
    from pyspark.sql import functions as F

    from mydatalake_spark.similarity.pq import (
        QueryBatchExceeded,
        pq_adc_topk,
        pq_encode,
        train_pq,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = train_pq(emb, m_subspaces=8, n_codes=16)
    codes = pq_encode(emb, books)
    q = emb.filter(F.col("vec_id") < 12)
    with pytest.raises(QueryBatchExceeded, match="ivfpq_topk"):
        pq_adc_topk(codes, q, books, k=3, max_queries=10)
    # small batch under the cap: unchanged result shape
    out = pq_adc_topk(codes, q, books, k=3, max_queries=100)
    assert out.groupBy("query_id").count().agg(
        F.max("count")
    ).first()[0] == 3
    # explicit opt-out skips the probe entirely
    out2 = pq_adc_topk(codes, q, books, k=3, max_queries=None)
    assert out2.select("query_id").distinct().count() == 12


def test_exact_blas_refuses_oversize_corpus_bytes(spark):
    """VERDICT r7 ask #8: the <=1M-row auto-route bounds ROWS but the
    driver-side collect materializes rows x dim float64 BYTES; the
    bytes probe must refuse before collecting and name the LSH route."""
    import pytest
    from pyspark.sql import functions as F

    from mydatalake_spark.operators.neardup import (
        ExactCorpusExceeded,
        _exact_pairs_blas,
        cosine_neardup_pairs,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    normed = emb.select(
        F.col("vec_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double"))
        .alias("_nv"),
    )
    with pytest.raises(ExactCorpusExceeded, match="exact=False"):
        _exact_pairs_blas(normed, "vec_id", 0.45, bytes_cap=1024)
    # default budget: small corpora unchanged (same pairs as before)
    pairs = cosine_neardup_pairs(emb, threshold=0.45, exact=True)
    assert pairs.count() >= 0 and set(pairs.columns) == {
        "id_a", "id_b", "score",
    }


def test_ngram_jaccard_native_family_matches_portable(spark):
    """family='native' (xxhash64 8-byte join keys) must produce the
    same Jaccard table as the portable string-key path — hash
    collisions are the only divergence and cannot occur on a
    4-doc corpus."""
    from mydatalake_spark.caching import release

    docs = _docs(spark)
    p = ngram_jaccard_pairs(docs, n=3, threshold=0.4)
    portable = {(r.id_a, r.id_b): r.jaccard for r in p.collect()}
    release(p)
    nv = ngram_jaccard_pairs(docs, n=3, threshold=0.4, family="native")
    native = {(r.id_a, r.id_b): r.jaccard for r in nv.collect()}
    release(nv)
    assert native == portable and portable
    with pytest.raises(ValueError, match="family"):
        ngram_jaccard_pairs(docs, family="xxh3")


def test_winnow_native_family_same_contract(spark):
    """Native winnow selects DIFFERENT fingerprints (different hash
    order) but the same contract: long-typed values, ~2/(w+1)
    density bounds, and the pair join still surfaces the duplicated
    documents the portable family surfaces."""
    from pyspark.sql import functions as F

    from mydatalake_spark.caching import release
    from mydatalake_spark.operators.neardup import (
        winnow_fingerprints,
        winnow_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog " * 20
    docs = spark.createDataFrame(
        [(1, base), (2, base + " tail edit"), (3, "totally unrelated words " * 25)],
        "doc_id long, text string",
    )
    fps = docs.select(
        winnow_fingerprints("text", family="native").alias("f")
    ).collect()
    assert all(isinstance(v, int) for r in fps for v in r.f)

    for fam in ("portable", "native"):
        out = winnow_pairs(
            docs, min_shared=10, max_df=None, guard_max_df=None, family=fam
        )
        got = {(r.id_a, r.id_b) for r in out.collect()}
        release(out)
        assert got == {(1, 2)}, (fam, got)
    with pytest.raises(ValueError, match="family"):
        docs.select(winnow_fingerprints("text", family="md5"))
