"""Scalar int8 embedding quantization + retrieval-quality measurement.

[extension] The memory-bandwidth lever for vector search at scale:
symmetric per-vector int8 quantization shrinks an embedding corpus 4×
(float32 → int8), which at 100 TB is the difference between a corpus
that fits executor storage and one that doesn't. Search quality is
NOT assumed — ``quantized_recall`` measures top-k overlap against the
fp32 exact ranking, the same measured-not-folklore discipline as
``operators/neardup.py:minhash_calibration``.

Spark-first shape: quantization is a map-side array expression
(``transform`` + ``floor``), integer dot products accumulate EXACTLY
(|q| ≤ 127 ⇒ 64-dim dot ≤ ~10⁶, far inside int64), so quantized
scores are bit-identical on any engine and any summation order — the
whole pipeline stays oracle-expressible. The brute-force scorer here
is the bounded baseline; the scale path composes quantization with
the IVF/LSH routers in ``similarity/search.py`` (quantize the
residuals the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization:
    q_i = floor(x_i / max|x| · 127 + 0.5) ∈ [−127, 127].

    Floor-based half-up rounding is the SAME double arithmetic on
    every engine (see user_trend_events) — quantized codes are
    portable by construction. All-zero vectors quantize to null
    (no scale exists). Returns ``(id, qvec, qnorm)`` with the integer
    L2 norm precomputed so scorers never re-reduce the array.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.transform(
        v, lambda x: F.floor(x / maxabs * 127.0 + 0.5).cast("long")
    )
    qvec = F.when(maxabs > 0, q)
    qnorm = F.sqrt(
        F.aggregate(
            qvec,
            F.lit(0).cast("long"),
            lambda acc, x: acc + x * x,
        ).cast("double")
    )
    return df.select(
        F.col(id_col), qvec.alias("qvec"), qnorm.alias("qnorm")
    )


def quantized_topk(
    quantized: DataFrame,
    query_ids: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k neighbors under the QUANTIZED cosine
    dot(qa, qb) / (‖qa‖·‖qb‖), ties broken by neighbor id.

    The query side is a broadcast (queries are few); the corpus side
    streams map-only — same shape as brute_force_topk but with exact
    integer dots. Returns (query_id, neighbor_id, qscore).
    """
    qs = (
        quantized.join(query_ids, id_col, "semi")
        .select(
            F.col(id_col).alias("query_id"),
            F.col("qvec").alias("__qa__"),
            F.col("qnorm").alias("__na__"),
        )
    )
    corpus = quantized.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("qvec").alias("__qb__"),
        F.col("qnorm").alias("__nb__"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("__qa__"), F.col("__qb__"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        F.broadcast(qs)
        .join(corpus, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot.cast("double") / (F.col("__na__") * F.col("__nb__")))
            .alias("qscore"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qscore").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") <= k)
        .drop("__rn__")
    )


def quantized_recall(
    df: DataFrame,
    exact_topk: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k of int8-quantized search vs the fp32 exact ranking.

    ``exact_topk`` must carry (query_id, neighbor_id) of the fp32
    top-k. Returns one row per query: (query_id, n_overlap, recall).
    """
    qids = exact_topk.select(
        F.col("query_id").alias(id_col)
    ).distinct()
    quantized = quantize_int8(df, vec_col=vec_col, id_col=id_col)
    qk = quantized_topk(quantized, qids, k=k, id_col=id_col)
    overlap = exact_topk.select("query_id", "neighbor_id").join(
        qk.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "semi",
    )
    hits = overlap.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    allq = exact_topk.select("query_id").distinct()
    return (
        allq.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_overlap"), F.lit(0))
            .cast("long")
            .alias("n_overlap"),
            F.round(
                F.coalesce(F.col("n_overlap"), F.lit(0)) / float(k), 4
            ).alias("recall"),
        )
    )
