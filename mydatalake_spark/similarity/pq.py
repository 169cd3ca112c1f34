"""Product quantization (PQ) for compressed ANN search.

[extension] The missing third of the FAISS-style ANN stack already in
this engine (LSH banding: ``search.lsh_topk``; IVF coarse cells:
``search.ivf_topk`` / ``index.build_ivf_index``): PQ compresses each
vector to ``m`` one-byte codes (here 64 float32 dims → 8 codes: 32×
smaller) so the CORPUS side of a scan fits in a fraction of the
memory/IO, and query scoring becomes ``m`` table lookups instead of
``dim`` multiplies (asymmetric distance computation, ADC — Jégou,
Douze & Schmid, "Product Quantization for Nearest Neighbor Search",
TPAMI 2011). At 100 TB this is the difference between scanning 100 TB
of raw vectors and ~3 TB of codes.

Spark-first shape, mirroring the IVF discipline:
- codebooks train driver-side on a BOUNDED deterministic sample
  (orderBy(id).limit — the same contract as
  ``search._train_spherical_kmeans``); nothing corpus-sized collects.
- encoding is a pure column expression (per-subspace argmax of
  ``v·c − |c|²/2``, the L2-argmin identity — built as one parsed SQL
  string like ``search._centroid_scores_expr``); map-only over the
  corpus, no UDF, no shuffle.
- ADC search: each query row derives its ``m × n_codes`` lookup
  tables as array literals-of-expressions once, broadcast-joins the
  (tiny) code table, and the approximate score is ``m``
  ``element_at`` lookups — never touching raw corpus vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_pq(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_subspaces: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    sample_size: int = 4096,
    iters: int = 8,
):
    """Train per-subspace Euclidean k-means codebooks on a bounded
    deterministic sample of L2-normalized vectors. Returns a list of
    ``m_subspaces`` (n_codes × subdim) float arrays. Vectors are
    normalized first so PQ-ADC dot products approximate cosine — the
    metric every other similarity operator here uses."""
    import numpy as np

    sample = np.array(
        [
            [float(x) for x in r[0]]
            for r in corpus.select(vec_col)
            .orderBy(id_col)
            .limit(sample_size)
            .collect()
        ],
        dtype=np.float64,
    )
    if sample.ndim != 2 or sample.shape[0] < n_codes:
        raise ValueError("sample too small to train PQ codebooks")
    dim = sample.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m={m_subspaces}")
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = sample / norms
    subdim = dim // m_subspaces
    rng = np.random.RandomState(seed)
    books = []
    for j in range(m_subspaces):
        sub = unit[:, j * subdim : (j + 1) * subdim]
        cents = sub[rng.choice(len(sub), size=n_codes, replace=False)]
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(n_codes):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(cents.copy())
    return books


def _unit_expr(vec_col: str) -> str:
    """SQL text for the L2-normalized double vector (0-norm safe)."""
    return (
        f"transform(`{vec_col}`, x -> cast(x as double) / "
        f"greatest(sqrt(aggregate(`{vec_col}`, cast(0.0 as double), "
        f"(a, x) -> a + cast(x as double) * cast(x as double))), "
        "cast(1e-300 as double)))"
    )


def pq_encode(
    df: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str = "codes",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Encode each vector to ``m`` small-int codes: per subspace, the
    argmax of ``v_sub·c − |c|²/2`` over the codebook (≡ L2 argmin).
    One parsed SQL expression per subspace — pure map, fused with the
    scan; the output table is ``m`` ints per row regardless of dim.
    ``keep_cols`` carries extra columns through (e.g. the IVF cell id
    for :func:`ivfpq_topk`)."""
    unit = _unit_expr(vec_col)
    subdim = len(codebooks[0][0])
    # Each subspace's score array parses ONCE into a Column and is
    # referenced twice (array_position + array_max) as an expression
    # DAG — halving the parse work of the old duplicated-SQL-string
    # form while keeping the identical single-Project plan, whose
    # runtime subexpression elimination already evaluates the array
    # once per row. An r14 two-projection variant (scores in an
    # intermediate select) made the plan 100 KB smaller but measured
    # ~0.7 s SLOWER end-to-end on pq_recall_embeddings at sf0.1 in
    # interleaved A/B, so the single-Project shape stays.
    sub_cols = []
    for j, book in enumerate(codebooks):
        start = j * subdim + 1  # slice() is 1-based
        scores = ", ".join(
            "aggregate(zip_with(slice(__u__, {s}, {l}), array({arr}), "
            "(x, y) -> x * y), cast({bias!r} as double), "
            "(acc, x) -> acc + x)".format(
                s=start,
                l=subdim,
                arr=", ".join(f"{float(x)!r}D" for x in c),
                bias=-float((c * c).sum()) / 2.0,
            )
            for c in book
        )
        sa = F.expr(f"array({scores})")
        sub_cols.append(
            (F.array_position(sa, F.array_max(sa)) - 1).cast("int")
        )
    return (
        df.withColumn("__u__", F.expr(unit))
        .select(
            F.col(id_col),
            *[F.col(c) for c in (keep_cols or [])],
            F.array(*sub_cols).alias(codes_col),
        )
    )


def _query_adc_tables(
    queries: DataFrame,
    codebooks,
    id_col: str,
    vec_col: str,
    extra: list = (),
) -> DataFrame:
    """Per-query ADC lookup tables: ``__t{j}__`` holds query-subvector ·
    codebook-entry for every entry of subspace ``j`` — built once per
    query row as expression arrays; scoring any code is then ``m``
    ``element_at`` lookups."""
    unit = _unit_expr(vec_col)
    subdim = len(codebooks[0][0])
    table_cols = []
    for j, book in enumerate(codebooks):
        start = j * subdim + 1
        entries = ", ".join(
            "aggregate(zip_with(slice(__qu__, {s}, {l}), array({arr}), "
            "(x, y) -> x * y), cast(0.0 as double), "
            "(acc, x) -> acc + x)".format(
                s=start,
                l=subdim,
                arr=", ".join(f"{float(x)!r}D" for x in c),
            )
            for c in book
        )
        table_cols.append(F.expr(f"array({entries})").alias(f"__t{j}__"))
    return queries.withColumn("__qu__", F.expr(unit)).select(
        F.col(id_col).alias("query_id"), *extra, *table_cols
    )


def _adc_score(codebooks, codes_col: str):
    """Σ_j table_j[code_j] — the ADC approximate dot product."""
    score = None
    for j in range(len(codebooks)):
        term = F.expr(
            f"element_at(__t{j}__, cast(element_at({codes_col}, {j + 1}) "
            "+ 1 as int))"
        )
        score = term if score is None else score + term
    return score


#: Bounded-query-batch contract cap for :func:`pq_adc_topk` — the
#: broadcast side carries m lookup-table arrays (m·256 doubles ≈ 32 KB
#: at m=16) per query, and the candidate frame is queries × corpus, so
#: ~10³ queries is where both the broadcast and the scoring frame stop
#: being "small side" shaped.
ADC_QUERY_BATCH_CAP = 1024


class QueryBatchExceeded(ValueError):
    """The ADC query batch exceeds the bounded-batch contract.

    ``pq_adc_topk`` broadcasts the per-query lookup tables and scores
    queries × corpus candidate rows; a 10⁵-query batch against a big
    corpus explodes both. Raised BEFORE the crossJoin is built, with
    the probed-cell remediation in the message.
    """


def pq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str = "codes",
    max_queries: int | None = ADC_QUERY_BATCH_CAP,
) -> DataFrame:
    """Asymmetric-distance top-k: each query builds its per-subspace
    lookup tables (query-sub · codebook entry, as expression arrays),
    broadcast-joins the code table, and scores with ``m`` element_at
    lookups. Returns ``(query_id, neighbor_id, rank)`` with the
    deterministic (score desc, id) tiebreak every ranking here uses.

    SCALE CONTRACT (enforced): the query batch is the BROADCAST side
    of a crossJoin against the full code table — correct ADC shape,
    but the candidate frame is queries × corpus, so the batch must be
    small (default cap 1024; one ``limit(n+1).count()`` probe job,
    driver transfer bounded at one long). A bigger batch belongs on
    :func:`mydatalake_spark.similarity.index.ivfpq_topk`'s probed-cell
    path, where each query scores only its ``n_probe`` cells — the
    same routing split :func:`cosine_neardup_pairs` applies at 10⁶
    rows. ``max_queries=None`` opts out for pre-bounded callers.
    """
    if max_queries is not None:
        n_q = queries.limit(max_queries + 1).count()
        if n_q > max_queries:
            raise QueryBatchExceeded(
                f"pq_adc_topk: query batch has >{max_queries} rows; the "
                f"broadcast lookup tables and the queries x corpus ADC "
                f"frame both scale with the batch. Route large batches "
                f"through similarity.index.ivfpq_topk (probed-cell ADC), "
                f"split the batch, or pass max_queries=None for a "
                f"corpus known to be small."
            )
    q = _query_adc_tables(queries, codebooks, id_col, vec_col)
    scored = F.broadcast(q).crossJoin(
        codes.select(F.col(id_col).alias("neighbor_id"), codes_col)
    ).select(
        "query_id",
        "neighbor_id",
        _adc_score(codebooks, codes_col).alias("__s__"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("query_id")
        .orderBy(F.desc("__s__"), "neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("__s__")
    )


def pq_search_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 5,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int | None = ADC_QUERY_BATCH_CAP,
) -> DataFrame:
    """The production PQ shape: ADC over the compressed codes selects a
    ``shortlist`` of candidates per query (touching ONLY the ~32×
    smaller code table), then exact cosine reranks just those
    candidates against raw vectors — per query, ``shortlist`` raw-
    vector reads instead of a corpus scan. Returns
    ``(query_id, neighbor_id, rank)`` for the exact-reranked top-k.

    Quantization error now only costs recall when a true top-k
    neighbor falls outside the ADC top-``shortlist`` — measured at
    sf0.01: recall@5 jumps from 0.2 (raw ADC ranks) to ≥0.9 with a
    50-candidate shortlist over 500 vectors."""
    codes = pq_encode(corpus, codebooks, id_col=id_col, vec_col=vec_col)
    cand = pq_adc_topk(
        codes, queries, codebooks, k=shortlist, id_col=id_col,
        vec_col=vec_col, max_queries=max_queries,
    ).select("query_id", "neighbor_id")
    return _exact_rerank(cand, corpus, queries, k, id_col, vec_col)


def _exact_rerank(
    cand: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Exact cosine rerank of a (query_id, neighbor_id) candidate set:
    per query, ``|shortlist|`` raw-vector reads instead of a corpus
    scan; deterministic (score desc, id) tiebreak."""
    from pyspark.sql import Window

    from ..functions.vectors import cosine_similarity

    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv__"),
    )
    nv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__nv__"),
    )
    dbl_q = F.transform(F.col("__qv__"), lambda x: x.cast("double"))
    dbl_n = F.transform(F.col("__nv__"), lambda x: x.cast("double"))
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(dbl_q, dbl_n), 6).alias("__s__"),
        )
    )
    w = (
        Window.partitionBy("query_id")
        .orderBy(F.desc("__s__"), "neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("__s__")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 5,
    shortlist: int = 50,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_size: int = 4096,
    iters: int = 5,
) -> DataFrame:
    """IVF-PQ — the full FAISS production composition, on DataFrames:
    the coarse quantizer (``search._train_spherical_kmeans``, bounded
    seeded sample) restricts each query's ADC scan to its ``n_probe``
    nearest cells, PQ codes score those survivors with ``m`` lookups,
    and exact cosine reranks the shortlist. Cost per query:
    ``~(n_probe / n_centroids) × |codes|`` lookup rows + ``shortlist``
    raw-vector reads — against a corpus that stores 32× fewer bytes.

    Plan shape: cell assignment and encoding are one fused map over
    the corpus; the probe is an equi-join of the (tiny, broadcast)
    exploded query×cell frame against the code table — with the code
    table written PARTITIONED BY cell (index.py's layout), the join
    prunes to probed partitions and the scan fraction is literal.
    With ``n_probe = n_centroids`` this degrades exactly to
    :func:`pq_search_rerank` (parity-tested)."""
    from .search import (
        _assign_argmax,
        _centroid_scores_expr,
        _train_spherical_kmeans,
    )

    cents = _train_spherical_kmeans(
        corpus, id_col, vec_col, n_centroids,
        seed=seed, sample_size=sample_size, iters=iters,
    )
    cell_scores = _centroid_scores_expr(cents)
    codes = pq_encode(
        _assign_argmax(corpus, cell_scores(vec_col), "__cell__"),
        codebooks,
        id_col=id_col,
        vec_col=vec_col,
        keep_cols=["__cell__"],
    )
    q = _query_adc_tables(
        queries, codebooks, id_col, vec_col,
        extra=[cell_scores(vec_col).alias("__cs__")],
    )
    probe = q.select(
        "query_id",
        F.explode(
            F.slice(
                F.reverse(F.array_sort(
                    F.transform(
                        F.col("__cs__"),
                        lambda s, i: F.struct(s.alias("s"), i.alias("cell")),
                    )
                )),
                1,
                n_probe,
            )
        ).alias("p"),
        *[F.col(f"__t{j}__") for j in range(len(codebooks))],
    ).select(
        "query_id",
        F.col("p.cell").alias("__cell__"),
        *[F.col(f"__t{j}__") for j in range(len(codebooks))],
    )
    scored = codes.join(F.broadcast(probe), "__cell__").select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        _adc_score(codebooks, "codes").alias("__s__"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("query_id")
        .orderBy(F.desc("__s__"), "neighbor_id")
    )
    cand = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(cand, corpus, queries, k, id_col, vec_col)
