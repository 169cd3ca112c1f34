"""Persisted IVF index: ANN index BUILD separated from SEARCH.

[extension] ``similarity.search.ivf_topk`` re-trains its coarse
quantizer and re-assigns the corpus on every call — right for ad-hoc
queries, wrong for the production cadence where one corpus serves many
query batches. This module persists the index as two catalog tables:

- ``{name}_centroids``: (cell int, centroid array<double>) — tiny
  (n_centroids × dim), the trained spherical-k-means quantizer;
- ``{name}_cells``: the corpus with its cell assignment, written
  PARTITIONED BY cell — so a probe of ``n_probe`` cells is a
  partition-pruned scan (~n_probe/n_centroids of the corpus bytes),
  and Spark's dynamic partition pruning applies when the probe
  arrives as a join.

``search_ivf_index`` then costs: read centroids (KBs) + score queries
+ scan only the probed cell partitions + exact rerank inside. New
vectors fold in with ``append_to_ivf_index`` — assignment against the
STORED centroids, an append of increment-sized data; the quantizer is
only retrained when drift warrants a rebuild (the FAISS
train-once/add-many contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import Catalog
from .search import (
    _assign_argmax,
    _centroid_scores_expr,
    _train_spherical_kmeans,
    cosine_similarity,
    dedup_topk,
)


def _names(name: str) -> tuple[str, str]:
    return f"{name}_centroids", f"{name}_cells"


def _pq_name(name: str) -> str:
    return f"{name}_pq"


def build_ivf_index(
    catalog: Catalog,
    name: str,
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_size: int = 4096,
    iters: int = 5,
    pq_subspaces: int | None = None,
    pq_codes: int = 16,
) -> None:
    """Train the quantizer on a bounded sample, assign every corpus
    vector to its nearest centroid JVM-side (argmax over centroid
    dots — one scan, no UDF), and persist both tables. The cells
    table is partitioned by cell id.

    With ``pq_subspaces`` set, the index is IVF-PQ: per-subspace PQ
    codebooks train on the same bounded sample contract, persist as a
    third tiny table ``{name}_pq`` (subspace, code, centroid), and the
    cells table gains a ``codes`` column (m small ints per row) in the
    SAME single corpus pass — so a search can scan 32× fewer bytes
    (codes only) in the probed partitions and touch raw vectors just
    for the rerank shortlist."""
    cent_table, cells_table = _names(name)
    centroids = _train_spherical_kmeans(
        corpus, id_col, vec_col, n_centroids,
        seed=seed, sample_size=sample_size, iters=iters,
    )
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    )
    catalog.overwrite(cent_df, cent_table)

    scores = _centroid_scores_expr(centroids)
    assigned = _assign_argmax(
        corpus.select(F.col(id_col), F.col(vec_col)),
        scores(vec_col),
        "cell",
    )
    if pq_subspaces:
        from .pq import pq_encode, train_pq

        books = train_pq(
            corpus, id_col=id_col, vec_col=vec_col,
            m_subspaces=pq_subspaces, n_codes=pq_codes,
            seed=seed, sample_size=sample_size,
        )
        pq_df = spark.createDataFrame(
            [
                (j, c, [float(x) for x in books[j][c]])
                for j in range(len(books))
                for c in range(len(books[j]))
            ],
            "subspace int, code int, centroid array<double>",
        )
        catalog.overwrite(pq_df, _pq_name(name))
        assigned = pq_encode(
            assigned, books, id_col=id_col, vec_col=vec_col,
            keep_cols=[vec_col, "cell"],
        )
    catalog.overwrite(assigned, cells_table, partition_by=["cell"])


def append_to_ivf_index(
    catalog: Catalog,
    name: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Fold an increment into the cells table using the STORED
    centroids — increment-sized work, no retraining. Appends via
    ``Catalog.overwrite_partitions``: only the cells the increment
    actually lands in are read back, unioned, and swapped; untouched
    cell directories are never read or written, so cost is
    O(increment + touched cells), not O(table). The touched-cell list
    is one distinct-collect bounded by n_centroids (index metadata
    scale, not corpus scale)."""
    cent_table, cells_table = _names(name)
    centroids = _load_centroids(catalog, cent_table)
    scores = _centroid_scores_expr(centroids)
    assigned = _assign_argmax(
        new_vectors.select(F.col(id_col), F.col(vec_col)),
        scores(vec_col),
        "cell",
    )
    if catalog.exists(_pq_name(name)):
        # IVF-PQ index: the increment encodes against the STORED
        # codebooks (train-once/add-many applies to PQ exactly as it
        # does to the coarse quantizer)
        from .pq import pq_encode

        books = _load_pq_codebooks(catalog, _pq_name(name))
        assigned = pq_encode(
            assigned, books, id_col=id_col, vec_col=vec_col,
            keep_cols=[vec_col, "cell"],
        )
    assigned = assigned.cache()
    touched = [r.cell for r in assigned.select("cell").distinct().collect()]
    if not touched:
        assigned.unpersist()
        return
    # Partition-pruned read of ONLY the touched cells (cell is the
    # partition column, so the isin filter prunes directories).
    existing = catalog.read(cells_table).filter(F.col("cell").isin(touched))
    merged = existing.unionByName(assigned.select(*existing.columns))
    catalog.overwrite_partitions(merged, cells_table, "cell", touched)
    assigned.unpersist()


def _load_centroids(catalog: Catalog, cent_table: str):
    import numpy as np

    rows = catalog.read(cent_table).orderBy("cell").collect()
    return np.array([r.centroid for r in rows], dtype=np.float64)


def _load_pq_codebooks(catalog: Catalog, pq_table: str):
    """Rebuild the train_pq-shaped codebook list from the stored
    (subspace, code, centroid) rows — index metadata scale (m ×
    n_codes rows), bounded by construction."""
    import numpy as np

    rows = catalog.read(pq_table).orderBy("subspace", "code").collect()
    n_sub = max(r.subspace for r in rows) + 1
    books = []
    for j in range(n_sub):
        books.append(np.array(
            [r.centroid for r in rows if r.subspace == j],
            dtype=np.float64,
        ))
    return books


def search_ivf_index(
    catalog: Catalog,
    name: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k cosine neighbors from the persisted index:
    ``(query_id, neighbor_id, score)``. The stored centroids (KBs)
    collect to the driver and inline as plan literals; each query
    probes its ``n_probe`` best cells; the probe reaches the
    partitioned cells table as an equi-join on the partition column,
    so only probed partitions scan. Exact cosine reranks inside."""
    cent_table, cells_table = _names(name)
    centroids = _load_centroids(catalog, cent_table)
    scores = _centroid_scores_expr(centroids)

    q_scored = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec__"),
        scores(vec_col).alias("__cs__"),
    )
    probe = q_scored.select(
        "query_id",
        "__qvec__",
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
    ).select("query_id", "__qvec__", F.col("p.cell").alias("cell"))

    cells = catalog.read(cells_table).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec__"),
        "cell",
    )
    cand = cells.join(F.broadcast(probe), "cell")
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine_similarity("__qvec__", "__cvec__").alias("score"),
    )
    return dedup_topk(scored, k)


def search_ivfpq_index(
    catalog: Catalog,
    name: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF-PQ search over an index built with ``pq_subspaces``: the
    probed cell partitions are scanned CODES-ONLY (the 32×-smaller
    column; raw vectors pruned away at the reader), ADC scores them
    with ``m`` lookups against per-query tables, a per-query window
    keeps the top-``shortlist``, and only those rows re-read their raw
    vectors — partition-pruned again via the carried cell id — for the
    exact cosine rerank. Returns ``(query_id, neighbor_id, score)``
    like :func:`search_ivf_index` (score = exact cosine of the
    reranked survivors, rounded to 6 dp)."""
    from pyspark.sql import Window

    from .pq import _adc_score, _query_adc_tables

    cent_table, cells_table = _names(name)
    centroids = _load_centroids(catalog, cent_table)
    books = _load_pq_codebooks(catalog, _pq_name(name))
    scores = _centroid_scores_expr(centroids)

    q = _query_adc_tables(
        queries, books, id_col, vec_col,
        extra=[scores(vec_col).alias("__cs__"),
               F.col(vec_col).alias("__qvec__")],
    )
    m = len(books)
    probe = q.select(
        "query_id",
        "__qvec__",
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
        *[F.col(f"__t{j}__") for j in range(m)],
    ).select(
        "query_id",
        "__qvec__",
        F.col("p.cell").alias("cell"),
        *[F.col(f"__t{j}__") for j in range(m)],
    )

    codes = catalog.read(cells_table).select(
        F.col(id_col).alias("neighbor_id"), "cell", "codes"
    )
    cand = codes.join(F.broadcast(probe.drop("__qvec__")), "cell")
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    adc = cand.select(
        "query_id",
        "neighbor_id",
        "cell",
        _adc_score(books, "codes").alias("__s__"),
    )
    w = (
        Window.partitionBy("query_id")
        .orderBy(F.desc("__s__"), "neighbor_id")
    )
    short = (
        adc.withColumn("__r__", F.row_number().over(w))
        .filter(F.col("__r__") <= shortlist)
        .select("query_id", "neighbor_id", "cell")
    )
    raw = catalog.read(cells_table).select(
        F.col(id_col).alias("neighbor_id"), "cell",
        F.col(vec_col).alias("__cvec__"),
    )
    qv = probe.select("query_id", "__qvec__").distinct()
    reranked = (
        short.join(raw, ["cell", "neighbor_id"])
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_similarity("__qvec__", "__cvec__"), 6
            ).alias("score"),
        )
    )
    return dedup_topk(reranked, k)
