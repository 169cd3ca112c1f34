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
    _argmax_cell,
    _centroid_scores_expr,
    _train_spherical_kmeans,
    cosine_similarity,
    dedup_topk,
)


def _names(name: str) -> tuple[str, str]:
    return f"{name}_centroids", f"{name}_cells"


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
) -> None:
    """Train the quantizer on a bounded sample, assign every corpus
    vector to its nearest centroid JVM-side (argmax over centroid
    dots — one scan, no UDF), and persist both tables. The cells
    table is partitioned by cell id."""
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
    assigned = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        _argmax_cell(scores(vec_col)).alias("cell"),
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
    assigned = new_vectors.select(
        F.col(id_col),
        F.col(vec_col),
        _argmax_cell(scores(vec_col)).alias("cell"),
    ).cache()
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
