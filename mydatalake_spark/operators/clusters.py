"""Duplicate-cluster resolution: near-dup PAIRS → connected
components → one canonical document per cluster.

[extension] The missing last step of every dedup pipeline (no
reference analogue): pair lists (minhash/winnow/cosine verify output)
say "A≈B, B≈C" — retention decisions need the transitive closure
{A,B,C} and a deterministic survivor. Component id = MIN doc id in
the component, so the labeling is a pure fixpoint — deterministic
under any execution order, which is what makes a SQL (recursive CTE)
oracle possible.

Scale notes: min-label propagation is the Pregel/GraphX CC algorithm
expressed in DataFrames — per iteration one join edges⋈labels and one
min-aggregate, both hash-shuffles on node id. Iterations needed =
component diameter, and near-dup clusters are shallow (pairs come
from a similarity threshold, so components are dense — diameter 2-4
in practice). Each iteration's result is persisted and the previous
unpersisted, so lineage stays O(1) instead of growing per iteration
(the classic iterative-Spark pitfall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the smallest node id reachable from the node.

    Driver-coordinated fixpoint loop (bounded by ``max_iters``,
    raises if not converged — a similarity graph needing >25 rounds
    means the threshold is connecting everything and dedup semantics
    are broken anyway).
    """
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    ).distinct().persist()

    labels = sym.groupBy("u").agg(
        F.least(F.min("v"), F.col("u")).alias("component")
    ).persist()
    labels.count()

    for _ in range(max_iters):
        # new label = min(own, min over neighbors' labels)
        neighbor_min = (
            sym.join(
                labels.select(
                    F.col("u").alias("v"),
                    F.col("component").alias("nbr_label"),
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("nbr_label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
            )
            .persist()
        )
        # LIMIT-1 probe: proving convergence still scans everything,
        # but a NOT-converged round stops at the first changed label
        # instead of counting them all.
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            sym.unpersist()
            return labels.select(F.col("u").alias("node"), "component")

    sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} "
        "iterations — the similarity threshold is connecting "
        "everything (giant component); raise the threshold."
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Full dedup decision table: every document labeled with its
    duplicate-cluster id (its own id when it has no near-dups) and a
    deterministic ``keep`` flag (the cluster's min id survives).
    Filtering ``keep`` yields the deduplicated corpus; the rest is
    the removal manifest."""
    cc = connected_components(pairs, src=src, dst=dst)
    return docs.join(
        cc, docs[id_col] == cc["node"], "left"
    ).select(
        docs[id_col],
        F.coalesce(cc["component"], docs[id_col]).alias("cluster_id"),
        (
            F.coalesce(cc["component"], docs[id_col]) == docs[id_col]
        ).alias("keep"),
    )
