"""Connected components / duplicate-cluster resolution."""

import pytest

from mydatalake_spark.operators.clusters import (
    connected_components,
    dedup_clusters,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_cc_chain_and_island(spark):
    # chain 1-2-3-4 (diameter 3, needs >1 iteration) + island 10-11
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    got = {r.node: r.component
           for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cc_star_and_cycle(spark):
    edges = _edges(spark, [(5, 1), (5, 2), (5, 3), (7, 8), (8, 9), (9, 7)])
    got = {r.node: r.component
           for r in connected_components(edges).collect()}
    assert got == {5: 1, 1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 9: 7}


def test_cc_nonconvergence_raises(spark):
    edges = _edges(spark, [(1, 2), (2, 3)])
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, max_iters=0)


def test_dedup_clusters_keep_flags(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (20, "solo")],
        "doc_id long, text string",
    )
    pairs = _edges(spark, [(1, 2), (2, 3)])
    got = {r.doc_id: (r.cluster_id, r.keep)
           for r in dedup_clusters(docs, pairs).collect()}
    assert got == {
        1: (1, True),      # cluster survivor
        2: (1, False),
        3: (1, False),
        20: (20, True),    # singleton keeps itself
    }
