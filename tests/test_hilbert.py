"""Hilbert curve for multi-column CLUSTER BY (liquid clustering's
space-filling curve; legacy ZORDER keeps Morton).

operators/layout.py:hilbert_transpose implements Skilling's
AxesToTranspose (2004) as bits-level unrolled integer column
arithmetic — no UDF, no shuffle — and hilbert_key interleaves the
transposed words MSB-first. The curve is pinned EXHAUSTIVELY against
an independent pure-Python implementation: bijection over the whole
grid and the unit-step property (consecutive indices are always grid
neighbors — the locality guarantee Morton lacks at quadrant seams)."""

import pytest
from pyspark.sql import functions as F

from mydatalake_spark.operators.layout import hilbert_key, zorder_key


def _axes_to_transpose(X, b, n):
    X = list(X)
    M = 1 << (b - 1)
    Q = M
    while Q > 1:
        P = Q - 1
        for i in range(n):
            if X[i] & Q:
                X[0] ^= P
            else:
                t = (X[0] ^ X[i]) & P
                X[0] ^= t
                X[i] ^= t
        Q >>= 1
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = 0
    Q = M
    while Q > 1:
        if X[n - 1] & Q:
            t ^= Q - 1
        Q >>= 1
    return [x ^ t for x in X]


def _ref_index(pt, b):
    n = len(pt)
    X = _axes_to_transpose(pt, b, n)
    h = 0
    for j in range(b - 1, -1, -1):
        for i in range(n):
            h = (h << 1) | ((X[i] >> j) & 1)
    return h


@pytest.mark.parametrize(
    "bits,n_dims", [(3, 2), (2, 3)]
)
def test_hilbert_key_matches_reference_exhaustively(
    spark, bits, n_dims
):
    side = 1 << bits
    pts = [
        tuple((v // side**i) % side for i in range(n_dims))
        for v in range(side**n_dims)
    ]
    cols = [f"c{i}" for i in range(n_dims)]
    df = spark.createDataFrame(
        pts, ", ".join(f"{c} long" for c in cols)
    )
    got = {
        tuple(r[c] for c in cols): r["__hilbert__"]
        for r in hilbert_key(df, cols, bits=bits).collect()
    }
    ref = {p: _ref_index(list(p), bits) for p in pts}
    assert got == ref
    # the reference itself is a bijection with unit steps — i.e. a
    # true Hilbert curve, not just any consistent pair of functions
    inv = {v: k for k, v in ref.items()}
    assert sorted(inv) == list(range(side**n_dims))
    for i in range(side**n_dims - 1):
        step = sum(abs(a - b) for a, b in zip(inv[i], inv[i + 1]))
        assert step == 1, (i, inv[i], inv[i + 1])


def test_hilbert_key_is_pure_column_arithmetic(spark):
    # no UDF, no shuffle: the whole transform is projections over the
    # input — BatchEvalPython/ArrowEvalPython and Exchange must be
    # absent from the plan
    df = spark.range(100).select(
        (F.col("id") % 10).alias("x"), (F.col("id") % 7).alias("y")
    )
    out = hilbert_key(df, ["x", "y"], bits=3)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = out._jdf.queryExecution().explainString(mode)
    assert "EvalPython" not in plan
    assert "Exchange" not in plan


def test_hilbert_locality_beats_morton_on_seams(spark):
    # the classic Z-curve defect: crossing the main quadrant seam
    # jumps across half the grid. Measure the max coordinate jump
    # between consecutive curve positions — Hilbert's is 1 by
    # construction, Morton's grows with the grid.
    bits, side = 4, 16
    pts = [(x, y) for x in range(side) for y in range(side)]
    df = spark.createDataFrame(pts, "x long, y long")
    h = {
        r["__hilbert__"]: (r["x"], r["y"])
        for r in hilbert_key(df, ["x", "y"], bits=bits).collect()
    }
    z = {
        r["z"]: (r["x"], r["y"])
        for r in df.select(
            "x", "y", zorder_key(["x", "y"], bits=bits).alias("z")
        ).collect()
    }
    def max_jump(curve):
        ks = sorted(curve)
        return max(
            sum(abs(a - b) for a, b in zip(curve[i], curve[j]))
            for i, j in zip(ks, ks[1:])
        )
    assert max_jump(h) == 1
    assert max_jump(z) > 1
