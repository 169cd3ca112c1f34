"""Interleaved A/B: pagerank per-iteration completeness-join fold for
symmetric graphs (VERDICT r14 ask #1, second half; guide §2.4 — remove
shuffles outright / §1.2 fewer passes).

In a SYMMETRIC edge list every node has both in- and out-edges, so the
per-iteration ``nodes LEFT JOIN contrib`` completeness join (there to
give in-edge-less nodes their teleport mass) is a no-op by
construction: ``contrib``'s groupBy(dst) already enumerates every
node. The variant drops that join for ``symmetric=True`` — one fewer
equi-join + exchange per iteration (3 at iters=3) — and attaches the
broadcast N row directly to ``contrib``. Arithmetic per node is
unchanged: (1-d)/N + d*in — bit-identical ranks.

Usage: python scripts/ab_pagerank_fold.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mydatalake_spark.caching import adopt, release, release_all  # noqa: E402
from mydatalake_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))


def pagerank_fold(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 3,
    round_to: int = 7,
) -> DataFrame:
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).persist()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__outdeg__"))
    e_deg = e.join(deg, "src").persist()
    nodes0 = deg.select(F.col("src").alias("node")).persist()
    n_row = nodes0.agg(F.count(F.lit(1)).alias("__n__"))

    d = float(damping)
    ranks = nodes0.crossJoin(F.broadcast(n_row)).select(
        "node", (F.lit(1.0) / F.col("__n__")).alias("rank")
    )
    for i in range(iters):
        contrib = (
            e_deg.join(ranks, e_deg.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("__outdeg__")).alias("__c__"),
            )
            .groupBy("node")
            .agg(F.sum("__c__").alias("__in__"))
        )
        ranks = contrib.crossJoin(F.broadcast(n_row)).select(
            "node",
            (
                F.lit(1.0 - d) / F.col("__n__")
                + F.lit(d) * F.col("__in__")
            ).alias("rank"),
        )
        if i < iters - 1 and (i + 1) % 8 == 0:
            ranks = ranks.localCheckpoint(eager=True)
    out = ranks.select("node", F.round("rank", round_to).alias("rank"))
    return adopt(out, e, nodes0, e_deg)


def pagerank_trade_graph_fold(spark, sf_dir):
    li = (
        entry._t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    orders = entry._t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("l_suppkey") * 2).alias("src"),
            (F.col("o_custkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = pairs.union(pairs.select(F.col("dst").alias("src"),
                                     F.col("src").alias("dst")))
    return pagerank_fold(edges, damping=0.85, iters=3, round_to=7)


def main():
    spark = get_spark(
        app_name="ab-pagerank-fold",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")
    base_fn = entry.queries()["pagerank_trade_graph"]
    var_fn = pagerank_trade_graph_fold

    def rows(fn):
        df = fn(spark, SF_DIR)
        got = sorted(map(tuple, df.collect()))
        release(df)
        release_all()
        return got

    assert rows(base_fn) == rows(var_fn), "fold variant ranks DIVERGED"
    print("rows identical", flush=True)

    def timed(fn):
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        release(df)
        release_all()
        return dt

    timed(base_fn)
    timed(var_fn)
    b = v = None
    for _ in range(REPS):
        bb = timed(base_fn)
        vv = timed(var_fn)
        b = bb if b is None else min(b, bb)
        v = vv if v is None else min(v, vv)
    print(json.dumps({
        "base": round(b, 3), "fold": round(v, 3),
        "ratio": round(v / max(b, 1e-9), 3),
    }), flush=True)


if __name__ == "__main__":
    main()
