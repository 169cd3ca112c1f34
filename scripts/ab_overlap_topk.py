"""Interleaved A/B: two-thread overlap of similarity_topk's two
independent verification sides (VERDICT r14 ask #1; guide §2.6 —
actions are only sequential because driver code calls them
sequentially). Variant: persist the brute-force side and the LSH side,
materialize them from two driver threads (each side's chain of AQE
stage-jobs back-fills the other's tail), then full-outer join the two
cached 50-row frames exactly as the plain query does.

Checks rows identical first, then interleaved off/on timing.

Usage: python scripts/ab_overlap_topk.py
"""
from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mydatalake_spark.caching import adopt, release, release_all  # noqa: E402
from mydatalake_spark.session import get_spark  # noqa: E402
from mydatalake_spark.similarity.search import (  # noqa: E402
    brute_force_topk,
    lsh_topk,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))


def similarity_topk_overlap(spark, sf_dir):
    emb = entry._t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    bf = brute_force_topk(emb, q, k=5).select(
        "query_id", "neighbor_id", F.round("score", 4).alias("score")
    ).persist()
    lsh = lsh_topk(
        emb, q, dim=64, k=5, n_bands=32, bits_per_band=3
    ).select("query_id", "neighbor_id", F.lit(True).alias("in_lsh")).persist()

    def _fill(df):
        df.write.format("noop").mode("overwrite").save()

    with ThreadPoolExecutor(max_workers=2) as pool:
        fs = [pool.submit(_fill, d) for d in (bf, lsh)]
        for f in fs:
            f.result()
    out = bf.join(
        lsh, ["query_id", "neighbor_id"], "full_outer"
    ).select(
        "query_id",
        "neighbor_id",
        F.when(
            F.col("in_lsh").isNotNull() & F.col("score").isNotNull(),
            F.col("score"),
        ).otherwise(F.lit(-999.0)).alias("score"),
    )
    return adopt(out, bf, lsh)


def main():
    spark = get_spark(
        app_name="ab-overlap-topk",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")
    base_fn = entry.queries()["similarity_topk"]
    var_fn = similarity_topk_overlap

    def rows(fn):
        df = fn(spark, SF_DIR)
        got = sorted(map(tuple, df.collect()))
        release(df)
        release_all()
        return got

    assert rows(base_fn) == rows(var_fn), "overlap variant rows DIVERGED"
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
        "base": round(b, 3), "overlap": round(v, 3),
        "ratio": round(v / max(b, 1e-9), 3),
    }), flush=True)


if __name__ == "__main__":
    main()
