"""Per-query build-vs-exec profiling (optimization guide §1).

For each named query: separately times (a) query construction —
``fn(spark, SF_DIR)``, i.e. driver-side expression building, bounded
collects, k-means fits — and (b) the noop-sink execution of the built
frame, min-of-N each, after one warm pass. Shows where a slow query's
wall-clock actually goes before any change is attempted.

Usage: python scripts/profile_build_exec.py q1 q2 ...
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from mydatalake_spark.caching import release, release_all  # noqa: E402
from mydatalake_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "3"))


def main():
    names = sys.argv[1:]
    spark = get_spark(
        app_name="profile-build-exec",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        # validate up front (ADVICE r14): a mistyped name mid-list must
        # not cost the partial results of the queries already profiled
        sys.exit(
            f"unknown query name(s): {', '.join(unknown)}\n"
            f"available: {', '.join(sorted(qs))}"
        )
    out = {}
    for name in names:
        fn = qs[name]
        # warm pass (codegen caches, parquet footers)
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        release(df)
        release_all()
        build = exec_ = total = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            release(df)
            release_all()
            b, e, t = t1 - t0, t2 - t1, t2 - t0
            build = b if build is None else min(build, b)
            exec_ = e if exec_ is None else min(exec_, e)
            total = t if total is None else min(total, t)
        out[name] = {
            "build_sec": round(build, 3),
            "exec_sec": round(exec_, 3),
            "total_sec": round(total, 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"all": out}), flush=True)


if __name__ == "__main__":
    main()
