"""Dump `.explain("formatted")` plans for named queries from the
CURRENT tree into plans/r15/<query>_<suffix>.txt.

Round-15 usage: run with suffix ``before`` at round start (inherited
tree), then ``after`` once a change lands — the pair is the judge's
plan-diff evidence. Queries whose change is driver-side scheduling
only (thread overlap) have no plan diff and get no files.

  python scripts/dump_r15_plans.py before query1 query2 ...
  python scripts/dump_r15_plans.py after  query1 query2 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from mydatalake_spark.caching import release, release_all  # noqa: E402
from mydatalake_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def formatted(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    suffix, names = sys.argv[1], sys.argv[2:]
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15",
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(
        app_name="dump-r15-plans",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(formatted(spark, df))
        release(df)
        release_all()
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
