"""Dump before/after `.explain("formatted")` plans for queries touched
in an optimization round, into plans/r<N>/<query>_{before,after}.txt.

"before" replays the query with the scan-spread opt-in disabled
(`_SPREAD_KEYS` emptied — byte-identical to the pre-r14 `_t`);
"after" is the current tree. Usage:

  python scripts/dump_opt_plans.py r14 query1 query2 ...
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
    tag, names = sys.argv[1], sys.argv[2:]
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(
        app_name="dump-opt-plans",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    full = dict(entry._SPREAD_KEYS)
    for name in names:
        fn = qs[name]
        for label, cfg in (("before", {}), ("after", full)):
            entry._SPREAD_KEYS.clear()
            entry._SPREAD_KEYS.update(cfg)
            df = fn(spark, SF_DIR)
            plan = formatted(spark, df)
            release(df)
            release_all()
            with open(os.path.join(outdir, f"{name}_{label}.txt"), "w") as f:
                f.write(plan + "\n")
        print(name, flush=True)
    entry._SPREAD_KEYS.clear()
    entry._SPREAD_KEYS.update(full)


if __name__ == "__main__":
    main()
