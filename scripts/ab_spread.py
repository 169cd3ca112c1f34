"""Isolated A/B of the r14 scan-spread change, per query.

For each named query, times min-of-N back-to-back noop-sink runs
under each spread configuration (bench.py methodology), interleaving
configurations A/B/A/B so host phase drift hits both sides equally.

Usage:
  python scripts/ab_spread.py q1 q2 ...          # spread-all vs spread-none
  SPARK_GRAFT_AB_TABLES=documents python ...     # custom "on" config
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
REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))

FULL_SPREAD = dict(entry._SPREAD_KEYS)
on_tables = os.environ.get("SPARK_GRAFT_AB_TABLES")
ON = (
    {t: FULL_SPREAD[t] for t in on_tables.split(",")}
    if on_tables
    else FULL_SPREAD
)


def timed(spark, fn, reps):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        release(df)
        release_all()
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main():
    names = sys.argv[1:]
    spark = get_spark(
        app_name="ab-spread",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out = {}
    for name in names:
        fn = qs[name]
        # warm both configs once (codegen, footer caches)
        for cfg in (ON, {}):
            entry._SPREAD_KEYS.clear()
            entry._SPREAD_KEYS.update(cfg)
            timed(spark, fn, 1)
        res = {}
        # interleave: on,off,on,off,... taking min per side
        for lbl, cfg in (("on", ON), ("off", {})):
            res[lbl] = None
        for _ in range(REPS):
            for lbl, cfg in (("on", ON), ("off", {})):
                entry._SPREAD_KEYS.clear()
                entry._SPREAD_KEYS.update(cfg)
                t = timed(spark, fn, 1)
                res[lbl] = t if res[lbl] is None else min(res[lbl], t)
        out[name] = {
            **res,
            "ratio_on_off": round(res["on"] / max(res["off"], 1e-3), 2),
        }
        print(json.dumps({name: out[name]}), flush=True)
    entry._SPREAD_KEYS.clear()
    entry._SPREAD_KEYS.update(FULL_SPREAD)
    print(json.dumps({"all": out}), flush=True)


if __name__ == "__main__":
    main()
