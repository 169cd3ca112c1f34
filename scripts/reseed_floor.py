"""Re-seed ONE query's floor from a fresh LABELED measurement.

Usage: SPARK_GRAFT_RUN_LABEL=<label> python scripts/reseed_floor.py <query>

Exists for the r9 provenance hole (VERDICT r10 ask #2): a floor entry
whose `run` doesn't resolve to a bench_history archive has no evidence
behind it. This script measures the query with the bench protocol
(one warm pass, then min-of-3 back-to-back, release between reps),
DELETES the unbacked entry, seeds the new floor through bench.py's
labeled-write path, and archives the record — so the provenance chain
is whole again. Refuses to run unlabeled (the point is the label).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402


def main() -> None:
    if len(sys.argv) != 2:
        sys.exit("usage: reseed_floor.py <query_name>")
    name = sys.argv[1]
    if not bench._label_ok():
        sys.exit("refusing: set SPARK_GRAFT_RUN_LABEL to a real label")
    sf = bench.SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_num = float(sf) if sf.replace(".", "").isdigit() else sf

    import __spark_entry__ as entry_mod
    from mydatalake_spark.caching import release, release_all
    from mydatalake_spark.session import get_spark

    spark = get_spark(
        app_name="mydatalake-reseed",
        master=f"local[{bench.CPUS}]",
        shuffle_partitions=int(bench.CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = entry_mod.queries()[name]

    best = None
    for rep in range(4):  # rep 0 warms
        start = time.perf_counter()
        df = fn(spark, bench.SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - start, 3)
        release(df)
        release_all()
        if rep > 0:
            best = dt if best is None else min(best, dt)

    with open(bench.FLOORS_PATH) as fh:
        book = json.load(fh)
    dropped = book["floors"].pop(name, None)
    with open(bench.FLOORS_PATH, "w") as fh:
        json.dump(book, fh, indent=1)
        fh.write("\n")

    rep = bench._floor_report({name: best}, sf_num)
    line = json.dumps(
        {
            "metric": "reseed_floor_seconds",
            "value": best,
            "unit": "sec",
            "queries": {name: best},
            "floors": rep,
            "dropped_entry": dropped,
            "sf": sf_num,
        }
    )
    archive = bench._archive_run(line)
    print(line)
    print(f"archived: {archive}")


if __name__ == "__main__":
    main()
