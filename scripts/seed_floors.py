"""Seeder for bench_history/floors.json (VERDICT r7 ask #3).

Per-query best-known HONEST floor at sf0.1, with provenance.

HONESTY RULE, revised in r8: **no number from a pre-cache-fix run
seeds anything.** The r7 seeding admitted the interim (pre-fix) run
for queries whose own operators don't cache; r8 falsified that —
Spark's CacheManager matches cached plans by LOGICAL SUBTREE, so a
leaked cache from one query silently accelerates EVERY other query
sharing the subplan. Measured on `ewma_daily_revenue` (owns no cache;
shares its resample_daily subtree with `gapfill_nation_revenue`):
honest min-of-3 1.366 s, but 0.516 s with the shared subplan left
cached — at/below the 0.699 s interim "floor" that three rounds of
standalone A/Bs could never reproduce. The same mechanism explains
`join_size_estimate_orders` and `bloom_prune_lineitem` (BENCHNOTES_r8
§ask-2-closure). Post-fix runs are immune: `release_all()` runs
between queries.

Honest sources:
- `r7_builder_final.json` (first post-fix full run);
- the driver's `BENCH_r07.json` compact `slowest` values (post-fix
  code on the driver box);
- `r8_builder_run1.json` and every later archived run (bench.py also
  updates floors live on every sf0.1 run, labeled via
  SPARK_GRAFT_RUN_LABEL).
"""

from __future__ import annotations

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HIST = os.path.join(ROOT, "bench_history")

HONEST_RUNS = [
    ("r7_builder_final.json", "r7_builder_final"),
    ("r8_builder_run1.json", "r8_builder_run1"),
]


def main() -> None:
    floors: dict[str, dict] = {}

    def offer(name: str, sec: float, run: str) -> None:
        cur = floors.get(name)
        if cur is None or sec < cur["sec"]:
            floors[name] = {"sec": round(float(sec), 3), "run": run}

    for fname, label in HONEST_RUNS:
        path = os.path.join(HIST, fname)
        if not os.path.exists(path):
            continue
        with open(path) as fh:
            for q, s in json.load(fh)["queries"].items():
                offer(q, s, label)

    drv = os.path.join(ROOT, "BENCH_r07.json")
    if os.path.exists(drv):
        with open(drv) as fh:
            parsed = json.load(fh).get("parsed") or {}
        for q, s in (parsed.get("slowest") or {}).items():
            offer(q, s, "driver_r07")

    out = {
        "sf": 0.1,
        "note": (
            "best-known honest per-query seconds at sf0.1; maintained "
            "by bench.py (new floors rewritten with provenance). "
            "Seeded per scripts/seed_floors.py honesty rule — no "
            "pre-cache-fix numbers (see module docstring)."
        ),
        "floors": dict(sorted(floors.items())),
    }
    path = os.path.join(HIST, "floors.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=False)
        fh.write("\n")
    print(f"wrote {path}: {len(floors)} floors")


if __name__ == "__main__":
    main()
