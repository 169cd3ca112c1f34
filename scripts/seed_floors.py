"""One-shot seeder for bench_history/floors.json (VERDICT r7 ask #3).

Per-query best-known HONEST floor at sf0.1, with provenance. Honesty
rule (BENCHNOTES_r7.md): every run before the r7 cache-ownership fix
is flattered for the cache-adopting queries (shared leaked caches
across reps AND across same-subplan queries), so:

- `r7_builder_final.json` (post-fix) seeds every query;
- `r7_builder_leaky.json` (interim, pre-fix) seeds ONLY queries
  outside the tainted set below — for those its numbers are honest
  (no operator cache in the plan) and it is the r7 verdict's cited
  "interim floor" for the three unchanged-code regressions;
- the driver's `BENCH_r07.json` compact record contributes its
  top-10 `slowest` values (post-fix code on the driver box);
- runs r6 and earlier are never consulted.

Going forward `bench.py` maintains the file itself: any timed run at
the floors' sf that beats a floor rewrites it with provenance.
"""

from __future__ import annotations

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HIST = os.path.join(ROOT, "bench_history")

# Queries whose plans cache()-adopt an intermediate (shingle explode /
# embedding frames) — pre-fix numbers for these are flattered
# (BENCHNOTES_r7.md); identified there by operator family.
TAINTED_PREFIXES = (
    "canonical_by_quality",
    "neardup_clusters",
    "split_leakage",
    "minhash_calibration",
    "minhash_neardup",
    "ngram_jaccard",
    "pq_",
    "semantic_dedup",
    "quantized_",
    "winnow_",
    "fingerprint_",
    "dedup_summary",
)


def _tainted(name: str) -> bool:
    return name.startswith(TAINTED_PREFIXES)


def main() -> None:
    floors: dict[str, dict] = {}

    def offer(name: str, sec: float, run: str) -> None:
        cur = floors.get(name)
        if cur is None or sec < cur["sec"]:
            floors[name] = {"sec": round(float(sec), 3), "run": run}

    with open(os.path.join(HIST, "r7_builder_final.json")) as fh:
        for q, s in json.load(fh)["queries"].items():
            offer(q, s, "r7_builder_final")

    with open(os.path.join(HIST, "r7_builder_leaky.json")) as fh:
        for q, s in json.load(fh)["queries"].items():
            if not _tainted(q):
                offer(q, s, "r7_builder_interim")

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
            "Seeded per scripts/seed_floors.py honesty rule."
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
