"""Driver-prefix rotation schedule for the correctness gate.

The driver checks a PREFIX of the ``queries()`` registry each round
(observed budget: 50 rows). With 120+ entries, any fixed order leaves
entries stale for rounds — so the prefix ROTATES by freshness: entries
that have NEVER had a driver row come first, then entries whose last
green driver row is oldest. This module derives that order from the
CORRECTNESS_r*.json files themselves, so the schedule is computed, not
hand-maintained.

Usage:
  python scripts/rotation.py            # print freshness + suggested order
  python scripts/rotation.py --check    # exit 1 if the registry prefix
                                        #   is not freshness-sorted
  python scripts/rotation.py --table    # emit the COVERAGE.md table
  python scripts/rotation.py --budget-report
                                        # staleness vs registry size:
                                        #   how many rounds until every
                                        #   entry is driver-re-verified,
                                        #   and what adding N more
                                        #   queries would cost

The meta-test (tests/test_rotation.py) pins the --check invariant so a
registry edit that breaks rotation fails CI, and bounds worst-case
staleness given the budget.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PREFIX_BUDGET = 50   # observed driver rows per round

#: Snapshot of the prefix as the rotation actually computed it, written
#: by apply_rotation.py. check()'s round-boundary acceptance compares
#: the CURRENT prefix against this — freshness alone cannot tell "this
#: prefix was sorted when the driver checked it" from "an entry was
#: moved into the prefix after its round landed" (excluding the newest
#: round zeroes both), so the order at rotation time is recorded.
SNAPSHOT_PATH = os.path.join(REPO, ".rotation_prefix.json")


def write_snapshot(order: list[str]) -> None:
    """Record the prefix the rotation just computed (and the round
    history it was computed against)."""
    with open(SNAPSHOT_PATH, "w") as fh:
        json.dump(
            {
                "computed_against_round": newest_round(),
                "prefix": order[:PREFIX_BUDGET],
            },
            fh,
            indent=1,
        )
        fh.write("\n")


def load_snapshot() -> dict | None:
    """None iff the snapshot file is ABSENT (legacy state, accepted).
    A present-but-corrupt snapshot raises: the hardening must fail
    CLOSED — silently treating a truncated file as 'no snapshot'
    would re-open the masked-reorder hole with no warning."""
    if not os.path.exists(SNAPSHOT_PATH):
        return None
    try:
        snap = json.load(open(SNAPSHOT_PATH))
    except Exception as e:
        raise ValueError(
            f"corrupt rotation snapshot {SNAPSHOT_PATH}: {e}; "
            "re-run scripts/apply_rotation.py to regenerate it"
        ) from e
    if not isinstance(snap, dict) or not isinstance(
        snap.get("prefix"), list
    ):
        raise ValueError(
            f"malformed rotation snapshot {SNAPSHOT_PATH} "
            "(missing 'prefix' list); re-run scripts/apply_rotation.py"
        )
    return snap


def last_green_rounds(exclude_round: int | None = None) -> dict[str, int]:
    """query name → latest round with a fully green driver row
    (rows+schema+hash). Entries never checked are absent.
    ``exclude_round`` drops that round's file from the history — used by
    :func:`check` to evaluate the pre-boundary state (see below)."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if exclude_round is not None and rnd == exclude_round:
            continue
        try:
            data = json.load(open(path))
        except Exception:
            continue
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            if (
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
                and not rec.get("err")
            ):
                out[name] = max(out.get(name, 0), rnd)
    return out


def registry_names() -> list[str]:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    return list(entry._raw_queries().keys())


def newest_round() -> int:
    """Highest round number among the CORRECTNESS_r*.json files
    (0 if none exist)."""
    rounds = [
        int(m.group(1))
        for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", path))
    ]
    return max(rounds, default=0)


def freshness(
    names: list[str] | None = None,
    exclude_round: int | None = None,
) -> list[tuple[str, int]]:
    """(name, last_green_round) for every registry entry in registry
    order; 0 = never driver-checked."""
    greens = last_green_rounds(exclude_round=exclude_round)
    names = names if names is not None else registry_names()
    return [(n, greens.get(n, 0)) for n in names]


def suggested_order(names: list[str] | None = None) -> list[str]:
    """Freshness-sorted order: never-checked first, then oldest green;
    ties keep current registry order (stable sort)."""
    fresh = freshness(names)
    return [n for n, _ in sorted(fresh, key=lambda t: t[1])]


def _violations(
    fresh: list[tuple[str, int]], budget: int = PREFIX_BUDGET
) -> list[str]:
    """Raw rotation invariant on a freshness list: every entry in the
    driver prefix must be at least as stale as every entry outside it
    (never-checked = stalest)."""
    prefix, rest = fresh[:budget], fresh[budget:]
    if not rest:
        return []
    worst_inside = max(r for _, r in prefix)
    best_outside = min(r for _, r in rest)
    if worst_inside <= best_outside:
        return []
    stale_outside = sorted(
        [(n, r) for n, r in rest if r < worst_inside], key=lambda t: t[1]
    )
    return [
        f"{n} (last green r{r}) is outside the prefix while a "
        f"fresher entry (r{worst_inside}) is inside"
        for n, r in stale_outside
    ]


def check(
    budget: int = PREFIX_BUDGET,
    fresh: list[tuple[str, int]] | None = None,
    fresh_excl_newest: list[tuple[str, int]] | None = None,
    snapshot: dict | None = None,
) -> list[str]:
    """Round-boundary-aware rotation check.

    The invariant is evaluated twice when needed:

    1. On the full CORRECTNESS history. If it holds, OK.
    2. Otherwise, on the history EXCLUDING the newest round's file. The
       driver lands ``CORRECTNESS_r{N}.json`` *after* the builder's final
       commit, turning the just-checked prefix into the freshest entries
       — a state the rotation caused on purpose. If the prefix was
       freshness-sorted *before* that file landed AND the current prefix
       is the one the rotation actually computed (the
       ``.rotation_prefix.json`` snapshot), the boundary state is
       accepted.

    The snapshot comparison closes a masking hole in the exclusion
    heuristic alone: excluding round N zeroes an entry checked ONLY in
    round N, so a post-landing edit that moves a just-checked entry
    INTO the prefix (displacing a never-checked one) would look sorted
    under exclusion. Freshness cannot distinguish "was in the prefix
    when checked" from "moved in after being checked" — the recorded
    order at rotation time can.

    ``fresh`` / ``fresh_excl_newest`` / ``snapshot`` inject state for
    tests; with ``fresh`` injected and no snapshot, the snapshot arm is
    skipped (pure freshness-logic tests).
    """
    current = fresh if fresh is not None else freshness()
    full = _violations(current, budget)
    if not full:
        return []
    if fresh_excl_newest is None:
        nr = newest_round()
        if nr == 0:
            return full
        fresh_excl_newest = freshness(exclude_round=nr)
    if _violations(fresh_excl_newest, budget):
        return full
    if snapshot is None:
        if fresh is not None:
            return []  # injected freshness-only test: legacy behavior
        snapshot = load_snapshot()
        if snapshot is None:
            return []  # no snapshot recorded yet (pre-hardening state)
    snap_prefix = set(snapshot.get("prefix", []))
    cur_prefix = {n for n, _ in current[:budget]}
    if cur_prefix == snap_prefix:
        return []
    moved_in = sorted(cur_prefix - snap_prefix)
    moved_out = sorted(snap_prefix - cur_prefix)
    return full + [
        "prefix does not match the rotation snapshot "
        f"(.rotation_prefix.json): moved in {moved_in[:5]}, "
        f"moved out {moved_out[:5]} — re-run scripts/apply_rotation.py"
    ]


def coverage_table() -> str:
    fresh = freshness()
    lines = [
        "| # | query | last driver-green | next prefix |",
        "|---|---|---|---|",
    ]
    for i, (n, r) in enumerate(fresh):
        nxt = "next round" if i < PREFIX_BUDGET else (
            f"round +{(i // PREFIX_BUDGET)}"
        )
        lines.append(
            f"| {i + 1} | {n} | {'never' if r == 0 else f'r{r}'} | {nxt} |"
        )
    return "\n".join(lines)


def budget_report() -> str:
    """Staleness economics of the current registry size: the full
    re-verification cycle length, the freshness distribution, and the
    marginal cost of growing the registry — the number the round
    review asks for before adding breadth."""
    import math

    fresh = freshness()
    n = len(fresh)
    cycle = math.ceil(n / PREFIX_BUDGET)
    never = sum(1 for _, r in fresh if r == 0)
    rounds = sorted({r for _, r in fresh if r > 0})
    lines = [
        f"registry size:        {n}",
        f"driver prefix budget: {PREFIX_BUDGET} rows/round",
        f"full cycle:           {cycle} rounds "
        f"(worst-case driver staleness)",
        f"never driver-checked: {never}",
        "freshness distribution:",
    ]
    for r in rounds:
        k = sum(1 for _, rr in fresh if rr == r)
        lines.append(f"  last green r{r}: {k}")
    lines.append("marginal cost of growth:")
    for extra in (5, 10, 25, 50):
        lines.append(
            f"  +{extra} queries -> cycle "
            f"{math.ceil((n + extra) / PREFIX_BUDGET)} rounds"
        )
    lines.append(
        "(every entry stays verified every round by the full local gate; "
        "this is DRIVER-row staleness only)"
    )
    return "\n".join(lines)


if __name__ == "__main__":
    if "--budget-report" in sys.argv:
        print(budget_report())
        sys.exit(0)
    if "--check" in sys.argv:
        problems = check()
        for p in problems:
            print("VIOLATION:", p)
        print("rotation", "BROKEN" if problems else "OK")
        sys.exit(1 if problems else 0)
    if "--table" in sys.argv:
        print(coverage_table())
        sys.exit(0)
    for n, r in freshness():
        print(f"{'never' if r == 0 else f'r{r}':>6}  {n}")
    print("\nsuggested order:")
    for n in suggested_order():
        print(" ", n)
