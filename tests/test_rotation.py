"""Meta-test pinning the driver-prefix rotation invariant.

The driver checks the first PREFIX_BUDGET registry entries per round;
freshness rotation (scripts/rotation.py) guarantees no entry goes
unchecked longer than ceil(len(registry)/budget) rounds — but only if
the registry order actually IS freshness-sorted. Pin it.
"""

import math
import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
    ),
)

import rotation  # noqa: E402


def test_registry_prefix_is_freshness_sorted():
    violations = rotation.check()
    assert not violations, (
        "registry order is stale — regenerate with "
        "`python scripts/rotation.py` and paste the suggested order "
        f"into _raw_queries():\n" + "\n".join(violations)
    )


def _fresh(rounds):
    return [(f"q{i}", r) for i, r in enumerate(rounds)]


def test_check_accepts_round_boundary_state():
    """The driver lands CORRECTNESS_r{N}.json after the builder's final
    commit, making the just-checked prefix the freshest entries. If the
    prefix was freshness-sorted before that file landed, check() must
    accept (r5/r6 this was the only red test at judging time)."""
    # pre-boundary: prefix is the stale r3 entries, rest r4/r5 — sorted
    pre = _fresh([3, 3, 4, 5])
    # post-boundary: driver checked the 2-row prefix in r7
    post = _fresh([7, 7, 4, 5])
    assert rotation._violations(post, budget=2), "sanity: raw invariant trips"
    assert not rotation.check(
        budget=2, fresh=post, fresh_excl_newest=pre
    ), "boundary state (newest file on a sorted prefix) must be accepted"


def test_check_still_fails_genuinely_stale_prefix():
    """A prefix that was ALREADY unsorted before the newest round's file
    landed must fail both evaluations."""
    pre = _fresh([5, 5, 3, 4])     # fresh entries inside, stale outside
    post = _fresh([7, 7, 3, 4])    # newest round re-checked the same prefix
    assert rotation.check(budget=2, fresh=post, fresh_excl_newest=pre), (
        "an unsorted pre-boundary prefix must still be a violation"
    )


def test_check_passes_plain_sorted_state():
    fresh = _fresh([0, 3, 4, 5])
    assert not rotation.check(budget=2, fresh=fresh, fresh_excl_newest=fresh)


def test_worst_case_staleness_is_bounded():
    fresh = rotation.freshness()
    n = len(fresh)
    bound = math.ceil(n / rotation.PREFIX_BUDGET)
    # every checked entry's last green round must be within `bound`
    # rounds of the newest correctness file's round
    rounds = [r for _, r in fresh if r > 0]
    assert rounds, "no driver rows recorded yet"
    newest = max(rounds)
    too_stale = [
        (name, r)
        for name, r in fresh
        if 0 < r < newest - bound
    ]
    assert not too_stale, (
        f"entries staler than the {bound}-round rotation bound: "
        f"{too_stale}"
    )


def test_every_query_name_in_rotation_schedule_table():
    """COVERAGE.md's rotation table must list every registry entry."""
    cov_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "COVERAGE.md",
    )
    cov = open(cov_path).read()
    assert "## Driver-prefix rotation schedule" in cov
    missing = [n for n in rotation.registry_names() if n not in cov]
    assert not missing, missing


def test_boundary_acceptance_requires_snapshot_prefix_match():
    """The masking hole the snapshot closes: a post-landing edit that
    moves a just-checked entry INTO the prefix (displacing a stale one)
    looks sorted under round-exclusion — the moved entry's freshness
    zeroes out with its only round excluded. With the recorded
    rotation-time prefix, the reorder is caught; the genuine boundary
    state (prefix unchanged since rotation) still passes."""
    # rotation computed prefix = [q0, q1]; driver then checked it in r7
    snapshot = {"computed_against_round": 6, "prefix": ["q0", "q1"]}
    honest = [("q0", 7), ("q1", 7), ("q2", 4), ("q3", 5)]
    pre = [("q0", 3), ("q1", 3), ("q2", 4), ("q3", 5)]
    assert not rotation.check(
        budget=2, fresh=honest, fresh_excl_newest=pre, snapshot=snapshot
    )
    # masked reorder: the rotation computed prefix [q3, q1], the driver
    # checked q1 (and q0, outside) in r7, then q0 was moved INTO the
    # prefix displacing never-checked q3. Exclusion zeroes both r7-only
    # entries, so the post-edit prefix reads [0, 0] vs outside [4, 0] —
    # sorted, i.e. the freshness heuristic alone is blind to the swap.
    snapshot2 = {"computed_against_round": 6, "prefix": ["q3", "q1"]}
    reordered = [("q0", 7), ("q1", 7), ("q2", 4), ("q3", 0)]
    pre2 = [("q0", 0), ("q1", 0), ("q2", 4), ("q3", 0)]
    assert not rotation._violations(pre2, budget=2), (
        "sanity: this shape must be invisible to the exclusion arm"
    )
    violations = rotation.check(
        budget=2, fresh=reordered, fresh_excl_newest=pre2,
        snapshot=snapshot2,
    )
    assert violations and "snapshot" in violations[-1]
