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
