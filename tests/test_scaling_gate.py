"""Scaling-curve GATE (round-5 review ask #8): bench.py MEASURES the
two-point sf0.01→sf0.1 curves every round, but nothing failed if one
went quadratic — a regression would only surface as a number in
BENCH_r{N}.json someone had to read. This test makes it red.

Pass bar: ``time_ratio < quadratic_bound / 3`` per curve — today's
worst measured curve is t5.3 against a q100 bound (BENCH_r05), so the
bar has ~6× headroom for real curves while any genuinely quadratic
blow-up (t approaching q) overshoots it by 3×. Host noise guard: a
shared-microVM CPU-steal spike on the big-side sample inflates the
ratio, so violations get ONE re-measurement before failing (min of
the two samples — the same min-estimator bench.py uses).

Deselect with ``-m "not scaling"`` for quick iterations; the gate
skips cleanly where the sf0.1 fixture is absent.
"""

import importlib.util
import os

import pytest

SMALL = "/root/testdata/sf0.01"
BIG = "/root/testdata/sf0.1"

pytestmark = pytest.mark.scaling


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entry_for_scaling",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "__spark_entry__.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(
    not (os.path.isdir(SMALL) and os.path.isdir(BIG)),
    reason="sf0.01/sf0.1 testdata not available",
)
def test_scaling_curves_stay_subquadratic(spark):
    import bench

    qs = _entry().queries()
    saved_sf = bench.SF_DIR
    bench.SF_DIR = BIG
    try:
        curves = bench.bench_scaling(spark, qs)
        violations = {
            name: c
            for name, c in curves.items()
            if name != "rows"
            and c["time_ratio"] >= c["quadratic_bound"] / 3
        }
        if violations:
            # one retry for the noisy losers only: a CPU-steal spike
            # on one big-side run must not fail the gate
            saved_queries = bench.SCALING_QUERIES
            bench.SCALING_QUERIES = list(violations)
            try:
                retried = bench.bench_scaling(spark, qs)
            finally:
                bench.SCALING_QUERIES = saved_queries
            still_bad = {}
            for name, c in violations.items():
                r = retried[name]
                best = min(c["time_ratio"], r["time_ratio"])
                if best >= c["quadratic_bound"] / 3:
                    still_bad[name] = {
                        "first": c["time_ratio"],
                        "retry": r["time_ratio"],
                        "bound": c["quadratic_bound"],
                    }
            assert not still_bad, (
                "scaling curves regressed past quadratic_bound/3 "
                f"(measured twice): {still_bad}"
            )
    finally:
        bench.SF_DIR = saved_sf
