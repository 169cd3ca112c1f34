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
            # retries for the noisy losers only: a CPU-steal spike on
            # one big-side run must not fail the gate. TWO retries
            # (min-of-3 overall) since r12: deep in the full suite the
            # first retry inherits the same suite-position state
            # (lingering async cleanup after 600+ tests — the exact
            # effect BENCHNOTES_r6 measured on pagerank) and one
            # retry proved insufficient while the isolated run passed
            # with 3x margin.
            from mydatalake_spark.caching import release_all

            saved_queries = bench.SCALING_QUERIES
            still_bad = dict(violations)
            best_ratio = {
                name: c["time_ratio"] for name, c in violations.items()
            }
            try:
                for _attempt in range(2):
                    if not still_bad:
                        break
                    release_all()
                    bench.SCALING_QUERIES = list(still_bad)
                    retried = bench.bench_scaling(spark, qs)
                    for name in list(still_bad):
                        best_ratio[name] = min(
                            best_ratio[name],
                            retried[name]["time_ratio"],
                        )
                        if (
                            best_ratio[name]
                            < still_bad[name]["quadratic_bound"] / 3
                        ):
                            del still_bad[name]
            finally:
                bench.SCALING_QUERIES = saved_queries
            assert not still_bad, (
                "scaling curves regressed past quadratic_bound/3 "
                "(measured three times): "
                + str(
                    {
                        n: {
                            "best": best_ratio[n],
                            "bound": c["quadratic_bound"],
                        }
                        for n, c in still_bad.items()
                    }
                )
            )
    finally:
        bench.SF_DIR = saved_sf
