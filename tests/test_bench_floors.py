"""Floor-file protocol (VERDICT r7 ask #3): bench.py compares each
run to the persisted best-known honest per-query floors and maintains
the file, so round-over-round deltas compare floors, not single
samples on a shared box."""

import importlib.util
import json
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_floor_test", os.path.join(ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_floor_test"] = spec.loader.exec_module(mod) or mod
    floors = tmp_path / "floors.json"
    floors.write_text(json.dumps({
        "sf": 0.1,
        "floors": {
            "fast_q": {"sec": 1.0, "run": "seed"},
            "slow_q": {"sec": 2.0, "run": "seed"},
            "tiny_q": {"sec": 0.5, "run": "seed"},
        },
    }))
    monkeypatch.setattr(mod, "FLOORS_PATH", str(floors))
    monkeypatch.setattr(mod, "RUN_LABEL", "test_run")
    return mod, floors


def test_new_floor_rewrites_file_with_provenance(bench):
    mod, floors = bench
    rep = mod._floor_report({"fast_q": 0.8, "slow_q": 2.1}, 0.1)
    assert rep["new_floors"] == {"fast_q": [0.8, 1.0]}
    book = json.loads(floors.read_text())
    assert book["floors"]["fast_q"] == {"sec": 0.8, "run": "test_run"}
    assert book["floors"]["slow_q"] == {"sec": 2.0, "run": "seed"}


def test_above_floor_needs_ratio_and_absolute_margin(bench):
    mod, _ = bench
    # 1.25x: below the 1.3x ratio gate
    assert mod._floor_report({"fast_q": 1.25}, 0.1)["above_floor_1p3x"] == {}
    # 1.4x but only +0.2s absolute: sub-noise, not reported
    assert mod._floor_report({"tiny_q": 0.7}, 0.1)["above_floor_1p3x"] == {}
    # both gates cleared: reported with [sec, floor, ratio]
    rep = mod._floor_report({"slow_q": 2.9}, 0.1)
    assert rep["above_floor_1p3x"] == {"slow_q": [2.9, 2.0, 1.45]}


def test_unknown_query_seeds_floor(bench):
    mod, floors = bench
    rep = mod._floor_report({"brand_new": 3.0}, 0.1)
    assert rep["new_floors"]["brand_new"] == [3.0, None]
    assert json.loads(floors.read_text())["floors"]["brand_new"]["sec"] == 3.0


def test_sf_mismatch_is_inert(bench):
    mod, floors = bench
    before = floors.read_text()
    assert mod._floor_report({"fast_q": 0.1}, 0.001) is None
    assert floors.read_text() == before


def test_repo_floors_file_is_valid_and_covers_headline():
    with open(os.path.join(ROOT, "bench_history", "floors.json")) as fh:
        book = json.load(fh)
    assert book["sf"] == 0.1
    spec = importlib.util.spec_from_file_location(
        "bench_floor_check", os.path.join(ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # every headline query has a floor (the r8 final run seeded the
    # round's additions; a new query's first sf0.1 run seeds its own)
    missing = [q for q in mod.HEADLINE if q not in book["floors"]]
    assert not missing, missing
    for q, v in book["floors"].items():
        assert v["sec"] > 0 and isinstance(v["run"], str), (q, v)


def test_unlabeled_run_never_writes_floors(bench, monkeypatch):
    """VERDICT r9 ask #2: floor WRITES are gated on a labeled run, the
    same guard as _archive_run — an unlabeled run still gets the full
    comparison report but floors.json is byte-identical afterwards, so
    provenance can never cite 'unlabeled_run' again."""
    mod, floors = bench
    monkeypatch.setattr(mod, "RUN_LABEL", "unlabeled_run")
    before = floors.read_text()
    rep = mod._floor_report({"fast_q": 0.8, "brand_new": 3.0}, 0.1)
    # the report still shows the would-be floors and the persist flag
    assert rep["new_floors"] == {"fast_q": [0.8, 1.0], "brand_new": [3.0, None]}
    assert rep["floors_persisted"] is False
    assert floors.read_text() == before
    # reserved/unsafe labels are equally gated
    for label in ("floors", "../escape", "a/b"):
        monkeypatch.setattr(mod, "RUN_LABEL", label)
        assert mod._floor_report({"fast_q": 0.7}, 0.1)["floors_persisted"] is False
        assert floors.read_text() == before


def test_labeled_run_persists_and_reports_flag(bench):
    mod, floors = bench
    rep = mod._floor_report({"fast_q": 0.8}, 0.1)
    assert rep["floors_persisted"] is True
    assert json.loads(floors.read_text())["floors"]["fast_q"]["run"] == "test_run"


def test_repo_floor_provenance_resolves_to_archives():
    """Every floors.json entry's run label must resolve to an existing
    bench_history archive ({label}.json or a collision-suffixed
    {label}.N.json) — 'mins with provenance' means the evidence chain
    is on disk (VERDICT r9 ask #2 done-criterion)."""
    import glob

    hist = os.path.join(ROOT, "bench_history")
    with open(os.path.join(hist, "floors.json")) as fh:
        book = json.load(fh)
    unresolved = []
    for q, v in book["floors"].items():
        label = v["run"]
        if not (
            os.path.exists(os.path.join(hist, f"{label}.json"))
            or glob.glob(os.path.join(hist, f"{label}.[0-9]*.json"))
        ):
            unresolved.append((q, label))
    assert not unresolved, unresolved


def test_malformed_floor_entry_reports_error(bench):
    mod, floors = bench
    floors.write_text('{"sf": 0.1, "floors": {"q1": 1.2}}')
    rep = mod._floor_report({"q1": 2.0}, 0.1)
    assert rep is not None and "error" in rep
    assert "TypeError" in rep["error"] or "KeyError" in rep["error"]


def _mk_timings(n):
    return {f"query_with_a_fairly_long_name_{i:03d}": 1.234 + i * 0.01
            for i in range(n)}


def test_compact_record_parses_and_fits_budget(bench):
    """VERDICT r8 ask #1: BENCH_r08.json had parsed=null because the
    compact line outgrew the driver's 2000-char tail capture. The
    compact record must stay parseable and under the hard budget even
    with a full-size suite and every optional section populated."""
    mod, _ = bench
    timings = _mk_timings(150)
    floors = {
        "suite_floor_sec": 129.3,
        "n_new_floors": 40,
        "new_floors": {k: [1.0, 2.0] for k in list(timings)[:40]},
        "above_floor_1p3x": {
            k: [2.0, 1.0, 2.0] for k in list(timings)[:20]
        },
    }
    skew = {
        "plain_sec": 2.9, "salted_sec": 1.4,
        "plain_max_over_mean": 15.4, "salted_max_over_mean": 3.73,
    }
    tax = {
        f"operator_family_name_{i}": {
            "native": 1.1, "portable": 3.3, "portable_tax": 3.0
        }
        for i in range(8)
    }
    line = mod.build_compact_record(
        187.654, timings, floors, skew, tax, 0.1
    )
    assert len(line.encode()) <= mod.COMPACT_BUDGET_BYTES
    rec = json.loads(line)
    assert rec["metric"] == "headline_suite_seconds"
    assert rec["value"] == 187.654
    assert rec["n_queries"] == 150
    assert rec["compact"] is True
    assert rec["floors"]["suite_floor_sec"] == 129.3
    assert rec["floors"]["n_above_floor"] == 20
    # top-3 above-floor and hash-tax ratios ride when they fit
    assert len(rec.get("above_floor_top3", {})) <= 3
    if "hash_tax_ratio" in rec:
        assert all(isinstance(v, float) for v in rec["hash_tax_ratio"].values())


def test_compact_record_degrades_under_budget(bench, monkeypatch):
    """With an absurdly small budget the record drops optional
    sections (least-valuable first) but keeps the core fields."""
    mod, _ = bench
    monkeypatch.setattr(mod, "COMPACT_BUDGET_BYTES", 300)
    line = mod.build_compact_record(
        10.0, _mk_timings(5),
        {"suite_floor_sec": 9.0, "n_new_floors": 1, "new_floors": {},
         "above_floor_1p3x": {"q": [2.0, 1.0, 2.0]}},
        {"plain_max_over_mean": 15.0, "salted_max_over_mean": 3.0},
        {"op": {"portable_tax": 2.0}}, 0.1,
    )
    assert len(line.encode()) <= 300
    rec = json.loads(line)
    assert rec["value"] == 10.0 and rec["floors"]["n_new_floors"] == 1
    assert "slowest3" not in rec  # first to be dropped


def test_compact_record_surfaces_floor_error(bench):
    mod, _ = bench
    rec = json.loads(mod.build_compact_record(
        1.0, {"q": 1.0}, {"error": "KeyError: sec"}, None, None, 0.1))
    assert rec["floors"] == {"error": "KeyError: sec"}


def test_compact_record_carries_archive_pointer(bench):
    """r15 (VERDICT r14 ask #2): the compact line names the
    self-archived full record so per-query seconds are traceable from
    the driver's captured tail; unlabeled runs (no archive) omit it."""
    mod, _ = bench
    rec = json.loads(mod.build_compact_record(
        1.0, {"q": 1.0}, None, None, None, 0.1,
        archived="bench_history/r15_some_run.json"))
    assert rec["archived"] == "bench_history/r15_some_run.json"
    rec = json.loads(mod.build_compact_record(
        1.0, {"q": 1.0}, None, None, None, 0.1))
    assert "archived" not in rec


def test_archive_never_overwrites_existing_label(bench, tmp_path):
    """ADVICE r8: rerunning with a used label must not clobber the
    archived run that floors.json provenance points at."""
    mod, _ = bench
    p1 = mod._archive_run('{"original": true}')
    p2 = mod._archive_run('{"second": true}')
    p3 = mod._archive_run('{"third": true}')
    assert p1 == str(tmp_path / "test_run.json")
    assert p2 == str(tmp_path / "test_run.2.json")
    assert p3 == str(tmp_path / "test_run.3.json")
    assert json.loads(open(p1).read()) == {"original": True}
    assert json.loads(open(p2).read()) == {"second": True}


def test_archive_refuses_unsafe_or_reserved_labels(bench, monkeypatch):
    mod, _ = bench
    for label in ("unlabeled_run", "floors", "../escape", "a/b"):
        monkeypatch.setattr(mod, "RUN_LABEL", label)
        assert mod._archive_run("{}") is None


def test_calibration_anchors_pinned():
    """Host-phase calibration (VERDICT r11 ask #1): phase_factor is
    only meaningful if the anchor queries never change, so their
    source is hash-pinned. If this test fails you edited an anchor:
    either revert, or re-seed EVERY CALIBRATION_REF on a quiet box,
    update these hashes, and note the basis change in BENCHNOTES.
    (merge_bloom_orders also leans on library merge/bloom code — the
    pin covers the entry plan; treat library-level rewrites of that
    path as a basis change too.)"""
    import hashlib
    import inspect

    spec = importlib.util.spec_from_file_location(
        "entry_cal_pin", os.path.join(ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    pinned = {
        "forecast_backtest_revenue": "7e5e92d0679365f7",
        "q1_pricing_summary": "bfb5919d6b820324",
        "window_functions_lineitem": "2bd2938383b9e3a7",
        "merge_bloom_orders": "ee03e0753f4ec1fd",
        # shuffle-heavy axis anchor (VERDICT r12 ask #4); also leans
        # on operators/neardup.py minhash/band code — treat library
        # rewrites of that path as a basis change
        "incremental_neardup_documents": "7d28d87c27205177",
    }
    spec_b = importlib.util.spec_from_file_location(
        "bench_cal_pin", os.path.join(ROOT, "bench.py")
    )
    bench_mod = importlib.util.module_from_spec(spec_b)
    spec_b.loader.exec_module(bench_mod)
    assert set(bench_mod.CALIBRATION_REF) == set(pinned)
    for name, want in pinned.items():
        src = inspect.getsource(getattr(mod, name))
        got = hashlib.sha256(src.encode()).hexdigest()[:16]
        assert got == want, f"calibration anchor {name} changed"
        # every anchor must ride the timed HEADLINE pass (zero-cost)
        assert name in bench_mod.HEADLINE


def test_phase_factor_median_and_normalized_floors(bench):
    mod, _ = bench
    refs = dict(mod.CALIBRATION_REF)
    anchors = list(refs)
    # box running everything at ~3x its reference phase
    timings = {q: refs[q] * 3.0 for q in anchors}
    phase = mod._phase_factor(timings, 0.1)
    assert phase is not None and abs(phase["factor"] - 3.0) < 0.01
    # off the calibrated SF: no phase call
    assert mod._phase_factor(timings, 0.01) is None
    # <3 anchors present: no phase call
    assert mod._phase_factor({anchors[0]: 1.0}, 0.1) is None
    # normalized floors: slow_q at 6.0s vs floor 2.0 is 3x raw (above)
    # but AT floor once divided by the 3x phase -> norm set is empty
    rep = mod._floor_report({"slow_q": 6.0}, 0.1, phase)
    assert rep["above_floor_1p3x"] == {"slow_q": [6.0, 2.0, 3.0]}
    assert rep["phase_factor"] == 3.0
    assert rep["above_floor_1p3x_norm"] == {}
    # a genuine 2x regression ON TOP of the phase survives normalization
    rep = mod._floor_report({"slow_q": 12.0}, 0.1, phase)
    assert rep["above_floor_1p3x_norm"] == {"slow_q": [4.0, 2.0, 2.0]}
    # fast phase (pf < 1) is clamped: never excuses an above-floor
    fast = {"factor": 0.5, "ratios": {}}
    rep = mod._floor_report({"slow_q": 2.9}, 0.1, fast)
    assert rep["above_floor_1p3x_norm"] == {"slow_q": [2.9, 2.0, 1.45]}


def test_compact_record_carries_phase(bench):
    mod, _ = bench
    phase = {"factor": 2.5, "ratios": {}}
    floors = mod._floor_report({"slow_q": 6.0}, 0.1, phase)
    line = mod.build_compact_record(6.0, {"slow_q": 6.0}, floors,
                                    None, None, 0.1)
    rec = json.loads(line)
    assert rec["phase_factor"] == 2.5
    assert rec["floors"]["n_above_floor"] == 1
    assert rec["floors"]["n_above_floor_norm"] == 0
