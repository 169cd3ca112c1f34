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


def test_malformed_floor_entry_reports_error(bench):
    mod, floors = bench
    floors.write_text('{"sf": 0.1, "floors": {"q1": 1.2}}')
    rep = mod._floor_report({"q1": 2.0}, 0.1)
    assert rep is not None and "error" in rep
    assert "TypeError" in rep["error"] or "KeyError" in rep["error"]
