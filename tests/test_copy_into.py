"""COPY INTO (ingest.copy_into + the SQL head): file-level idempotent
batch loads that compose with Catalog.append's txn protocol — new
files load once, loaded files never reload, crashes converge."""

import json
import os

import pytest

from mydatalake_spark.catalog import Catalog
from mydatalake_spark.ingest import copy_into
from mydatalake_spark.plans.table_sql import (
    UnsupportedStatement,
    run_table_sql,
)

TBL = "bronze.ev.clicks"


def _write(path, rows):
    with open(path, "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in rows))


def _seed_table(spark, cat):
    df = spark.createDataFrame([(0, "seed")], "id int, kind string")
    cat.overwrite(df, TBL)


def test_copy_into_loads_only_new_files(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed_table(spark, cat)
    drop = tmp_path / "drop"
    drop.mkdir()
    _write(drop / "a.json", [{"id": 1, "kind": "x"}, {"id": 2, "kind": "y"}])
    _write(drop / "b.json", [{"id": 3, "kind": "z"}])
    assert copy_into(cat, TBL, str(drop)) == 3
    # re-run with nothing new: no-op
    assert copy_into(cat, TBL, str(drop)) == 0
    # a new file lands: only it loads
    _write(drop / "c.json", [{"id": 4, "kind": "w"}])
    assert copy_into(cat, TBL, str(drop)) == 1
    assert sorted(r.id for r in cat.read(TBL).collect()) == [0, 1, 2, 3, 4]
    # a MODIFIED already-loaded file stays skipped (Databricks rule)
    _write(drop / "a.json", [{"id": 99, "kind": "no"}])
    assert copy_into(cat, TBL, str(drop)) == 0
    assert 99 not in {r.id for r in cat.read(TBL).collect()}


def test_copy_into_crash_between_append_and_book_converges(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed_table(spark, cat)
    drop = tmp_path / "drop"
    drop.mkdir()
    _write(drop / "a.json", [{"id": 1, "kind": "x"}])
    assert copy_into(cat, TBL, str(drop)) == 1
    # forge the crash: the append txn landed but the file book did not
    book = os.path.join(cat._version_root(TBL), ".copy_into.json")
    os.remove(book)
    # replay: same new-file set → same txn → append no-ops, book heals
    assert copy_into(cat, TBL, str(drop)) == 0
    assert sorted(r.id for r in cat.read(TBL).collect()) == [0, 1]
    assert os.path.exists(book)


def test_copy_into_crash_replay_pins_txn_despite_new_files(spark, tmp_path):
    # ADVICE r11: a crash after the append committed but before the
    # book update must NOT re-digest the (now larger) new-file set —
    # the pending record pins the crashed batch's exact (txn, files).
    import hashlib

    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed_table(spark, cat)
    drop = tmp_path / "drop"
    drop.mkdir()
    a = drop / "a.json"
    _write(a, [{"id": 1, "kind": "x"}])
    assert copy_into(cat, TBL, str(drop)) == 1
    vroot = cat._version_root(TBL)
    # forge the crash: append txn committed, book + pending rolled back
    os.remove(os.path.join(vroot, ".copy_into.json"))
    txn = "copyinto-" + hashlib.md5(
        os.path.abspath(str(a)).encode()
    ).hexdigest()[:16]
    with open(os.path.join(vroot, ".copy_into.pending.json"), "w") as fh:
        json.dump(
            {"txn": txn, "files": {os.path.abspath(str(a)): [a.stat().st_size]}},
            fh,
        )
    # a NEW file lands before the retry — the old bug minted a fresh
    # txn over {a, b} and appended a's rows a second time
    _write(drop / "b.json", [{"id": 2, "kind": "y"}])
    assert copy_into(cat, TBL, str(drop)) == 1  # only b's row is new
    assert sorted(r.id for r in cat.read(TBL).collect()) == [0, 1, 2]
    assert not os.path.exists(
        os.path.join(vroot, ".copy_into.pending.json")
    )


def test_copy_into_crash_before_append_replays_pending(spark, tmp_path):
    # crash BEFORE the append committed: the pending batch replays
    # under its pinned txn and actually loads the rows
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed_table(spark, cat)
    drop = tmp_path / "drop"
    drop.mkdir()
    a = drop / "a.json"
    _write(a, [{"id": 1, "kind": "x"}])
    vroot = cat._version_root(TBL)
    os.makedirs(vroot, exist_ok=True)
    with open(os.path.join(vroot, ".copy_into.pending.json"), "w") as fh:
        json.dump(
            {
                "txn": "copyinto-forged0000000000",
                "files": {os.path.abspath(str(a)): [a.stat().st_size]},
            },
            fh,
        )
    _write(drop / "b.json", [{"id": 2, "kind": "y"}])
    assert copy_into(cat, TBL, str(drop)) == 2  # pinned a + fresh b
    assert sorted(r.id for r in cat.read(TBL).collect()) == [0, 1, 2]
    # idempotent thereafter
    assert copy_into(cat, TBL, str(drop)) == 0


def test_copy_into_glob_matching_directory_expands(spark, tmp_path):
    # ADVICE r11: a glob like 'landing/*' can match a DIRECTORY; the
    # old code booked the directory path itself, permanently skipping
    # files added inside it later
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed_table(spark, cat)
    day1 = tmp_path / "drop" / "day1"
    day1.mkdir(parents=True)
    _write(day1 / "a.json", [{"id": 1, "kind": "x"}])
    pat = str(tmp_path / "drop" / "*")
    assert copy_into(cat, TBL, pat) == 1
    # a file lands INSIDE the already-matched directory
    _write(day1 / "b.json", [{"id": 2, "kind": "y"}])
    assert copy_into(cat, TBL, pat) == 1
    assert sorted(r.id for r in cat.read(TBL).collect()) == [0, 1, 2]


def test_copy_into_sql_head_and_refusals(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed_table(spark, cat)
    drop = tmp_path / "drop"
    drop.mkdir()
    _write(drop / "a.json", [{"id": 7, "kind": "q"}])
    n = run_table_sql(
        cat, f"COPY INTO {TBL} FROM '{drop}' FILEFORMAT = JSON"
    )
    assert n == 1
    assert run_table_sql(
        cat, f"COPY INTO {TBL} FROM '{drop}' FILEFORMAT = JSON"
    ) == 0
    with pytest.raises(UnsupportedStatement, match="FORMAT_OPTIONS"):
        run_table_sql(
            cat,
            f"COPY INTO {TBL} FROM '{drop}' FILEFORMAT = JSON "
            "FORMAT_OPTIONS('header' = 'true')",
        )
    with pytest.raises(UnsupportedStatement, match="FILEFORMAT"):
        run_table_sql(cat, f"COPY INTO {TBL} FROM '{drop}'")
    with pytest.raises(ValueError, match="does not exist"):
        copy_into(cat, "bronze.no.table", str(drop))


def test_copy_into_partitioned_and_glob(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(0, "EU", "seed")], "id int, region string, kind string"
    )
    cat.overwrite(df, TBL, partition_by=["region"])
    drop = tmp_path / "drop"
    drop.mkdir()
    _write(drop / "a.json", [{"id": 1, "region": "US", "kind": "x"}])
    _write(drop / "skip.txt", [{"id": 9, "region": "XX", "kind": "no"}])
    assert copy_into(cat, TBL, str(drop / "*.json")) == 1
    got = {r.id: r.region for r in cat.read(TBL).collect()}
    assert got == {0: "EU", 1: "US"}


def test_copy_into_job_type(spark, tmp_path):
    # type: copy_into job — the scheduled landing-zone drain shape:
    # re-running the job loads only files that landed since last run
    import json as _json

    from mydatalake_spark.jobs import JobRunner

    root = tmp_path / "meta" / "bronze"
    root.mkdir(parents=True)
    drop = tmp_path / "drop"
    drop.mkdir()
    (root / "job_metadata.yml").write_text(
        f"""
jobs:
  - name: bronze_drain
    type: copy_into
    tables:
      - table: {TBL}
        path: '{drop}'
        file_format: json
"""
    )
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed_table(spark, cat)
    _write(drop / "a.json", [{"id": 1, "kind": "x"}])
    runner = JobRunner(spark, cat, str(tmp_path / "meta"))
    assert runner.run("copy_into", "bronze_drain") == [TBL]
    assert cat.read(TBL).count() == 2
    # second run: nothing new landed → table unchanged
    runner.run("copy_into", "bronze_drain")
    assert cat.read(TBL).count() == 2
    _write(drop / "b.json", [{"id": 2, "kind": "y"}])
    runner.run("copy_into", "bronze_drain")
    assert sorted(r.id for r in cat.read(TBL).collect()) == [0, 1, 2]


def test_copy_into_poisoned_pending_surfaces_abandon_path(spark, tmp_path):
    """ADVICE r12: a pending batch whose replay fails for a reason
    OTHER than missing files (e.g. schema-poisoned bytes) must name
    the recovery path, and abandon_pending=True must un-wedge the
    table without forgetting the batch's files forever."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed_table(spark, cat)
    drop = tmp_path / "drop"
    drop.mkdir()
    bad = drop / "bad.json"
    _write(bad, [{"id": 5, "kind": "ok"}])
    # forge a crash-before-append, then poison the REPLAY (any
    # non-missing-file failure: schema clash, disk full, ...) by
    # making the append raise
    pending = os.path.join(cat._version_root(TBL), ".copy_into.pending.json")
    os.makedirs(cat._version_root(TBL), exist_ok=True)
    with open(pending, "w") as fh:
        json.dump(
            {
                "txn": "copyinto-poisoned00000",
                "files": {str(bad): [os.path.getsize(bad)]},
            },
            fh,
        )
    real_append = cat.append
    cat.append = lambda *a, **k: (_ for _ in ()).throw(OSError("disk full"))
    with pytest.raises(RuntimeError, match="abandon"):
        copy_into(cat, TBL, str(drop))
    # the pending record survives for a fixed-cause retry, and the
    # error named the recovery path instead of wedging silently
    assert os.path.exists(pending)
    cat.append = real_append
    # fixed-cause retry replays the pinned batch and clears pending
    assert copy_into(cat, TBL, str(drop)) == 1
    assert not os.path.exists(pending)
    assert 5 in {r.id for r in cat.read(TBL).collect()}


def test_copy_into_abandon_pending_skips_batch(spark, tmp_path):
    """abandon_pending=True clears the pending record WITHOUT booking
    its files — they retry as a fresh batch on the next run."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed_table(spark, cat)
    drop = tmp_path / "drop"
    drop.mkdir()
    f = drop / "a.json"
    _write(f, [{"id": 7, "kind": "q"}])
    pending = os.path.join(cat._version_root(TBL), ".copy_into.pending.json")
    os.makedirs(cat._version_root(TBL), exist_ok=True)
    with open(pending, "w") as fh:
        json.dump(
            {
                "txn": "copyinto-abandoned0000",
                "files": {str(f): [os.path.getsize(f)]},
            },
            fh,
        )
    # abandon: pending cleared; the file is NOT in the book, so the
    # same call loads it as a fresh batch (new txn)
    assert copy_into(cat, TBL, str(drop), abandon_pending=True) == 1
    assert not os.path.exists(pending)
    assert 7 in {r.id for r in cat.read(TBL).collect()}


def test_copy_into_abandon_of_committed_batch_keeps_rows(spark, tmp_path):
    """ADVICE r13 (medium): abandon_pending on a batch whose append
    already COMMITTED (txn token recorded, file book not yet written)
    must finish the bookkeeping, not sweep the committed rows. The
    old sweep deleted the rows, and the retry's deterministic md5
    txn over the same file set hit the recorded token, so the retry
    no-op'd and booked the files — silent data loss."""
    import hashlib

    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed_table(spark, cat)
    drop = tmp_path / "drop"
    drop.mkdir()
    f = drop / "a.json"
    _write(f, [{"id": i, "kind": "x"} for i in range(1, 6)])
    assert copy_into(cat, TBL, str(drop)) == 5
    # forge a crash BETWEEN the append commit and the book write: the
    # token is recorded, the book and pending reflect pre-commit state
    vroot = cat._version_root(TBL)
    os.remove(os.path.join(vroot, ".copy_into.json"))
    txn = "copyinto-" + hashlib.md5(
        os.path.abspath(str(f)).encode()
    ).hexdigest()[:16]
    assert cat._append_txn_seen(TBL, txn)  # the commit really landed
    pending = os.path.join(vroot, ".copy_into.pending.json")
    with open(pending, "w") as fh:
        json.dump(
            {"txn": txn, "files": {str(f): [os.path.getsize(f)]}}, fh
        )
    # abandon against a committed batch: nothing to abandon — the rows
    # stay, the book heals, pending clears
    assert copy_into(cat, TBL, str(drop), abandon_pending=True) == 0
    assert sorted(r.id for r in cat.read(TBL).collect()) == [0, 1, 2, 3, 4, 5]
    assert not os.path.exists(pending)
    # and the healed book means a plain re-run is a no-op too
    assert copy_into(cat, TBL, str(drop)) == 0
    assert cat.read(TBL).count() == 6
