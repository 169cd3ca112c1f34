"""Optimistic concurrency on publish (VERDICT r13 ask #3): every
staging-swap / file-move commit captures the live commit token when
the write plans and re-checks it under the publish lock right before
the swap — two interleaved writers both pay for staging, but only the
first swap wins; the second raises ConcurrentWriteException instead of
silently clobbering (Delta's OCC contract)."""

import pytest

from mydatalake_spark.catalog import Catalog, ConcurrentWriteException

T = "silver.s.t"


def _df(spark, tag):
    return spark.createDataFrame([(1, tag), (2, tag)], "id int, tag string")


def test_plan_time_token_cas_second_writer_raises(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"), keep_versions=4)
    cat.overwrite_via_staging(_df(spark, "base"), T)
    # writer A plans (captures the token), writer B commits first
    token_a = cat.commit_token(T)
    cat.overwrite_via_staging(_df(spark, "B"), T)
    with pytest.raises(ConcurrentWriteException, match="another writer"):
        cat.overwrite_via_staging(
            _df(spark, "A"), T, expected_token=token_a
        )
    # B's commit survives untouched; A left no staging husk behind
    assert {r.tag for r in cat.read(T).collect()} == {"B"}
    import os

    assert not os.path.exists(cat.path(T) + "__staging")
    # A re-plans against the new state and succeeds
    cat.overwrite_via_staging(
        _df(spark, "A2"), T, expected_token=cat.commit_token(T)
    )
    assert {r.tag for r in cat.read(T).collect()} == {"A2"}


def test_default_capture_covers_staging_window(spark, tmp_path, monkeypatch):
    """The DEFAULT (no token passed) captures at entry, so a commit
    landing while this writer materializes its staging directory is
    detected — the verdict's 'two concurrent overwrite_via_staging
    publishes race the directory swap' scenario."""
    cat = Catalog(spark, str(tmp_path / "wh"), keep_versions=4)
    other = Catalog(spark, str(tmp_path / "wh"), keep_versions=4)
    cat.overwrite_via_staging(_df(spark, "base"), T)

    state = {"fired": False}
    orig = cat._with_check_guards

    def hooked(df, name, **kw):
        if name == T and not state["fired"]:
            state["fired"] = True
            other.overwrite_via_staging(_df(spark, "other"), T)
        return orig(df, name, **kw)

    monkeypatch.setattr(cat, "_with_check_guards", hooked)
    with pytest.raises(ConcurrentWriteException):
        cat.overwrite_via_staging(_df(spark, "mine"), T)
    assert {r.tag for r in cat.read(T).collect()} == {"other"}


def test_append_gets_the_same_guard(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"), keep_versions=4)
    cat.overwrite_via_staging(_df(spark, "base"), T)
    token_a = cat.commit_token(T)
    # another writer's commit (any kind) lands first
    cat.append(_df(spark, "B"), T)
    with pytest.raises(ConcurrentWriteException):
        cat.append(_df(spark, "A"), T, expected_token=token_a)
    tags = sorted(r.tag for r in cat.read(T).collect())
    assert tags == ["B", "B", "base", "base"]  # A's rows never landed
    # txn-book path: same guard, and the token is NOT burned by the
    # refused attempt — the retry with a fresh capture succeeds
    with pytest.raises(ConcurrentWriteException):
        cat.append(_df(spark, "A"), T, txn_id="batch-1",
                   expected_token=token_a)
    assert cat.append(_df(spark, "A"), T, txn_id="batch-1") == 2
    assert cat.append(_df(spark, "A"), T, txn_id="batch-1") == 0  # replay
    assert sorted(r.tag for r in cat.read(T).collect()) == [
        "A", "A", "B", "B", "base", "base"
    ]


def test_snapshot_with_expected_token(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"), keep_versions=4)
    cat.overwrite_via_staging(_df(spark, "base"), T)
    token = cat.commit_token(T)
    assert cat.snapshot(T, expected_token=token) >= 1
    cat.overwrite_via_staging(_df(spark, "next"), T)
    with pytest.raises(ConcurrentWriteException):
        cat.snapshot(T, expected_token=token)


def test_sequential_writers_unaffected(spark, tmp_path):
    """No concurrency → the default-on check never fires (every
    existing single-writer flow keeps working unchanged)."""
    cat = Catalog(spark, str(tmp_path / "wh"), keep_versions=4)
    for i in range(3):
        cat.overwrite_via_staging(_df(spark, f"w{i}"), T)
    cat.append(_df(spark, "app"), T)
    assert cat.read(T).count() == 4
    assert len(cat.versions(T)) == 3


def test_create_create_race_detected(spark, tmp_path):
    """Two writers both creating the same fresh table: the first
    create commits, the second (which planned against 'absent')
    raises instead of replacing it."""
    cat = Catalog(spark, str(tmp_path / "wh"), keep_versions=4)
    token = cat.commit_token(T)  # None — table doesn't exist yet
    assert token is None
    cat.overwrite_via_staging(_df(spark, "first"), T)
    with pytest.raises(ConcurrentWriteException):
        cat.overwrite_via_staging(
            _df(spark, "second"), T, expected_token=token
        )
    assert {r.tag for r in cat.read(T).collect()} == {"first"}
