"""Streaming change-feed tail (streaming/cdf.py — VERDICT r13 ask #1):
a table's own commits exported to an append-only feed directory
(atomic per-commit rename, tokened, crash-idempotent) and consumed as
a genuine Structured Streaming file source — so downstream views /
replicas / arbitrary consumers SUBSCRIBE to commits instead of polling
the batch sync."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from mydatalake_spark.catalog import Catalog
from mydatalake_spark.streaming.cdf import (
    collapse_change_feed,
    export_table_changes,
    feed_schema,
    stream_table_changes,
    subscribe_changes_into_view,
    subscribe_replica,
    vacuum_feed,
)

S = "silver.s.orders"


def _src(spark, tmp_path, keep=8):
    cat = Catalog(spark, str(tmp_path / "src"), keep_versions=keep)
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id int, tag string, amt double",
    )
    cat.overwrite_via_staging(v1, S)
    cat.snapshot(S)  # version 1
    return cat


def _commit(cat, spark, rows):
    df = spark.createDataFrame(rows, "id int, tag string, amt double")
    cat.overwrite_via_staging(df, S)
    cat.snapshot(S)


def test_two_drains_exactly_once_and_redrain_noop(spark, tmp_path):
    """Commits between drains arrive exactly once; a re-drain applies
    nothing (the ask's two-drain test)."""
    cat = _src(spark, tmp_path)
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    D = "gold.s.orders_replica"

    # drain 1: baseline
    assert export_table_changes(cat, S, ["id"], feed) == [1]
    subscribe_replica(spark, feed, cat, D, ckpt)
    assert sorted((r.id, r.amt) for r in cat.read(D).collect()) == [
        (1, 10.0), (2, 20.0), (3, 30.0)
    ]
    tok1 = cat.read_marker(D, ".cdf_subscribed")

    # two commits land between drains: update 2, delete 3, insert 9
    _commit(cat, spark, [(1, "a", 10.0), (2, "b2", 22.0), (3, "c", 30.0)])
    _commit(cat, spark, [(1, "a", 10.0), (2, "b2", 22.0), (9, "i", 90.0)])

    # drain 2: both commits arrive, net-applied exactly once (each
    # _commit yields two versions: the staging overwrite snapshots the
    # pre-state — an empty changeset — then snapshot() pins the new)
    assert export_table_changes(cat, S, ["id"], feed) == [2, 3, 4, 5]
    subscribe_replica(spark, feed, cat, D, ckpt)
    assert sorted((r.id, r.tag, r.amt) for r in cat.read(D).collect()) == [
        (1, "a", 10.0), (2, "b2", 22.0), (9, "i", 90.0)
    ]

    # re-drain with nothing new: export empty, replica untouched
    assert export_table_changes(cat, S, ["id"], feed) == []
    tok2 = cat.read_marker(D, ".cdf_subscribed")
    subscribe_replica(spark, feed, cat, D, ckpt)
    assert cat.read_marker(D, ".cdf_subscribed") == tok2
    assert tok2 != tok1
    assert sorted(r.id for r in cat.read(D).collect()) == [1, 2, 9]


def test_stream_equals_batch_table_changes(spark, tmp_path):
    """Parity: the exported feed's rows ARE table_changes' rows —
    per commit, same change types, same values."""
    cat = _src(spark, tmp_path)
    _commit(cat, spark, [(1, "a", 11.0), (2, "b", 20.0), (4, "d", 40.0)])
    feed = str(tmp_path / "feed")
    export_table_changes(cat, S, ["id"], feed)

    # batch-read the feed (what any stream consumer will see in total)
    schema, keys = feed_schema(spark, feed)
    assert keys == ["id"]
    got = (
        spark.read.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(feed)
    )
    # commit 3's hop vs the batch API, row for row (version 2 is the
    # overwrite's pre-state snapshot: an empty changeset)
    want = cat.table_changes(S, ["id"], from_version=2, to_version=3)
    key = lambda r: (r["id"], r["_change_type"], r["_commit_version"])
    assert sorted(
        map(key, got.where("_commit_version = 3").collect())
    ) == sorted(map(key, want.collect()))
    assert got.where("_commit_version = 2").count() == 0
    # the baseline is version 1's state as inserts
    base = got.where("_commit_version = 1")
    assert {r._change_type for r in base.collect()} == {"insert"}
    assert base.count() == 3


def test_crashed_drain_resumes(spark, tmp_path):
    """Producer crash between the commit-dir rename and the token
    write: the re-drain skips the landed commit (no duplicate rows)
    and continues with the rest."""
    cat = _src(spark, tmp_path)
    _commit(cat, spark, [(1, "a", 11.0), (2, "b", 20.0), (3, "c", 30.0)])
    _commit(cat, spark, [(1, "a", 12.0), (2, "b", 20.0), (3, "c", 30.0)])
    feed = str(tmp_path / "feed")
    export_table_changes(cat, S, ["id"], feed)  # token now at 5
    # forge the crash: roll the token back one commit, leave the
    # commit-5 directory in place
    with open(os.path.join(feed, ".cdf_exported"), "w") as fh:
        fh.write("4")
    before = sorted(
        f for _, _, fs in os.walk(os.path.join(feed, "commit-00000005"))
        for f in fs
    )
    assert export_table_changes(cat, S, ["id"], feed) == [5]
    after = sorted(
        f for _, _, fs in os.walk(os.path.join(feed, "commit-00000005"))
        for f in fs
    )
    assert after == before  # never rewritten — consumers saw it once
    # feed totals: exactly one changeset per commit
    schema, _ = feed_schema(spark, feed)
    got = (
        spark.read.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(feed)
    )
    assert got.where("_commit_version = 5 AND id = 1").count() == 2  # pre+post


def test_subscribe_view_folds_changes(spark, tmp_path):
    """An incremental aggregate view maintained from the feed equals
    the batch recompute — updates and deletes retract correctly."""
    from mydatalake_spark.views import IncrementalAggView

    cat = _src(spark, tmp_path)
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    view = IncrementalAggView(
        spark, cat, "gold.s.amt_by_tag",
        keys=["tag"], measures={"amt_total": "amt"},
    )
    export_table_changes(cat, S, ["id"], feed)
    subscribe_changes_into_view(view, spark, feed, ckpt)
    got = {r.tag: r.amt_total for r in view.read().collect()}
    assert got == {"a": 10.0, "b": 20.0, "c": 30.0}

    # update 1 (a: 10->15), delete 3 (c leaves), insert 9 (b grows)
    _commit(cat, spark, [(1, "a", 15.0), (2, "b", 20.0), (9, "b", 5.0)])
    export_table_changes(cat, S, ["id"], feed)
    subscribe_changes_into_view(view, spark, feed, ckpt)
    got = {
        r.tag: r.amt_total
        for r in view.read().collect()
        if r.n_rows > 0
    }
    assert got == {"a": 15.0, "b": 25.0}


def test_collapse_change_feed_nets_multi_commit_batches(spark):
    feed = spark.createDataFrame(
        [
            (1, "x", "insert", 2),
            (1, "x", "update_preimage", 3),
            (1, "y", "update_postimage", 3),
            (2, "p", "insert", 2),
            (2, "p", "delete", 3),
            (3, "q", "insert", 3),
        ],
        "id int, tag string, _change_type string, _commit_version int",
    )
    net = {
        (r.id, r._change_type)
        for r in collapse_change_feed(feed, ["id"]).collect()
    }
    assert net == {
        (1, "update_postimage"), (2, "delete"), (3, "insert")
    }


def test_subscribe_refuses_foreign_destination(spark, tmp_path):
    cat = _src(spark, tmp_path)
    feed = str(tmp_path / "feed")
    export_table_changes(cat, S, ["id"], feed)
    D = "gold.s.not_a_replica"
    cat.overwrite_via_staging(
        spark.createDataFrame([(7,)], "x int"), D
    )
    with pytest.raises(Exception, match="not a subscribed replica"):
        subscribe_replica(spark, feed, cat, D, str(tmp_path / "ck"))


def test_vacuumed_source_gap_raises_and_vacuum_feed_bounds(
    spark, tmp_path
):
    cat = _src(spark, tmp_path, keep=2)
    feed = str(tmp_path / "feed")
    export_table_changes(cat, S, ["id"], feed)
    # push the exported token out of the source's retention
    for i in range(4):
        _commit(cat, spark, [(1, "a", float(i)), (2, "b", 20.0), (3, "c", 30.0)])
    with pytest.raises(ValueError, match="no longer retained"):
        export_table_changes(cat, S, ["id"], feed)
    # feed retention: keep the newest commit dir only
    shutil.rmtree(feed)
    cat2 = _src(spark, tmp_path / "again")
    feed2 = str(tmp_path / "feed2")
    export_table_changes(cat2, "silver.s.orders", ["id"], feed2)
    _commit(cat2, spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)])
    export_table_changes(cat2, "silver.s.orders", ["id"], feed2)
    dropped = vacuum_feed(feed2, keep_commits=1)
    assert dropped == [1, 2]
    assert sorted(
        d for d in os.listdir(feed2) if d.startswith("commit-")
    ) == ["commit-00000003"]


def test_cdf_subscribe_job(spark, tmp_path):
    """Job wiring: type cdf_subscribe drains source commits into the
    declared replica."""
    from mydatalake_spark.jobs import JobRunner

    cat = _src(spark, tmp_path)
    meta = tmp_path / "meta" / "gold"
    meta.mkdir(parents=True)
    (meta / "job_metadata.yml").write_text(
        f"""jobs:
  - name: gold_subscribe
    type: cdf_subscribe
    tables:
      - source_table: {S}
        keys: [id]
        replica: gold.s.orders_replica
"""
    )
    runner = JobRunner(spark, cat, str(tmp_path / "meta"))
    assert runner.run("cdf_subscribe", "gold_subscribe") == [
        "gold.s.orders_replica"
    ]
    assert sorted(r.id for r in cat.read("gold.s.orders_replica").collect()) \
        == [1, 2, 3]
    # a commit lands; the next scheduled run picks it up
    _commit(cat, spark, [(1, "a", 10.0), (2, "b", 20.0), (4, "d", 40.0)])
    runner.run("cdf_subscribe", "gold_subscribe")
    assert sorted(r.id for r in cat.read("gold.s.orders_replica").collect()) \
        == [1, 2, 4]
