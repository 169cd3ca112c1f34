"""Partition-scoped CDC merge: only touched partitions rewrite."""

import os

import pytest
from pyspark.sql import functions as F

from mydatalake_spark.catalog import Catalog
from mydatalake_spark.operators.merge import merge_upsert_partitioned


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "wh"))


def _prices(spark, rows):
    return spark.createDataFrame(
        rows, "sym string, day string, ts long, px double"
    )


BASE = [
    ("A", "2026-08-01", 1, 10.0),
    ("B", "2026-08-01", 1, 20.0),
    ("A", "2026-08-02", 1, 11.0),
    ("B", "2026-08-02", 1, 21.0),
]


def test_partitioned_merge_touches_only_source_partitions(spark, cat):
    merge_upsert_partitioned(
        cat, "silver.mkt.prices", _prices(spark, BASE),
        keys=["sym", "day"], partition_col="day", ts_col="ts",
    )
    p1 = cat.path("silver.mkt.prices") + "/day=2026-08-01"
    mtime_before = os.path.getmtime(p1)
    files_before = sorted(os.listdir(p1))

    # second batch touches only 2026-08-02 (update A, stale B, insert C)
    touched = merge_upsert_partitioned(
        cat, "silver.mkt.prices",
        _prices(spark, [
            ("A", "2026-08-02", 5, 99.0),
            ("B", "2026-08-02", 0, 1.0),     # stale: ts 0 < 1
            ("C", "2026-08-02", 2, 30.0),
        ]),
        keys=["sym", "day"], partition_col="day", ts_col="ts",
    )
    assert touched == ["2026-08-02"]

    # partition-column values come back type-inferred (date here) —
    # standard Spark partition discovery; normalize for comparison
    got = {
        (r.sym, str(r.day)): r.px
        for r in cat.read("silver.mkt.prices").collect()
    }
    assert got == {
        ("A", "2026-08-01"): 10.0,
        ("B", "2026-08-01"): 20.0,
        ("A", "2026-08-02"): 99.0,   # updated
        ("B", "2026-08-02"): 21.0,   # stale source ignored
        ("C", "2026-08-02"): 30.0,   # inserted
    }
    # untouched partition's files were not rewritten
    assert sorted(os.listdir(p1)) == files_before
    assert os.path.getmtime(p1) == mtime_before


def test_partition_col_must_be_in_keys(spark, cat):
    with pytest.raises(ValueError, match="partition column"):
        merge_upsert_partitioned(
            cat, "t.t.t", _prices(spark, BASE),
            keys=["sym"], partition_col="day", ts_col="ts",
        )


def test_first_write_bootstraps(spark, cat):
    touched = merge_upsert_partitioned(
        cat, "silver.mkt.p2", _prices(spark, BASE[:2]),
        keys=["sym", "day"], partition_col="day", ts_col="ts",
    )
    assert touched == ["2026-08-01"]
    assert cat.read("silver.mkt.p2").count() == 2


def test_high_cardinality_partition_col_refused(spark, cat):
    # a per-row id mistakenly used as the partition column must fail
    # fast (bounded probe), not collect a corpus-sized list to the
    # driver and OOM
    src = spark.range(500).select(
        F.col("id").cast("string").alias("sym"),
        F.col("id").cast("string").alias("day"),   # 500 distinct "partitions"
        F.lit(1).alias("ts"),
        F.lit(1.0).alias("px"),
    )
    with pytest.raises(ValueError, match="more than 100 distinct"):
        merge_upsert_partitioned(
            cat, "silver.mkt.p4", src,
            keys=["sym", "day"], partition_col="day", ts_col="ts",
            max_partitions=100,
        )
    assert not cat.exists("silver.mkt.p4")


def test_empty_source_is_noop(spark, cat):
    empty = _prices(spark, [])
    touched = merge_upsert_partitioned(
        cat, "silver.mkt.p3", empty,
        keys=["sym", "day"], partition_col="day", ts_col="ts",
    )
    assert touched == []
    assert not cat.exists("silver.mkt.p3")


def _file_hashes(root):
    import hashlib

    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = hashlib.md5(
                    fh.read()
                ).hexdigest()
    return out


def _exchange_records_written(df):
    """Run ``df`` and return every Exchange's shuffleRecordsWritten
    from the EXECUTED (adaptive) plan — the ground truth for 'what
    actually crossed a shuffle', not a plan-shape proxy."""
    df.collect()
    vals = []

    def walk(node):
        name = node.nodeName()
        if name.startswith("Exchange"):
            it = node.metrics().iterator()
            while it.hasNext():
                t = it.next()
                if t._1() == "shuffleRecordsWritten":
                    vals.append(t._2().value())
        if name.startswith("AdaptiveSparkPlan"):
            walk(node.executedPlan())
            return
        if "QueryStage" in name:
            walk(node.plan())
            return
        ch = node.children()
        for i in range(ch.length()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return vals


def test_bloomed_partitioned_merge_composes_both_prunes(spark, cat):
    """VERDICT r7 ask #4: partition pruning (untouched partitions'
    files BYTE-identical — never read, never rewritten) composed with
    bloom row pruning (within the touched partition, the merge join's
    shuffles carry only post-prune row counts; the guaranteed-miss
    rows rewrite via the map-only bypass). Result identical to the
    plain partition-scoped merge."""
    days = ["2026-08-01", "2026-08-02", "2026-08-03"]
    rows = [
        (f"S{i:04d}", d, 1, float(i)) for d in days for i in range(400)
    ]
    for table in ("silver.mkt.bloomed", "silver.mkt.plain"):
        merge_upsert_partitioned(
            cat, table, _prices(spark, rows),
            keys=["sym", "day"], partition_col="day", ts_col="ts",
        )
    base = cat.path("silver.mkt.bloomed")
    before = {
        d: _file_hashes(os.path.join(base, f"day={d}"))
        for d in days
    }

    change = _prices(spark, [
        ("S0007", "2026-08-02", 9, 700.0),
        ("S0123", "2026-08-02", 9, 701.0),
        ("S0200", "2026-08-02", 0, -1.0),      # stale: loses to ts=1
        ("SNEW1", "2026-08-02", 9, 703.0),     # insert
        ("S0390", "2026-08-02", 9, 704.0),
    ])

    captured = {}
    orig = cat.overwrite_partitions

    def capture(df, table, pcol, vals):
        # plan + metrics must be taken BEFORE the write: the merged
        # frame reads the pre-merge files the write replaces
        captured["plan"] = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")
        )
        captured["written"] = _exchange_records_written(df)
        orig(df, table, pcol, vals)

    cat.overwrite_partitions = capture
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        touched = merge_upsert_partitioned(
            cat, "silver.mkt.bloomed", change,
            keys=["sym", "day"], partition_col="day", ts_col="ts",
            bloom=True, bloom_m_bits=1 << 13,
        )
    finally:
        cat.overwrite_partitions = orig
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert touched == ["2026-08-02"]

    # untouched partitions: every file byte-identical
    after = {
        d: _file_hashes(os.path.join(base, f"day={d}"))
        for d in days
    }
    assert after["2026-08-01"] == before["2026-08-01"]
    assert after["2026-08-03"] == before["2026-08-03"]
    assert after["2026-08-02"] != before["2026-08-02"]

    # identical result to the plain composed path
    merge_upsert_partitioned(
        cat, "silver.mkt.plain", change,
        keys=["sym", "day"], partition_col="day", ts_col="ts",
    )
    got = {
        (r.sym, str(r.day)): (r.ts, r.px)
        for r in cat.read("silver.mkt.bloomed").collect()
    }
    want = {
        (r.sym, str(r.day)): (r.ts, r.px)
        for r in cat.read("silver.mkt.plain").collect()
    }
    assert got == want
    assert got[("S0007", "2026-08-02")] == (9, 700.0)
    assert got[("S0200", "2026-08-02")] == (1, 200.0)   # stale ignored
    assert got[("SNEW1", "2026-08-02")] == (9, 703.0)
    assert len(got) == 3 * 400 + 1

    # the captured merge frame: partition pruning reached the scan,
    # and the merge join's shuffles carried POST-prune counts
    import re

    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", captured["plan"])
    assert any("day" in f and f.strip() for f in pf), pf
    # touched slice has 400 rows; only the ~5 bloom-hit target rows +
    # 5 source rows may shuffle (plus fp, bounded far under the slice)
    written = captured["written"]
    assert written, "no Exchange metrics captured"
    assert max(written) <= 40, written


def _regional(spark, rows):
    return spark.createDataFrame(
        rows, "sym string, day string, region string, ts long, px double"
    )


def test_two_level_partitioned_merge_prunes_leaf_dirs(spark, cat):
    """VERDICT r8 ask #5: hierarchical (day, region) partitioning.
    A changeset touching one (day, region) leaf must leave every other
    leaf byte-identical — including the SIBLING region under the same
    day — and the merge scan's PartitionFilters must carry both
    columns."""
    days = ["2026-08-01", "2026-08-02"]
    regions = ["EU", "US"]
    rows = [
        (f"S{i:03d}", d, rg, 1, float(i))
        for d in days for rg in regions for i in range(50)
    ]
    merge_upsert_partitioned(
        cat, "silver.mkt.multi", _regional(spark, rows),
        keys=["sym", "day", "region"],
        partition_col=["day", "region"], ts_col="ts",
    )
    base = cat.path("silver.mkt.multi")
    leaves = [f"day={d}/region={rg}" for d in days for rg in regions]
    before = {lf: _file_hashes(os.path.join(base, lf)) for lf in leaves}
    assert all(before.values()), before  # all four leaves materialized

    captured = {}
    orig = cat.overwrite_partitions

    def capture(df, table, pcols, vals):
        captured["plan"] = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")
        )
        orig(df, table, pcols, vals)

    cat.overwrite_partitions = capture
    try:
        touched = merge_upsert_partitioned(
            cat, "silver.mkt.multi",
            _regional(spark, [
                ("S007", "2026-08-02", "EU", 9, 700.0),   # update
                ("S000", "2026-08-02", "EU", 0, -1.0),    # stale
                ("SNEW", "2026-08-02", "EU", 2, 800.0),   # insert
            ]),
            keys=["sym", "day", "region"],
            partition_col=["day", "region"], ts_col="ts",
        )
    finally:
        cat.overwrite_partitions = orig
    assert touched == [("2026-08-02", "EU")]

    after = {lf: _file_hashes(os.path.join(base, lf)) for lf in leaves}
    for lf in leaves:
        if lf == "day=2026-08-02/region=EU":
            assert after[lf] != before[lf]
        else:
            # untouched leaves byte-identical — notably the US sibling
            # under the touched day
            assert after[lf] == before[lf], lf

    got = {
        (r.sym, str(r.day), r.region): (r.ts, r.px)
        for r in cat.read("silver.mkt.multi").collect()
    }
    assert got[("S007", "2026-08-02", "EU")] == (9, 700.0)
    assert got[("S000", "2026-08-02", "EU")] == (1, 0.0)    # stale lost
    assert got[("SNEW", "2026-08-02", "EU")] == (2, 800.0)
    assert got[("S007", "2026-08-02", "US")] == (1, 7.0)    # sibling
    assert len(got) == 2 * 2 * 50 + 1

    # both pruning levels visible at the scan
    import re

    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", captured["plan"])
    assert any("day" in f and "region" in f for f in pf), pf


def test_two_level_first_write_bootstraps_nested_layout(spark, cat):
    touched = merge_upsert_partitioned(
        cat, "silver.mkt.multi2",
        _regional(spark, [("A", "2026-08-01", "EU", 1, 1.0)]),
        keys=["sym", "day", "region"],
        partition_col=["day", "region"], ts_col="ts",
    )
    assert touched == [("2026-08-01", "EU")]
    assert os.path.isdir(
        os.path.join(cat.path("silver.mkt.multi2"),
                     "day=2026-08-01", "region=EU")
    )
    assert cat.read("silver.mkt.multi2").count() == 1


def test_null_partition_value_fails_fast(spark, cat):
    """ADVICE r8: a NULL partition value would silently vanish from
    isin()/= predicates — refuse the changeset instead."""
    merge_upsert_partitioned(
        cat, "silver.mkt.p5", _prices(spark, BASE),
        keys=["sym", "day"], partition_col="day", ts_col="ts",
    )
    bad = spark.createDataFrame(
        [("A", None, 5, 1.0)],
        "sym string, day string, ts long, px double",
    )
    with pytest.raises(ValueError, match="NULL"):
        merge_upsert_partitioned(
            cat, "silver.mkt.p5", bad,
            keys=["sym", "day"], partition_col="day", ts_col="ts",
        )
    # table unchanged
    assert cat.read("silver.mkt.p5").count() == len(BASE)
    # multi-col: a null in EITHER member refuses
    bad2 = _regional(spark, [("A", "2026-08-01", None, 5, 1.0)])
    with pytest.raises(ValueError, match="NULL"):
        merge_upsert_partitioned(
            cat, "silver.mkt.p6", bad2,
            keys=["sym", "day", "region"],
            partition_col=["day", "region"], ts_col="ts",
        )


def test_multicol_partition_requires_all_keys(spark, cat):
    with pytest.raises(ValueError, match="region"):
        merge_upsert_partitioned(
            cat, "t.t.t", _regional(spark, []),
            keys=["sym", "day"],
            partition_col=["day", "region"], ts_col="ts",
        )
