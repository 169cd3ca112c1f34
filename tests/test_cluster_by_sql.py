"""CLUSTER BY — liquid clustering's declaration surface (VERDICT r12
ask #8). ``CREATE TABLE ... CLUSTER BY (cols)`` stores the layout
declaration beside the table; full overwrites lay data out clustered
(range shuffle + in-partition sort → tight, pairwise-disjoint parquet
footer min/max spans, the precondition for row-group skipping);
appends land unclustered and ``OPTIMIZE t`` restores the layout —
Delta's write-then-OPTIMIZE contract. Mutually exclusive with
partitioning, printed by SHOW CREATE TABLE, re-declared or dropped via
``ALTER TABLE ... CLUSTER BY (...)|NONE``."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mydatalake_spark.catalog import Catalog
from mydatalake_spark.maintenance import optimize_table
from mydatalake_spark.plans.table_sql import (
    UnsupportedStatement,
    run_table_sql,
)

TBL = "silver.sales.clustered"
SRC = "bronze.sales.raw"


def _key_ranges(path: str) -> list[tuple[int, int]]:
    """Per-ROW-GROUP (min, max) of column 'k' from the parquet
    footers — the granularity parquet data skipping prunes at. A
    clustered write (global range partition + within-partition sort)
    makes these pairwise disjoint across the whole table, whatever
    file count AQE's advisory sizing lands on."""
    out = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == "k":
                    out.append(
                        (col.statistics.min, col.statistics.max)
                    )
    return sorted(out)


def _assert_disjoint(ranges) -> None:
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlap: ({lo1},{hi1}) vs ({lo2},{hi2})"


def _seed_src(spark, cat, n=50_000):
    df = spark.range(n).select(
        (F.hash("id") % 1_000_000).alias("k"), F.col("id").alias("v")
    )
    cat.overwrite(df.repartition(8), SRC)
    return df


@pytest.fixture()
def small_advisory(spark):
    """Clustered writes size output files via AQE's advisory partition
    size (the right behavior at 100 TB: ~advisory-sized, range-disjoint
    files). At 50k-row test scale AQE coalesces the range shuffle to
    one or two files, so the evidence lives at row-group granularity —
    shrink the parquet block size so each file holds many row groups
    for the footer assertions."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old = hconf.get("parquet.block.size")
    hconf.setInt("parquet.block.size", 64 * 1024)
    yield
    if old is None:
        hconf.unset("parquet.block.size")
    else:
        hconf.set("parquet.block.size", old)


def test_ctas_cluster_by_tightens_footers_and_round_trips(
    spark, tmp_path, small_advisory
):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed_src(spark, cat)
    # source (hash-scattered, 8 files): every file spans ~the whole
    # domain — the layout data skipping can't use
    src_ranges = _key_ranges(cat.path(SRC))
    domain = max(hi for _, hi in src_ranges) - min(
        lo for lo, _ in src_ranges
    )
    assert all(hi - lo > 0.5 * domain for lo, hi in src_ranges)

    run_table_sql(
        cat, f"CREATE TABLE {TBL} CLUSTER BY (k) AS SELECT * FROM {SRC}"
    )
    ranges = _key_ranges(cat.path(TBL))
    assert len(ranges) >= 4
    _assert_disjoint(ranges)
    avg = sum(hi - lo for lo, hi in ranges) / len(ranges)
    assert avg < domain / 2, f"spans did not tighten: {ranges}"
    # same data
    assert cat.read(TBL).count() == 50_000

    stmt = run_table_sql(cat, f"SHOW CREATE TABLE {TBL}").first()[0]
    assert "CLUSTER BY (k)" in stmt
    desc = {r.col_name: r.data_type for r in
            run_table_sql(cat, f"DESCRIBE EXTENDED {TBL}").collect()}
    assert desc.get("Cluster By") == "k"
    # the printed DDL is runnable and carries the declaration
    stmt2 = stmt.replace(TBL, "silver.sales.c2")
    for piece in stmt2.split(";\n"):
        run_table_sql(cat, piece)
    assert cat.declared_cluster_cols("silver.sales.c2") == ["k"]


def test_append_then_optimize_restores_clustering(
    spark, tmp_path, small_advisory
):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed_src(spark, cat, n=20_000)
    run_table_sql(
        cat, f"CREATE TABLE {TBL} CLUSTER BY (k) AS SELECT * FROM {SRC}"
    )
    # an appended batch lands unclustered (Delta appends don't
    # cluster); its files overlap the clustered set
    inc = spark.range(20_000, 40_000).select(
        (F.hash("id") % 1_000_000).alias("k"), F.col("id").alias("v")
    )
    cat.append(inc.repartition(4), TBL)
    with pytest.raises(AssertionError):
        _assert_disjoint(_key_ranges(cat.path(TBL)))
    # OPTIMIZE (no ZORDER BY) maintains the DECLARED layout
    run_table_sql(cat, f"OPTIMIZE {TBL}")
    ranges = _key_ranges(cat.path(TBL))
    _assert_disjoint(ranges)
    assert cat.read(TBL).count() == 40_000
    # explicit ZORDER BY on a clustered table would fork the layout
    with pytest.raises(ValueError, match="CLUSTER BY"):
        optimize_table(cat, TBL, zorder_by=["v"])


def test_cluster_by_exclusions_and_alter(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed_src(spark, cat, n=5_000)
    with pytest.raises(UnsupportedStatement, match="not.*both"):
        run_table_sql(
            cat,
            f"CREATE TABLE {TBL} PARTITIONED BY (k) CLUSTER BY (v) "
            f"AS SELECT * FROM {SRC}",
        )
    # declaring clustering on a partitioned table is refused
    run_table_sql(
        cat,
        "CREATE TABLE silver.sales.p PARTITIONED BY (k) "
        f"AS SELECT k % 4 AS k, v FROM {SRC}",
    )
    with pytest.raises(ValueError, match="partitioned"):
        cat.set_declared_cluster_cols("silver.sales.p", ["v"])

    # column-list DDL declares; ALTER re-declares; NONE clears
    run_table_sql(
        cat, f"CREATE TABLE {TBL} (k INT, v BIGINT) CLUSTER BY (k)"
    )
    assert cat.declared_cluster_cols(TBL) == ["k"]
    run_table_sql(cat, f"ALTER TABLE {TBL} CLUSTER BY (k, v)")
    assert cat.declared_cluster_cols(TBL) == ["k", "v"]
    with pytest.raises(ValueError, match="nope"):
        run_table_sql(cat, f"ALTER TABLE {TBL} CLUSTER BY (nope)")
    run_table_sql(cat, f"ALTER TABLE {TBL} CLUSTER BY NONE")
    assert cat.declared_cluster_cols(TBL) is None
    assert "CLUSTER BY" not in run_table_sql(
        cat, f"SHOW CREATE TABLE {TBL}"
    ).first()[0]


def test_cluster_declaration_travels_and_guards(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed_src(spark, cat, n=5_000)
    run_table_sql(
        cat, f"CREATE TABLE {TBL} CLUSTER BY (k) AS SELECT * FROM {SRC}"
    )
    # CLONE and LIKE carry the declaration
    run_table_sql(cat, f"CREATE TABLE silver.sales.cl DEEP CLONE {TBL}")
    assert cat.declared_cluster_cols("silver.sales.cl") == ["k"]
    run_table_sql(cat, f"CREATE TABLE silver.sales.lk LIKE {TBL}")
    assert cat.declared_cluster_cols("silver.sales.lk") == ["k"]
    # overwrite missing a declared cluster column fails by name
    with pytest.raises(ValueError, match=r"\['k'\]"):
        cat.overwrite(
            spark.range(3).select(F.col("id").alias("v")), TBL
        )
    # CREATE OR REPLACE drops the declaration with the definition
    run_table_sql(
        cat,
        f"CREATE OR REPLACE TABLE {TBL} AS SELECT v FROM {SRC}",
    )
    assert cat.declared_cluster_cols(TBL) is None


def test_optimize_full_reclusters_clustered_table_only(
    spark, tmp_path, small_advisory
):
    # OPTIMIZE t FULL — Databricks' force-recluster form. Same rewrite
    # as plain OPTIMIZE here (clustered OPTIMIZE is always a full
    # rewrite), accepted only on a CLUSTER BY table.
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed_src(spark, cat, n=20_000)
    run_table_sql(
        cat, f"CREATE TABLE {TBL} CLUSTER BY (k) AS SELECT * FROM {SRC}"
    )
    inc = spark.range(20_000, 30_000).select(
        (F.hash("id") % 1_000_000).alias("k"), F.col("id").alias("v")
    )
    cat.append(inc.repartition(4), TBL)
    run_table_sql(cat, f"OPTIMIZE {TBL} FULL")
    _assert_disjoint(_key_ranges(cat.path(TBL)))
    assert cat.read(TBL).count() == 30_000
    with pytest.raises(ValueError, match="declares no"):
        run_table_sql(cat, f"OPTIMIZE {SRC} FULL")
    with pytest.raises(UnsupportedStatement, match="no other clause"):
        run_table_sql(cat, f"OPTIMIZE {TBL} FULL ZORDER BY (v)")


def test_incremental_optimize_rewrites_only_overlapping_files(
    spark, tmp_path
):
    """Plain OPTIMIZE on a clustered table is INCREMENTAL (the form
    that holds at 100 TB): overlap detection from parquet footers
    only, clean files hardlinked through the staging swap (same
    inodes, zero data bytes moved), only the overlapped component's
    rows re-range-partitioned."""
    import os

    cat = Catalog(spark, str(tmp_path / "wh"), keep_versions=3)
    src = spark.range(40_000).select(
        (F.hash("id") % 1_000_000).alias("k"), F.col("id").alias("v")
    )
    cat.overwrite(src.repartition(4), SRC)
    run_table_sql(
        cat, f"CREATE TABLE {TBL} CLUSTER BY (k) AS SELECT * FROM {SRC}"
    )
    # force several clustered files regardless of AQE coalescing
    from mydatalake_spark.maintenance import optimize_table

    optimize_table(cat, TBL, target_file_bytes=64 * 1024, full=True)
    path = cat.path(TBL)

    def inodes():
        return {
            f: os.stat(os.path.join(path, f)).st_ino
            for f in os.listdir(path)
            if not f.startswith((".", "_"))
        }

    before = inodes()
    assert len(before) >= 4, before
    # append a NARROW batch overlapping only the low end of the domain
    inc = spark.range(2_000).select(
        (-1_000_000 + F.col("id") % 5_000).alias("k").cast("int"),
        F.col("id").alias("v"),
    )
    lo_file_count = len(before)
    cat.append(inc.repartition(1), TBL)
    # target matched to the test's file scale: at the default 128MB
    # target every ~60KB file is (correctly) "small" and the size arm
    # compacts the whole table — here we isolate the OVERLAP arm
    n = optimize_table(cat, TBL, target_file_bytes=64 * 1024)
    after = inodes()
    # the appended file and the one clustered file it overlapped were
    # rewritten; every other file survived with its inode intact
    surviving = set(before.items()) & set(after.items())
    assert len(surviving) >= lo_file_count - 2, (before, after)
    assert any(f.startswith("rc0-") for f in after), after
    _assert_disjoint(
        [(lo, hi) for lo, hi in _key_ranges(path)]
    )
    assert cat.read(TBL).count() == 42_000
    # already clustered: OPTIMIZE is a no-op that commits NO version
    versions_before = cat.versions(TBL)
    assert optimize_table(cat, TBL, target_file_bytes=64 * 1024) == 0
    assert inodes() == after
    assert cat.versions(TBL) == versions_before
    # FULL forces the whole-table rewrite: every inode changes
    run_table_sql(cat, f"OPTIMIZE {TBL} FULL")
    assert not (set(inodes().items()) & set(after.items()))
    assert cat.read(TBL).count() == 42_000


def test_describe_detail_reports_clustering_columns(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed_src(spark, cat, n=2_000)
    run_table_sql(
        cat, f"CREATE TABLE {TBL} CLUSTER BY (k) AS SELECT * FROM {SRC}"
    )
    d = run_table_sql(cat, f"DESCRIBE DETAIL {TBL}").first()
    assert d.clustering_columns == ["k"]
    assert d.partition_columns == []
    d2 = run_table_sql(cat, f"DESCRIBE DETAIL {SRC}").first()
    assert d2.clustering_columns == []
    # NONE on a missing table errors by name (metadata statements
    # never silently succeed against nothing)
    with pytest.raises(ValueError, match="does not exist"):
        run_table_sql(
            cat, "ALTER TABLE silver.sales.nope CLUSTER BY NONE"
        )


def test_multicolumn_cluster_by_gives_both_columns_locality(
    spark, tmp_path, small_advisory
):
    """CLUSTER BY (x, y) rides the Hilbert curve (liquid clustering's
    curve): each row group's footer range on EACH column is a fraction
    of its domain, so selective predicates on either column prune.
    Lexicographic range clustering on (x, y) cannot do this — y would
    span its whole domain inside every x-run."""
    import pyarrow.parquet as pq

    cat = Catalog(spark, str(tmp_path / "wh"))
    n = 40_000
    src = spark.range(n).select(
        (F.hash("id") % 10_000).alias("x"),
        (F.hash(F.col("id") + 1) % 10_000).alias("y"),
        F.col("id").alias("v"),
    )
    cat.overwrite(src.repartition(8), SRC)
    run_table_sql(
        cat,
        f"CREATE TABLE {TBL} CLUSTER BY (x, y) AS SELECT * FROM {SRC}",
    )
    spans = {"x": [], "y": []}
    for f in glob.glob(f"{cat.path(TBL)}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema in spans:
                    st = col.statistics
                    spans[col.path_in_schema].append(st.max - st.min)
    assert len(spans["x"]) >= 8
    domain = 20_000
    for name in ("x", "y"):
        avg = sum(spans[name]) / len(spans[name])
        assert avg < 0.55 * domain, (name, avg, spans[name][:5])
    assert cat.read(TBL).count() == n
    # OPTIMIZE FULL maintains the same both-column locality
    cat.append(src.limit(4_000), TBL)
    run_table_sql(cat, f"OPTIMIZE {TBL} FULL")
    assert cat.read(TBL).count() == n + 4_000


def test_multicolumn_incremental_optimize_uses_cube_book(
    spark, tmp_path
):
    """Multi-column CLUSTER BY OPTIMIZE is incremental via the
    clustered-file book (ZCube-style — n-D boxes of clustered files
    legitimately overlap, so footer geometry can't detect dirt
    there): only appended files are Hilbert-reclustered, clean files
    keep their inodes through the hardlink swap, and a healthy book
    makes the second OPTIMIZE a version-free no-op."""
    import os

    cat = Catalog(spark, str(tmp_path / "wh"), keep_versions=3)
    src = spark.range(30_000).select(
        (F.hash("id") % 9_999).alias("x"),
        (F.hash(F.col("id") + 1) % 9_999).alias("y"),
        F.col("id").alias("v"),
    )
    cat.overwrite(src.repartition(4), SRC)
    run_table_sql(
        cat,
        f"CREATE TABLE {TBL} CLUSTER BY (x, y) AS SELECT * FROM {SRC}",
    )
    path = cat.path(TBL)

    def inodes():
        return {
            f: os.stat(os.path.join(path, f)).st_ino
            for f in os.listdir(path)
            if not f.startswith((".", "_"))
        }

    # the clustered write marked every file
    assert cat.clustered_files(TBL) == set(inodes())
    before = inodes()
    cat.append(src.limit(3_000), TBL)
    assert set(inodes()) - cat.clustered_files(TBL)  # dirty tail
    n = run_table_sql(cat, f"OPTIMIZE {TBL}")
    assert n >= 1
    after = inodes()
    # every pre-append file survived the swap inode-identical
    assert set(before.items()) <= set(after.items())
    assert cat.read(TBL).count() == 33_000
    assert cat.clustered_files(TBL) == set(after)
    # healthy book: OPTIMIZE again is a no-op, no version committed
    versions = cat.versions(TBL)
    assert run_table_sql(cat, f"OPTIMIZE {TBL}") == 0
    assert cat.versions(TBL) == versions
    assert inodes() == after
    # FULL merges the cubes: everything rewrites, book re-marks
    run_table_sql(cat, f"OPTIMIZE {TBL} FULL")
    assert not (set(inodes().items()) & set(after.items()))
    assert cat.clustered_files(TBL) == set(inodes())
    assert cat.read(TBL).count() == 33_000


def test_replace_partitioned_table_with_cluster_by(spark, tmp_path):
    """ADVICE r13: CREATE OR REPLACE ... CLUSTER BY over an existing
    HIVE-PARTITIONED table is legitimate — the replacing write defines
    the new layout, so the old data's partition directories must not
    veto the declaration."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed_src(spark, cat)
    part = "silver.sales.part_then_clustered"
    run_table_sql(
        cat,
        f"CREATE TABLE {part} PARTITIONED BY (bucket) AS "
        f"SELECT k, v, k % 4 AS bucket FROM {SRC}",
    )
    assert cat.declared_cluster_cols(part) is None
    run_table_sql(
        cat,
        f"CREATE OR REPLACE TABLE {part} CLUSTER BY (k) AS "
        f"SELECT k, v FROM {SRC}",
    )
    assert cat.declared_cluster_cols(part) == ["k"]
    assert cat.read(part).count() == 50_000
    assert "bucket" not in cat.read(part).columns


def test_failed_replace_restores_prior_cluster_declaration(
    spark, tmp_path
):
    """ADVICE r13: a failed CREATE OR REPLACE must leave the SURVIVING
    old table with ITS cluster declaration, not a cleared one (and not
    the replacement's)."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    _seed_src(spark, cat)
    t = "silver.sales.keepdecl"
    run_table_sql(
        cat, f"CREATE TABLE {t} CLUSTER BY (k) AS SELECT * FROM {SRC}"
    )
    assert cat.declared_cluster_cols(t) == ["k"]
    real = cat.overwrite_via_staging
    cat.overwrite_via_staging = lambda *a, **kw: (_ for _ in ()).throw(
        OSError("disk full")
    )
    with pytest.raises(OSError):
        run_table_sql(
            cat,
            f"CREATE OR REPLACE TABLE {t} CLUSTER BY (v) AS "
            f"SELECT * FROM {SRC}",
        )
    cat.overwrite_via_staging = real
    # the survivor keeps its own declaration — not (v), not None
    assert cat.declared_cluster_cols(t) == ["k"]
    assert cat.read(t).count() == 50_000
