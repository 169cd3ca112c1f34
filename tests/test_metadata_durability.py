"""Durability of the version-root metadata books across lifecycle
operations — regression tests for the r13 code-review findings: vacuum
must never strip declarations, MERGE must honor the identity ALWAYS
rule, failed DDL must not half-apply, LIKE must carry the full
declared surface, and the comment book must follow column DDL."""

import os

import pytest
from pyspark.sql import functions as F

from mydatalake_spark.catalog import Catalog
from mydatalake_spark.plans.table_sql import run_table_sql

TBL = "silver.sales.t"


def test_vacuum_preserves_metadata_books(spark, tmp_path):
    # vacuum(keep=0) on a keep_versions=0 catalog: no versions exist,
    # so the old code rmtree'd the version root — taking the identity
    # high-water, CLUSTER BY declaration, comments and TBLPROPERTIES
    # with it. Books must outlive any vacuum; only DROP/TRUNCATE end
    # the lifecycle.
    cat = Catalog(spark, str(tmp_path / "wh"))
    run_table_sql(
        cat,
        f"CREATE TABLE {TBL} ("
        "sk BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)",
    )
    run_table_sql(cat, f"INSERT INTO {TBL} (v) VALUES ('a'), ('b')")
    run_table_sql(cat, f"COMMENT ON TABLE {TBL} IS 'keep'")
    run_table_sql(
        cat, f"ALTER TABLE {TBL} SET TBLPROPERTIES ('k' = 'v')"
    )
    cat.vacuum(TBL, keep=0)
    assert "sk" in cat.identity_columns(TBL)
    assert cat.identity_columns(TBL)["sk"]["high"] == 2
    assert cat.table_comment(TBL) == "keep"
    assert cat.table_properties(TBL) == {"k": "v"}
    # the next insert continues the sequence instead of NULL-filling
    run_table_sql(cat, f"INSERT INTO {TBL} (v) VALUES ('c')")
    got = sorted(r.sk for r in cat.read(TBL).collect())
    assert got == [1, 2, 3]
    # clustered declaration survives too
    cat2 = Catalog(spark, str(tmp_path / "wh2"))
    src = spark.range(100).select(
        (F.col("id") % 7).alias("a"), F.col("id").alias("b")
    )
    cat2.overwrite(src, "b.s.raw")
    run_table_sql(
        cat2, "CREATE TABLE b.s.c CLUSTER BY (a) AS SELECT * FROM b.s.raw"
    )
    cat2.vacuum("b.s.c", keep=0)
    assert cat2.declared_cluster_cols("b.s.c") == ["a"]


def test_merge_refuses_explicit_identity_values(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    run_table_sql(
        cat,
        f"CREATE TABLE {TBL} ("
        "sk BIGINT GENERATED ALWAYS AS IDENTITY, k INT, v STRING)",
    )
    run_table_sql(
        cat, f"INSERT INTO {TBL} (k, v) VALUES (1, 'a'), (2, 'b')"
    )
    src = spark.createDataFrame(
        [(999, 2, "x"), (998, 9, "y")], "sk long, k int, v string"
    )
    cat.overwrite(src, "b.s.changes")
    with pytest.raises(ValueError, match="GENERATED ALWAYS AS IDENT"):
        run_table_sql(
            cat,
            f"MERGE INTO {TBL} t USING b.s.changes s ON t.k = s.k "
            "WHEN NOT MATCHED THEN INSERT (sk, k, v) "
            "VALUES (s.sk, s.k, s.v)",
        )
    with pytest.raises(ValueError, match="GENERATED ALWAYS AS IDENT"):
        run_table_sql(
            cat,
            f"MERGE INTO {TBL} t USING b.s.changes s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET sk = 12345",
        )
    # an INSERT list OMITTING the identity column still allocates:
    # the inserted rows arrive with a NULL slot and the allocator
    # fills it above the high-water mark
    run_table_sql(
        cat,
        f"MERGE INTO {TBL} t USING b.s.changes s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)",
    )
    got = {r.k: r.sk for r in cat.read(TBL).collect()}
    # engine-assigned above the high-water: unique, never NULL, never
    # a reuse of 1/2 (gaps are fine — Delta's documented behavior)
    assert len(set(got.values())) == 3
    assert all(v is not None for v in got.values())
    assert got[9] > 2
    assert cat.identity_columns(TBL)["sk"]["high"] >= got[9]


def test_failed_drop_column_restores_declarations(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    run_table_sql(
        cat,
        f"CREATE TABLE {TBL} ("
        "sk BIGINT GENERATED ALWAYS AS IDENTITY, a INT, b BIGINT) "
        "CLUSTER BY (a)",
    )
    run_table_sql(
        cat, f"INSERT INTO {TBL} (a, b) VALUES (1, 10), (2, 20)"
    )
    before = cat.identity_columns(TBL)
    assert before["sk"]["high"] == 2
    # dropping sk together with the CLUSTER BY column fails in the
    # rewrite (declared cluster column missing from the frame) — the
    # identity declaration must survive the failed statement
    with pytest.raises(ValueError, match=r"\['a'\]"):
        run_table_sql(cat, f"ALTER TABLE {TBL} DROP COLUMNS (sk, a)")
    assert cat.identity_columns(TBL) == before
    assert "sk" in cat.read(TBL).columns


def test_create_table_like_carries_identity_and_comments(
    spark, tmp_path
):
    cat = Catalog(spark, str(tmp_path / "wh"))
    run_table_sql(
        cat,
        f"CREATE TABLE {TBL} ("
        "sk BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 5 "
        "INCREMENT BY 2), v STRING COMMENT 'val') "
        "COMMENT 'tbl' TBLPROPERTIES ('p' = 'q')",
    )
    run_table_sql(cat, f"INSERT INTO {TBL} (v) VALUES ('a')")
    run_table_sql(cat, f"CREATE TABLE silver.sales.c LIKE {TBL}")
    ispec = cat.identity_columns("silver.sales.c")["sk"]
    assert (ispec["start"], ispec["step"]) == (5, 2)
    assert ispec["high"] is None         # fresh counter, empty copy
    assert cat.table_comment("silver.sales.c") == "tbl"
    assert cat.column_comments("silver.sales.c") == {"v": "val"}
    assert cat.table_properties("silver.sales.c") == {"p": "q"}
    run_table_sql(
        cat, "INSERT INTO silver.sales.c (v) VALUES ('x'), ('y')"
    )
    got = sorted(r.sk for r in cat.read("silver.sales.c").collect())
    assert got == [5, 7]                 # allocated, not NULL-filled


def test_failed_ctas_does_not_orphan_cluster_declaration(
    spark, tmp_path
):
    cat = Catalog(spark, str(tmp_path / "wh"))
    src = spark.range(10).select(
        (F.col("id") % 3).alias("a"), F.col("id").alias("b")
    )
    cat.overwrite(src, "b.s.raw")
    with pytest.raises(Exception, match="boom"):
        run_table_sql(
            cat,
            f"CREATE TABLE {TBL} CLUSTER BY (a) AS "
            "SELECT a, b, raise_error('boom') AS c FROM b.s.raw",
        )
    assert not cat.exists(TBL)
    assert cat.declared_cluster_cols(TBL) is None
    # the name is NOT wedged: a different layout now succeeds
    run_table_sql(
        cat,
        f"CREATE TABLE {TBL} PARTITIONED BY (a) "
        "AS SELECT * FROM b.s.raw",
    )
    assert cat.read(TBL).count() == 10


def test_column_comments_follow_rename_and_drop(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(1, "a", 1.0)], "id int, c string, z double"
    )
    cat.overwrite(df, TBL)
    run_table_sql(cat, f"COMMENT ON COLUMN {TBL}.c IS 'pii'")
    run_table_sql(cat, f"COMMENT ON COLUMN {TBL}.z IS 'zz'")
    run_table_sql(cat, f"ALTER TABLE {TBL} RENAME COLUMN c TO d")
    assert cat.column_comments(TBL) == {"d": "pii", "z": "zz"}
    run_table_sql(cat, f"ALTER TABLE {TBL} DROP COLUMN z")
    assert cat.column_comments(TBL) == {"d": "pii"}
    # a future same-named column does NOT inherit the ghost comment
    run_table_sql(cat, f"ALTER TABLE {TBL} ADD COLUMNS (z INT)")
    assert cat.column_comments(TBL) == {"d": "pii"}


def test_merge_star_expansion_refuses_identity_carrying_source(
    spark, tmp_path
):
    # SET */INSERT * copy source values verbatim, so a source that
    # CARRIES the identity column would write explicit ids with no
    # high-water bump (Delta refuses this too). Sources without the
    # column are refused by the star column-match rule downstream;
    # explicit lists omitting it remain the supported CDC shape.
    cat = Catalog(spark, str(tmp_path / "wh"))
    run_table_sql(
        cat,
        f"CREATE TABLE {TBL} ("
        "sk BIGINT GENERATED ALWAYS AS IDENTITY, k INT, v STRING)",
    )
    run_table_sql(cat, f"INSERT INTO {TBL} (k, v) VALUES (1, 'a')")
    src = spark.createDataFrame(
        [(999, 1, "x"), (998, 9, "y")], "sk long, k int, v string"
    )
    cat.overwrite(src, "b.s.changes")
    with pytest.raises(ValueError, match="carries"):
        run_table_sql(
            cat,
            f"MERGE INTO {TBL} t USING b.s.changes s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *",
        )
    assert cat.identity_columns(TBL)["sk"]["high"] == 1
    assert {r.sk for r in cat.read(TBL).collect()} == {1}


def test_redeclaring_cluster_keys_invalidates_file_book(
    spark, tmp_path
):
    cat = Catalog(spark, str(tmp_path / "wh"))
    src = spark.range(5_000).select(
        (F.hash("id") % 97).alias("x"),
        (F.hash(F.col("id") + 1) % 97).alias("y"),
        F.col("id").alias("v"),
    )
    cat.overwrite(src, "b.s.raw")
    run_table_sql(
        cat, f"CREATE TABLE {TBL} CLUSTER BY (x) AS SELECT * FROM b.s.raw"
    )
    assert cat.clustered_files(TBL)        # marked by the write
    run_table_sql(cat, f"ALTER TABLE {TBL} CLUSTER BY (x, y)")
    # the book certified the OLD keys' layout — it must not survive
    assert cat.clustered_files(TBL) == set()
    # so the next OPTIMIZE actually re-clusters (not a silent no-op)
    assert run_table_sql(cat, f"OPTIMIZE {TBL}") >= 1
    assert cat.clustered_files(TBL)


def test_failed_replace_ctas_does_not_leave_new_declaration(
    spark, tmp_path
):
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([(1, "a")], "id int, v string")
    cat.overwrite(df, TBL)                 # no 'c' column
    cat.overwrite(
        spark.range(10).select((F.col("id") % 3).alias("c")), "b.s.src"
    )
    with pytest.raises(Exception, match="boom"):
        run_table_sql(
            cat,
            f"CREATE OR REPLACE TABLE {TBL} CLUSTER BY (c) AS "
            "SELECT c, raise_error('boom') AS z FROM b.s.src",
        )
    # the old table survived — it must NOT carry the new declaration
    # (its own schema has no 'c'; every overwrite would wedge)
    assert cat.declared_cluster_cols(TBL) is None
    cat.overwrite(df, TBL)                 # still writable
    assert cat.read(TBL).count() == 1


def test_comment_on_missing_column_still_refused_after_ddl(
    spark, tmp_path
):
    # the DDL book edits went internal; the public statement keeps its
    # validation — including the IS NULL form
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.overwrite(spark.createDataFrame([(1,)], "id int"), TBL)
    with pytest.raises(ValueError, match="typo"):
        run_table_sql(cat, f"COMMENT ON COLUMN {TBL}.typo IS NULL")


def test_identity_sync_on_carried_values_and_type_guard(
    spark, tmp_path
):
    # Carried values PAST the high-water (externally loaded files with
    # pre-assigned ids) move the book — Delta SYNC IDENTITY — so a
    # later allocation can never mint one of them again.
    cat = Catalog(spark, str(tmp_path / "wh"))
    run_table_sql(
        cat,
        f"CREATE TABLE {TBL} ("
        "sk BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)",
    )
    run_table_sql(cat, f"INSERT INTO {TBL} (v) VALUES ('a')")  # sk=1
    carried = spark.createDataFrame(
        [(150, "x"), (200, "y")], "sk long, v string"
    )
    cat.append(carried, TBL)               # library path carries ids
    assert cat.identity_columns(TBL)["sk"]["high"] == 200
    run_table_sql(cat, f"INSERT INTO {TBL} (v) VALUES ('b')")
    ids = sorted(r.sk for r in cat.read(TBL).collect())
    assert len(ids) == len(set(ids)) == 4
    assert ids[-1] > 200                   # allocated past the sync

    # the reserved range must fit the declared type: an INT identity
    # about to cross 2^31 raises instead of wrapping negative
    run_table_sql(
        cat,
        "CREATE TABLE silver.sales.narrow ("
        "sk INT GENERATED ALWAYS AS IDENTITY (START WITH 2147483646), "
        "v STRING)",
    )
    run_table_sql(
        cat, "INSERT INTO silver.sales.narrow (v) VALUES ('a'), ('b')"
    )
    with pytest.raises(ValueError, match="range"):
        run_table_sql(
            cat, "INSERT INTO silver.sales.narrow (v) VALUES ('c')"
        )


def test_identity_optional_clause_grammar(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    run_table_sql(
        cat,
        f"CREATE TABLE {TBL} ("
        "sk BIGINT GENERATED ALWAYS AS IDENTITY (INCREMENT BY 3), "
        "v STRING)",
    )
    spec = cat.identity_columns(TBL)["sk"]
    assert (spec["start"], spec["step"]) == (1, 3)
    run_table_sql(cat, f"INSERT INTO {TBL} (v) VALUES ('a'), ('b')")
    assert sorted(r.sk for r in cat.read(TBL).collect()) == [1, 4]


def test_monotonic_appends_compact_without_overlap(spark, tmp_path):
    # time-series shape: every appended file's key range sits strictly
    # above the previous max — no overlaps ever, but OPTIMIZE must
    # still bin-pack the accumulating small files (the size arm),
    # not report success-as-no-op forever.
    import glob

    cat = Catalog(spark, str(tmp_path / "wh"))
    run_table_sql(cat, f"CREATE TABLE {TBL} (k BIGINT, v BIGINT)")
    run_table_sql(cat, f"ALTER TABLE {TBL} CLUSTER BY (k)")
    for day in range(6):
        inc = spark.range(day * 1000, (day + 1) * 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        cat.append(inc.coalesce(1), TBL)
    files_before = len(glob.glob(cat.path(TBL) + "/*.parquet"))
    assert files_before >= 6
    from mydatalake_spark.maintenance import optimize_table

    n = optimize_table(cat, TBL)           # default 128MB target
    assert n >= 1
    files_after = len(glob.glob(cat.path(TBL) + "/*.parquet"))
    assert files_after < files_before
    assert cat.read(TBL).count() == 6000
    # and the result is still globally disjoint on k
    import pyarrow.parquet as pq

    rgs = []
    for f in glob.glob(cat.path(TBL) + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            c = md.row_group(rg).column(0)
            if c.path_in_schema == "k":
                rgs.append((c.statistics.min, c.statistics.max))
    rgs.sort()
    for (l1, h1), (l2, h2) in zip(rgs, rgs[1:]):
        assert h1 <= l2


def test_copy_into_abandon_sweeps_partial_files(spark, tmp_path):
    # a crashed copy_into can leave txn-prefixed files live with no
    # token; abandoning the pending batch must sweep them, or the
    # retry (different txn id) double-loads those rows
    import json
    import os

    from mydatalake_spark.ingest import copy_into

    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.overwrite(
        spark.createDataFrame([(0, "seed")], "id long, v string"), TBL
    )
    drop = tmp_path / "drop"
    drop.mkdir()
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    ).coalesce(1).write.mode("overwrite").parquet(str(drop / "batch1"))
    # forge the crash: pending record written, half the batch moved in
    pend = {
        "txn": "deadbeef",
        "files": sorted(
            str(p) for p in (drop / "batch1").glob("part-*.parquet")
        ),
    }
    pending_path = os.path.join(
        cat._version_root(TBL), ".copy_into.pending.json"
    )
    os.makedirs(os.path.dirname(pending_path), exist_ok=True)
    with open(pending_path, "w") as fh:
        json.dump(pend, fh)
    import shutil

    src_file = pend["files"][0]
    shutil.copy2(
        src_file,
        os.path.join(
            cat.path(TBL), f"txn-deadbeef-{os.path.basename(src_file)}"
        ),
    )
    cat._invalidate(TBL)
    assert cat.read(TBL).count() == 3      # partial rows ARE live
    loaded = copy_into(
        cat, TBL, str(drop / "batch1") + "/*.parquet",
        file_format="parquet", abandon_pending=True,
    )
    # the partial file was swept BEFORE the fresh batch loaded, so
    # each source row appears exactly once
    got = sorted(
        (r.id, r.v) for r in cat.read(TBL).collect()
    )
    assert got == [(0, "seed"), (1, "a"), (2, "b")], got
    assert loaded == 2
