"""Scale-hardening operators: salted agg/join equivalence, bucketed
join shuffle elimination, compaction."""

import os

import pytest
from pyspark.sql import functions as F

from mydatalake_spark.catalog import Catalog
from mydatalake_spark.maintenance import compact, write_bucketed
from mydatalake_spark.operators.skew import salted_agg, salted_join


def test_salted_agg_matches_plain(spark, lineitem):
    plain = {
        (r.l_returnflag): (r.s, r.c)
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    salted = {
        (r.l_returnflag): (r.s, r.c)
        for r in salted_agg(
            lineitem, ["l_returnflag"],
            {"s": ("sum", "l_quantity"), "c": ("count", "*")},
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, lineitem, orders):
    dim = orders.select("o_orderkey", "o_orderpriority")
    plain = (
        lineitem.join(dim, lineitem.l_orderkey == dim.o_orderkey)
        .groupBy("o_orderpriority").count()
    )
    salted = (
        salted_join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            dim, ["o_orderkey"], n_salts=4,
        ).groupBy("o_orderpriority").count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_bucketed_join_has_no_shuffle(spark, lineitem, orders):
    write_bucketed(
        spark, lineitem.select("l_orderkey", "l_quantity"),
        "li_bucketed", ["l_orderkey"], n_buckets=4,
        sort_cols=["l_orderkey"],
    )
    write_bucketed(
        spark, orders.select("o_orderkey", "o_totalprice"),
        "ord_bucketed", ["o_orderkey"], n_buckets=4,
        sort_cols=["o_orderkey"],
    )
    a = spark.table("li_bucketed")
    b = spark.table("ord_bucketed")
    joined = a.join(b, a.l_orderkey == b.o_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located buckets: no shuffle exchange on either join side
    assert "Exchange hashpartitioning" not in plan
    assert joined.count() > 0


def test_compact_reduces_files(spark, lineitem, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    # fragment: write with many partitions → many small files
    cat.overwrite(lineitem.repartition(32), "silver.t.li")
    files_before = [
        f for f in os.listdir(cat.path("silver.t.li")) if f.endswith(".parquet")
    ]
    assert len(files_before) >= 32
    n = compact(cat, "silver.t.li", target_file_bytes=64 * 1024 * 1024)
    files_after = [
        f for f in os.listdir(cat.path("silver.t.li")) if f.endswith(".parquet")
    ]
    assert len(files_after) == n < len(files_before)
    assert cat.read("silver.t.li").count() == lineitem.count()


def test_write_clustered_produces_disjoint_file_ranges(spark, tmp_path):
    """Footer-level evidence for data skipping: after range-clustering,
    each parquet file's (min, max) on the cluster key is tight and the
    files' ranges are pairwise disjoint — the precondition for parquet
    row-group pruning to skip ~(n-1)/n of a selective scan."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from mydatalake_spark.maintenance import write_clustered

    df = spark.range(100_000).select(
        (F.hash("id") % 1_000_000).alias("k"), F.col("id").alias("v")
    )
    out = str(tmp_path / "clustered")
    write_clustered(df, out, ["k"], n_files=8)

    ranges = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "k"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 4
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"file ranges overlap: ({lo1},{hi1}) vs ({lo2},{hi2})"

    # and the rewritten table is still the same data
    back = spark.read.parquet(out)
    assert back.count() == 100_000
    assert back.agg(F.sum("v")).collect()[0][0] == sum(range(100_000))


def test_write_zordered_gives_both_columns_locality(spark, tmp_path):
    """Multi-column data skipping: after Z-ordering on (x, y), each
    file's footer range on EACH column is a fraction of the global
    domain (a 2-D Z-curve cell), so selective predicates on either
    column prune row groups. Single-column range clustering can only
    do this for its one key."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from mydatalake_spark.maintenance import write_zordered

    # two independent uniform dimensions
    df = spark.range(100_000).select(
        F.pmod(F.hash("id"), 10_000).alias("x"),
        F.pmod(F.hash(F.col("id") + 1), 10_000).alias("y"),
        F.col("id").alias("v"),
    )
    out = str(tmp_path / "zordered")
    write_zordered(df, out, ["x", "y"], n_files=16)

    spans = {"x": [], "y": []}
    schema_cols = None
    for f in glob.glob(f"{out}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        if schema_cols is None:
            schema_cols = [
                md.row_group(0).column(i).path_in_schema
                for i in range(md.row_group(0).num_columns)
            ]
        for name in ("x", "y"):
            idx = schema_cols.index(name)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            spans[name].append(max(maxs) - min(mins))
    assert len(spans["x"]) >= 8
    # pmod → domain [0, 10000); 16 files on a 2-D Z-curve ≈ a 4×4
    # grid, so each file spans ~1/4 (~2500) of EACH dimension. A
    # random (or single-column-clustered) layout gives the full
    # ~10000 span on at least one dimension.
    for name in ("x", "y"):
        avg_span = sum(spans[name]) / len(spans[name])
        assert avg_span < 5_000, (name, avg_span)

    back = spark.read.parquet(out)
    assert back.count() == 100_000
    assert back.agg(F.sum("v")).collect()[0][0] == sum(range(100_000))


def test_zorder_key_never_reaches_the_sign_bit(spark):
    """4 columns x default 16 bits would place a bit at position 63
    (the long sign bit) and invert the sort for large keys; zorder_key
    auto-reduces bits to 63 // n_cols so the key stays non-negative."""
    from pyspark.sql import functions as F

    from mydatalake_spark.maintenance import zorder_key

    cols = ["a", "b", "c", "d"]
    hi = (1 << 31) - 1
    df = spark.range(2).select(
        *[(F.when(F.col("id") == 1, F.lit(hi)).otherwise(F.lit(0)))
          .cast("long").alias(c) for c in cols]
    )
    key = zorder_key(cols, [0] * 4, [hi] * 4, bits=16)
    rows = df.select(key.alias("z")).collect()
    assert all(r.z >= 0 for r in rows)
    # max-corner key uses all 4*15=60 interleaved bits, none above 62
    assert max(r.z for r in rows) < (1 << 63)
    assert max(r.z for r in rows) > 0


def test_zorder_key_rejects_impossible_width():
    import pytest

    from mydatalake_spark.maintenance import zorder_key

    with pytest.raises(ValueError, match="at least one column"):
        zorder_key([], [], [])
    cols = [f"c{i}" for i in range(64)]
    with pytest.raises(ValueError, match="cannot interleave"):
        zorder_key(cols, [0] * 64, [1] * 64)


def test_compact_skewed_layout_rebalances(spark, lineitem, tmp_path):
    """coalesce can never split an input file, so a skewed layout (one
    big file + many tiny ones) must route through the repartition
    fallback and come out balanced; a uniform layout must keep the
    no-shuffle coalesce fast path."""
    from mydatalake_spark.maintenance import file_sizes

    cat = Catalog(spark, str(tmp_path / "wh"))
    # skewed: ~95% of rows in one input file, crumbs in the others
    big = lineitem.filter("l_orderkey % 20 != 0").coalesce(1)
    crumbs = lineitem.filter("l_orderkey % 20 = 0").repartition(16)
    cat.overwrite(big.unionByName(crumbs), "silver.t.skewed")
    # force a genuinely skewed on-disk layout: one file holds most bytes
    sizes_in = file_sizes(cat, "silver.t.skewed")
    assert max(sizes_in) > 4.0 * (sum(sizes_in) / len(sizes_in))
    target = max(1, sum(sizes_in) // 4)
    n = compact(cat, "silver.t.skewed", target_file_bytes=target)
    sizes_out = file_sizes(cat, "silver.t.skewed")
    assert len(sizes_out) == n > 1
    # balanced output: no file dominates anymore
    assert max(sizes_out) <= 2.0 * (sum(sizes_out) / len(sizes_out))
    assert cat.read("silver.t.skewed").count() == lineitem.count()
