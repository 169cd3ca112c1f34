"""Focused tests for the r14 scale-adaptive scan spread
(`__spark_entry__._spread`): opt-in hash repartition of single-split
inputs, structurally a no-op at scale (file splits ≥ parallelism)."""

import importlib.util
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def entry():
    spec = importlib.util.spec_from_file_location(
        "entry_for_spread",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_spread_repartitions_small_single_split_input(
    spark, sf_dir, entry
):
    path = f"{sf_dir}/documents.parquet"
    plain = spark.read.parquet(path)
    spread = entry._spread(spark, plain, path, ("doc_id",))
    # tiny file, 4-core session: one scan task without the spread
    assert plain.rdd.getNumPartitions() == 1
    assert (
        spread.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # the repartition node is tagged REPARTITION_BY_NUM in the plan
    assert "REPARTITION_BY_NUM" in spread._jdf.queryExecution().toString()
    # row content identical (hash partition is a pure reshuffle)
    assert spread.count() == plain.count()


def test_spread_is_noop_when_splits_cover_parallelism(
    spark, sf_dir, entry, monkeypatch
):
    # force the "100 TB case": file size ≥ maxPartitionBytes × cores →
    # _spread must return the input df object untouched (no exchange)
    path = f"{sf_dir}/documents.parquet"
    df = spark.read.parquet(path)
    monkeypatch.setattr(
        entry.os.path, "getsize", lambda p: 1 << 50
    )
    assert entry._spread(spark, df, path, ("doc_id",)) is df


def test_spread_sums_directory_tables(spark, entry, tmp_path):
    # a directory table's size is the sum of its data files (dot/_
    # metadata excluded) — a multi-file 100 TB table must not be
    # mistaken for a small one via the directory inode size
    d = tmp_path / "t.parquet"
    spark.range(1000).withColumn("k", F.col("id")).write.parquet(str(d))
    df = spark.read.parquet(str(d))
    out = entry._spread(spark, df, str(d), ("id",))
    total = sum(
        os.path.getsize(os.path.join(d, f))
        for f in os.listdir(d)
        if not f.startswith((".", "_"))
    )
    cores = spark.sparkContext.defaultParallelism
    split = 128 << 20
    if total >= split * cores:
        assert out is df
    else:
        assert out.rdd.getNumPartitions() == cores


def test_spread_missing_file_is_noop(spark, sf_dir, entry):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = entry._spread(spark, df, "/nonexistent/nowhere.parquet", ("x",))
    assert out is df
