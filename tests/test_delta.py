"""Delta Lake capability flag: gated paths fail fast without
delta-spark and run the ACID MERGE when it is importable.

The reference's production path is Delta on Databricks
(reference lib/ingestors.py:92-96,113-126); this repo emulates MERGE
with a join on parquet and flips to real DeltaTable MERGE behind
``delta_available()``. This environment has no delta-spark, so the
positive-path tests skip and the capability-error tests run.
"""

import pytest

from mydatalake_spark.catalog import Catalog, delta_available
from mydatalake_spark.operators.merge import merge_upsert_delta

HAVE_DELTA = delta_available()


@pytest.mark.skipif(HAVE_DELTA, reason="delta installed: error path n/a")
def test_catalog_delta_without_package_fails_fast(spark, tmp_path):
    with pytest.raises(ImportError, match="delta-spark"):
        Catalog(spark, str(tmp_path), fmt="delta")


@pytest.mark.skipif(HAVE_DELTA, reason="delta installed: error path n/a")
def test_merge_delta_without_package_fails_fast(spark, tmp_path):
    src = spark.createDataFrame([(1, "a", 1)], "id int, v string, ts int")
    with pytest.raises(ImportError, match="delta-spark"):
        merge_upsert_delta(spark, str(tmp_path / "t"), src, ["id"], "ts")


@pytest.mark.skipif(not HAVE_DELTA, reason="delta-spark not importable")
def test_delta_cdc_merge_end_to_end(spark, tmp_path):
    """Same scenario as test_merge_upsert_semantics, on real Delta:
    newer source row wins, stale row is NOT re-inserted, new key
    inserted, null-ts follows the -infinity rule."""
    path = str(tmp_path / "delta_tbl")
    target = spark.createDataFrame(
        [(1, "t1", 10), (2, "t2", 20), (3, "t3", None)],
        "id int, v string, ts int",
    )
    target.write.format("delta").save(path)
    source = spark.createDataFrame(
        [(1, "s1", 11), (2, "s2", 5), (3, "s3", None), (4, "s4", 1)],
        "id int, v string, ts int",
    )
    merge_upsert_delta(spark, path, source, ["id"], "ts")
    got = {
        (r.id, r.v)
        for r in spark.read.format("delta").load(path).collect()
    }
    assert got == {(1, "s1"), (2, "t2"), (3, "s3"), (4, "s4")}
