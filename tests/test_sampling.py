"""Deterministic sampling/splitting and text-pipeline operators:
properties that matter at 100 TB — partition-layout independence,
append stability, exact coverage — plus chunking and PII redaction
edge cases."""

import pytest
from pyspark.sql import functions as F

from mydatalake_spark.functions.text import chunk_text, redact_pii
from mydatalake_spark.operators.sampling import (
    hash_sample,
    hash_split,
    split_column,
    stratified_sample,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 5000).withColumnRenamed("id", "key")


def test_hash_split_partitions_every_row_exactly_once(spark, ids):
    out = hash_split(ids, "key", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 5000
    assert set(counts) == {"train", "val", "test"}
    # binomial(5000, .8) is within ±3σ ≈ ±85 of 4000 essentially always
    assert abs(counts["train"] - 4000) < 150, counts
    assert abs(counts["val"] - 500) < 100, counts


def test_hash_split_is_partition_layout_independent(spark, ids):
    a = hash_split(ids.repartition(17), "key", {"a": 0.5, "b": 0.5})
    b = hash_split(ids.coalesce(1), "key", {"a": 0.5, "b": 0.5})
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_hash_split_is_append_stable(spark, ids):
    """Adding rows must never reassign existing ones (content-addressed,
    unlike fraction-of-count or rand(seed) schemes)."""
    w = {"train": 0.9, "test": 0.1}
    before = dict(
        hash_split(ids, "key", w).select("key", "split").collect()
    )
    bigger = spark.range(0, 10000).withColumnRenamed("id", "key")
    after = dict(
        hash_split(bigger, "key", w).select("key", "split").collect()
    )
    assert all(after[k] == v for k, v in before.items())


def test_hash_split_salt_changes_assignment(spark, ids):
    w = {"a": 0.5, "b": 0.5}
    x = hash_split(ids, "key", w, salt="s1")
    y = hash_split(ids, "key", w, salt="s2")
    differing = (
        x.alias("x").join(y.alias("y"), "key")
        .filter(F.col("x.split") != F.col("y.split")).count()
    )
    assert differing > 1000  # ~half should move under an independent hash


def test_hash_split_rejects_bad_weights(spark, ids):
    with pytest.raises(ValueError):
        hash_split(ids, "key", {"a": 0.0, "b": 0.0}).collect()
    with pytest.raises(ValueError):
        hash_split(ids, "key", {"a": -1.0, "b": 2.0}).collect()


def test_split_column_is_scan_fused(spark, ids):
    out = ids.select(split_column("key", {"a": 0.5, "b": 0.5}).alias("s"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "split must not shuffle"


def test_hash_sample_consistent_across_tables(spark):
    """Sampling two tables by the same key keeps the SAME keys — the
    property that lets you subsample a fact table and its satellite
    tables without breaking referential integrity."""
    t1 = spark.range(0, 2000).withColumnRenamed("id", "k")
    t2 = spark.range(1000, 3000).withColumnRenamed("id", "k")
    s1 = set(r["k"] for r in hash_sample(t1, "k", 0.3, salt="x").collect())
    s2 = set(r["k"] for r in hash_sample(t2, "k", 0.3, salt="x").collect())
    overlap_keys = set(range(1000, 2000))
    assert s1 & overlap_keys == s2 & overlap_keys


def test_hash_sample_fraction_bounds(spark, ids):
    assert hash_sample(ids, "key", 0.0).count() == 0
    assert hash_sample(ids, "key", 1.0).count() == 5000
    with pytest.raises(ValueError):
        hash_sample(ids, "key", 1.5)


def test_stratified_sample_respects_per_stratum_fractions(spark):
    df = spark.range(0, 4000).select(
        F.col("id").alias("key"),
        (F.col("id") % 2 == 0).cast("string").alias("stratum"),
    )
    out = stratified_sample(
        df, "key", "stratum", {"true": 1.0, "false": 0.25}
    )
    counts = {r["stratum"]: r["n"] for r in
              out.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert counts["true"] == 2000           # keep-all stratum is exact
    assert abs(counts["false"] - 500) < 120  # ±3σ of binomial(2000,.25)


def test_stratified_sample_default_fraction_zero_drops_unknown(spark):
    df = spark.range(0, 100).select(
        F.col("id").alias("key"), F.lit("other").alias("stratum")
    )
    assert stratified_sample(df, "key", "stratum", {"x": 1.0}).count() == 0


def test_chunk_text_covers_document_with_overlap(spark):
    df = spark.createDataFrame([(1, "a" * 1000)], "doc_id long, text string")
    rows = chunk_text(df, "text", size=256, stride=192).orderBy("chunk_id") \
        .select("chunk_id", F.length("chunk").alias("n")).collect()
    # ceil((1000-256)/192)+1 = 5 windows; last one short
    assert [r["chunk_id"] for r in rows] == [0, 1, 2, 3, 4]
    assert [r["n"] for r in rows] == [256, 256, 256, 256, 1000 - 4 * 192]


def test_chunk_text_short_and_empty_docs_yield_one_chunk(spark):
    df = spark.createDataFrame(
        [(1, "short"), (2, "")], "doc_id long, text string"
    )
    out = chunk_text(df, "text", size=256, stride=192)
    rows = {r["doc_id"]: r["chunk"] for r in out.collect()}
    assert rows == {1: "short", 2: ""}


def test_chunk_text_reconstructs_prefix(spark):
    """Non-overlapped prefixes of consecutive chunks re-concatenate to
    the original document — no bytes lost or duplicated."""
    text = "".join(chr(97 + i % 26) for i in range(700))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_text(df, "text", size=256, stride=192).orderBy("chunk_id") \
        .select("chunk").collect()
    rebuilt = "".join(r["chunk"][:192] for r in rows[:-1]) + rows[-1]["chunk"]
    assert rebuilt == text


def test_redact_pii_replaces_all_occurrences_and_types(spark):
    df = spark.createDataFrame(
        [(
            "mail a@b.com and c.d+e@f-g.org, ssn 123-45-6789, "
            "call 555-123-4567 or 555.987.6543, host 192.168.0.1 twice "
            "192.168.0.1",
        )],
        "text string",
    )
    out = df.select(redact_pii("text").alias("r")).collect()[0]["r"]
    assert out.count("[EMAIL]") == 2
    assert out.count("[SSN]") == 1
    assert out.count("[PHONE]") == 2
    assert out.count("[IP]") == 2
    for leak in ("a@b.com", "123-45-6789", "555-123-4567", "192.168.0.1"):
        assert leak not in out


def test_redact_pii_leaves_clean_text_alone(spark):
    df = spark.createDataFrame(
        [("plain text with numbers 12345 and dots a.b.c",)], "text string"
    )
    assert df.select(redact_pii("text").alias("r")).collect()[0]["r"] == \
        "plain text with numbers 12345 and dots a.b.c"
