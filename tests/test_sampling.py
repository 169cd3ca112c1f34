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


def test_capped_sample_caps_and_is_deterministic(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("key"), (F.col("id") % 7).alias("grp")
    )
    from mydatalake_spark.operators.sampling import capped_sample

    out = capped_sample(df, "grp", "key", cap=10)
    counts = [r["n"] for r in
              out.groupBy("grp").agg(F.count("*").alias("n")).collect()]
    assert all(c == 10 for c in counts)
    again = set(r["key"] for r in capped_sample(df.repartition(13), "grp",
                                                "key", cap=10).collect())
    assert again == set(r["key"] for r in out.collect())


def test_capped_sample_small_groups_keep_everything(spark):
    df = spark.range(0, 4).select(
        F.col("id").alias("key"), F.lit("g").alias("grp")
    )
    from mydatalake_spark.operators.sampling import capped_sample

    assert capped_sample(df, "grp", "key", cap=10).count() == 4


def test_capped_sample_gets_window_group_limit(spark):
    from mydatalake_spark.operators.sampling import capped_sample

    df = spark.range(0, 100).select(
        F.col("id").alias("key"), (F.col("id") % 3).alias("grp")
    )
    plan = capped_sample(df, "grp", "key", cap=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, (
        "rn<=cap must trigger map-side group limit before the shuffle"
    )


def test_pack_shards_respects_budget_and_order(spark):
    from mydatalake_spark.operators.sampling import pack_shards

    df = spark.createDataFrame(
        [(i, "s", 300) for i in range(20)], "doc_id long, src string, n long"
    )
    rows = pack_shards(df, "doc_id", "n", budget=1000,
                       partition_cols=["src"]).orderBy("doc_id").collect()
    # 300-unit items, 1000 budget, shard = floor(start_offset/1000):
    # starts 0,300,600,900 → 0; 1200,1500,1800 → 1; 2100,2400,2700 → 2
    assert [r["shard"] for r in rows[:8]] == [0, 0, 0, 0, 1, 1, 1, 2]
    # shard ids are contiguous non-decreasing in pack order
    shards = [r["shard"] for r in rows]
    assert shards == sorted(shards)


def test_pack_shards_oversized_item_gets_own_shard_progression(spark):
    from mydatalake_spark.operators.sampling import pack_shards

    df = spark.createDataFrame(
        [(1, 100), (2, 5000), (3, 100)], "doc_id long, n long"
    )
    rows = {r["doc_id"]: r["shard"] for r in
            pack_shards(df, "doc_id", "n", budget=1000).collect()}
    # item 2 starts inside shard 0 (offset 100) but pushes item 3 to
    # shard floor(5100/1000)=5 — no shard id is ever reused later
    assert rows == {1: 0, 2: 0, 3: 5}


def test_winnowing_guarantees_shared_fingerprint_for_long_matches(spark):
    """Schleimer et al. guarantee: any common substring of length
    >= k + w - 1 (= 11 here) yields at least one common fingerprint."""
    from mydatalake_spark.operators.neardup import winnow_fingerprints

    common = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [(1, "AAAA " + common + " BBBB"), (2, "xyzzy " + common + " qqqq")],
        "doc_id long, text string",
    )
    fps = df.select(
        "doc_id", F.explode(winnow_fingerprints("text", k=8, w=4)).alias("f")
    ).collect()
    s1 = {r["f"] for r in fps if r["doc_id"] == 1}
    s2 = {r["f"] for r in fps if r["doc_id"] == 2}
    assert s1 & s2, "44-char shared substring must share a fingerprint"


def test_winnowing_disjoint_texts_share_nothing(spark):
    from mydatalake_spark.operators.neardup import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz"), (2, "0123456789012345678901234")],
        "doc_id long, text string",
    )
    fps = df.select(
        "doc_id", F.explode(winnow_fingerprints("text", k=8, w=4)).alias("f")
    ).collect()
    s1 = {r["f"] for r in fps if r["doc_id"] == 1}
    s2 = {r["f"] for r in fps if r["doc_id"] == 2}
    assert s1 and s2 and not (s1 & s2)


def test_winnowing_short_text_single_fingerprint(spark):
    from mydatalake_spark.operators.neardup import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, "tiny txt"), (2, "shrt")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["fps"] for r in df.select(
        "doc_id", winnow_fingerprints("text", k=8, w=4).alias("fps")
    ).collect()}
    assert len(out[1]) == 1      # exactly k chars → one gram, one window
    assert out[2] == []          # shorter than k → no fingerprints


def test_temperature_sample_flattens_source_distribution(spark):
    """alpha=0.5 at target_rate=0.5: the rare source keeps (nearly)
    everything, the dominant one downsamples hardest, keep
    probabilities follow min(1, r·N·p_s/n_s) exactly, and decisions
    are deterministic (re-run -> identical set)."""
    from pyspark.sql import functions as F

    from mydatalake_spark.operators.sampling import temperature_sample

    rows = [(i, "big" if i < 900 else ("mid" if i < 990 else "rare"))
            for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_sample(
        df, "source", "doc_id", alpha=0.5, target_rate=0.5, salt="t1"
    )
    got = out.groupBy("source").agg(
        F.count(F.lit(1)).alias("kept"),
        F.max("__q__").alias("q"),
    ).collect()
    by = {r.source: r for r in got}

    import math
    sum_na = math.sqrt(900) + math.sqrt(90) + math.sqrt(10)
    for s, n in (("big", 900), ("mid", 90), ("rare", 10)):
        expect_q = min(1.0, 0.5 * 1000 * (math.sqrt(n) / sum_na) / n)
        assert by[s].q == pytest.approx(expect_q, rel=1e-12), s
    # the two small sources over-demand and clamp to keep-everything;
    # the dominant source absorbs all the downsampling
    assert by["rare"].q == 1.0 and by["rare"].kept == 10
    assert by["mid"].q == 1.0 and by["mid"].kept == 90
    assert by["big"].q < 0.5
    # determinism: identical second run
    again = {r.doc_id for r in temperature_sample(
        df, "source", "doc_id", alpha=0.5, target_rate=0.5, salt="t1"
    ).collect()}
    assert again == {r.doc_id for r in out.collect()}


def test_weighted_wor_exact_size_and_weight_bias(spark):
    """A-ES sample: exact k per stratum, deterministic across runs,
    and heavier rows are overrepresented vs their population share."""
    from mydatalake_spark.operators.sampling import weighted_sample_wor

    # 900 light rows (w=1) + 100 heavy rows (w=50)
    rows = [(i, "s", 1.0) for i in range(900)] + [
        (i, "s", 50.0) for i in range(900, 1000)]
    df = spark.createDataFrame(rows, "id long, src string, w double")
    out1 = weighted_sample_wor(df, "id", "w", k=100, strata_col="src",
                               salt="t")
    got1 = sorted(r.id for r in out1.collect())
    assert len(got1) == 100
    out2 = weighted_sample_wor(df, "id", "w", k=100, strata_col="src",
                               salt="t")
    assert sorted(r.id for r in out2.collect()) == got1
    heavy = sum(1 for i in got1 if i >= 900)
    # heavy rows are 10% of the population with 50x weight: expect
    # far more than 10 of the 100 slots (E ≈ 85); 40 is a loose floor
    assert heavy > 40
    # zero/negative weights never selected
    df2 = df.withColumn("w", F.when(F.col("id") < 999, 0.0).otherwise(1.0))
    out3 = weighted_sample_wor(df2, "id", "w", k=10, strata_col="src")
    assert [r.id for r in out3.collect()] == [999]


# --------------------------------------------------------- pack_greedy


def test_pack_greedy_boundary_respecting(spark):
    from mydatalake_spark.operators.sampling import pack_greedy

    rows = [(i, "g", s) for i, s in enumerate([5, 5, 5, 9, 2, 10, 1])]
    df = spark.createDataFrame(rows, "id int, g string, sz int")
    got = sorted(
        (r.id, r.pack)
        for r in pack_greedy(df, "id", "sz", 10, ["g"]).collect()
    )
    # [5,5] fills 10 exactly; every later row overflows -> own window
    assert got == [(0, 0), (1, 0), (2, 1), (3, 2), (4, 3), (5, 4), (6, 5)]
    # no window exceeds budget
    out = pack_greedy(df, "id", "sz", 10, ["g"])
    sums = {
        r.pack: r.s
        for r in out.groupBy("pack").agg(F.sum("sz").alias("s")).collect()
    }
    assert all(v <= 10 for v in sums.values())


def test_pack_greedy_groups_pack_independently(spark):
    from mydatalake_spark.operators.sampling import pack_greedy

    rows = [(0, "a", 6), (1, "a", 6), (0, "b", 6), (1, "b", 3)]
    df = spark.createDataFrame(rows, "id int, g string, sz int")
    got = {
        (r.g, r.id): r.pack
        for r in pack_greedy(df, "id", "sz", 10, ["g"]).collect()
    }
    assert got == {("a", 0): 0, ("a", 1): 1, ("b", 0): 0, ("b", 1): 0}


def test_pack_greedy_oversize_modes(spark):
    from pyspark.sql.utils import PythonException

    from mydatalake_spark.operators.sampling import pack_greedy

    rows = [(0, "g", 5), (1, "g", 15), (2, "g", 3)]
    df = spark.createDataFrame(rows, "id int, g string, sz int")
    with pytest.raises(Exception, match="budget"):
        pack_greedy(df, "id", "sz", 10, ["g"]).collect()
    got = sorted(
        (r.id, r.pack)
        for r in pack_greedy(
            df, "id", "sz", 10, ["g"], oversize="own"
        ).collect()
    )
    assert got == [(0, 0), (1, 1), (2, 2)]
    with pytest.raises(ValueError, match="'error' or 'own'"):
        pack_greedy(df, "id", "sz", 10, ["g"], oversize="truncate")


def test_pack_greedy_requires_partition_cols(spark):
    from mydatalake_spark.operators.sampling import pack_greedy

    df = spark.createDataFrame([(0, "g", 5)], "id int, g string, sz int")
    with pytest.raises(ValueError, match="partition_cols"):
        pack_greedy(df, "id", "sz", 10, [])


def test_pack_greedy_refuses_hot_stream(spark):
    """VERDICT r9 ask #5: a skewed stream must fail fast with the
    stream's key in the message (the whole group becomes ONE Arrow
    batch on one worker), not OOM an executor — the same pre-probe
    refusal contract as fastss_join's max_candidates."""
    from mydatalake_spark.operators.sampling import pack_greedy

    df = spark.createDataFrame(
        [(i, "hot" if i < 8 else "cold", 5) for i in range(10)],
        "id int, g string, sz int",
    )
    # rows bound: the hot stream (8 rows) trips max_group_rows=5
    with pytest.raises(ValueError, match=r"stream \{'g': 'hot'\}.*8 rows"):
        pack_greedy(df, "id", "sz", 10, ["g"], max_group_rows=5)
    # units bound: 8 rows x 5 units = 40 > 30
    with pytest.raises(ValueError, match="max_group_units=30"):
        pack_greedy(df, "id", "sz", 10, ["g"], max_group_units=30)
    # under both bounds the pack proceeds normally
    assert pack_greedy(
        df, "id", "sz", 10, ["g"], max_group_rows=8, max_group_units=40
    ).count() == 10


def test_pack_greedy_does_not_mutate_input_schema(spark):
    from mydatalake_spark.operators.sampling import pack_greedy

    df = spark.createDataFrame([(0, "g", 5)], "id int, g string, sz int")
    before = df.columns[:]
    pack_greedy(df, "id", "sz", 10, ["g"])
    assert df.columns == before  # StructType.add mutation regression
