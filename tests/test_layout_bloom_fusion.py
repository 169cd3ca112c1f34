"""Round-6 operator tests: Z-order layout, bloom-filter pruning,
Cohen's kappa, boilerplate stripping, RRF fusion."""

from pyspark.sql import functions as F


def test_zorder_key_interleaves_bits(spark):
    from mydatalake_spark.operators.layout import zorder_key

    # (x=0b11, y=0b01) with 2 bits -> bits land at
    # pos0=x0=1, pos1=y0=1, pos2=x1=1, pos3=y1=0 -> 0b0111 = 7
    row = spark.createDataFrame([(3, 1)], "x long, y long").select(
        zorder_key(["x", "y"], bits=2).alias("z")
    ).first()
    assert row.z == 7


def test_zorder_key_sql_matches_spark(spark):
    import duckdb

    from mydatalake_spark.operators.layout import zorder_key, zorder_key_sql

    rows = [(i % 17, (i * 7) % 23) for i in range(50)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_key(["x", "y"], bits=6).alias("z")
        ).collect()
    }
    con = duckdb.connect()
    expr = zorder_key_sql(["x", "y"], bits=6)
    for (x, y), z in got.items():
        (zz,) = con.execute(
            f"SELECT {expr} FROM (SELECT {x} AS x, {y} AS y)"
        ).fetchone()
        assert zz == z, (x, y, z, zz)


def test_cluster_by_zorder_tightens_zone_maps(spark):
    """After Z-order clustering, per-partition bounding boxes must be
    dramatically tighter than under round-robin layout — the property
    that makes min/max file skipping work."""
    from mydatalake_spark.operators.layout import (
        cluster_by_zorder,
        zone_maps,
    )

    n = 4096
    rows = [((i * 2654435761) % 1024, (i * 40503) % 1024)
            for i in range(n)]
    df = spark.createDataFrame(rows, "a long, b long")

    def avg_box_area(frame, n_parts):
        zm = zone_maps(
            frame.withColumn("pid", F.spark_partition_id()),
            F.col("pid"),
            ["a", "b"],
        ).collect()
        areas = [
            (r["max_a"] - r["min_a"] + 1) * (r["max_b"] - r["min_b"] + 1)
            for r in zm
        ]
        return sum(areas) / len(areas)

    random_area = avg_box_area(df.repartition(16), 16)
    clustered = cluster_by_zorder(df, ["a", "b"], n_files=16, bits=10)
    assert "__z__" not in clustered.columns
    clustered_area = avg_box_area(clustered, 16)
    # random layout boxes span ~the whole 1024x1024 domain; z-ordered
    # partitions own compact curve segments
    assert clustered_area < random_area / 4, (clustered_area, random_area)


def test_bloom_filter_no_false_negatives_and_low_fp(spark):
    import pytest

    from mydatalake_spark.operators.bloomjoin import (
        bloom_build,
        bloom_probe_keys,
    )

    build = spark.range(0, 500).withColumnRenamed("id", "k")
    probe = spark.range(0, 5000).withColumnRenamed("id", "k")
    # both hash families share the contract: zero false negatives,
    # bounded false positives (fill ~1500/65536 bits -> fp ~(0.023)^3)
    for family in ("native", "portable"):
        bloom = bloom_build(build, "k", m_bits=1 << 16, k=3, family=family)
        flagged = {
            r.k: r.bloom_pass
            for r in bloom_probe_keys(
                probe, "k", bloom, m_bits=1 << 16, k=3, family=family
            ).collect()
        }
        assert all(flagged[k] for k in range(500)), family
        fps = sum(1 for k in range(500, 5000) if flagged[k])
        assert fps < 45, (family, fps)
    with pytest.raises(ValueError, match="family"):
        bloom_build(build, "k", family="sha2")


def test_bloom_prune_portable_family_matches_native_join_result(spark):
    """The family is an execution choice, never a semantics one: a
    bloom_filtered_join returns the same rows under the portable md5
    lanes as under native xxhash64 (different fp sets, same join
    output), and the portable prune agrees key-for-key with the
    portable probe_keys audit — the pairing the oracle replays."""
    from mydatalake_spark.operators.bloomjoin import (
        bloom_build,
        bloom_filtered_join,
        bloom_mask_array,
        bloom_probe_keys,
        bloom_prune,
    )

    build = (
        spark.range(0, 300)
        .selectExpr("id * 3 AS k", "id AS payload")
    )
    probe = spark.range(0, 3000).selectExpr("id AS k", "id % 7 AS v")
    outs = []
    for family in ("native", "portable"):
        out = bloom_filtered_join(
            probe, build, "k", m_bits=1 << 14, k=3, family=family
        )
        outs.append({tuple(r) for r in out.collect()})
    assert outs[0] == outs[1]

    # prune must agree key-for-key with the probe_keys audit under the
    # SAME family — k=3 covers the single-digest portable path, k=5
    # the two-digest mixed-lane path (4 lanes + 1 lane).
    for family in ("native", "portable"):
        for k in (3, 5):
            bloom = bloom_build(
                build, "k", m_bits=1 << 14, k=k, family=family
            )
            words = bloom_mask_array(bloom, m_bits=1 << 14)
            pruned = {
                r.k
                for r in bloom_prune(
                    probe.select("k"), "k", words, k=k, family=family
                ).collect()
            }
            audited = {
                r.k
                for r in bloom_probe_keys(
                    probe.select("k"), "k", bloom,
                    m_bits=1 << 14, k=k, family=family,
                ).collect()
                if r.bloom_pass
            }
            assert pruned == audited, (family, k)


def test_cohens_kappa_perfect_and_chance(spark):
    from mydatalake_spark.functions.stats import cohens_kappa

    perfect = spark.createDataFrame(
        [("x", "x"), ("y", "y"), ("z", "z"), ("x", "x")],
        "a string, b string",
    )
    assert cohens_kappa(perfect, "a", "b").first().kappa == 1.0

    # independent raters with uniform marginals -> kappa ~ 0
    rows = [(["x", "y"][i % 2], ["x", "y"][(i // 2) % 2])
            for i in range(400)]
    chance = spark.createDataFrame(rows, "a string, b string")
    assert abs(cohens_kappa(chance, "a", "b").first().kappa) < 1e-9


def test_boilerplate_strip_invariants(spark):
    from mydatalake_spark.operators.paradedup import boilerplate_strip

    common = "A" * 48
    docs = spark.createDataFrame(
        [
            (0, common + "unique-zero" + "B" * 37),
            (1, common + "unique-one-" + "C" * 37),
            (2, "totally-distinct-text-" + "D" * 26),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in boilerplate_strip(
        docs, size=48, max_df=1).collect()}
    # one row per input doc, null text included
    assert set(out) == {0, 1, 2, 3}
    # the shared 48-char prefix is stripped from BOTH docs
    assert out[0].removed_chunks == 1 and out[1].removed_chunks == 1
    assert out[0].kept_chunks == 1 and out[2].removed_chunks == 0
    # identical surviving remainder -> different md5 (different uniques)
    assert out[0].clean_md5 != out[1].clean_md5


def test_rrf_fuse_math_and_shape(spark):
    from mydatalake_spark.similarity.fusion import rank_top_n, rrf_fuse

    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(2, 1), (4, 2)], "doc_id long, rank int"
    )
    got = {r.doc_id: r for r in rrf_fuse([a, b], "doc_id", k=60).collect()}
    assert got[2].in_lists == 2
    assert abs(got[2].rrf_score - round(1 / 62 + 1 / 61, 6)) < 1e-9
    assert got[4].in_lists == 1 and abs(
        got[4].rrf_score - round(1 / 62, 6)
    ) < 1e-9

    ranked = rank_top_n(
        spark.createDataFrame(
            [(i, float(i % 5)) for i in range(20)], "doc_id long, s double"
        ),
        F.col("s"),
        "doc_id",
        n=5,
    ).collect()
    assert len(ranked) == 5
    # score desc, id asc tiebreak: 4.0 scores are ids 4,9,14,19 then 3.0 id 3
    assert [r.doc_id for r in sorted(ranked, key=lambda r: r.rank)] == [
        4, 9, 14, 19, 3,
    ]


def test_plan_compaction_groups_and_order(spark):
    from mydatalake_spark.maintenance import plan_compaction

    files = spark.createDataFrame(
        [(i, 100) for i in range(10)], "bucket int, n_rows long"
    )
    out = plan_compaction(files, "n_rows", "bucket", 250.0).collect()
    groups = {r.bucket: r.group_id for r in out}
    # cumulative starts 0,100,...,900 / 250 -> 0,0,0,1,1,2,2,2,3,3
    assert [groups[i] for i in range(10)] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]
    # never splits a file; order preserved within groups
    assert all(r.n_rows == 100 for r in out)


def test_join_cardinality_estimate_upper_bound(spark):
    from mydatalake_spark.operators.profile import (
        join_cardinality_estimate,
    )

    a = spark.range(0, 2000).withColumnRenamed("id", "k")
    b = spark.range(0, 500).withColumnRenamed("id", "k")
    est = join_cardinality_estimate(a, b, "k", "k", n_buckets=4096).first()
    true = a.join(b, "k").count()
    assert est.n_left == 2000 and est.n_right == 500
    # histogram product is always >= the true cardinality, and tight
    # at high resolution
    assert est.est_pairs >= true
    assert est.est_pairs < true * 2


def test_bloom_prune_map_only_matches_probe_keys(spark):
    """The production map-only path (constant-folded literal filter)
    must agree key-for-key with the audited bloom_probe_keys path, be
    a strict superset of true matches, and add ZERO exchanges to the
    probe plan."""
    from mydatalake_spark.operators.bloomjoin import (
        bloom_build,
        bloom_mask_array,
        bloom_probe_keys,
        bloom_prune,
    )

    build = spark.range(0, 500).withColumnRenamed("id", "k")
    probe = spark.range(0, 5000).withColumnRenamed("id", "k")
    bloom = bloom_build(build, "k", m_bits=1 << 16, k=3)
    words = bloom_mask_array(bloom, m_bits=1 << 16)
    assert len(words) == (1 << 16) // 32

    pruned = bloom_prune(probe, "k", words, k=3)
    kept = {r.k for r in pruned.collect()}
    flagged = {
        r.k
        for r in bloom_probe_keys(
            probe, "k", bloom, m_bits=1 << 16, k=3
        ).collect()
        if r.bloom_pass
    }
    assert kept == flagged                      # cross-impl agreement
    assert set(range(500)) <= kept              # no false negatives

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = pruned._jdf.queryExecution().explainString(mode)
    assert "Exchange" not in plan               # pure scan + filter
    assert "Join" not in plan


def test_bloom_filtered_join_equals_plain_join(spark):
    """The composed build→mask→prune→join path must return EXACTLY the
    plain join's rows (bloom pass is a superset of true matches, the
    equi-join discards false positives), and refuse unsound join
    types whose semantics need the pruned-away probe rows."""
    import os

    import pytest

    from mydatalake_spark.operators.bloomjoin import bloom_filtered_join

    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(os.path.join(sf, "orders.parquet"))
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderpriority"
    )
    li = spark.read.parquet(os.path.join(sf, "lineitem.parquet")).select(
        "l_orderkey", "l_quantity"
    )
    out = bloom_filtered_join(
        li, urgent, "l_orderkey", "o_orderkey", m_bits=1 << 16, k=3
    )
    plain = li.join(
        urgent, li.l_orderkey == urgent.o_orderkey, "inner"
    )
    assert out.count() == plain.count()
    assert (
        out.agg(F.sum("l_quantity")).first()[0]
        == plain.agg(F.sum("l_quantity")).first()[0]
    )
    with pytest.raises(ValueError, match="unsupported"):
        bloom_filtered_join(li, urgent, "l_orderkey", "o_orderkey",
                            how="left_outer")


def test_bloom_mask_array_refuses_oversize_literal(spark):
    """The word list becomes a plan LITERAL — a 2^30-bit filter would
    inline ~33.5M longs (~268 MB) into the expression tree. The
    constant-folding path must refuse above MAX_FOLD_BITS with sizing
    remediation; the cap itself must pass."""
    import pytest

    from mydatalake_spark.operators.bloomjoin import (
        MAX_FOLD_BITS,
        bloom_build,
        bloom_mask_array,
    )

    build = spark.range(0, 50).withColumnRenamed("id", "k")
    bloom = bloom_build(build, "k", m_bits=1 << 16, k=3)
    with pytest.raises(ValueError, match="constant-folding cap"):
        bloom_mask_array(bloom, m_bits=MAX_FOLD_BITS * 2)
    words = bloom_mask_array(bloom, m_bits=1 << 16)
    assert len(words) == (1 << 16) // 32


def _merged_rows(df):
    # key=repr so None sorts against strings without a TypeError
    return sorted((tuple(r) for r in df.collect()), key=repr)


def test_merge_upsert_bloomed_equals_plain(spark):
    """Bloom-pruned merge must return IDENTICAL rows to merge_upsert:
    updates, stale-ts keeps, inserts, and untouched targets — the miss
    branch bypasses the join, the hit branch's exact join discards
    bloom false positives."""
    import datetime as dt

    from mydatalake_spark.operators.merge import (
        merge_upsert,
        merge_upsert_bloomed,
    )

    def ts(d):
        return dt.datetime(2026, 1, d)

    target = spark.createDataFrame(
        [(i, float(i), ts(10)) for i in range(1, 201)],
        "id long, v double, ts timestamp",
    )
    # updates (fresh ts), stale rows (must lose), and new keys
    source = spark.createDataFrame(
        [(i, 1000.0 + i, ts(20)) for i in range(1, 30)]      # fresh
        + [(i, -1.0, ts(1)) for i in range(30, 40)]          # stale
        + [(i, 5000.0 + i, ts(20)) for i in range(300, 310)],  # insert
        "id long, v double, ts timestamp",
    )
    plain = merge_upsert(target, source, ["id"], "ts")
    bloomed = merge_upsert_bloomed(target, source, ["id"], "ts")
    assert _merged_rows(bloomed) == _merged_rows(plain)


def test_merge_upsert_bloomed_tiny_filter_false_positives_harmless(spark):
    """A deliberately saturated 32-bit filter floods the hit branch
    with false positives — the result must STILL equal the plain
    merge (the exact join keeps fp rows unchanged)."""
    from mydatalake_spark.operators.merge import (
        merge_upsert,
        merge_upsert_bloomed,
    )

    target = spark.createDataFrame(
        [(i, float(i)) for i in range(500)], "id long, v double"
    )
    source = spark.createDataFrame(
        [(i, -float(i)) for i in range(0, 1000, 100)], "id long, v double"
    )
    plain = merge_upsert(target, source, ["id"])
    bloomed = merge_upsert_bloomed(target, source, ["id"], m_bits=32, k=1)
    assert _merged_rows(bloomed) == _merged_rows(plain)


def test_merge_upsert_bloomed_null_and_multi_keys(spark):
    """Null-safe composite key: a null-keyed source row must still
    update the null-keyed target row (eqNullSafe merge rule), i.e. the
    sentinel keeps null keys OUT of the bypass branch; multi-column
    keys route through the same composite string."""
    from mydatalake_spark.operators.merge import (
        merge_upsert,
        merge_upsert_bloomed,
    )

    target = spark.createDataFrame(
        [("a", 1, 10.0), ("a", None, 20.0), (None, 2, 30.0),
         ("b", 2, 40.0)],
        "k1 string, k2 int, v double",
    )
    source = spark.createDataFrame(
        [("a", None, 21.0), (None, 2, 31.0), ("c", 9, 99.0)],
        "k1 string, k2 int, v double",
    )
    plain = merge_upsert(target, source, ["k1", "k2"])
    bloomed = merge_upsert_bloomed(target, source, ["k1", "k2"])
    assert _merged_rows(bloomed) == _merged_rows(plain)
    got = {(r.k1, r.k2): r.v for r in bloomed.collect()}
    assert got[("a", None)] == 21.0 and got[(None, 2)] == 31.0
    assert got[("b", 2)] == 40.0 and got[("c", 9)] == 99.0


def test_merge_upsert_bloomed_delete_missing_and_evolve(spark):
    """delete_missing: bloom-miss targets are exactly the full-sync
    deletes, so the miss branch is dropped, matching merge_upsert.
    evolve_schema: the bypass branch must carry the added column."""
    from mydatalake_spark.operators.merge import (
        merge_upsert,
        merge_upsert_bloomed,
    )

    target = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "id long, v double"
    )
    source = spark.createDataFrame(
        [(i, -float(i)) for i in range(0, 50, 10)], "id long, v double"
    )
    for dm in (False, True):
        plain = merge_upsert(target, source, ["id"], delete_missing=dm)
        bloomed = merge_upsert_bloomed(
            target, source, ["id"], delete_missing=dm
        )
        assert _merged_rows(bloomed) == _merged_rows(plain)

    wide = source.withColumn("extra", F.lit("x"))
    plain = merge_upsert(target, wide, ["id"], evolve_schema=True)
    bloomed = merge_upsert_bloomed(target, wide, ["id"], evolve_schema=True)
    assert _merged_rows(bloomed) == _merged_rows(plain)
    # untouched (bypass-branch) rows read NULL for the evolved column
    row = {r.id: r.extra for r in bloomed.collect()}
    assert row[1] is None and row[0] == "x"


def test_bloom_split_partitions_every_row(spark):
    """bloom_split is a true partition: hit ∪ miss = probe, disjoint,
    and null keys land in miss (three-valued cond handled)."""
    from mydatalake_spark.operators.bloomjoin import (
        bloom_build,
        bloom_mask_array,
        bloom_split,
    )

    probe = spark.createDataFrame(
        [(i,) for i in range(100)] + [(None,)], "k long"
    )
    build = spark.createDataFrame([(i,) for i in range(0, 20)], "k long")
    words = bloom_mask_array(bloom_build(build, "k"), m_bits=1 << 16)
    hit, miss = bloom_split(probe, "k", words)
    nh, nm = hit.count(), miss.count()
    assert nh + nm == 101
    hit_keys = {r.k for r in hit.collect()}
    assert set(range(20)) <= hit_keys        # no false negatives
    assert None not in hit_keys              # null -> miss branch


def test_auto_m_bits_and_expected_fp():
    from mydatalake_spark.operators.bloomjoin import (
        FP_GIVE_UP,
        MAX_FOLD_BITS,
        auto_m_bits,
        expected_fp,
    )

    assert auto_m_bits(0) == 1 << 13          # floor
    assert auto_m_bits(100) == 1 << 13        # 1200 bits -> floor
    assert auto_m_bits(1000) == 1 << 14       # 12000 -> 16384
    assert auto_m_bits(10**9) == MAX_FOLD_BITS  # cap
    # at ~12 bits/key, k=3, fp is ~1%
    assert expected_fp(1000, auto_m_bits(1000), 3) < 0.03
    # a build side 100x past the cap's capacity cannot be filtered
    assert expected_fp(40_000_000, MAX_FOLD_BITS, 3) > FP_GIVE_UP


def test_bloom_filtered_join_auto_sizes_and_degrades_gracefully(spark):
    """m_bits='auto' sizes the filter from the build side's key count;
    when even the capped filter can't discriminate (huge build side),
    the PLAIN join plan comes back — same rows, no bloom Filter."""
    from unittest import mock

    from mydatalake_spark.operators import bloomjoin
    from mydatalake_spark.operators.bloomjoin import bloom_filtered_join

    build = spark.range(0, 200).selectExpr("id * 5 AS k", "id AS payload")
    probe = spark.range(0, 2000).selectExpr("id AS k", "id % 3 AS v")
    expected = {
        tuple(r) for r in probe.join(build, "k", "inner").collect()
    }

    auto = bloom_filtered_join(probe, build, "k")  # m_bits defaults auto
    assert {tuple(r) for r in auto.collect()} == expected
    plan = auto._jdf.queryExecution().optimizedPlan().toString()
    assert "element_at(" in plan  # pruning engaged

    # force the give-up branch: pretend the build side saturates the cap
    with mock.patch.object(bloomjoin, "expected_fp", return_value=0.99):
        plain = bloom_filtered_join(probe, build, "k")
    assert {tuple(r) for r in plain.collect()} == expected
    plan = plain._jdf.queryExecution().optimizedPlan().toString()
    assert "element_at(" not in plan  # no filter — the plain join


def test_merge_upsert_bloomed_auto_falls_back_to_plain_merge(spark):
    from unittest import mock

    from mydatalake_spark.operators import merge as merge_mod
    from mydatalake_spark.operators import bloomjoin
    from mydatalake_spark.operators.merge import (
        merge_upsert,
        merge_upsert_bloomed,
    )

    target = spark.createDataFrame(
        [(i, 0, float(i)) for i in range(100)], "k long, ts long, v double"
    )
    source = spark.createDataFrame(
        [(i, 1, -1.0) for i in range(0, 100, 10)],
        "k long, ts long, v double",
    )
    expected = {
        tuple(r)
        for r in merge_upsert(target, source, ["k"], "ts").collect()
    }
    got_auto = merge_upsert_bloomed(target, source, ["k"], "ts")
    assert {tuple(r) for r in got_auto.collect()} == expected
    with mock.patch.object(bloomjoin, "expected_fp", return_value=0.99):
        got_plain = merge_upsert_bloomed(target, source, ["k"], "ts")
    assert {tuple(r) for r in got_plain.collect()} == expected
    plan = got_plain._jdf.queryExecution().optimizedPlan().toString()
    assert "element_at(" not in plan and "Union" not in plan


def test_bloom_null_keys_never_pass_either_family(spark):
    """The null contract under BOTH families: null build keys are
    dropped (they can never equi-join; under native they'd otherwise
    set k fixed bits, and their null positions would crash the dense
    collect), null probe keys never pass bloom_prune, always land in
    bloom_split's no_match, and never flag true in the probe_keys
    audit — even against a SATURATED filter, the adversarial case for
    native's xxhash64-skips-nulls behavior."""
    from mydatalake_spark.operators.bloomjoin import (
        bloom_build,
        bloom_mask_array,
        bloom_probe_keys,
        bloom_prune,
        bloom_split,
    )

    m_bits = 1 << 13
    build = spark.createDataFrame(
        [(i,) for i in range(50)] + [(None,)], "k long"
    )
    probe = spark.createDataFrame(
        [(i,) for i in range(100)] + [(None,), (None,)], "k long"
    )
    saturated = [0xFFFFFFFF] * (m_bits // 32)
    for family in ("native", "portable"):
        # build with a null key must not crash the dense collect
        words = bloom_mask_array(
            bloom_build(build, "k", m_bits=m_bits, k=3, family=family),
            m_bits=m_bits,
        )
        assert len(words) == m_bits // 32
        for w in (words, saturated):
            pruned = bloom_prune(probe, "k", w, k=3, family=family)
            assert all(
                r.k is not None for r in pruned.collect()
            ), family
            hit, miss = bloom_split(probe, "k", w, k=3, family=family)
            hit_rows, miss_rows = hit.collect(), miss.collect()
            assert all(r.k is not None for r in hit_rows), family
            nulls_in_miss = sum(1 for r in miss_rows if r.k is None)
            assert nulls_in_miss == 2, (family, nulls_in_miss)
            assert len(hit_rows) + len(miss_rows) == 102, family
        flagged = bloom_probe_keys(
            probe.distinct(), "k",
            bloom_build(build, "k", m_bits=m_bits, k=3, family=family),
            m_bits=m_bits, k=3, family=family,
        ).collect()
        null_flags = [r.bloom_pass for r in flagged if r.k is None]
        # must be literal False, not three-valued NULL — a NULL flag
        # would vanish from BOTH filter(col) and filter(~col)
        assert null_flags == [False], (family, null_flags)


def test_bloom_rejects_ragged_m_bits_and_zero_k(spark):
    """ADVICE r7: an m_bits not divisible by the 32-bit word size makes
    build and probe disagree on the modulus (the dense word list
    re-derives it as len(words)*32) -> bloom FALSE NEGATIVES, which in
    merge_upsert_bloomed duplicate a matched key. k=0 would build a
    vacuous/malformed condition. Both must fail at the entry point."""
    import pytest

    from mydatalake_spark.operators.bloomjoin import (
        bloom_build,
        bloom_mask_array,
        bloom_probe_keys,
        bloom_prune,
    )

    build = spark.range(0, 10).withColumnRenamed("id", "k")
    for bad in (100, 31, 0, -32):
        with pytest.raises(ValueError, match="multiple of 32"):
            bloom_build(build, "k", m_bits=bad)
        with pytest.raises(ValueError, match="multiple of 32"):
            bloom_mask_array(
                bloom_build(build, "k", m_bits=1 << 13), m_bits=bad
            )
    for family in ("native", "portable"):
        with pytest.raises(ValueError, match="k .hash count. must be"):
            bloom_build(build, "k", m_bits=1 << 13, k=0, family=family)
        with pytest.raises(ValueError, match="k .hash count. must be"):
            bloom_prune(build, "k", [0] * 256, k=0, family=family)
        with pytest.raises(ValueError, match="k .hash count. must be"):
            bloom_probe_keys(
                build, "k",
                bloom_build(build, "k", m_bits=1 << 13, family=family),
                m_bits=1 << 13, k=-1, family=family,
            )


def test_merge_upsert_bloomed_rejects_reserved_column_clash(spark):
    """ADVICE r7: a real __mk__/__bf__ column would be clobbered by the
    bloom staging and silently dropped from the merged output."""
    import pytest

    from mydatalake_spark.operators.merge import merge_upsert_bloomed

    tgt = spark.createDataFrame(
        [(1, "a", 10)], "k long, __mk__ string, ts long"
    )
    src = tgt
    with pytest.raises(ValueError, match="__mk__"):
        merge_upsert_bloomed(tgt, src, ["k"], ts_col="ts")
    tgt2 = spark.createDataFrame(
        [(1, "a", 10)], "k long, __bf__ string, ts long"
    )
    with pytest.raises(ValueError, match="__bf__"):
        merge_upsert_bloomed(tgt2, tgt2, ["k"], ts_col="ts")
