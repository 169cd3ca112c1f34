"""REST source (injected transport) + materialized view recompute."""

import pytest
from pyspark.sql import types as T

from mydatalake_spark.catalog import Catalog
from mydatalake_spark.sources.rest import RestSource
from mydatalake_spark.views import MaterializedView


def test_rest_source_decorates_and_types(spark):
    calls = []

    def fake_fetch(url, headers):
        calls.append((url, headers))
        return {
            "symbol": "AAPL",
            "price": 123.45,
            "history": [{"date": "1700000000", "close": "1.5"}],
        }

    src = RestSource("https://api.example.com", {"X-Key": "k"}, fetcher=fake_fetch)
    p1 = src.fetch("quote/AAPL", asset_type="stocks")
    assert calls == [("https://api.example.com/quote/AAPL", {"X-Key": "k"})]
    assert p1["asset_type"] == "stocks" and "loaded_at" in p1

    schema = T.StructType([
        T.StructField("symbol", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("history", T.ArrayType(T.StructType([
            T.StructField("date", T.StringType()),
            T.StructField("close", T.StringType()),
        ]))),
        T.StructField("asset_type", T.StringType()),
        T.StructField("loaded_at", T.StringType()),
    ])
    df = src.to_dataframe(spark, [p1], schema=schema)
    row = df.first()
    assert row.symbol == "AAPL" and row.price == 123.45
    assert row.history[0].date == "1700000000"
    assert row.asset_type == "stocks"


def test_materialized_view_refresh(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [("A", 10.0, 12.0), ("B", 5.0, 4.0)],
        "sym string, open double, close double",
    )
    cat.overwrite(base, "silver.mkt.prices")

    # gold MV: reference Pipelines/Test/transformations/test.sql shape
    mv = MaterializedView(
        spark, cat, "gold.mkt.daily",
        sql="""SELECT sym, close - open AS intraday_change
               FROM silver.mkt.prices""",
    )
    mv.refresh()
    got = {r.sym: r.intraday_change for r in mv.read().collect()}
    assert got == {"A": 2.0, "B": -1.0}

    # base table changes → refresh recomputes
    cat.overwrite(
        spark.createDataFrame([("A", 10.0, 20.0)],
                              "sym string, open double, close double"),
        "silver.mkt.prices",
    )
    mv.refresh()
    got = {r.sym: r.intraday_change for r in mv.read().collect()}
    assert got == {"A": 10.0}


def test_csv_source_with_declared_schema(spark, tmp_path):
    from pyspark.sql import types as T

    from mydatalake_spark.sources.readers import read_source

    p = tmp_path / "raw_csv"
    p.mkdir()
    (p / "a.csv").write_text("symbol,px\nAAA,1.5\nBBB,2.25\n")
    st = T.StructType([
        T.StructField("symbol", T.StringType()),
        T.StructField("px", T.DoubleType()),
    ])
    df = read_source(
        spark, "csv", str(p), schema=st, options={"header": "true"}
    )
    rows = {r.symbol: r.px for r in df.collect()}
    assert rows == {"AAA": 1.5, "BBB": 2.25}
    assert "loaded_at" in df.columns


def test_orc_source_and_catalog_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.sources.readers import read_source

    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2.5).alias("v")
    )
    src = str(tmp_path / "orc_src")
    df.write.format("orc").save(src)

    back = read_source(spark, "orc", src, stamp_loaded_at=False)
    assert back.count() == 100 and set(back.columns) == {"id", "v"}

    cat = Catalog(spark, str(tmp_path / "wh"), fmt="orc")
    cat.overwrite(df, "bronze.t.orc_table")
    out = cat.read("bronze.t.orc_table")
    assert out.count() == 100
    assert out.agg(F.sum("v")).collect()[0][0] == sum(i * 2.5 for i in range(100))


def test_catalog_time_travel_versions(spark, tmp_path):
    """keep_versions retains the last N table states as rename-only
    snapshots: read_version(1) is the state the last overwrite
    replaced, pruning drops the oldest, version dirs stay invisible
    to list_tables, and drop removes the history too."""
    import pytest

    from mydatalake_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"), keep_versions=2)

    def batch(v):
        return spark.createDataFrame([(1, v)], "id long, v string")

    cat.overwrite(batch("a"), "g.s.t")
    assert cat.versions("g.s.t") == []             # nothing replaced yet
    cat.overwrite(batch("b"), "g.s.t")
    cat.overwrite_via_staging(batch("c"), "g.s.t")
    assert [r.v for r in cat.read("g.s.t").collect()] == ["c"]
    assert [r.v for r in cat.read_version("g.s.t", 1).collect()] == ["b"]
    assert [r.v for r in cat.read_version("g.s.t", 2).collect()] == ["a"]

    cat.overwrite(batch("d"), "g.s.t")             # prunes "a"
    assert len(cat.versions("g.s.t")) == 2
    assert [r.v for r in cat.read_version("g.s.t", 1).collect()] == ["c"]
    with pytest.raises(ValueError, match="retains 2"):
        cat.read_version("g.s.t", 3)

    assert cat.list_tables() == ["g.s.t"]          # snapshots hidden
    cat.drop("g.s.t")
    assert cat.versions("g.s.t") == []

    # versioning off (default): behavior unchanged, no snapshot dirs
    cat0 = Catalog(spark, str(tmp_path / "wh0"))
    cat0.overwrite(batch("x"), "g.s.t0")
    cat0.overwrite(batch("y"), "g.s.t0")
    assert cat0.versions("g.s.t0") == []


def test_incremental_agg_view_matches_full_recompute(spark, tmp_path):
    from pyspark.sql import functions as F

    from mydatalake_spark.views import IncrementalAggView

    cat = Catalog(spark, str(tmp_path / "wh_inc"))
    iv = IncrementalAggView(
        spark, cat, "gold.mkt.rev",
        keys=["k"],
        measures={"revenue": "qty * price", "qty_total": "qty"},
    )
    b1 = spark.createDataFrame(
        [("A", 2.0, 10.0), ("B", 1.0, 5.0)],
        "k string, qty double, price double",
    )
    b2 = spark.createDataFrame(
        [("A", 3.0, 10.0), ("C", 4.0, 2.0)],
        "k string, qty double, price double",
    )
    iv.apply(b1)
    iv.apply(b2)
    got = {
        r.k: (r.revenue, r.qty_total, r.n_rows)
        for r in iv.read().collect()
    }
    # equals the one-shot aggregate over b1 ∪ b2
    full = {
        r.k: (r.revenue, r.qty_total, r.cnt)
        for r in b1.unionByName(b2)
        .groupBy("k")
        .agg(
            F.sum(F.expr("qty * price")).alias("revenue"),
            F.sum("qty").alias("qty_total"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    }
    assert got == full
    assert got["A"] == (50.0, 5.0, 2)


def test_incremental_agg_view_idempotent_schema_and_avg_at_read(spark, tmp_path):
    from pyspark.sql import functions as F

    from mydatalake_spark.views import IncrementalAggView

    cat = Catalog(spark, str(tmp_path / "wh_inc2"))
    iv = IncrementalAggView(
        spark, cat, "gold.mkt.avgdemo",
        keys=["k"], measures={"total": "v"},
    )
    iv.apply(spark.createDataFrame([("A", 1.0), ("A", 3.0)], "k string, v double"))
    iv.apply(spark.createDataFrame([("A", 5.0)], "k string, v double"))
    row = iv.read().select(
        "k", (F.col("total") / F.col("n_rows")).alias("avg_v")
    ).collect()[0]
    assert row.k == "A" and row.avg_v == 3.0


def test_sketch_view_two_batch_fold_equals_one_shot(spark, tmp_path):
    import datetime as dt

    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.views import SketchDistinctView

    cat = Catalog(spark, str(tmp_path / "wh_sk"))
    view = SketchDistinctView(
        spark, cat, "gold.metrics.daily_users", keys=["day"], col="user"
    )
    d1, d2 = dt.date(2024, 1, 1), dt.date(2024, 1, 2)
    b1 = spark.createDataFrame(
        [(d1, "a"), (d1, "b"), (d2, "a")], "day date, user string"
    )
    b2 = spark.createDataFrame(
        [(d1, "b"), (d1, "c"), (d2, "z")], "day date, user string"
    )
    view.apply(b1)
    view.apply(b2)
    got = {
        r.day.isoformat(): r.distinct_estimate
        for r in view.estimates().collect()
    }
    # small cardinalities: HLL is exact in sparse mode — incremental
    # fold across batches deduplicates (b twice counts once)
    assert got == {"2024-01-01": 3.0, "2024-01-02": 2.0}

    # one-shot over the concatenated input gives identical estimates
    cat2 = Catalog(spark, str(tmp_path / "wh_sk2"))
    ones = SketchDistinctView(
        spark, cat2, "gold.metrics.daily_users", keys=["day"], col="user"
    )
    ones.apply(b1.unionByName(b2))
    assert got == {
        r.day.isoformat(): r.distinct_estimate
        for r in ones.estimates().collect()
    }


def test_sketch_view_rolling_estimates_range_frame(spark, tmp_path):
    import datetime as dt

    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.views import SketchDistinctView

    cat = Catalog(spark, str(tmp_path / "wh_sk3"))
    view = SketchDistinctView(
        spark, cat, "gold.metrics.daily_users", keys=["day"], col="user"
    )
    rows = [
        (dt.date(2024, 1, 1), "a"),
        (dt.date(2024, 1, 2), "b"),
        (dt.date(2024, 1, 10), "a"),   # 8-day gap
    ]
    view.apply(spark.createDataFrame(rows, "day date, user string"))
    got = {
        r.day.isoformat(): r.rolling_distinct
        for r in view.rolling_estimates("day", window_days=7).collect()
    }
    # day 10's window excludes days 1-2 (RANGE frame, not ROWS)
    assert got == {"2024-01-01": 1.0, "2024-01-02": 2.0, "2024-01-10": 1.0}


def test_sketch_view_rolling_estimates_partitions_by_non_date_keys(
    spark, tmp_path
):
    """Multi-column keys: the rolling window must union sketches only
    WITHIN each non-date key group (regression: an unpartitioned
    Window.orderBy(day) merged every country's daily sketches, turning
    per-country rolling distincts into global ones)."""
    import datetime as dt

    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.views import SketchDistinctView

    cat = Catalog(spark, str(tmp_path / "wh_sk4"))
    view = SketchDistinctView(
        spark, cat, "gold.metrics.daily_users_cc",
        keys=["day", "country"], col="user",
    )
    d1, d2 = dt.date(2024, 1, 1), dt.date(2024, 1, 2)
    rows = [
        (d1, "US", "a"),
        (d1, "BR", "x"),
        (d2, "US", "a"),      # repeat within US → still 1 distinct
        (d2, "BR", "y"),      # BR gains a second user
    ]
    view.apply(spark.createDataFrame(rows, "day date, country string, user string"))
    got = {
        (r.day.isoformat(), r.country): r.rolling_distinct
        for r in view.rolling_estimates("day", window_days=7).collect()
    }
    assert got == {
        ("2024-01-01", "US"): 1.0,
        ("2024-01-01", "BR"): 1.0,
        ("2024-01-02", "US"): 1.0,   # a∪a — not merged with BR's x
        ("2024-01-02", "BR"): 2.0,   # x∪y
    }

    import pytest

    with pytest.raises(ValueError, match="must be one of keys"):
        view.rolling_estimates("not_a_key")


def test_read_source_csv_and_orc_round_trip(spark, tmp_path):
    """csv + orc raw-zone scans with explicit schemas: declared types
    land (no inference pass), loaded_at stamps, and an orc write/read
    round-trips — the two file formats the parquet/json tests skip."""
    from pyspark.sql import types as T

    from mydatalake_spark.sources.readers import read_source

    csv_dir = tmp_path / "csv_raw"
    csv_dir.mkdir()
    (csv_dir / "part1.csv").write_text("stock,price\nAAA,5.5\nBBB,6.25\n")
    schema = T.StructType(
        [
            T.StructField("stock", T.StringType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    df = read_source(
        spark, "csv", str(csv_dir), schema, options={"header": "true"}
    )
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string", "double", "timestamp",
    ]
    got = {r.stock: r.price for r in df.collect()}
    assert got == {"AAA": 5.5, "BBB": 6.25}
    assert all(r.loaded_at is not None for r in df.collect())

    orc_dir = str(tmp_path / "orc_raw")
    df.drop("loaded_at").write.format("orc").save(orc_dir)
    back = read_source(spark, "orc", orc_dir, schema)
    assert {r.stock: r.price for r in back.collect()} == got

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported"):
        read_source(spark, "avro", orc_dir, schema)


def test_hll_intersection_check_known_overlap(spark):
    from mydatalake_spark.functions.sketches import hll_intersection_check

    # A = 0..999, B = 500..1499 -> |A∩B| = 500, |A∪B| = 1500
    rows = [("A", i) for i in range(1000)] + [
        ("B", i) for i in range(500, 1500)]
    df = spark.createDataFrame(rows, "seg string, k long")
    r = hll_intersection_check(df, "seg", "k", tolerance=0.05).collect()[0]
    assert (r.seg_a, r.seg_b) == ("A", "B")
    assert r.exact_intersection == 500 and r.exact_union == 1500
    assert r.within_bound is True


def test_hll_intersection_disjoint_segments(spark):
    from mydatalake_spark.functions.sketches import hll_intersection_check

    rows = [("A", i) for i in range(300)] + [
        ("B", i + 10_000) for i in range(300)]
    df = spark.createDataFrame(rows, "seg string, k long")
    r = hll_intersection_check(df, "seg", "k", tolerance=0.05).collect()[0]
    assert r.exact_intersection == 0
    assert r.within_bound is True


# --------------------------------- r10: idempotent token folds (ADVICE r9)


def _cents_view(spark, tmp_path, name="gold.s.rev"):
    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.views import IncrementalAggView

    cat = Catalog(spark, str(tmp_path / "wh"))
    return IncrementalAggView(
        spark, cat, name, keys=["g"], measures={"total": "v"}
    )


def test_apply_changes_batch_token_skips_replay(spark, tmp_path):
    """foreachBatch is at-least-once: a replayed change batch must NOT
    double-apply retractions. The token commits atomically with the
    fold (marker file riding the staged swap), so the replay is a
    no-op."""
    view = _cents_view(spark, tmp_path)
    base = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 50), (3, "b", 10)],
        "k bigint, g string, v bigint",
    )
    view.apply(base, batch_token=0)
    feed = spark.createDataFrame(
        [(3, "b", 10, "delete"), (1, "a", 100, "update_preimage"),
         (1, "a", 70, "update_postimage")],
        "k bigint, g string, v bigint, _change_type string",
    )
    view.apply_changes(feed, batch_token=1)
    want = {("a", 120, 2)}
    got = {(r.g, r.total, r.n_rows) for r in view.read().collect()}
    assert got == want
    assert view.applied_token() == 1
    # replay: same batch id → skipped, view unchanged (a double-applied
    # delete of k=3 would raise the negative-count guard; a
    # double-applied update would drift total to 90)
    view.apply_changes(feed, batch_token=1)
    assert {(r.g, r.total, r.n_rows) for r in view.read().collect()} == want
    # stale token (0 < 1) equally skipped
    view.apply_changes(feed, batch_token=0)
    assert {(r.g, r.total, r.n_rows) for r in view.read().collect()} == want
    # tokenless calls keep the legacy (caller-managed) behavior
    more = spark.createDataFrame(
        [(9, "c", 5, "insert")], "k bigint, g string, v bigint, _change_type string"
    )
    view.apply_changes(more)
    assert ("c", 5, 1) in {
        (r.g, r.total, r.n_rows) for r in view.read().collect()
    }


def test_apply_batch_token_create_commits_atomically(spark, tmp_path):
    """The FIRST token fold (view creation) also goes through the
    staged swap so the marker can never exist without its data."""
    view = _cents_view(spark, tmp_path)
    b = spark.createDataFrame([(1, "a", 10)], "k bigint, g string, v bigint")
    view.apply(b, batch_token=5)
    assert view.applied_token() == 5
    view.apply(b, batch_token=5)  # replay of the creating batch
    assert [
        (r.g, r.total, r.n_rows) for r in view.read().collect()
    ] == [("a", 10, 1)]


def test_fold_negative_count_fails_deterministically(spark, tmp_path):
    """ADVICE r9: n_rows going NEGATIVE is feed corruption (retracting
    rows never added), not a legit empty group — must raise naming the
    group, not silently drop it."""
    import pytest

    view = _cents_view(spark, tmp_path)
    view.apply(
        spark.createDataFrame(
            [(1, "a", 100)], "k bigint, g string, v bigint"
        )
    )
    bad = spark.createDataFrame(
        [(7, "zz", 10, "delete"), (8, "zz", 20, "delete")],
        "k bigint, g string, v bigint, _change_type string",
    )
    with pytest.raises(Exception, match="negative.*zz"):
        view.apply_changes(bad)
    # legit full retraction still drops the group cleanly
    legit = spark.createDataFrame(
        [(1, "a", 100, "delete")],
        "k bigint, g string, v bigint, _change_type string",
    )
    view.apply_changes(legit)
    assert view.read().count() == 0


def test_stream_changes_into_view_is_idempotent_per_batch(spark, tmp_path):
    """End-to-end: the streaming fold passes batch ids as tokens, so
    re-draining from a FRESH checkpoint (which replays batch 0) does
    not corrupt the view."""
    import json

    from mydatalake_spark.streaming.events import (
        stream_changes_into_view,
        stream_from_json_dir,
    )
    from pyspark.sql import types as T

    view = _cents_view(spark, tmp_path)
    view.apply(
        spark.createDataFrame(
            [(1, "a", 100), (2, "b", 50)], "k bigint, g string, v bigint"
        ),
        batch_token=-1,
    )
    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"k": 2, "g": "b", "v": 50, "_change_type": "delete"},
    ]
    (src / "b0.json").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("g", T.StringType()),
            T.StructField("v", T.LongType()),
            T.StructField("_change_type", T.StringType()),
        ]
    )

    def drain(ckpt):
        stream = stream_from_json_dir(spark, str(src), schema)
        q = stream_changes_into_view(stream, view, str(tmp_path / ckpt))
        q.awaitTermination(120)

    drain("ckpt1")
    want = {("a", 100, 1)}
    assert {(r.g, r.total, r.n_rows) for r in view.read().collect()} == want
    # a fresh checkpoint replays batch 0 — without the token the
    # replayed delete of the already-gone group would raise the
    # negative-count guard; with it, the fold is a no-op
    drain("ckpt2")
    assert {(r.g, r.total, r.n_rows) for r in view.read().collect()} == want


def test_sync_view_from_table_changes_end_to_end(spark, tmp_path):
    """Versioned CDC table → per-commit feed → idempotent incremental
    gold view: baseline from the oldest retained version, replay each
    commit tokened with its version, resume after partial application,
    no-op when current, and refuse a vacuumed gap."""
    import pytest

    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.views import (
        IncrementalAggView,
        sync_view_from_table_changes,
    )

    src = Catalog(spark, str(tmp_path / "src"), keep_versions=5)
    gold = Catalog(spark, str(tmp_path / "gold"))
    states = [
        [(1, "a", 100), (2, "a", 50), (3, "b", 10)],          # v1
        [(1, "a", 70), (3, "b", 10), (4, "b", 5)],            # v2: upd 1, del 2, ins 4
        [(1, "a", 70), (4, "b", 25)],                         # v3: del 3, upd 4
    ]
    for s in states:
        src.overwrite_via_staging(
            spark.createDataFrame(s, "k bigint, g string, v bigint"),
            "c.s.t",
        )
    src.snapshot("c.s.t")  # v3 = current live state
    view = IncrementalAggView(
        spark, gold, "gold.s.rev", keys=["g"], measures={"total": "v"}
    )
    applied = sync_view_from_table_changes(view, src, "c.s.t", ["k"])
    assert applied == [1, 2, 3]
    assert {(r.g, r.total, r.n_rows) for r in view.read().collect()} == {
        ("a", 70, 1), ("b", 25, 1),
    }
    # already current → no-op
    assert sync_view_from_table_changes(view, src, "c.s.t", ["k"]) == []
    # new commit → exactly one more hop
    src.overwrite_via_staging(
        spark.createDataFrame(
            [(1, "a", 70), (4, "b", 25), (5, "c", 9)],
            "k bigint, g string, v bigint",
        ),
        "c.s.t",
    )
    src.snapshot("c.s.t")
    assert sync_view_from_table_changes(view, src, "c.s.t", ["k"]) == [4, 5]
    assert ("c", 9, 1) in {
        (r.g, r.total, r.n_rows) for r in view.read().collect()
    }
    # a vacuumed intermediate version is bridged by ONE net hop
    # between its retained neighbors — exact for the aggregate view
    # (intermediate churn retracts itself), coarser resume only
    import os
    import shutil

    view2 = IncrementalAggView(
        spark, gold, "gold.s.rev2", keys=["g"], measures={"total": "v"}
    )
    view2.apply(src.read_version("c.s.t", version=1), batch_token=1)
    shutil.rmtree(os.path.join(src._version_root("c.s.t"), "v00000002"))
    applied = sync_view_from_table_changes(view2, src, "c.s.t", ["k"])
    assert applied == [3, 4, 5]  # the 1→3 hop bridges the gap
    assert {(r.g, r.total, r.n_rows) for r in view2.read().collect()} == {
        (r.g, r.total, r.n_rows) for r in view.read().collect()
    }


def test_sync_view_refuses_unretained_applied_version(spark, tmp_path):
    import pytest

    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.views import (
        IncrementalAggView,
        sync_view_from_table_changes,
    )

    src = Catalog(spark, str(tmp_path / "src"), keep_versions=2)
    gold = Catalog(spark, str(tmp_path / "gold"))
    df = spark.createDataFrame([(1, "a", 1)], "k bigint, g string, v bigint")
    for _ in range(2):
        src.overwrite_via_staging(df, "c.s.t")
    src.snapshot("c.s.t")
    view = IncrementalAggView(
        spark, gold, "gold.s.r3", keys=["g"], measures={"total": "v"}
    )
    sync_view_from_table_changes(view, src, "c.s.t", ["k"])
    # advance retention past the view's applied version
    for _ in range(3):
        src.overwrite_via_staging(df, "c.s.t")
    with pytest.raises(ValueError, match="no longer retained"):
        sync_view_from_table_changes(view, src, "c.s.t", ["k"])


def test_create_view_lazy_stored(spark, tmp_path):
    """Plain CREATE VIEW (r12): the DEFINITION is stored, not the
    data — every read re-resolves against the live base tables, the
    property that distinguishes it from CREATE MATERIALIZED VIEW."""
    import pytest

    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.plans.table_sql import run_table_sql

    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(1, "EU", 10.0), (2, "US", 20.0)],
        "id int, region string, amount double",
    )
    cat.overwrite(df, "silver.s.orders")
    run_table_sql(
        cat,
        "CREATE VIEW gold.s.v AS SELECT region, "
        "SUM(amount) AS total FROM silver.s.orders GROUP BY region",
    )
    got = {
        r.region: r.total
        for r in run_table_sql(
            cat, "SELECT * FROM gold.s.v"
        ).collect()
    }
    assert got == {"EU": 10.0, "US": 20.0}
    # base table mutates -> the view reflects it WITHOUT any refresh
    run_table_sql(
        cat, "UPDATE silver.s.orders SET amount = 99 WHERE id = 1"
    )
    got = {
        r.region: r.total
        for r in run_table_sql(cat, "SELECT * FROM gold.s.v").collect()
    }
    assert got["EU"] == 99.0
    # views over views resolve (fixpoint registration)
    run_table_sql(
        cat,
        "CREATE VIEW gold.s.v2 AS SELECT SUM(total) AS grand "
        "FROM gold.s.v",
    )
    assert run_table_sql(
        cat, "SELECT * FROM gold.s.v2"
    ).collect()[0].grand == 119.0
    # SHOW CREATE TABLE emits the definition
    stmt = run_table_sql(
        cat, "SHOW CREATE TABLE gold.s.v"
    ).collect()[0][0]
    assert stmt.startswith("CREATE VIEW gold.s.v AS SELECT")
    # namespace guards, both directions, and the DROP lifecycle
    with pytest.raises(ValueError, match="already exists"):
        run_table_sql(
            cat, "CREATE VIEW gold.s.v AS SELECT 1 AS one"
        )
    run_table_sql(
        cat,
        "CREATE OR REPLACE VIEW gold.s.v AS SELECT region, "
        "COUNT(*) AS total FROM silver.s.orders GROUP BY region",
    )
    with pytest.raises(ValueError, match="stored VIEW"):
        run_table_sql(cat, "CREATE TABLE gold.s.v (x INT)")
    with pytest.raises(ValueError, match="stored TABLE"):
        run_table_sql(
            cat,
            "CREATE VIEW silver.s.orders AS SELECT 1 AS one",
        )
    # a broken body is caught at declare time (ANSI CREATE VIEW)
    with pytest.raises(Exception):
        run_table_sql(
            cat, "CREATE VIEW gold.s.bad AS SELECT nope FROM no.such.t"
        )
    run_table_sql(cat, "DROP VIEW gold.s.v2")
    assert run_table_sql(cat, "DROP VIEW IF EXISTS gold.s.v2") is None
    with pytest.raises(ValueError, match="not a stored view"):
        run_table_sql(cat, "DROP VIEW gold.s.v2")
    with pytest.raises(ValueError, match="use DROP TABLE"):
        run_table_sql(cat, "DROP VIEW silver.s.orders")


def test_stored_view_write_paths_refused_by_name(spark, tmp_path):
    # a stored view is a definition, not data: every write-shaped
    # statement refuses by name instead of creating a shadowed table
    import pytest

    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.plans.table_sql import run_table_sql

    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.overwrite(
        spark.createDataFrame([(1, 2.0)], "id int, v double"),
        "silver.s.base",
    )
    run_table_sql(
        cat, "CREATE VIEW gold.s.v AS SELECT id, v FROM silver.s.base"
    )
    for stmt in (
        "INSERT INTO gold.s.v VALUES (2, 3.0)",
        "INSERT OVERWRITE gold.s.v SELECT 1 AS id, 1.0 AS v",
        "DELETE FROM gold.s.v WHERE id = 1",
        "UPDATE gold.s.v SET v = 0 WHERE id = 1",
        "MERGE INTO gold.s.v t USING silver.s.base s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET v = s.v",
        "TRUNCATE TABLE gold.s.v",
        "ALTER TABLE gold.s.v ADD CONSTRAINT c CHECK (v > 0)",
        "OPTIMIZE gold.s.v",
        "RESTORE TABLE gold.s.v TO VERSION AS OF 1",
        "CREATE TABLE gold.s.v AS SELECT 1 AS one",
        "COPY INTO gold.s.v FROM '/tmp/nowhere' FILEFORMAT = JSON",
        "DROP TABLE gold.s.v",
    ):
        with pytest.raises(ValueError, match="stored VIEW"):
            run_table_sql(cat, stmt)
    # the view still resolves and no shadow table appeared
    assert not cat.exists("gold.s.v")
    assert run_table_sql(cat, "SELECT * FROM gold.s.v").count() == 1


def test_merge_using_stored_view(spark, tmp_path):
    # a lazy view as the MERGE changeset: its definition resolves
    # against the live base at merge time
    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.plans.table_sql import run_table_sql

    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.overwrite(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0)], "id int, v double"
        ),
        "silver.s.t",
    )
    cat.overwrite(
        spark.createDataFrame(
            [(1, 99.0, "keep"), (3, 30.0, "keep"), (4, 1.0, "skip")],
            "id int, v double, tag string",
        ),
        "bronze.s.raw",
    )
    run_table_sql(
        cat,
        "CREATE VIEW bronze.s.chg AS SELECT id, v FROM bronze.s.raw "
        "WHERE tag = 'keep'",
    )
    run_table_sql(
        cat,
        "MERGE INTO silver.s.t t USING bronze.s.chg s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)",
    )
    got = {r.id: r.v for r in cat.read("silver.s.t").collect()}
    assert got == {1: 99.0, 2: 20.0, 3: 30.0}  # 4 filtered by the view


def test_show_views(spark, tmp_path):
    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.plans.table_sql import run_table_sql

    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.overwrite(
        spark.createDataFrame([(1,)], "id int"), "silver.s.base"
    )
    run_table_sql(
        cat, "CREATE VIEW gold.s.lazy AS SELECT id FROM silver.s.base"
    )
    run_table_sql(
        cat,
        "CREATE MATERIALIZED VIEW gold.s.mat AS "
        "SELECT COUNT(*) AS n FROM silver.s.base",
    )
    got = {
        r.viewName: r.viewType
        for r in run_table_sql(cat, "SHOW VIEWS").collect()
    }
    assert got == {
        "gold.s.lazy": "VIEW",
        "gold.s.mat": "MATERIALIZED VIEW",
    }


def test_read_source_text_and_binaryfile(spark, tmp_path):
    """The remaining Databricks COPY INTO source formats: ``text``
    (one 'value' string row per line — log/raw-corpus ingestion) and
    ``binaryfile`` (Spark's binaryFile: path/modificationTime/length/
    content — the opaque-payload front door for multimodal columns;
    its FIXED schema ignores a caller schema rather than erroring)."""
    from pyspark.sql import types as T

    from mydatalake_spark.sources.readers import read_source

    p = tmp_path / "raw.txt"
    p.write_text("alpha\nbeta\ngamma\n")
    txt = read_source(spark, "text", str(p), stamp_loaded_at=False)
    assert sorted(r.value for r in txt.collect()) == [
        "alpha", "beta", "gamma",
    ]
    # loaded_at stamp composes like every other source
    stamped = read_source(spark, "text", str(p))
    assert "loaded_at" in stamped.columns

    b = tmp_path / "blob.bin"
    b.write_bytes(b"\x00\x01PAYLOAD")
    bf = read_source(
        spark, "binaryfile", str(b), stamp_loaded_at=False,
        # a caller schema is ignored, not an error (fixed schema)
        schema=T.StructType([T.StructField("x", T.StringType())]),
    )
    row = bf.first()
    assert row.length == 9
    assert bytes(row.content) == b"\x00\x01PAYLOAD"
    assert row.path.endswith("blob.bin")

    with pytest.raises(ValueError, match="supported"):
        read_source(spark, "avro", str(p))


def test_copy_into_text_format(spark, tmp_path):
    """COPY INTO from a text drop: lines append under the target
    table's (value, loaded_at-free) schema contract, file-level
    idempotent like every other format."""
    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.ingest import copy_into

    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.overwrite(
        spark.createDataFrame([("seed",)], "value string"),
        "bronze.raw.lines",
    )
    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "a.log").write_text("l1\nl2\n")
    n = copy_into(
        cat, "bronze.raw.lines", str(drop) + "/*.log",
        file_format="text",
    )
    assert n == 2
    assert copy_into(
        cat, "bronze.raw.lines", str(drop) + "/*.log",
        file_format="text",
    ) == 0                                  # idempotent re-run
    (drop / "b.log").write_text("l3\n")
    assert copy_into(
        cat, "bronze.raw.lines", str(drop) + "/*.log",
        file_format="text",
    ) == 1
    got = sorted(r.value for r in cat.read("bronze.raw.lines").collect())
    assert got == ["l1", "l2", "l3", "seed"]


def test_sync_replica_from_table_changes(spark, tmp_path):
    """Row-level replica maintained from the source's version history:
    baseline from the latest retained version, then one net hop per
    sync, token committed atomically with the state (crash-idempotent),
    vacuumed base refused by name."""
    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.views import sync_replica_from_table_changes

    src_cat = Catalog(spark, str(tmp_path / "src"), keep_versions=8)
    dst_cat = Catalog(spark, str(tmp_path / "dst"))
    S, D = "silver.s.orders", "gold.s.orders_replica"

    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id int, tag string, amt double",
    )
    src_cat.overwrite_via_staging(v1, S)
    src_cat.snapshot(S)                     # version 1 = v1
    got = sync_replica_from_table_changes(src_cat, S, dst_cat, D, ["id"])
    assert got == 1
    assert sorted(r.id for r in dst_cat.read(D).collect()) == [1, 2, 3]
    # already current → no-op
    assert (
        sync_replica_from_table_changes(src_cat, S, dst_cat, D, ["id"])
        is None
    )

    # two source commits: update 2, delete 3, insert 9 — one net hop
    v2 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b2", 22.0), (9, "i", 90.0)],
        "id int, tag string, amt double",
    )
    v3 = spark.createDataFrame(
        [(1, "a3", 11.0), (2, "b2", 22.0), (9, "i", 90.0)],
        "id int, tag string, amt double",
    )
    src_cat.overwrite_via_staging(v2, S)    # snapshots v1 again (v2)
    src_cat.overwrite_via_staging(v3, S)    # snapshots v2 (version 3)
    src_cat.snapshot(S)                     # version 4 = v3
    got = sync_replica_from_table_changes(src_cat, S, dst_cat, D, ["id"])
    assert got == 4
    want = sorted((r.id, r.tag, r.amt) for r in v3.collect())
    assert sorted(
        (r.id, r.tag, r.amt) for r in dst_cat.read(D).collect()
    ) == want
    # replays are no-ops; the replica equals the source's latest
    # retained state bit-for-bit
    assert (
        sync_replica_from_table_changes(src_cat, S, dst_cat, D, ["id"])
        is None
    )

    # vacuumed base: drop retention below the replica's synced version
    for _ in range(3):
        src_cat.overwrite_via_staging(v3, S)
    src_cat.vacuum(S, keep=1)
    # replica at v3; only the newest snapshot retained now
    dst2 = "gold.s.stale_replica"
    dst_cat.overwrite_via_staging(v1, dst2)
    # forge an out-of-retention token
    import os

    with open(
        os.path.join(dst_cat.path(dst2), ".replica_synced"), "w"
    ) as fh:
        fh.write("1")
    with pytest.raises(ValueError, match="no longer retained"):
        sync_replica_from_table_changes(src_cat, S, dst_cat, dst2, ["id"])


def test_sync_replica_refuses_tokenless_existing_destination(
    spark, tmp_path
):
    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.views import sync_replica_from_table_changes

    src_cat = Catalog(spark, str(tmp_path / "src"), keep_versions=4)
    dst_cat = Catalog(spark, str(tmp_path / "dst"))
    df = spark.createDataFrame([(1, 1.0)], "id int, amt double")
    src_cat.overwrite_via_staging(df, "s.t.a")
    src_cat.snapshot("s.t.a")
    # pre-existing unrelated table at the destination: refused, not
    # clobbered by the baseline
    dst_cat.overwrite(
        spark.createDataFrame([("precious",)], "v string"), "g.t.a"
    )
    with pytest.raises(ValueError, match="no sync token"):
        sync_replica_from_table_changes(
            src_cat, "s.t.a", dst_cat, "g.t.a", ["id"]
        )
    assert dst_cat.read("g.t.a").first().v == "precious"


def test_optimize_on_replica_keeps_sync_token(spark, tmp_path):
    """ADVICE r13: OPTIMIZE/compaction permutes files, not rows — the
    replica's .replica_synced token must ride the staging swap, or the
    tokenless-destination refusal permanently wedges the sync."""
    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.maintenance import optimize_table
    from mydatalake_spark.views import sync_replica_from_table_changes

    src_cat = Catalog(spark, str(tmp_path / "src"), keep_versions=8)
    dst_cat = Catalog(spark, str(tmp_path / "dst"))
    S, D = "silver.s.orders", "gold.s.orders_replica"
    v1 = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id int, amt double"
    )
    src_cat.overwrite_via_staging(v1, S)
    src_cat.snapshot(S)
    assert sync_replica_from_table_changes(
        src_cat, S, dst_cat, D, ["id"]
    ) == 1
    tok = dst_cat.read_marker(D, ".replica_synced")
    assert tok is not None
    # compact the replica — the token survives the rewrite
    optimize_table(dst_cat, D, target_file_bytes=1 << 20)
    assert dst_cat.read_marker(D, ".replica_synced") == tok
    # and the sync still works: no refusal, next source commit lands
    v2 = spark.createDataFrame(
        [(1, 11.0), (2, 20.0), (4, 40.0)], "id int, amt double"
    )
    src_cat.overwrite_via_staging(v2, S)
    src_cat.snapshot(S)
    assert sync_replica_from_table_changes(
        src_cat, S, dst_cat, D, ["id"]
    ) == 3
    assert sorted(r.id for r in dst_cat.read(D).collect()) == [1, 2, 4]


def test_incremental_recluster_keeps_markers(spark, tmp_path):
    """The incremental recluster commit arm carries live dot-markers
    into its hand-built staging directory too."""
    import os

    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.maintenance import optimize_table
    from pyspark.sql import functions as F

    cat = Catalog(spark, str(tmp_path / "wh"))
    t = "silver.s.clustered"
    df = spark.range(5_000).select(
        (F.hash("id") % 100_000).alias("k"), F.col("id").alias("v")
    )
    cat.overwrite(df, t)
    cat.set_declared_cluster_cols(t, ["k"])
    with open(os.path.join(cat.path(t), ".replica_synced"), "w") as fh:
        fh.write("7")
    # unclustered append makes the incremental path do real work
    cat.append(
        spark.range(5_000, 6_000).select(
            (F.hash("id") % 100_000).alias("k"), F.col("id").alias("v")
        ),
        t,
    )
    optimize_table(cat, t)
    assert cat.read_marker(t, ".replica_synced") == "7"
    assert cat.read(t).count() == 6_000
