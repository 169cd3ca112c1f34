"""DQ engine tests — fixture shapes per FIXTURES.md A3 (prices-like
table with one row failing each declared check)."""

import pytest
from pyspark.sql import functions as F

from mydatalake_spark.catalog import Catalog
from mydatalake_spark.quality import CheckRunner, TableCheck, annotate
from mydatalake_spark.quality.checks import build_check, specs_from_meta
from mydatalake_spark.schema import parse_table_meta

PRICES_META = {
    "catalog": "silver",
    "schema": "brapi",
    "table_name": "prices",
    # reference uses 'schema:' as the field-list key (silver/prices/prices.yml)
    "schema": [
        {
            "name": "symbol", "type": "string", "key": True,
            "mandate": "global_required",
            "tests": [
                {"test_type": "missing"},
                {"test_type": "duplicated"},
                {"test_type": "type_mismatch"},
            ],
        },
        {
            "name": "date", "type": "date", "key": True,
            "date_predicate": True, "mandate": "global_required",
            "tests": [
                {"test_type": "missing"},
                {"test_type": "outdated", "kwargs": {"threshold": 15}},
            ],
        },
        {
            "name": "high", "type": "float", "mandate": "global_required",
            "tests": [
                {"test_type": "outside_of_rules", "test_name": "high >= low",
                 "kwargs": {"expression": "high >= low"}},
            ],
        },
        {
            "name": "low", "type": "float", "mandate": "global_required",
            "tests": [],
        },
        {
            "name": "volume", "type": "long", "mandate": "local_required",
            "tests": [
                {"test_type": "outside_of_rules", "test_name": "volume >= 10000",
                 "kwargs": {"expression": "volume >= 10000"}},
            ],
        },
        {
            "name": "currency", "type": "string", "mandate": "local_optional",
            "tests": [
                {"test_type": "not_in_list",
                 "kwargs": {"expected_values": ["USD", "BRL"]}},
                {"test_type": "pattern_mismatch",
                 "kwargs": {"pattern": "^[A-Z]{3}$"}},
            ],
        },
    ],
}

ROWS = [
    # symbol, date,          high, low,  volume, currency
    ("AAPL", "2026-08-10", 10.0, 9.0, 20000, "USD"),    # clean
    (None,   "2026-08-10", 10.0, 9.0, 20000, "USD"),    # missing symbol
    ("DUP",  "2026-08-10", 10.0, 9.0, 20000, "BRL"),    # dup pair …
    ("DUP",  "2026-08-09", 10.0, 9.0, 20000, "brl "),   # … same symbol twice
    ("OLD",  "2020-01-01", 10.0, 9.0, 20000, "USD"),    # outdated
    ("BADR", "2026-08-10", 5.0, 9.0, 20000, "USD"),     # high < low
    ("LOWV", "2026-08-10", 10.0, 9.0, 500, "USD"),      # volume < 10000
    ("BADC", "2026-08-10", 10.0, 9.0, 20000, "xx"),     # bad currency + pattern
]

AS_OF = "2026-08-13"


@pytest.fixture(scope="module")
def prices(spark):
    df = spark.createDataFrame(
        ROWS, "symbol string, date string, high float, low float, "
              "volume long, currency string"
    )
    return df.withColumn("date", F.to_date("date"))


@pytest.fixture(scope="module")
def results(prices):
    meta = parse_table_meta(PRICES_META)
    return annotate(
        prices, specs_from_meta(meta), meta.key_columns,
        run_date=AS_OF, as_of=AS_OF,
    ).cache()


def _failed(results, test_type, test_name=None):
    df = results.filter(F.col("test_type") == test_type)
    if test_name:
        df = df.filter(F.col("test_name") == test_name)
    return {r.df_key for r in df.filter("check_result = 'failed'").collect()}


def test_row_count_is_rows_times_tests(results, prices):
    meta = parse_table_meta(PRICES_META)
    n_tests = len(specs_from_meta(meta))
    assert results.count() == prices.count() * n_tests


def test_missing(results):
    # concat_ws skips nulls (reference lib/checker.py:98 same behavior),
    # so the null-symbol row's composite key is just the date part.
    assert _failed(results, "missing") == {"2026-08-10"}


def test_duplicated(results):
    # second occurrence of symbol DUP (ordered by df_key) fails
    assert _failed(results, "duplicated") == {"DUP_2026-08-10"}


def test_outdated(results):
    assert _failed(results, "outdated") == {"OLD_2020-01-01"}


def test_rules(results):
    assert _failed(results, "outside_of_rules", "high >= low") == {"BADR_2026-08-10"}
    assert _failed(results, "outside_of_rules", "volume >= 10000") == {"LOWV_2026-08-10"}


def test_not_in_list_normalizes(results):
    # 'brl ' passes after lower+trim; 'xx' fails
    assert _failed(results, "not_in_list") == {"BADC_2026-08-10"}


def test_pattern(results):
    # 'xx' and 'brl ' both violate ^[A-Z]{3}$ (pattern check does NOT
    # normalize, unlike not_in_list — reference behavior)
    assert _failed(results, "pattern_mismatch") == {
        "BADC_2026-08-10", "DUP_2026-08-09"
    }


def test_type_mismatch_on_cast(spark):
    df = spark.createDataFrame(
        [("1", "1.5"), ("2", "oops")], "id string, px string"
    )
    out = annotate(
        df,
        [{"column": "px", "test_type": "type_mismatch", "type": "double"}],
        ["id"], run_date=AS_OF,
    )
    failed = {r.df_key for r in out.filter("check_result='failed'").collect()}
    assert failed == {"2"}


def test_unknown_check_raises():
    with pytest.raises(ValueError, match="Unsupported expectation type"):
        build_check("nonsense", "c")


def test_runner_end_to_end(spark, prices, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    meta = parse_table_meta(PRICES_META)
    runner = CheckRunner(spark, cat, run_date=AS_OF, as_of=AS_OF)
    agg = runner.execute([TableCheck(df=prices, meta=meta, layer="silver")])

    # results table persisted, partitioned by run_date
    saved = cat.read("silver.checks.column_checks")
    assert saved.count() == prices.count() * len(specs_from_meta(meta))

    # aggregation: one row per (test_name, table, type, layer, run_date, mandate)
    rows = {r.test_name: r for r in agg.collect()}
    m = rows["missing"]
    assert m.table_name == "prices" and m.layer == "silver"
    # 'missing' on symbol (global_required): two declarations share
    # test_name 'missing' but different columns — both under same mandate
    assert m.columns_checked == m.passing_cols + m.failing_cols

    # history upsert: run twice → same key set, no duplicates
    runner.execute([TableCheck(df=prices, meta=meta, layer="silver")])
    hist = cat.read("silver.checks.aggregated_checks")
    assert hist.count() == agg.count()


def test_runner_history_accumulates_new_run_dates(spark, prices, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh2"))
    meta = parse_table_meta(PRICES_META)
    r1 = CheckRunner(spark, cat, run_date="2026-08-12", as_of=AS_OF)
    a1 = r1.execute([TableCheck(df=prices, meta=meta)])
    r2 = CheckRunner(spark, cat, run_date="2026-08-13", as_of=AS_OF)
    a2 = r2.execute([TableCheck(df=prices, meta=meta)])
    hist = cat.read("silver.checks.aggregated_checks")
    assert hist.count() == a1.count() + a2.count()


def test_outlier_check_flags_tail_and_ignores_constant(spark):
    """Corpus-relative outlier check (Q-extension): an extreme value
    fails, the bulk passes, and a constant column (stddev 0) flags
    NOTHING — degenerate stats must not fail every row."""
    from mydatalake_spark.quality.checks import annotate

    rows = [(i, float(i % 5), 7.0) for i in range(50)] + [(99, 1000.0, 7.0)]
    df = spark.createDataFrame(rows, "id long, x double, c double")
    specs = [
        {"column": "x", "test_type": "outlier", "kwargs": {"k": 3.0}},
        {"column": "c", "test_type": "outlier", "kwargs": {"k": 3.0}},
    ]
    out = annotate(df, specs, ["id"], run_date="2026-01-01")
    got = {
        (r.df_key, r.column): r.check_result for r in out.collect()
    }
    assert got[("99", "x")] == "failed"           # the planted outlier
    assert got[("0", "x")] == "passed"
    assert all(v == "passed" for (k, c), v in got.items() if c == "c")
    # long format intact: one row per (record x test)
    assert len(got) == 51 * 2


def test_foreign_key_check_flags_orphans(spark):
    from mydatalake_spark.quality.checks import annotate

    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    out = annotate(
        child,
        [{"column": "fk", "test_type": "foreign_key",
          "kwargs": {"parent": "p", "parent_key": "pk"}}],
        ["id"],
        run_date="2026-01-01",
        fk_parents={"p": parent},
    )
    got = {r.df_key: r.check_result for r in out.collect()}
    # 99 is an orphan; NULL fk passes (presence is the missing check's job)
    assert got == {"1": "passed", "2": "passed", "3": "failed", "4": "passed"}


def test_foreign_key_check_requires_parent(spark):
    import pytest as _pytest

    from mydatalake_spark.quality.checks import annotate

    child = spark.createDataFrame([(1, 10)], "id long, fk long")
    spec = [{"column": "fk", "test_type": "foreign_key",
             "kwargs": {"parent": "p", "parent_key": "pk"}}]
    with _pytest.raises(ValueError, match="not supplied"):
        annotate(child, spec, ["id"], fk_parents={})
    with _pytest.raises(ValueError, match="parent_key"):
        annotate(child, [{"column": "fk", "test_type": "foreign_key"}],
                 ["id"], fk_parents={})


def test_foreign_key_shares_the_single_pass(spark):
    """fk + missing + rule checks in one annotate: one result row per
    (record x test), and the fk join does not duplicate records."""
    from mydatalake_spark.quality.checks import annotate

    child = spark.createDataFrame(
        [(1, 10, "a"), (2, 77, None)], "id long, fk long, s string"
    )
    parent = spark.createDataFrame([(10,), (10,)], "pk long")  # dup parent keys
    out = annotate(
        child,
        [
            {"column": "fk", "test_type": "foreign_key",
             "kwargs": {"parent": "p", "parent_key": "pk"}},
            {"column": "s", "test_type": "missing"},
        ],
        ["id"],
        fk_parents={"p": parent},
    ).collect()
    assert len(out) == 4  # 2 records x 2 tests — distinct() absorbed dup pks
    got = {(r.df_key, r.test_type): r.check_result for r in out}
    assert got[("1", "foreign_key")] == "passed"
    assert got[("2", "foreign_key")] == "failed"
    assert got[("2", "missing")] == "failed"
