"""The reference's flagship pipeline end-to-end (FIXTURES.md A2):
nested tickers JSON → stringly bronze (dedup-latest) → silver prices
(LATERAL VIEW explode of historicalDataPrice, epoch→date casts) +
silver summary_profile (struct field access) → gold materialized view
(intraday change — reference Pipelines/Test/transformations/test.sql).

SQL shapes mirror reference bronze/tickers/tickers.sql,
silver/prices/prices.sql, silver/summary_profile/summary_profile.sql —
with the nondeterministic orderings fixed (SURVEY.md §7.4(4))."""

import json

import pytest

from mydatalake_spark.catalog import Catalog
from mydatalake_spark.jobs import JobRunner
from mydatalake_spark.views import MaterializedView

TICKERS_YML = """
table_name: 'tickers'
schema:
  - name: 'symbol'
    type: 'string'
    key: true
  - name: 'regularMarketTime'
    type: 'string'
    date_predicate: true
  - name: 'currency'
    type: 'string'
  - name: 'historicalDataPrice'
    type: 'array'
    element_type:
      type: 'struct'
      fields:
        - name: 'date'
          type: 'string'
        - name: 'open'
          type: 'string'
        - name: 'high'
          type: 'string'
        - name: 'low'
          type: 'string'
        - name: 'close'
          type: 'string'
        - name: 'volume'
          type: 'string'
        - name: 'adjustedClose'
          type: 'string'
  - name: 'summaryProfile'
    type: 'struct'
    fields:
      - name: 'city'
        type: 'string'
      - name: 'sector'
        type: 'string'
      - name: 'companyOfficers'
        type: 'array'
"""

# reference bronze/tickers/tickers.sql shape: typed projection +
# dedup-latest per symbol on the market timestamp
TICKERS_SQL = """
SELECT symbol,
       CAST(regularMarketTime AS timestamp) AS regularMarketTime,
       currency,
       historicalDataPrice,
       summaryProfile
FROM view_tickers
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY symbol ORDER BY regularMarketTime DESC
) = 1
"""

PRICES_YML = """
table_name: 'prices'
schema:
  - name: 'symbol'
    type: 'string'
    key: true
  - name: 'date'
    type: 'date'
    key: true
    date_predicate: true
"""

# reference silver/prices/prices.sql shape: LATERAL VIEW explode of the
# array<struct>, epoch-seconds→date, float casts, composite-key dedup
# (ordering fixed: the reference orders by a key-subset column)
PRICES_SQL = """
SELECT symbol,
       CAST(FROM_UNIXTIME(CAST(h.date AS bigint)) AS DATE) AS date,
       CAST(h.open AS float) AS open,
       CAST(h.high AS float) AS high,
       CAST(h.low AS float) AS low,
       CAST(h.close AS float) AS close,
       CAST(h.volume AS float) AS volume,
       CURRENT_TIMESTAMP() AS loaded_at
FROM bronze.brapi.tickers
LATERAL VIEW EXPLODE(historicalDataPrice) t AS h
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY symbol, date ORDER BY volume DESC
) = 1
"""

SUMMARY_YML = """
table_name: 'summary_profile'
schema:
  - name: 'symbol'
    type: 'string'
    key: true
"""

# reference silver/summary_profile/summary_profile.sql shape: struct
# field access (ordering fixed: reference uses current_timestamp())
SUMMARY_SQL = """
SELECT symbol,
       CAST(regularMarketTime AS timestamp) AS regularMarketTime,
       summaryProfile.city AS city,
       summaryProfile.sector AS sector,
       SIZE(summaryProfile.companyOfficers) AS n_officers
FROM bronze.brapi.tickers
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY symbol ORDER BY regularMarketTime DESC
) = 1
"""

BRONZE_JOBS = """
jobs:
  - name: 'bronze_full'
    type: 'full'
    tables:
      - table_name: 'tickers'
        input_format: 'json'
        catalog: 'bronze'
        schema: 'brapi'
"""

SILVER_JOBS = """
jobs:
  - name: 'silver_full'
    type: 'full'
    tables:
      - table_name: 'prices'
        input_format: 'delta'
        catalog: 'silver'
        schema: 'brapi'
      - table_name: 'summary_profile'
        input_format: 'delta'
        catalog: 'silver'
        schema: 'brapi'
"""


def _payload(symbol, mkt_time, days, city="SF", officers=("a", "b")):
    return {
        "symbol": symbol,
        "regularMarketTime": mkt_time,
        "currency": "USD",
        "historicalDataPrice": [
            {
                "date": str(1700000000 + i * 86400),
                "open": f"{10 + i}.0",
                "high": f"{12 + i}.5",
                "low": f"{9 + i}.0",
                "close": f"{11 + i}.25",
                "volume": f"{1000 + i}",
                "adjustedClose": f"{11 + i}.0",
            }
            for i in range(days)
        ],
        "summaryProfile": {
            "city": city,
            "sector": "tech",
            "companyOfficers": list(officers),
        },
    }


@pytest.fixture()
def workspace(tmp_path):
    root = tmp_path / "meta"
    for layer, files in {
        "bronze": {"job_metadata.yml": BRONZE_JOBS,
                   "tickers/tickers.yml": TICKERS_YML,
                   "tickers/tickers.sql": TICKERS_SQL},
        "silver": {"job_metadata.yml": SILVER_JOBS,
                   "prices/prices.yml": PRICES_YML,
                   "prices/prices.sql": PRICES_SQL,
                   "summary_profile/summary_profile.yml": SUMMARY_YML,
                   "summary_profile/summary_profile.sql": SUMMARY_SQL},
    }.items():
        for rel, content in files.items():
            p = root / layer / rel
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_text(content)
    raw = tmp_path / "raw"
    raw.mkdir()
    payloads = [
        _payload("AAPL", "2026-08-01T10:00:00", days=5),
        # stale AAPL snapshot — bronze dedup must drop it
        _payload("AAPL", "2026-07-01T10:00:00", days=2, city="OLD"),
        _payload("MSFT", "2026-08-01T10:00:00", days=3, city="Redmond",
                 officers=("x",)),
    ]
    with open(raw / "tickers.json", "w") as fh:
        for p in payloads:
            fh.write(json.dumps(p) + "\n")
    return root, raw


def test_tickers_medallion_pipeline(spark, workspace, tmp_path):
    root, raw = workspace
    cat = Catalog(spark, str(tmp_path / "wh"))
    runner = JobRunner(spark, cat, str(root),
                       input_paths={"tickers": str(raw)})

    runner.run("full", "bronze_full")
    bronze = cat.read("bronze.brapi.tickers")
    # nested schema compiled correctly: array<struct> + struct<...array>
    assert "array<struct<" in dict(bronze.dtypes)["historicalDataPrice"]
    rows = {r.symbol: r for r in bronze.collect()}
    assert len(rows) == 2                      # stale AAPL deduped
    assert rows["AAPL"].summaryProfile.city == "SF"
    assert len(rows["AAPL"].historicalDataPrice) == 5

    runner.run("full", "silver_full")
    prices = cat.read("silver.brapi.prices")
    got = {(r.symbol, str(r.date)): r for r in prices.collect()}
    assert len(got) == 5 + 3                   # one row per (symbol, day)
    some = got[("AAPL", "2023-11-14")]
    assert some.open == 10.0 and some.close == 11.25

    profile = {r.symbol: r for r in
               cat.read("silver.brapi.summary_profile").collect()}
    assert profile["MSFT"].city == "Redmond"
    assert profile["MSFT"].n_officers == 1

    # gold MV: reference Pipelines/Test/transformations/test.sql
    mv = MaterializedView(
        spark, cat, "gold.brapi.prices",
        sql="""SELECT symbol, date,
                      close - open AS intraday_change,
                      high - low AS intraday_range
               FROM silver.brapi.prices""",
    )
    mv.refresh()
    gold = {(r.symbol, str(r.date)): r for r in mv.read().collect()}
    g = gold[("AAPL", "2023-11-14")]
    assert abs(g.intraday_change - 1.25) < 1e-6
    assert abs(g.intraday_range - 3.5) < 1e-6


def test_sql_job_runs_reference_transformation_file(spark, tmp_path):
    """type: sql jobs (r12): the DLT 'run pipeline' shape — the
    reference's own gold transformation file
    (Pipelines/Test/transformations/test.sql, verbatim text incl.
    backticked identifiers) executes as a declared job, and re-running
    the job is the scheduled refresh."""
    import json
    import os

    from mydatalake_spark.catalog import Catalog
    from mydatalake_spark.jobs import JobRunner

    meta = tmp_path / "meta" / "gold"
    (meta / "transformations").mkdir(parents=True)
    # the reference file, verbatim
    (meta / "transformations" / "test.sql").write_text(
        "\n\nCREATE MATERIALIZED VIEW `gold`.`brapi`.`prices` AS\n"
        "SELECT\n    symbol\n    , date\n    , low   \n    , close\n"
        "    , high    \n    , open\n    , volume\n    , adjustedClose\n"
        "    , (close - open) AS intraday_change\n"
        "    , (high - low) AS intraday_range\n"
        "FROM silver.brapi.prices\n"
    )
    (tmp_path / "meta" / "gold" / "job_metadata.yml").write_text(
        """
jobs:
  - name: gold_transformations
    type: sql
    scripts:
      - path: transformations/test.sql
"""
    )
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.overwrite(
        spark.createDataFrame(
            [("PETR4", "2024-01-02", 9.0, 10.0, 11.0, 9.5, 100, 10.0)],
            "symbol string, date string, low double, close double, "
            "high double, open double, volume long, adjustedClose double",
        ),
        "silver.brapi.prices",
    )
    runner = JobRunner(spark, cat, str(tmp_path / "meta"))
    executed = runner.run("sql", "gold_transformations")
    assert executed and executed[0].endswith("test.sql")
    assert cat.read("gold.brapi.prices").count() == 1
    # scheduled re-run: CREATE (not OR REPLACE) of an existing MV
    # fails fast — the reference's DLT implies full re-definition, so
    # the job script refresh spelling is REFRESH; prove it composes
    (meta / "transformations" / "test.sql").write_text(
        "REFRESH MATERIALIZED VIEW gold.brapi.prices\n"
    )
    cat.append(
        spark.createDataFrame(
            [("VALE3", "2024-01-02", 1.0, 2.0, 3.0, 1.5, 5, 2.0)],
            cat.read("silver.brapi.prices").schema,
        ),
        "silver.brapi.prices",
    )
    runner.run("sql", "gold_transformations")
    assert cat.read("gold.brapi.prices").count() == 2
