"""One-pass table profiling (ANALYZE-style column statistics).

[extension] The catalog-maintenance primitive behind cost-based
decisions and data-quality dashboards: per-column row count, null
count, exact distinct count, and numeric min/max — as a long-format
DataFrame so downstream tooling (DQ history tables, drift monitors)
can diff profiles across runs without schema churn.

Spark-first shape: ONE aggregation over ONE scan computes every
column's statistics simultaneously; multiple exact ``count(distinct)``
aggregates make Catalyst plan an Expand (each input row fans out once
per distinct-aggregate) followed by two-level partial aggregation —
the standard multi-distinct strategy, still a single pass over the
data and a single shuffle keyed on the expanded group id.

At 100 TB the Expand's row multiplication (×(n_cols+1)) is the cost
that matters, so the SCALE DEFAULT is ``approx=True``: HLL++-based
``approx_count_distinct`` folds every column's sketch into the same
plain hash aggregate — no Expand, no per-column fan-out, one
map-side-combined pass (relative standard error defaults to 5%,
tunable via ``rsd``). ``approx=False`` keeps the exact Expand plan
for engine-exact parity checks (the DuckDB oracle query uses it).

The wide one-row aggregate is reshaped to long format with a
``stack``-style explode of per-column structs — a projection over one
row, free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float",
            "decimal"}


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    approx: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-column statistics in one pass: ``(column, n_rows, n_null,
    n_distinct, min_value, max_value)`` — min/max as doubles for
    numeric columns, null otherwise (casting arbitrary types to
    strings is not engine-portable; numeric min/max are).

    ``approx=True`` (the scale default) estimates ``n_distinct`` with
    ``approx_count_distinct`` (HLL++, relative standard error ``rsd``,
    default 5%) so the plan is a plain hash aggregate with NO Expand
    node; ``approx=False`` is exact COUNT(DISTINCT) (excludes nulls)
    at the cost of an Expand ×(n_cols+1) row fan-out. Either way
    ``n_null`` counts nulls separately so null+distinct reconcile to
    ``n_rows`` in the exact mode."""
    names = cols or df.columns
    types = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for c in names:
        is_num = types[c].split("(")[0] in _NUMERIC
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}__")
        )
        aggs.append(
            (
                F.approx_count_distinct(F.col(c), rsd)
                if approx
                else F.count_distinct(F.col(c))
            ).alias(f"__nd_{c}__")
        )
        aggs.append(
            (F.min(F.col(c)).cast("double") if is_num
             else F.lit(None).cast("double")).alias(f"__min_{c}__")
        )
        aggs.append(
            (F.max(F.col(c)).cast("double") if is_num
             else F.lit(None).cast("double")).alias(f"__max_{c}__")
        )
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n__").alias("n_rows"),
                F.col(f"__null_{c}__").alias("n_null"),
                F.col(f"__nd_{c}__").alias("n_distinct"),
                F.col(f"__min_{c}__").alias("min_value"),
                F.col(f"__max_{c}__").alias("max_value"),
            )
            for c in names
        ]
    )
    return wide.select(F.explode(per_col).alias("s")).select("s.*")


def key_skew_profile(
    df: DataFrame, key: str, top_n: int = 10
) -> DataFrame:
    """ONE-row skew diagnostic for a prospective shuffle/join key —
    the measurement behind choosing salting (operators/skew.py),
    AQE skew-join thresholds, or a different partitioning altogether:

    ``(n_rows, n_keys, top1_share, topn_share, max_over_mean, gini)``

    where ``top1_share``/``topn_share`` are the row fraction owned by
    the hottest 1/``top_n`` keys, ``max_over_mean`` is the hot
    partition's overload factor under hash partitioning (≈ job
    straggler ratio), and ``gini`` is the Gini coefficient of the
    per-key row-count distribution (0 = uniform, →1 = one key owns
    everything).

    Spark-first shape: one groupBy(key) count (the same shuffle the
    real join would do), then ALL statistics come from one pass over
    the key-count frame — a rank window for the top-N split plus a
    single aggregate; gini folds in via the rank identity
    Σ(2i−n−1)·x_i / (n·Σx) on counts ordered ascending. Output is one
    row; nothing is collected.
    """
    counts = df.groupBy(F.col(key).alias("__k__")).agg(
        F.count(F.lit(1)).alias("__c__")
    )
    # descending rank for top-shares; ascending rank for the gini sum
    w_desc = Window.orderBy(F.col("__c__").desc(), F.col("__k__"))
    w_asc = Window.orderBy(F.col("__c__").asc(), F.col("__k__"))
    ranked = counts.select(
        "__c__",
        F.row_number().over(w_desc).alias("__rd__"),
        F.row_number().over(w_asc).alias("__ra__"),
    )
    # G = (2·Σ(rank_asc·c) − (n+1)·Σc) / (n·Σc): every term is a plain
    # aggregate over the ranked key-count frame — one pass.
    return ranked.agg(
        F.sum("__c__").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        (
            F.max(F.when(F.col("__rd__") == 1, F.col("__c__")))
            / F.sum("__c__")
        ).alias("top1_share"),
        (
            F.sum(F.when(F.col("__rd__") <= top_n, F.col("__c__")))
            / F.sum("__c__")
        ).alias("topn_share"),
        (
            F.max("__c__") / (F.sum("__c__") / F.count(F.lit(1)))
        ).alias("max_over_mean"),
        # double-space arithmetic: the long products (rank·count,
        # n_keys·n_rows) wrap int64 for high-cardinality keys at 100 TB
        # scale; doubles stay exact below 2^53 and degrade gracefully
        # above, and the oracle's HUGEINT/double division agrees within
        # the 9-significant-digit comparator contract either way.
        (
            (
                F.lit(2.0) * F.sum(
                    F.col("__ra__").cast("double") * F.col("__c__")
                )
                - (F.count(F.lit(1)) + 1).cast("double")
                * F.sum(F.col("__c__").cast("double"))
            )
            / (
                F.count(F.lit(1)).cast("double")
                * F.sum(F.col("__c__").cast("double"))
            )
        ).alias("gini"),
    )


def join_cardinality_estimate(
    a: DataFrame,
    b: DataFrame,
    key_a: str,
    key_b: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """Estimate an equi-join's output row count WITHOUT running the
    join: bucket each side's key by md5 into ``n_buckets``, aggregate
    per-bucket counts (two input-sized map-side-combined groupBys over
    1024 keys — tiny shuffles), then Σ_bucket n_a·n_b. The estimate is
    an UPPER BOUND that tightens as buckets approach one key each —
    exactly the histogram-product estimator a cost-based optimizer
    uses to decide broadcast vs shuffle vs skew-salt BEFORE paying for
    the real shuffle. Returns one row:
    ``(n_left, n_right, est_pairs)``; callers compare with the true
    count when auditing (see join_size_estimate_orders)."""
    def bucketed(df: DataFrame, key: str, out: str) -> DataFrame:
        bkt = F.conv(
            F.substring(F.md5(F.col(key).cast("string")), 1, 8), 16, 10
        ).cast("long") % n_buckets
        return df.groupBy(bkt.alias("bucket")).agg(
            F.count(F.lit(1)).alias(out)
        )
    ca = bucketed(a, key_a, "n_a")
    cb = bucketed(b, key_b, "n_b")
    joined = ca.join(cb, "bucket")
    return ca.agg(F.sum("n_a").alias("n_left")).crossJoin(
        cb.agg(F.sum("n_b").alias("n_right"))
    ).crossJoin(
        joined.agg(
            F.sum(F.col("n_a") * F.col("n_b")).alias("est_pairs")
        )
    ).select(
        F.col("n_left").cast("long").alias("n_left"),
        F.col("n_right").cast("long").alias("n_right"),
        F.col("est_pairs").cast("long").alias("est_pairs"),
    )
