"""Multi-dimensional data layout: Z-order clustering + zone-map
pruning statistics.

[extension] The measurement side of the layout story:
``maintenance.write_zordered`` / ``write_clustered`` WRITE clustered
files; this module provides the interleave primitive they share
(``zorder_key`` — ``maintenance.zorder_key`` delegates here after its
domain scaling), its SQL-twin generator so the oracle gate can check
the curve bit-for-bit, and the zone-map/pruning statistics that QUANTIFY
what a layout buys. The reference has no layout management at all —
its Delta tables are written however the merge leaves them (reference
lib/ingestors.py:92-96). At 100 TB, layout IS
the query plan: a selective 2-D predicate on a randomly laid-out table
scans every file, while on a Z-ordered table the same predicate's
min/max zone maps exclude all but the files whose interleaved-key
range intersects the query box — the mechanism behind Delta's
OPTIMIZE ZORDER and parquet row-group skipping.

Spark-first shape: the Z-value is a pure column expression (bit
interleaving unrolled to shift/mask/or terms — whole-stage-codegen
arithmetic, no UDF), so clustering is ``repartitionByRange(z)`` +
``sortWithinPartitions(z)`` — one range shuffle, exactly what a
single-column cluster costs. Zone maps are one groupBy over the
bucketed table (min/max/count per bucket), and pruning statistics are
column arithmetic over that tiny frame — both oracle-expressible, so
the correctness gate covers the whole layout story end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 10) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative integer)
    column into one Z-value: bit ``b`` of column ``i`` lands at
    position ``b * n_cols + i``, so the value enumerates the Morton
    space-filling curve. Inputs must already be scaled to
    ``[0, 2**bits)`` — see :func:`minmax_scale` for arbitrary domains.

    Unrolled to ``bits × n_cols`` shift/mask terms summed JVM-side:
    constant per-row arithmetic inside codegen, no UDF, no shuffle.
    """
    exprs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long")
             for c in cols]
    n = len(exprs)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, e in enumerate(exprs):
            z = z + F.shiftleft(
                F.shiftright(e, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return z


def zorder_key_sql(cols: list[str], bits: int = 10) -> str:
    """The identical interleave as an ANSI-SQL expression string —
    generated from the same loop so the DuckDB oracle computes
    bit-identical Z-values."""
    n = len(cols)
    terms = [
        f"(((CAST({c} AS BIGINT) >> {b}) & 1) << {b * n + i})"
        for b in range(bits)
        for i, c in enumerate(cols)
    ]
    return "(" + " + ".join(terms) + ")"


def minmax_scale(col: Column | str, lo: float, hi: float,
                 bits: int = 10) -> Column:
    """Affine-map a value with known domain ``[lo, hi]`` onto the
    integer grid ``[0, 2**bits)`` for :func:`zorder_key`. Domain
    bounds are caller-supplied (catalog statistics / an earlier
    min-max pass) so the scaling itself adds no scan."""
    c = F.col(col) if isinstance(col, str) else col
    cells = (1 << bits) - 1
    scaled = F.floor(
        (c.cast("double") - lo) / (hi - lo) * (1 << bits)
    ).cast("long")
    return F.greatest(F.least(scaled, F.lit(cells)), F.lit(0))


def cluster_by_zorder(
    df: DataFrame,
    cols: list[Column | str],
    n_files: int,
    bits: int = 10,
) -> DataFrame:
    """Physically cluster on the Morton curve: range-repartition into
    ``n_files`` partitions by Z-value, sort within each. Each output
    file then owns a compact hyper-rectangle-ish region of the key
    space, so per-file min/max stats on EVERY participating column are
    tight — the property :func:`zone_maps` + :func:`pruning_stats`
    measure and tests assert. One range shuffle (sampled boundaries),
    identical cost shape to single-column clustering at any scale."""
    z = zorder_key(cols, bits=bits).alias("__z__")
    return (
        df.withColumn("__z__", z)
        .repartitionByRange(n_files, "__z__")
        .sortWithinPartitions("__z__")
        .drop("__z__")
    )


def zone_maps(
    df: DataFrame,
    bucket: Column,
    cols: list[str],
) -> DataFrame:
    """Per-bucket zone maps: ``(bucket, n_rows, min_<c>, max_<c>)`` for
    each stat column — the file-footer metadata a scan planner prunes
    with, materialized as a queryable frame. One input-sized groupBy
    shuffle on the bucket key; output is bucket-count-sized."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy(bucket.alias("bucket")).agg(*aggs)


def pruning_stats(
    zmaps: DataFrame,
    predicates: dict[str, tuple[float, float]],
    layout: str = "layout",
) -> DataFrame:
    """Evaluate a conjunctive box predicate ``{col: (lo, hi)}`` against
    the zone maps: a bucket is a CANDIDATE iff every per-column
    ``[min, max]`` interval intersects its ``[lo, hi]``. Returns one
    row — layout label, bucket/row totals, candidate bucket count, and
    ``scan_fraction`` (rows in candidate buckets / total rows): the
    byte-skipping ratio the layout buys. Arithmetic over the
    bucket-count-sized frame; no rescan of the data."""
    cand = F.lit(True)
    for c, (lo, hi) in predicates.items():
        cand = cand & (F.col(f"max_{c}") >= lo) & (F.col(f"min_{c}") <= hi)
    flagged = zmaps.select(
        "n_rows", cand.alias("__cand__")
    )
    return flagged.agg(
        F.lit(layout).alias("layout"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(F.when(F.col("__cand__"), 1).otherwise(0))
        .cast("long")
        .alias("candidate_buckets"),
        F.sum("n_rows").cast("long").alias("total_rows"),
        F.round(
            F.sum(F.when(F.col("__cand__"), F.col("n_rows")).otherwise(0))
            / F.sum("n_rows"),
            6,
        ).alias("scan_fraction"),
    )


# --- Hilbert curve (liquid clustering's space-filling curve) ---------

def hilbert_transpose(
    df: DataFrame, cols: list[str], bits: int = 10,
    prefix: str = "__h",
) -> tuple[DataFrame, list[str]]:
    """Skilling's AxesToTranspose (2004) over ``cols`` — inputs
    already scaled to ``[0, 2**bits)`` — as ``bits``-level unrolled
    integer column arithmetic. Returns (frame, transposed column
    names); interleaving the transposed words MSB-first (column 0
    most significant within each bit group) yields the Hilbert index.

    Why Hilbert over Morton: consecutive Hilbert indices are always
    GRID NEIGHBORS (unit-step in exactly one coordinate — property
    test-pinned against an exhaustive grid), while the Z-curve jumps
    across quadrant seams, so a range of Hilbert-sorted rows is a
    tighter bounding box per file. This is the curve behind
    Databricks liquid clustering; legacy ZORDER keeps Morton.

    Each level is MATERIALIZED as named columns (one select per
    level), not nested into a single expression: the transform reads
    its own outputs several times per level, so a single expression
    tree would grow multiplicatively. Spark's CollapseProject leaves
    multi-referenced non-cheap projections alone, and whole-stage
    codegen turns the column chain into straight-line locals — no
    UDF, no shuffle, no Python in the row path."""
    n = len(cols)
    if n < 2:
        raise ValueError(
            "hilbert_transpose needs >= 2 columns (one column is "
            "plain range clustering — no curve required)"
        )
    xs = [f"{prefix}{i}" for i in range(n)]
    out = df.select(
        "*", *[F.col(c).cast("long").alias(x) for c, x in zip(cols, xs)]
    )

    def _lvl(tag: str, **newcols) -> None:
        nonlocal out
        keep = [c for c in out.columns if c not in newcols]
        out = out.select(
            *keep, *[v.alias(k) for k, v in newcols.items()]
        )

    q = 1 << (bits - 1)
    while q > 1:
        p = q - 1
        for i in range(n):
            cond = F.col(xs[i]).bitwiseAND(F.lit(q)) != 0
            if i == 0:
                _lvl(
                    f"q{q}i0",
                    **{xs[0]: F.when(
                        cond, F.col(xs[0]).bitwiseXOR(F.lit(p))
                    ).otherwise(F.col(xs[0]))},
                )
            else:
                # bit set → invert X[0] by P; bit clear → exchange the
                # P-masked low bits of X[0] and X[i]. t is materialized
                # first so its two uses stay one computation per row.
                t = (
                    F.col(xs[0]).bitwiseXOR(F.col(xs[i]))
                ).bitwiseAND(F.lit(p))
                tname = f"{prefix}t"
                _lvl(f"q{q}i{i}t", **{tname: t})
                _lvl(
                    f"q{q}i{i}",
                    **{
                        xs[0]: F.when(
                            cond, F.col(xs[0]).bitwiseXOR(F.lit(p))
                        ).otherwise(
                            F.col(xs[0]).bitwiseXOR(F.col(tname))
                        ),
                        xs[i]: F.when(cond, F.col(xs[i])).otherwise(
                            F.col(xs[i]).bitwiseXOR(F.col(tname))
                        ),
                    },
                )
                out = out.drop(tname)
        q >>= 1
    # Gray encode
    for i in range(1, n):
        _lvl(f"g{i}", **{xs[i]: F.col(xs[i]).bitwiseXOR(F.col(xs[i - 1]))})
    t_expr = F.lit(0).cast("long")
    q = 1 << (bits - 1)
    while q > 1:
        t_expr = F.when(
            F.col(xs[n - 1]).bitwiseAND(F.lit(q)) != 0,
            t_expr.bitwiseXOR(F.lit(q - 1)),
        ).otherwise(t_expr)
        q >>= 1
    _lvl("gt", **{f"{prefix}t": t_expr})
    _lvl(
        "gx",
        **{
            x: F.col(x).bitwiseXOR(F.col(f"{prefix}t")) for x in xs
        },
    )
    out = out.drop(f"{prefix}t")
    return out, xs


def hilbert_key(
    df: DataFrame, cols: list[str], bits: int = 10,
    key_name: str = "__hilbert__",
) -> DataFrame:
    """Hilbert index column over pre-scaled integer ``cols``: the
    transposed words interleave with column 0's bit MOST significant
    within each group (Skilling's read-out order), reusing the Morton
    interleave with the column list reversed. Auto-caps ``bits`` at
    ``63 // n`` like :func:`zorder_key`'s sign-bit guard."""
    n = len(cols)
    bits = min(bits, 63 // n)
    out, xs = hilbert_transpose(df, cols, bits=bits)
    key = zorder_key(list(reversed(xs)), bits=bits)
    return out.select(
        "*",
        key.alias(key_name),
    ).drop(*xs)
