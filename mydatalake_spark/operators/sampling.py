"""Deterministic, content-addressed sampling and dataset splitting.

[extension] Training-data pipelines need train/val/test splits and
per-stratum downsampling that are (a) reproducible run-to-run, (b)
independent of partition layout, and (c) stable when the table is
re-sharded, appended to, or processed incrementally — a row's
assignment must depend only on its key, never on where it happens to
sit. ``rand(seed)`` and ``df.sample``/``sampleBy`` fail (c): Spark
seeds them per-partition, so a repartition reassigns rows.

The scheme here hashes the row key with md5 and buckets on the first
four hex digits (65 536 buckets). Everything is a scan-fused Column
expression — no shuffle, no UDF, no state — so at 100 TB a split is
literally free (it rides the scan of whatever job consumes it), and
the same row always lands in the same split on any cluster in any
engine that has md5 (which is why a DuckDB oracle can replay it
exactly: the bucket thresholds compare *hex strings*, avoiding any
engine-specific hex→int conversion).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 16 ** 4  # 4 hex chars
# Exclusive upper bound for "keep everything": lexicographically above
# every 4-hex-digit bucket ('g' > 'f'), while format(65536,'04x') =
# '10000' would sort BELOW 'ffff' and silently drop rows.
_MAX_BOUND = "g"


def _hex_bound(bucket_count: int) -> str:
    return _MAX_BOUND if bucket_count >= _BUCKETS else format(bucket_count, "04x")


def _bucket(key: Column, salt: str) -> Column:
    """First 4 hex chars of md5(salt|key) — a uniform label in
    ['0000', 'ffff']. String form on purpose: comparisons against
    constant thresholds are engine-portable."""
    return F.substring(
        F.md5(F.concat_ws("|", F.lit(salt), key.cast("string"))), 1, 4
    )


def _thresholds(weights: dict[str, float]) -> list[tuple[str, str]]:
    """Cumulative-weight bucket boundaries as 4-digit hex strings.
    Returns [(name, upper_bound_hex)] in declaration order; the last
    split absorbs rounding remainder (its bound is exclusive-max)."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    out: list[tuple[str, str]] = []
    cum = 0.0
    for name, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for split {name!r}")
        cum += w / total
        out.append((name, _hex_bound(int(round(cum * _BUCKETS)))))
    return out


def split_column(
    key: Column | str,
    weights: dict[str, float],
    salt: str = "",
) -> Column:
    """Split-name Column for ``key`` under ``weights`` (e.g.
    ``{"train": .8, "val": .1, "test": .1}``). Deterministic,
    partition-independent, and portable: the same (salt, key) maps to
    the same split everywhere, and new rows never perturb existing
    assignments (unlike fraction-of-count schemes)."""
    key = F.col(key) if isinstance(key, str) else key
    bucket = _bucket(key, salt)
    names = _thresholds(weights)
    # built right-to-left so the earliest split claims its range first
    expr = F.lit(names[-1][0])  # remainder → last split
    for name, bound in reversed(names[:-1]):
        expr = F.when(bucket < F.lit(bound), F.lit(name)).otherwise(expr)
    return expr


def split_sql_case(key_sql: str, weights: dict[str, float], salt: str = "") -> str:
    """The ANSI-SQL CASE expression equivalent of :func:`split_column`
    — used to build DuckDB oracles that replay the split bit-for-bit."""
    names = _thresholds(weights)
    salted = f"CONCAT('{salt}', '|', CAST({key_sql} AS VARCHAR))"
    parts = [
        f"WHEN SUBSTRING(MD5({salted}), 1, 4) < '{bound}' THEN '{name}'"
        for name, bound in names[:-1]
    ]
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1][0]}' END"


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Append a deterministic split-assignment column. Pure projection:
    fuses into the scan, no shuffle, survives any repartitioning."""
    return df.withColumn(split_col, split_column(key_col, weights, salt))


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Deterministic ``fraction``-sample keyed on content, not
    position: keeps exactly the rows whose hash bucket falls below the
    fraction threshold. Unlike ``df.sample`` the result is identical
    across runs, partitionings, and engines, and is *consistent across
    tables*: sampling two tables by the same key keeps matching rows
    (the property join-aware subsampling needs)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    bound = _hex_bound(int(round(fraction * _BUCKETS)))
    return df.filter(_bucket(F.col(key_col), salt) < F.lit(bound))


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight: Column | str,
    salt: str = "",
) -> DataFrame:
    """Per-row Bernoulli keep with probability = ``weight`` (a Column,
    clamped to [0, 1]), decided by the row's content hash — the
    corpus-mixing primitive (quality- or temperature-weighted source
    blending in pre-training data recipes).

    Unlike ``df.sample``, the decision is a pure function of
    (salt, key, weight): reproducible across runs, partitionings and
    engines, append-stable (new rows never flip old decisions), and
    consistent across tables sharing the key. The hash bucket converts
    to an integer (``conv`` base 16) so it can compare against the
    row-dependent threshold ``floor(weight · 65536)`` — a dynamic
    bound the static hex-string comparison of :func:`hash_sample`
    cannot express. Scan-fused predicate: no shuffle, no UDF."""
    w = F.col(weight) if isinstance(weight, str) else weight
    clamped = F.least(F.greatest(w, F.lit(0.0)), F.lit(1.0))
    bucket_int = F.conv(
        _bucket(F.col(key_col), salt), 16, 10
    ).cast("long")
    return df.filter(bucket_int < F.floor(clamped * _BUCKETS))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample boilerplate
    sources, keep all rare-language documents). The per-row predicate
    compares the row's hash bucket to its stratum's threshold — still
    a scan-fused expression; the fractions table is a when-chain, not
    a join, so no shuffle and no broadcast either."""
    bucket = _bucket(F.col(key_col), salt)

    def bound(frac: float) -> str:
        if not 0.0 <= frac <= 1.0:
            raise ValueError("fractions must be in [0, 1]")
        return _hex_bound(int(round(frac * _BUCKETS)))

    threshold = F.lit(bound(default_fraction))
    for stratum, frac in fractions.items():
        threshold = F.when(
            F.col(strata_col) == F.lit(stratum), F.lit(bound(frac))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def capped_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
    salt: str = "",
    keep_rank: bool = False,
) -> DataFrame:
    """At most ``cap`` rows per group, chosen deterministically: rank
    rows inside each group by md5(salt|key) (uniform, content-
    addressed) and keep the first ``cap``. The balanced-mixture
    primitive for training sets — cap boilerplate-heavy sources while
    rare groups keep everything — with fully reproducible membership.

    Scale: the rn ≤ cap shape triggers InferWindowGroupLimit, so each
    map task forwards at most ``cap`` rows per group it sees BEFORE
    the shuffle — a hot group costs its map-side fraction, never an
    unbounded reducer. Changing salt draws an independent sample."""
    if cap < 1:
        raise ValueError("cap must be >= 1")
    from pyspark.sql import Window

    order = F.md5(
        F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(order, F.col(key_col))
    out = df.withColumn("sample_rank", F.row_number().over(w)).filter(
        F.col("sample_rank") <= cap
    )
    return out if keep_rank else out.drop("sample_rank")


def pack_shards(
    df: DataFrame,
    order_col: str,
    size_col,
    budget: int,
    partition_cols: list[str] | None = None,
    shard_col: str = "shard",
) -> DataFrame:
    """Assign contiguous shard ids so each shard holds ~``budget``
    units (chars, tokens, bytes): shard = floor(start_offset/budget)
    where start_offset is the running size sum *excluding* the current
    row — the standard offset-based packing that writers use to cut
    training shards of near-equal size in a deterministic order.

    Scale: the running sum is a window over ``partition_cols`` — pack
    per source/date/split so no single global ordering serializes the
    job; a global pack (partition_cols=None) is correct but runs the
    window single-partition, only sensible for small curated sets
    (both modes deliberately supported)."""
    from pyspark.sql import Window

    size = F.col(size_col) if isinstance(size_col, str) else size_col
    w = Window.partitionBy(*(partition_cols or [])).orderBy(order_col)
    running = F.sum(size).over(w)
    return df.withColumn(
        shard_col,
        F.floor((running - size) / F.lit(float(budget))).cast("long"),
    )


def pack_greedy(
    df: DataFrame,
    order_col: str,
    size_col: str,
    budget: int,
    partition_cols: list[str],
    pack_col: str = "pack",
    oversize: str = "error",
    max_group_rows: int = 5_000_000,
    max_group_units: int = 2_000_000_000,
) -> DataFrame:
    """Greedy boundary-respecting sequence packing: rows go WHOLE into
    windows of capacity ``budget`` in ``order_col`` order within each
    ``partition_cols`` group; a row that would overflow the current
    window closes it and opens the next. This is the
    "packing without truncation" variant training pipelines use when
    documents must never straddle a context window —
    :func:`pack_shards` is the offset-based sibling that lets them
    straddle (and is pure window arithmetic).

    The fill level is a sequential recurrence
    (``fill' = fill+sz if it fits else sz``) — NOT prefix-sum
    expressible, hence the one place this module uses Arrow-batched
    Python: ``applyInPandas`` per pack group, a tight numpy loop over
    the group's (order, size) vectors. Groups run in parallel; the
    recurrence is only sequential WITHIN a group — which is exactly
    the packing contract (windows are per-source/split/date streams).
    At 100 TB you pack per shard-stream, never globally: a global
    pack would serialize into one group (``partition_cols`` is
    therefore required; pass a constant column to opt into a global
    pack knowingly).

    ``oversize``: 'error' (default) fails the job on any row with
    size > budget (deterministically, naming the row's order key);
    'own' gives such a row its own (overfull) window — matching what
    a sample-then-truncate stage downstream would expect.

    ``order_col`` must be a total order within each group (a doc_id,
    not a timestamp with ties): ties would leave the pack assignment
    dependent on shuffle arrival order. Each group materializes as
    one Arrow batch on one worker — the stream, not the row, is the
    memory unit, the same sizing rule as any partition.

    Hot-stream refusal (VERDICT r9 ask #5, same contract as
    :func:`~mydatalake_spark.operators.fuzzy.fastss_join`'s
    ``max_candidates`` and ``winnow_pairs``' ``guard_max_df``): before
    the Arrow stage launches, ONE cheap count/sum agg over
    ``partition_cols`` probes the largest stream; a group past
    ``max_group_rows`` rows or ``max_group_units`` summed ``size_col``
    units fails fast with the offending stream's key, not an executor
    OOM. The probe's shuffle is on the same keys the pack itself
    shuffles on, so its cost is one extra pruned scan, never a new
    shuffle shape. Raise the bounds knowingly if your executors are
    sized for bigger batches.

    Returns ``df`` + ``pack_col`` (long, 0-based per group). Output
    schema is declared from the input schema, so the operator
    composes lazily like everything else.
    """
    if oversize not in ("error", "own"):
        raise ValueError(f"oversize must be 'error' or 'own', not {oversize!r}")
    if not partition_cols:
        raise ValueError(
            "pack_greedy requires partition_cols — a global pack "
            "serializes into one group; pass an explicit constant "
            "column to opt in knowingly"
        )
    import pandas as pd  # noqa: F401 — applyInPandas batch type
    from pyspark.sql import types as T

    # Hot-stream probe: the largest group's row count and summed size,
    # ONE map-side-combinable agg. Refuse with the stream's key so the
    # failure is actionable (split the stream, or raise the bounds).
    hot = (
        df.groupBy(*partition_cols)
        .agg(
            F.count(F.lit(1)).alias("__rows__"),
            F.sum(F.col(size_col).cast("long")).alias("__units__"),
        )
        .where(
            (F.col("__rows__") > max_group_rows)
            | (F.col("__units__") > max_group_units)
        )
        .orderBy(F.desc("__rows__"))
        .limit(1)
        .collect()
    )
    if hot:
        r = hot[0]
        key = {c: r[c] for c in partition_cols}
        raise ValueError(
            f"pack_greedy: stream {key} has {r['__rows__']:,} rows / "
            f"{r['__units__']:,} {size_col} units — past "
            f"max_group_rows={max_group_rows:,} / "
            f"max_group_units={max_group_units:,}; each stream "
            "materializes as ONE Arrow batch on one worker, so a hot "
            "stream must be split (add a sub-stream column) or the "
            "bounds raised to match executor memory"
        )

    # NOT df.schema.add(...): StructType.add mutates in place, which
    # would corrupt the input DataFrame's cached schema object
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(pack_col, T.LongType())]
    )
    b = int(budget)

    def _pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(
            drop=True
        )
        if pdf[size_col].isna().any():
            raise ValueError(
                f"pack_greedy: NULL {size_col} present — sizes must be "
                "computed (and non-null) upstream"
            )
        sizes = pdf[size_col].to_numpy()
        packs = [0] * len(sizes)
        fill = 0
        pack = 0
        first = True
        for i, sz in enumerate(sizes):
            sz = int(sz)
            if sz > b:
                if oversize == "error":
                    raise ValueError(
                        f"pack_greedy: row {order_col}="
                        f"{pdf[order_col].iloc[i]!r} has {size_col}={sz}"
                        f" > budget={b}; pass oversize='own' to give it"
                        " an overfull window"
                    )
                # own window: close current (if any), emit alone
                if not first:
                    pack += 1
                packs[i] = pack
                pack += 1
                fill = 0
                first = True
                continue
            if first or fill + sz <= b:
                fill += sz
                first = False
            else:
                pack += 1
                fill = sz
            packs[i] = pack
        pdf[pack_col] = packs
        return pdf

    return df.groupBy(*partition_cols).applyInPandas(
        _pack, schema=out_schema
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    alpha: float = 0.5,
    target_rate: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """Temperature-based source mixing — THE pre-training data-recipe
    primitive (multilingual/multi-source blending): sample so the
    selected corpus's source distribution follows
    ``p_s ∝ share_s^alpha`` (α < 1 boosts rare sources, α = 1 keeps
    natural proportions, α = 0 equalizes), at an overall ``target_rate``
    of the corpus.

    Per-source keep probability ``q_s = min(1,
    target_rate · N · p_s / n_s)``; the min-clamp means over-demanded
    tiny sources keep everything (you cannot upsample by filtering),
    so the realized rate can land slightly under target — by design,
    no iterative re-solve, fully deterministic.

    Spark-first shape: source counts are one map-side-combinable
    groupBy; N and Σ share^α fold in as 1-row broadcast scalar joins;
    the per-source ``q_s`` table (catalog-sized) broadcast-joins back
    onto the corpus; the keep decision is
    :func:`weighted_sample`'s content-hash predicate — reproducible
    across runs, partitionings, and engines, and append-stable.
    Returns the input columns plus ``__q__`` (the row's source keep
    probability, for audit)."""
    if not 0 < target_rate <= 1:
        raise ValueError("target_rate must be in (0, 1]")
    # p_s = share^alpha / Σ share^alpha = n^alpha / Σ n^alpha — the N^alpha
    # cancels, so ONE totals row (N, Σ n^alpha) parameterizes every q.
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n__"))
    # totals fold in as unpartitioned window sums over the counts
    # frame — it is catalog-sized (one row per source), so the single
    # window partition holds sources, never corpus rows; a crossJoin
    # against agg-of-self would hit Spark's ambiguous-attribute trap.
    from pyspark.sql import Window

    everything = Window.partitionBy()
    n_total = F.sum("__n__").over(everything)
    sum_na = F.sum(F.pow("__n__", float(alpha))).over(everything)
    q = counts.select(
        group_col,
        F.least(
            F.lit(1.0),
            F.lit(float(target_rate)) * n_total
            * (F.pow("__n__", float(alpha)) / sum_na)
            / F.col("__n__"),
        ).alias("__q__"),
    )
    joined = df.join(F.broadcast(q), group_col)
    return weighted_sample(joined, key_col, "__q__", salt=salt)

def weighted_sample_wor(
    df: DataFrame,
    key_col: str,
    weight: Column | str,
    k: int,
    strata_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, one distributed pass —
    the Efraimidis–Spirakis A-ES scheme: each row draws a key
    u^(1/w) (equivalently ln(u)/w, monotone) from a deterministic
    md5-derived uniform, and the top-k keys ARE a weighted
    without-replacement sample. Solves what Bernoulli
    :func:`weighted_sample` cannot: an EXACT sample size with
    inclusion probability proportional to weight.

    Deterministic and engine-portable like every sampler here: u is a
    pure function of (salt, key), so the same corpus always yields the
    same sample; per-stratum top-k via one rank window (the group-by
    shuffle), no driver-side state. Rows with weight ≤ 0 never
    qualify. u uses 8 hex digits (32-bit granularity) so key
    collisions are negligible; (selection_key, key) breaks residual
    ties deterministically.
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "#", F.lit(salt), F.col(key_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / 4294967296.0
    es_key = F.log(u) / w
    scored = df.where(w > 0).withColumn("__es__", es_key)
    part = [strata_col] if strata_col else []
    win = Window.partitionBy(*part).orderBy(
        F.col("__es__").desc(), F.col(key_col)
    )
    return (
        scored.withColumn("__rn__", F.row_number().over(win))
        .where(F.col("__rn__") <= k)
        .drop("__es__", "__rn__")
    )
