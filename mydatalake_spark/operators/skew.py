"""Skew-mitigation operators for hot keys at scale.

[extension, 100 TB hardening — SURVEY.md §7 M6] AQE's skew-join
splitting handles most cases automatically (enabled in session.py);
these helpers cover the two patterns AQE cannot fix:

1. ``salted_agg`` — a single hot GROUP BY key overwhelms one reducer.
   Two-stage aggregation: stage 1 groups on (key, salt) spreading the
   hot key over ``n_salts`` reducers with map-side partial aggs;
   stage 2 merges the per-salt partials. Only works for decomposable
   aggregates (sum/count/min/max — avg via sum+count).

2. ``salted_join`` — a hot join key on the fact side. The fact side
   gets a random-ish (deterministic: key-hash + row hash) salt in
   [0, n); the dimension side is exploded n× with every salt value, so
   each (key, salt) pair still matches. Dimension inflation is n×|dim|
   — use only when |dim| is modest and the key histogram is known-hot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt__"


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs``: {out_name: (fn, col)} with fn in
    {sum, count, min, max} (decomposable). The salt is derived from
    row content (xxhash64 of ``salt_on`` or all non-key columns) so
    it is deterministic — no rand(), replays are stable.
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    stage1_exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            stage1_exprs.append(F.count(F.lit(1)).alias(out))
        elif fn in ("sum", "min", "max"):
            stage1_exprs.append(getattr(F, fn)(col).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")

    salt_cols = salt_on or [c for c in df.columns if c not in keys]
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts)
    ).alias(_SALT)

    partial = df.withColumn(_SALT, salt).groupBy(*keys, _SALT).agg(*stage1_exprs)
    final_exprs = [
        merge_fn[fn](out).alias(out) for out, (fn, _) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the fact side, replicate the dim side
    n_salts× so every salt bucket finds its dimension rows."""
    fact_salted = fact.withColumn(
        _SALT,
        F.pmod(
            F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)
        ),
    )
    dim_replicated = dim.withColumn(
        _SALT,
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    out = fact_salted.join(dim_replicated, on + [_SALT], how)
    return out.drop(_SALT)
