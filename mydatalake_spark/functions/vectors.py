"""Vector math over ``array<float/double>`` embedding columns.

[extension] Pure ``pyspark.sql.functions`` higher-order expressions
(zip_with + aggregate) — JVM-side, no UDF, codegen-friendly. At 100 TB
these evaluate inside the scan/project stage; the expensive part of
similarity search is the *join strategy* (see similarity/), not the
arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (sequential fold — deterministic
    summation order, unlike a shuffle-order-dependent SUM)."""
    prod = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b) with 0-norm guard (null on zero vectors)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)
