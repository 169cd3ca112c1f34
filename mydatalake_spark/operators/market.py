"""Market-basket co-occurrence analytics (association rules).

[extension] The classic retail/recommendation primitive the reference
lacks: which item pairs co-occur in baskets beyond chance. Output per
pair: co-occurrence count, support, directional confidence, and lift
(observed co-rate over the independence expectation).

Spark-first shape: baskets never pivot or collect —

1. distinct (basket, item) rows (one shuffle),
2. per-item basket counts (reused broadcast-side, it is
   items-cardinality small),
3. the pair join is a SELF-EQUI-JOIN on basket id with ``item_a <
   item_b`` — join fan-out per basket is C(items_in_basket, 2), so
   the cost driver is basket WIDTH, not corpus size. ``max_basket``
   drops pathological mega-baskets (a single basket holding 1% of the
   catalog would quadratic the join on its own), mirroring
   winnow_pairs' stop-fingerprint cap — at 100 TB this bound is
   load-bearing, and dropped baskets are a one-line aggregate to
   audit.
4. one groupBy (item_a, item_b) count + two broadcast joins against
   the per-item counts; every rate is column arithmetic.

At 100 TB: one shuffle on basket id, one on the pair key; both sides
of the stats joins are catalog-sized (items²·support-bound), not
corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_basket: int | None = 1000,
) -> DataFrame:
    """Item-pair association stats over (basket, item) rows.

    Returns ``(item_a, item_b, n_pair, support, conf_a_b, conf_b_a,
    lift)`` with ``item_a < item_b``: support = co-baskets / total
    baskets, conf_a_b = P(b | a), lift = support /
    (P(a)·P(b)) — lift > 1 means the pair co-occurs beyond
    independence. Duplicate (basket, item) rows collapse first
    (presence, not multiplicity, is the basket model).
    """
    bi = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    if max_basket is not None:
        sizes = bi.groupBy("basket").agg(
            F.count(F.lit(1)).alias("__bsize__")
        )
        bi = bi.join(
            sizes.where(F.col("__bsize__") <= max_basket).select("basket"),
            "basket",
        )
    bi = bi.persist()

    n_baskets = bi.select("basket").distinct().agg(
        F.count(F.lit(1)).alias("__n_baskets__")
    )
    item_counts = bi.groupBy("item").agg(
        F.count(F.lit(1)).alias("__n_item__")
    )

    a, b = bi.alias("a"), bi.alias("b")
    pairs = (
        a.join(b, "basket")
        .where(F.col("a.item") < F.col("b.item"))
        .groupBy(
            F.col("a.item").alias("item_a"),
            F.col("b.item").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= min_pair_count)
    )
    ca = item_counts.select(
        F.col("item").alias("item_a"), F.col("__n_item__").alias("__n_a__")
    )
    cb = item_counts.select(
        F.col("item").alias("item_b"), F.col("__n_item__").alias("__n_b__")
    )
    out = (
        pairs.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_pair",
            (F.col("n_pair") / F.col("__n_baskets__")).alias("support"),
            (F.col("n_pair") / F.col("__n_a__")).alias("conf_a_b"),
            (F.col("n_pair") / F.col("__n_b__")).alias("conf_b_a"),
            (
                (F.col("n_pair") * F.col("__n_baskets__"))
                / (F.col("__n_a__") * F.col("__n_b__"))
            ).alias("lift"),
        )
    )
    from ..caching import adopt

    return adopt(out, bi)
