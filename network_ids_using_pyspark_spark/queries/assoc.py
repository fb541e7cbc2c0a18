"""Market-basket association rules over order baskets — exact
support / confidence / lift for item pairs, the SQL-exact complement
of the MLlib FP-Growth twin (``mllib_fpgrowth_itemsets``).

Reproducibility: supports are integer counts; confidence and lift are
each ONE division of exact integers (lift's numerator/denominator are
multiplied out in int64 first), so every value is bit-identical across
engines.

No reference parity; part of the engine's analytics extension family.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_table
from . import register

_MIN_SUP = 3  # minimum basket count for a pair to be reported

_ASSOC_SQL = f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM items),
sup AS (
  SELECT l_partkey, COUNT(*) AS sup_item FROM items
  GROUP BY l_partkey HAVING COUNT(*) >= {_MIN_SUP}
),
freq AS (
  SELECT i.l_orderkey, i.l_partkey
  FROM items i JOIN sup s ON i.l_partkey = s.l_partkey
),
pairs AS (
  SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
         CAST(COUNT(*) AS BIGINT) AS sup_pair
  FROM freq a JOIN freq b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {_MIN_SUP}
)
SELECT p.item_a, p.item_b, p.sup_pair,
       CAST(sa.sup_item AS BIGINT) AS sup_a,
       CAST(sb.sup_item AS BIGINT) AS sup_b,
       CAST(p.sup_pair AS DOUBLE) / sa.sup_item AS conf_a_b,
       CAST(p.sup_pair AS DOUBLE) / sb.sup_item AS conf_b_a,
       CAST(p.sup_pair * n.n_baskets AS DOUBLE) / (sa.sup_item * sb.sup_item) AS lift
FROM pairs p
JOIN sup sa ON p.item_a = sa.l_partkey
JOIN sup sb ON p.item_b = sb.l_partkey
CROSS JOIN n
"""


@register("assoc_rules_lift", _ASSOC_SQL)
def q_assoc_rules_lift(spark, sf_dir):
    """Item-pair association rules (support ≥ {_MIN_SUP}) with exact
    confidence in both directions and lift.

    Scale plan (the apriori monotonicity argument): items below the
    support floor are pruned BEFORE pair generation — a pair can only
    reach support s if both members do — so the within-basket self-join
    runs on the frequent-item projection only.  The self-join shuffles
    on the basket key once; pair counting is a map-side-combined
    aggregate on the (item_a, item_b) key; the final conf/lift joins
    attach the item-dim-sized support relation (broadcast) and the
    1-row basket count (broadcast cross-join, never a collect).
    Basket-size skew is the known hazard at 100 TB — the floor prunes
    exactly the long tail that fattens the quadratic term.
    """
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n = items.agg(F.countDistinct("l_orderkey").alias("n_baskets"))
    sup = (
        items.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("sup_item"))
        .filter(F.col("sup_item") >= _MIN_SUP)
    )
    freq = items.join(F.broadcast(sup.select("l_partkey")), "l_partkey").select(
        "l_orderkey", "l_partkey"
    )
    a = freq.select(F.col("l_orderkey"), F.col("l_partkey").alias("item_a"))
    b = freq.select(F.col("l_orderkey"), F.col("l_partkey").alias("item_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("sup_pair"))
        .filter(F.col("sup_pair") >= _MIN_SUP)
    )
    sa = sup.select(F.col("l_partkey").alias("item_a"), F.col("sup_item").alias("sup_a"))
    sb = sup.select(F.col("l_partkey").alias("item_b"), F.col("sup_item").alias("sup_b"))
    return (
        pairs.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .crossJoin(F.broadcast(n))
        .select(
            "item_a",
            "item_b",
            "sup_pair",
            F.col("sup_a").cast("long").alias("sup_a"),
            F.col("sup_b").cast("long").alias("sup_b"),
            (F.col("sup_pair").cast("double") / F.col("sup_a")).alias("conf_a_b"),
            (F.col("sup_pair").cast("double") / F.col("sup_b")).alias("conf_b_a"),
            (
                (F.col("sup_pair") * F.col("n_baskets")).cast("double")
                / (F.col("sup_a") * F.col("sup_b"))
            ).alias("lift"),
        )
    )
