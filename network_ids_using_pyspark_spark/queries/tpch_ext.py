"""TPC-H-shape join queries beyond the broadcast star (queries/core.py
``nation_revenue`` covers Q5's *star* shape with every dim broadcast).

These two exercise the join strategies that star didn't:

* ``q5_same_nation_revenue`` — the REAL Q5 semantics: revenue only when
  the customer and the line's supplier sit in the same nation, region-
  and date-filtered.  Two independent FK chains out of lineitem
  (l_orderkey→orders→customer, l_suppkey→supplier) meet in an equality
  constraint BETWEEN two dimensions — the classic case where you cannot
  broadcast your way out of every join at 100 TB (orders/customer/
  supplier all grow with SF; only nation/region stay tiny).
* ``q18_large_volume_customers`` — aggregate-then-semi-join: a HAVING
  filter on a fact aggregate drives the join, so the reduction happens
  BEFORE any wide join (the 100 TB rule: aggregate first, join the
  survivors).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.numeric import dec_sum, dec_sum_sql
from ..sources.tables import load_table
from . import register

_REGION = "EUROPE"
_D0, _D1 = "1996-01-01", "1997-01-01"

_Q5_SQL = f"""
SELECT n.n_name,
       {dec_sum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
               AND s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{_REGION}'
  AND o.o_orderdate >= TIMESTAMP '{_D0} 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '{_D1} 00:00:00'
GROUP BY n.n_name
"""


@register("q5_same_nation_revenue", _Q5_SQL)
def q_q5_same_nation_revenue(spark, sf_dir):
    """TPC-H Q5 (same-nation customer/supplier revenue by nation).

    Scale plan: the region filter prunes nation FIRST, and the pruned
    (≤25-row) nation relation is broadcast into BOTH the customer and
    supplier sides — so each fact-side join carries its nationkey and
    the region predicate is applied before any shuffle.  The two
    remaining joins (l⋈s map-side via broadcast only because supplier
    is a dim *here*; l⋈o⋈c by key shuffle, AQE-planned) meet in the
    same-nation equality applied as a join predicate, not a
    post-filter, so Catalyst keeps it in the join condition.  At
    100 TB: nation/region broadcast is free; orders/customer/supplier
    shuffles are on their FK keys with map-side date pruning pushed to
    the orders scan (PushedFilters on o_orderdate)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_D0).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_D1).cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == _REGION)
    # region→nation pruning, broadcast into both fact chains
    n_in_region = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    cust = c.join(
        F.broadcast(n_in_region), c.c_nationkey == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_nationkey").alias("c_nkey"))
    supp = s.join(
        F.broadcast(n_in_region.select("n_nationkey")),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("s_nationkey").alias("s_nkey"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .join(supp, (l.l_suppkey == supp.s_suppkey) & (F.col("c_nkey") == F.col("s_nkey")))
    )
    return (
        joined.join(F.broadcast(n_in_region), F.col("c_nkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            dec_sum(revenue).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


_Q10_SQL = f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       {dec_sum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
"""


@register("q10_returned_item_ranking", _Q10_SQL)
def q_q10_returned_item_ranking(spark, sf_dir):
    """TPC-H Q10 (top returned-item customers): the fact side is
    filtered to returns AT THE SCAN (PushedFilters on l_returnflag),
    so the joins move only the ~25% returned fraction; nation
    broadcasts; the ranking is TakeOrderedAndProject (per-partition
    heaps + k-merge), never a global sort.  Revenue ties broken by
    custkey for a total order."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dec_sum(revenue).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_QTY_T = 250

_Q18_SQL = f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       {dec_sum_sql('l.l_quantity')} AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(30,6))) > {_QTY_T}
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
"""


@register("q18_large_volume_customers", _Q18_SQL)
def q_q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 (large-volume customers): the aggregate-then-join
    shape.  The per-order quantity aggregate (map-side partial sums,
    one shuffle on l_orderkey) + HAVING reduces the fact table to a
    tiny key set FIRST; that survivor set drives a semi-join back into
    lineitem/orders, and only then does customer attach.  At 100 TB
    the HAVING survivors are ~1% of orders, so every downstream join
    moves 1% of the data — the aggregation is the filter."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,6)")).alias("q"))
        .filter(F.col("q") > _QTY_T)
        .select("l_orderkey")
    )
    return (
        l.join(big.withColumnRenamed("l_orderkey", "bk"), l.l_orderkey == F.col("bk"), "left_semi")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dec_sum("l_quantity").alias("sum_qty"))
    )


_Q3_SEG = "BUILDING"
_Q3_DATE = "1998-01-01"

_Q3_SQL = f"""
SELECT l.l_orderkey,
       {dec_sum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = '{_Q3_SEG}'
  AND o.o_orderdate < TIMESTAMP '{_Q3_DATE} 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '{_Q3_DATE} 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey ASC
LIMIT 10
"""


@register("q3_shipping_priority", _Q3_SQL)
def q_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 (shipping priority): top unshipped orders by revenue.

    Scale plan: both date predicates are scan-level PushedFilters (each
    side of the join is pruned BEFORE the shuffle); the segment filter
    reduces customer, which then semi-restricts orders via the join.
    The top-10 is TakeOrderedAndProject (per-partition heaps), never a
    global sort — at 100 TB the ranking cost is O(rows) + a 10-row
    merge on the driver."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == _Q3_SEG
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_Q3_DATE).cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_Q3_DATE).cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_sum(revenue).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q6_Y0, _Q6_Y1 = "1997-01-01", "1998-01-01"
_Q6_D0, _Q6_D1 = 0.02, 0.04
_Q6_QTY = 24

_Q6_SQL = f"""
SELECT {dec_sum_sql('l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{_Q6_Y0} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{_Q6_Y1} 00:00:00'
  AND l_discount BETWEEN {_Q6_D0} AND {_Q6_D1}
  AND l_quantity < {_Q6_QTY}
"""


@register("q6_forecast_revenue", _Q6_SQL)
def q_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 (forecast revenue change): the pure-scan query — no
    join, no wide shuffle, one global aggregate.

    This is the predicate-pushdown showcase: all three filters reach
    the parquet scan as PushedFilters, row groups outside the shipdate
    year are skipped on min/max stats, and only 3 of 11 columns are
    read (ReadSchema).  At 100 TB this query's cost is I/O on the
    pruned row groups alone; the aggregate is a partial-per-partition
    + single final reduce of one decimal accumulator.  Plan-shape
    asserted in tests/test_plans.py."""
    l = load_table(spark, sf_dir, "lineitem")
    f = l.filter(
        (F.col("l_shipdate") >= F.lit(_Q6_Y0).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q6_Y1).cast("timestamp"))
        & (F.col("l_discount") >= _Q6_D0)
        & (F.col("l_discount") <= _Q6_D1)
        & (F.col("l_quantity") < _Q6_QTY)
    )
    return f.agg(
        dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_Q14_Y0, _Q14_Y1 = "1997-01-01", "1997-04-01"

_Q14_SQL = f"""
SELECT CAST(100.0 AS DOUBLE)
         * {dec_sum_sql("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
         / {dec_sum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS promo_revenue_pct,
       COUNT(*) AS n_rows
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '{_Q14_Y0} 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '{_Q14_Y1} 00:00:00'
"""


@register("q14_promo_revenue", _Q14_SQL)
def q_q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 (promotion effect): conditional-aggregate-over-join.

    Scale plan: lineitem is date-pruned at the scan; part is the small
    side and broadcasts (no shuffle of the fact table at all — the
    only exchange is the final 1-row aggregate reduce).  Both sums
    accumulate in DECIMAL so the final double ratio is bit-identical
    across engines and partitionings."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q14_Y0).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q14_Y1).cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.0) * dec_sum(promo) / dec_sum(rev)).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


_Q4_D0, _Q4_D1 = "1997-01-01", "1997-04-01"

_Q4_SQL = f"""
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{_Q4_D0} 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '{_Q4_D1} 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
  )
GROUP BY o.o_orderpriority
"""


@register("q4_priority_with_returns", _Q4_SQL)
def q_q4_priority_with_returns(spark, sf_dir):
    """TPC-H Q4 shape (EXISTS decorrelation): quarter's orders having
    at least one returned line, counted by priority.  The correlated
    EXISTS becomes a LEFT SEMI join — Catalyst's standard
    decorrelation, and the right answer at 100 TB: the semi join emits
    each order at most once (no fan-out to dedup later), the date
    filter is a scan-level PushedFilter, and the returned-lines side
    is pre-filtered before the shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q4_D0).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q4_D1).cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_Q16_Y0, _Q16_Y1 = "1997-01-01", "1998-01-01"

_Q16_SQL = f"""
SELECT p.p_brand, p.p_type, COUNT(*) AS n_parts
FROM part p
WHERE NOT EXISTS (
  SELECT 1
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_partkey = p.p_partkey
    AND o.o_orderdate >= TIMESTAMP '{_Q16_Y0} 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '{_Q16_Y1} 00:00:00'
)
GROUP BY p.p_brand, p.p_type
"""


@register("q16_parts_not_ordered", _Q16_SQL)
def q_q16_parts_not_ordered(spark, sf_dir):
    """TPC-H Q16 shape (NOT EXISTS → LEFT ANTI): parts with zero
    orders in the year, profiled by brand/type.  The anti join's
    probe side is reduced FIRST (date-filtered orders semi-join
    lineitem, then distinct partkeys — at 100 TB this distinct set is
    bounded by |part|, far smaller than the fact table), so the anti
    join compares against the minimal key set."""
    p = load_table(spark, sf_dir, "part")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q16_Y0).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q16_Y1).cast("timestamp"))
    ).select("o_orderkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    ordered_parts = (
        l.join(o, l.l_orderkey == o.o_orderkey, "left_semi")
        .select("l_partkey")
        .distinct()
    )
    return (
        p.join(ordered_parts, p.p_partkey == ordered_parts.l_partkey, "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
