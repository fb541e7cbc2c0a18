"""Extended relational coverage: multi-level aggregation (rollup / cube
/ grouping sets), set operations, and the as-of join.

The reference exercises none of these (SURVEY.md §2.3 note) — Spark
provides them natively and the engine exposes them as first-class,
oracle-checked ops because the north-star workload (keyed streaming
analytics + training-data pipelines) leans on them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.numeric import dec_sum, dec_sum_sql
from ..operators.asof import asof_join
from ..sources.tables import load_table
from . import register


@register(
    "rollup_returnflag_status",
    f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           {dec_sum_sql('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark, sf_dir):
    """ROLLUP: hierarchical subtotals (flag, flag+status, grand total)
    in one pass — Spark expands grouping sets before the hash agg, so
    it stays a single shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dec_sum("l_quantity").alias("sum_qty")
    )


@register(
    "cube_priority_status",
    f"""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
           {dec_sum_sql('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
)
def q_cube(spark, sf_dir):
    """CUBE: all 2^k grouping combinations in one shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), dec_sum("o_totalprice").alias("sum_price")
    )


@register(
    "grouping_sets_events",
    f"""
    SELECT event_type, user_id, COUNT(*) AS n, {dec_sum_sql('value')} AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id))
    """,
)
def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS via the SQL surface (the engine exposes
    ``spark.sql`` passthrough as a first-class entry point)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    return spark.sql(
        f"""
        SELECT event_type, user_id, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
        FROM events_v
        GROUP BY GROUPING SETS ((event_type), (user_id))
        """
    )


@register(
    "union_split_halves",
    f"""
    SELECT o_orderstatus, COUNT(*) AS n, {dec_sum_sql('o_totalprice')} AS sum_price
    FROM (
      SELECT * FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT * FROM orders WHERE o_orderkey % 2 = 1
    )
    GROUP BY o_orderstatus
    """,
)
def q_union_split_halves(spark, sf_dir):
    """unionByName of homogeneous slices — the multi-source scan-union
    shape (the reference's multi-file CSV read, SURVEY.md §2.6)."""
    o = load_table(spark, sf_dir, "orders")
    even = o.filter(F.col("o_orderkey") % 2 == 0)
    odd = o.filter(F.col("o_orderkey") % 2 == 1)
    return (
        even.unionByName(odd)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), dec_sum("o_totalprice").alias("sum_price"))
    )


@register(
    "except_customers_without_orders",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def q_except_customers(spark, sf_dir):
    """EXCEPT (set difference): customers who never ordered."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.exceptAll(o).distinct()


@register(
    "intersect_active_users",
    """
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def q_intersect_users(spark, sf_dir):
    """INTERSECT: users appearing in both event classes."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("user_id")
    e = ev.filter(F.col("event_type") == "error").select("user_id")
    return p.intersect(e)


@register(
    "asof_last_click_before_purchase",
    """
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts, MAX(event_id) AS click_event_id
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts, c.ts AS asof_click_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_asof_join(spark, sf_dir):
    """As-of join: each purchase paired with the user's most recent
    click at-or-before it.  Engine: union + partitioned window (one
    shuffle, no range-join explosion — operators/asof.py); oracle:
    DuckDB's native ASOF JOIN.  Right side pre-aggregated to unique
    (user, ts) so both semantics are tie-free."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
        .select("user_id", "ts", F.col("ts").alias("click_ts"))
    )
    out = asof_join(purchases, clicks, ["user_id"], "ts", ["click_ts"])
    return out.select("event_id", "user_id", "ts", F.col("asof_click_ts"))
