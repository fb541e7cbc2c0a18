"""Coverage of the remaining modern PySpark API surfaces — VARIANT
semi-structured values, cogrouped applyInPandas, mapInArrow, and
Python UDTFs — each doing a real job AND certified by the same DuckDB
oracle gate as every relational op (the Python/Arrow paths are held to
the bit-exact standard, not grandfathered)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_table
from . import register

# ---------------------------------------------------------------------------
# VARIANT: Spark 4's semi-structured type — parse once, extract with
# typed paths; the shredded binary beats per-access JSON string
# parsing at scale.
# ---------------------------------------------------------------------------

_VARIANT_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
FROM events
GROUP BY event_type
"""


@register("variant_props_stats", _VARIANT_SQL)
def q_variant_props_stats(spark, sf_dir):
    """props parsed to VARIANT once (``parse_json``), then typed-path
    extraction (``variant_get``) feeds an ordinary aggregate.  At
    100 TB the parse happens in the scan projection and only the
    extracted int crosses into the aggregate — the JSON string itself
    never shuffles (contrast ``json_props_stats``, which re-parses per
    access via get_json_object)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("long").alias("sum_k"),
        F.max("k").alias("max_k"),
    )


# ---------------------------------------------------------------------------
# Cogrouped applyInPandas: the two-sided Arrow UDF — each user's
# clicks and purchases meet in one pandas callback (merge_asof), the
# escape hatch for per-key logic no built-in join expresses.
# ---------------------------------------------------------------------------

_COGROUP_SQL = """
WITH clicks AS (
  SELECT user_id, epoch_us(ts) AS c_us FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, event_id, epoch_us(ts) AS p_us FROM events WHERE event_type = 'purchase'
), matched AS (
  SELECT p.user_id, p.event_id, p.p_us,
         (SELECT MAX(c.c_us) FROM clicks c
          WHERE c.user_id = p.user_id AND c.c_us <= p.p_us) AS last_c_us
  FROM purchases p
)
SELECT user_id,
       COUNT(*) AS n_purchases,
       CAST(SUM(CASE WHEN last_c_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       CAST(MAX(CASE WHEN last_c_us IS NOT NULL THEN p_us - last_c_us END) AS BIGINT) AS max_gap_us
FROM matched
GROUP BY user_id
"""


@register("cogroup_asof_stats", _COGROUP_SQL)
def q_cogroup_asof_stats(spark, sf_dir):
    """Per-user as-of match of purchases to their latest preceding
    click via ``cogroup().applyInPandas`` + ``pandas.merge_asof`` —
    the cogrouped Arrow path: both sides shuffle ONCE on user_id, each
    key's pair of frames meets in a single Python callback (state
    bounded by per-key group size).  The relational as-of operator
    (`asof_last_click_before_purchase`) is the built-in twin; this one
    certifies the cogroup surface against the same scalar-subquery
    oracle."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", us.alias("c_us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", us.alias("p_us")
    )

    def asof(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # left = purchases, right = clicks for one user
        if left.empty:
            return pd.DataFrame(
                columns=["user_id", "n_purchases", "n_matched", "max_gap_us"]
            )
        left = left.sort_values(["p_us", "event_id"])
        right = right.sort_values("c_us")
        m = pd.merge_asof(
            left, right[["c_us"]], left_on="p_us", right_on="c_us",
            direction="backward", allow_exact_matches=True,
        )
        gaps = (m["p_us"] - m["c_us"]).dropna()
        return pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_purchases": [len(m)],
                "n_matched": [int(m["c_us"].notna().sum())],
                "max_gap_us": [int(gaps.max()) if len(gaps) else None],
            }
        )

    return purchases.groupBy("user_id").cogroup(clicks.groupBy("user_id")).applyInPandas(
        asof,
        schema="user_id long, n_purchases long, n_matched long, max_gap_us long",
    )
