"""Statistical-inference extensions: exact two-sample KS drift, the
Poisson bootstrap (the canonical distributed resampler), and Benford
first-digit forensics.  All integer/decimal-exact by the engine's
reproducibility discipline.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.hashing import (
    HASH_SPACE,
    hash_bucket,
    hash_bucket_sql,
    portable_hash64,
    portable_hash64_sql,
)
from ..sources.tables import load_table
from . import register

# ---------------------------------------------------------------------------
# Exact two-sample Kolmogorov-Smirnov: distribution drift between the
# click and error event populations.  Counts are pre-aggregated per
# DISTINCT value so the cumulative CDFs are tie-deterministic (a
# row-level running sum would depend on the sort order among equal
# values); the statistic stays integer via cross-multiplication
# |c1·n2 − c2·n1| until one final division.
# ---------------------------------------------------------------------------

_KS_SQL = """
WITH s AS (
  SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 2 END AS g
  FROM events WHERE event_type IN ('click', 'error')
),
per_v AS (
  SELECT value,
         SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS d1,
         SUM(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS d2
  FROM s GROUP BY value
),
c AS (
  SELECT value,
         SUM(d1) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS c1,
         SUM(d2) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS c2,
         SUM(d1) OVER () AS n1, SUM(d2) OVER () AS n2
  FROM per_v
),
m AS (
  SELECT value, c1, c2, n1, n2, ABS(c1 * n2 - c2 * n1) AS num,
         MAX(ABS(c1 * n2 - c2 * n1)) OVER () AS max_num
  FROM c
)
SELECT CAST(ANY_VALUE(n1) AS BIGINT) AS n1,
       CAST(ANY_VALUE(n2) AS BIGINT) AS n2,
       CAST(ANY_VALUE(max_num) AS BIGINT) AS ks_num,
       CAST(ANY_VALUE(max_num) AS DOUBLE)
         / (ANY_VALUE(n1) * ANY_VALUE(n2)) AS ks_stat,
       MIN(CASE WHEN num = max_num THEN value END) AS ks_at_value
FROM m
"""


@register("ks_two_sample_drift", _KS_SQL)
def q_ks_two_sample_drift(spark, sf_dir):
    """Exact two-sample KS statistic (click vs error value
    distributions) with the location of the maximum CDF gap — the
    nonparametric drift test PSI approximates in bands.

    Scale plan: the population collapses to per-distinct-value counts
    first (one aggregate); the cumulative window runs over the VALUE
    domain, not the rows.  For a domain too large even for that, the
    engine's KLL-sketch quantile gate is the approximate stand-in —
    same pairing as exact vs HLL distinct."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type").isin("click", "error")).select(
        "value",
        F.when(F.col("event_type") == "click", 1).otherwise(2).alias("g"),
    )
    per_v = s.groupBy("value").agg(
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("g") == 2, 1).otherwise(0)).alias("d2"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    c = per_v.select(
        "value",
        F.sum("d1").over(w).alias("c1"),
        F.sum("d2").over(w).alias("c2"),
        F.sum("d1").over(w_all).alias("n1"),
        F.sum("d2").over(w_all).alias("n2"),
    )
    m = c.select(
        "value",
        "n1",
        "n2",
        F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")).alias("num"),
    ).withColumn("max_num", F.max("num").over(w_all))
    return m.agg(
        F.first("n1").cast("long").alias("n1"),
        F.first("n2").cast("long").alias("n2"),
        F.first("max_num").cast("long").alias("ks_num"),
        (F.first("max_num").cast("double") / (F.first("n1") * F.first("n2"))).alias(
            "ks_stat"
        ),
        F.min(F.when(F.col("num") == F.col("max_num"), F.col("value"))).alias(
            "ks_at_value"
        ),
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap CI of the mean order price — THE distributed
# bootstrap: instead of resampling n rows with replacement (which
# needs global coordination), each row independently contributes a
# Poisson(1) weight per replicate.  Weights come from the portable
# hash via the exact Poisson inverse CDF, so every replicate is
# deterministic and engine-identical.
# ---------------------------------------------------------------------------

_B = 50
# cumulative Poisson(1) probabilities as exact double literals
_POIS_CDF = [
    0.3678794411714423,
    0.7357588823428846,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
]


def _boot_sql() -> str:
    h = portable_hash64_sql(
        "concat(CAST(rep AS VARCHAR), ':', CAST(o_orderkey AS VARCHAR))",
        seed="boot:",
    )
    cases = " ".join(
        f"WHEN u < {p} THEN {i}" for i, p in enumerate(_POIS_CDF)
    )
    return f"""
WITH reps AS (SELECT unnest(range(0, {_B})) AS rep),
w AS (
  SELECT rep, o_totalprice, {h} / {float(HASH_SPACE)} AS u
  FROM orders CROSS JOIN reps
),
pw AS (
  SELECT rep, o_totalprice, CASE {cases} ELSE {len(_POIS_CDF)} END AS wt FROM w
),
means AS (
  SELECT rep,
         CAST(CAST(SUM(wt * CAST(o_totalprice AS DECIMAL(30, 6))) AS VARCHAR)
              AS DOUBLE) / SUM(wt) AS m
  FROM pw GROUP BY rep
),
ranked AS (
  SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS rk FROM means
),
full_mean AS (
  SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30, 6))) AS VARCHAR)
              AS DOUBLE) / COUNT(*) AS point FROM orders
)
SELECT {_B} AS n_replicates,
       (SELECT point FROM full_mean) AS point_estimate,
       MIN(CASE WHEN rk = 2 THEN m END) AS ci_lo,
       MIN(CASE WHEN rk = {_B - 1} THEN m END) AS ci_hi
FROM ranked
"""


@register("poisson_bootstrap_ci", _boot_sql())
def q_poisson_bootstrap_ci(spark, sf_dir):
    """~95% bootstrap CI for the mean order price from {_B} Poisson
    replicates (order statistics 2 and {_B}−1 of the replicate means).
    Replicate weights are a pure function of (seed, replicate, row key)
    — the resampler re-runs bit-identically, and no replicate ever
    materializes a resampled dataset: the fan-out is a map-side
    explode of weights, each mean a decimal-exact weighted aggregate.

    Scale plan: one scan fans out to B weighted partial aggregates
    (map-side combine on rep); the B-row mean relation is dim-sized.
    B scans nothing — the corpus is read ONCE."""
    o = load_table(spark, sf_dir, "orders")
    reps = F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("rep")
    w = o.select("o_orderkey", "o_totalprice", reps)
    u = (
        portable_hash64(
            F.concat(F.col("rep").cast("string"), F.lit(":"), F.col("o_orderkey").cast("string")),
            seed="boot:",
        )
        / F.lit(float(HASH_SPACE))
    )
    wt = None
    for i, p in enumerate(_POIS_CDF):
        cond = u < p
        wt = F.when(cond, i) if wt is None else wt.when(cond, i)
    wt = wt.otherwise(len(_POIS_CDF))
    pw = w.select("rep", "o_totalprice", wt.alias("wt"))
    means = pw.groupBy("rep").agg(
        (
            F.sum(F.col("wt") * F.col("o_totalprice").cast("decimal(30, 6)"))
            .cast("string")
            .cast("double")
            / F.sum("wt")
        ).alias("m")
    )
    rk = Window.orderBy("m")
    ranked = means.select("m", F.row_number().over(rk).alias("rk"))
    point = o.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(30, 6)"))
            .cast("string")
            .cast("double")
            / F.count(F.lit(1))
        ).alias("point_estimate")
    )
    return (
        ranked.agg(
            F.min(F.when(F.col("rk") == 2, F.col("m"))).alias("ci_lo"),
            F.min(F.when(F.col("rk") == _B - 1, F.col("m"))).alias("ci_hi"),
        )
        .crossJoin(F.broadcast(point))
        .select(
            F.lit(_B).alias("n_replicates"),
            "point_estimate",
            "ci_lo",
            "ci_hi",
        )
    )


# ---------------------------------------------------------------------------
# Benford first-digit forensics over order totals: observed counts vs
# the log10(1 + 1/d) expectation — the fraud/synthetic-data screen.
# (The fixture's uniform-ish price generator deliberately FAILS
# Benford — the report shows exactly how, which is the point of a
# forensic query.)
# ---------------------------------------------------------------------------

_BENFORD_SQL = """
WITH d AS (
  -- floor, not CAST-to-BIGINT: DuckDB's double→BIGINT cast rounds to
  -- nearest while Spark's truncates — floor() agrees everywhere
  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit
  FROM orders WHERE o_totalprice >= 1
),
n AS (SELECT COUNT(*) AS nn FROM d)
SELECT digit,
       CAST(COUNT(*) AS BIGINT) AS n_obs,
       round(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(nn.nn), 6) AS obs_share,
       round(log10(1 + 1.0 / digit), 6) AS benford_share
FROM d CROSS JOIN n nn
GROUP BY digit
"""


@register("benford_digit_test", _BENFORD_SQL)
def q_benford_digit_test(spark, sf_dir):
    """First-significant-digit distribution of order totals against
    Benford's law.  Digit extraction goes through the integer part's
    string form (identical in both engines — no float log10 flooring);
    shares round at 1e-6.

    Scale plan: single scan, 9-key map-side-combined count, 1-row
    total broadcast."""
    o = load_table(spark, sf_dir, "orders")
    d = o.filter(F.col("o_totalprice") >= 1).select(
        F.substring(F.floor(F.col("o_totalprice")).cast("string"), 1, 1)
        .cast("long")
        .alias("digit")
    )
    n = d.agg(F.count(F.lit(1)).alias("nn"))
    return (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            "n_obs",
            F.round(F.col("n_obs").cast("double") / F.col("nn"), 6).alias(
                "obs_share"
            ),
            F.round(F.log10(1 + 1.0 / F.col("digit")), 6).alias("benford_share"),
        )
    )


# ---------------------------------------------------------------------------
# A/B experiment readout with CUPED variance reduction: per-user
# pre-period means as the control covariate, deterministic hash
# assignment, θ = cov(X,Y)/var(X) from decimal-exact moments.
# ---------------------------------------------------------------------------

_AB_SPLIT_DAY = 15  # pre-period = first 15 days of the fixture month


def _ab_sql() -> str:
    from ..functions.hashing import portable_hash64_sql

    h = portable_hash64_sql("CAST(user_id AS VARCHAR)", seed="ab:")
    dec = "DECIMAL(30, 6)"
    to_d = lambda e: f"CAST(CAST({e} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    return f"""
WITH b AS (SELECT CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP)
             + INTERVAL {_AB_SPLIT_DAY} DAY AS cut FROM events),
per_user AS (
  SELECT user_id, {h} % 2 AS grp,
         {to_d(f"SUM(CASE WHEN ts < cut THEN CAST(value AS {dec}) END)")}
           / COUNT(CASE WHEN ts < cut THEN 1 END) AS x,
         {to_d(f"SUM(CASE WHEN ts >= cut THEN CAST(value AS {dec}) END)")}
           / COUNT(CASE WHEN ts >= cut THEN 1 END) AS y
  FROM events CROSS JOIN b
  GROUP BY user_id
  HAVING COUNT(CASE WHEN ts < cut THEN 1 END) > 0
     AND COUNT(CASE WHEN ts >= cut THEN 1 END) > 0
),
q AS (
  SELECT user_id, grp,
         CAST(round(x, 9) AS DECIMAL(38, 9)) AS xq,
         CAST(round(y, 9) AS DECIMAL(38, 9)) AS yq
  FROM per_user
),
adj AS (
  -- per-arm DECIMAL moment sums; the global moments are then window
  -- sums over this 2-row relation — exact, and the event log is
  -- scanned exactly once
  SELECT grp, COUNT(*) AS n_g,
         SUM(xq) AS dx_g, SUM(yq) AS dy_g,
         SUM(xq * xq) AS dxx_g, SUM(xq * yq) AS dxy_g
  FROM q GROUP BY grp
),
tot AS (
  SELECT grp, n_g, dx_g, dy_g,
         SUM(n_g) OVER () AS n,
         {to_d('SUM(dx_g) OVER ()')} AS sx,
         {to_d('SUM(dy_g) OVER ()')} AS sy,
         {to_d('SUM(dxx_g) OVER ()')} AS sxx,
         {to_d('SUM(dxy_g) OVER ()')} AS sxy
  FROM adj
)
SELECT CAST(grp AS BIGINT) AS grp,
       CAST(n_g AS BIGINT) AS n_users,
       round({to_d('dy_g')} / n_g, 6) AS mean_y,
       round({to_d('dy_g')} / n_g
             - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
               * ({to_d('dx_g')} / n_g - sx / n), 6) AS mean_y_cuped
FROM tot
"""


@register("ab_cuped_readout", _ab_sql())
def q_ab_cuped_readout(spark, sf_dir):
    """Per-arm experiment readout: raw post-period mean and the
    CUPED-adjusted mean (ŷ − θ(x̄_g − x̄), θ from global pre/post
    covariance) under deterministic hash assignment.  Per-user means
    are quantized to the 1e-9 grid before the moment sums (exact
    DECIMAL thereafter), so θ and both adjusted means are identical
    across engines.

    Scale plan: one scan → user-keyed pre/post aggregate (map-side
    combined); the moment relation is 1-row, broadcast into the 2-row
    per-arm rollup.  CUPED at 100 TB costs exactly one extra pass over
    the USER dimension, not the event log."""
    from ..functions.hashing import portable_hash64

    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        (F.date_trunc("day", F.min("ts")) + F.expr(f"INTERVAL {_AB_SPLIT_DAY} DAY")).alias("cut")
    )
    dec = "decimal(30, 6)"
    per_user = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            (portable_hash64("user_id", seed="ab:") % 2).alias("grp_raw"),
            (
                F.sum(F.when(F.col("ts") < F.col("cut"), F.col("value").cast(dec)))
                .cast("string")
                .cast("double")
                / F.count(F.when(F.col("ts") < F.col("cut"), 1))
            ).alias("x"),
            (
                F.sum(F.when(F.col("ts") >= F.col("cut"), F.col("value").cast(dec)))
                .cast("string")
                .cast("double")
                / F.count(F.when(F.col("ts") >= F.col("cut"), 1))
            ).alias("y"),
            F.count(F.when(F.col("ts") < F.col("cut"), 1)).alias("pre_n"),
            F.count(F.when(F.col("ts") >= F.col("cut"), 1)).alias("post_n"),
        )
        .filter((F.col("pre_n") > 0) & (F.col("post_n") > 0))
    )
    # grp must be an agg output (hash of the group key) — first() of the
    # per-row hash is identical for all rows of the user
    q = per_user.select(
        F.col("grp_raw").alias("grp"),
        F.round("x", 9).cast("decimal(38, 9)").alias("xq"),
        F.round("y", 9).cast("decimal(38, 9)").alias("yq"),
    )
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    # per-arm DECIMAL moments; globals are window sums over the 2-row
    # arm relation — the event log is scanned once (plan-tested)
    adj = q.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("xq").alias("dx_g"),
        F.sum("yq").alias("dy_g"),
        F.sum(F.col("xq") * F.col("xq")).alias("dxx_g"),
        F.sum(F.col("xq") * F.col("yq")).alias("dxy_g"),
    )
    w_all = Window.partitionBy()
    tot = adj.select(
        "grp",
        "n_g",
        "dx_g",
        "dy_g",
        F.sum("n_g").over(w_all).alias("n"),
        to_d(F.sum("dx_g").over(w_all)).alias("sx"),
        to_d(F.sum("dy_g").over(w_all)).alias("sy"),
        to_d(F.sum("dxx_g").over(w_all)).alias("sxx"),
        to_d(F.sum("dxy_g").over(w_all)).alias("sxy"),
    )
    th = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return tot.select(
        F.col("grp").cast("long").alias("grp"),
        F.col("n_g").cast("long").alias("n_users"),
        F.round(to_d(F.col("dy_g")) / F.col("n_g"), 6).alias("mean_y"),
        F.round(
            to_d(F.col("dy_g")) / F.col("n_g")
            - th * (to_d(F.col("dx_g")) / F.col("n_g") - F.col("sx") / F.col("n")),
            6,
        ).alias("mean_y_cuped"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation: recency/frequency/monetary quintiles per customer,
# reported as the segment-cell histogram.
# ---------------------------------------------------------------------------

_RFM_SQL = """
WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
base AS (
  SELECT o_custkey,
         date_diff('day', MAX(CAST(o_orderdate AS DATE)), ANY_VALUE(mx.maxd))
           AS recency,
         COUNT(*) AS frequency,
         SUM(CAST(o_totalprice AS DECIMAL(30, 6))) AS monetary
  FROM orders CROSS JOIN mx GROUP BY o_custkey
),
scored AS (
  SELECT NTILE(5) OVER (ORDER BY recency DESC, o_custkey) AS r_sc,
         NTILE(5) OVER (ORDER BY frequency, o_custkey) AS f_sc,
         NTILE(5) OVER (ORDER BY monetary, o_custkey) AS m_sc
  FROM base
)
SELECT r_sc, f_sc, m_sc, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM scored GROUP BY 1, 2, 3
"""


@register("rfm_segment_counts", _RFM_SQL)
def q_rfm_segment_counts(spark, sf_dir):
    """RFM quintile segmentation (5×5×5 cells) of the customer base —
    deterministic NTILE with (metric, custkey) tiebreaks; monetary
    ranks on the exact DECIMAL sum so ordering never depends on float
    accumulation.

    Scale plan: the fact collapses to one row per customer first; the
    three NTILEs are single-sort windows over the CUSTOMER dimension —
    the exact gate form.  `rfm_segment_counts_scaled`
    (queries/rangescale.py) replaces them with rank-selected quintile
    cutpoints + a map-side CASE (identical output, shared oracle, no
    single-task sort) and is the 100 TB form."""
    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("maxd"))
    base = (
        o.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            F.datediff(
                F.first("maxd"), F.max(F.col("o_orderdate").cast("date"))
            ).alias("recency"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(30, 6)")).alias("monetary"),
        )
    )
    scored = base.select(
        F.ntile(5)
        .over(Window.orderBy(F.desc("recency"), F.asc("o_custkey")))
        .alias("r_sc"),
        F.ntile(5)
        .over(Window.orderBy(F.asc("frequency"), F.asc("o_custkey")))
        .alias("f_sc"),
        F.ntile(5)
        .over(Window.orderBy(F.asc("monetary"), F.asc("o_custkey")))
        .alias("m_sc"),
    )
    return scored.groupBy("r_sc", "f_sc", "m_sc").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier repeat-purchase curve: survival of "time to next order"
# with right-censoring at the observation end — the correct estimator
# where the naive gap histogram (interorder_gap_histogram) is biased by
# ignoring customers who have not yet reordered.
# ---------------------------------------------------------------------------

_KM_MAX_T = 60  # report the curve over the first 60 days


def _km_sql() -> str:
    return f"""
WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
g AS (
  SELECT date_diff('day', CAST(o_orderdate AS DATE),
           LEAD(CAST(o_orderdate AS DATE)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) AS gap,
         date_diff('day', CAST(o_orderdate AS DATE), mx.maxd) AS to_end
  FROM orders CROSS JOIN mx
),
obs AS (
  SELECT CASE WHEN gap IS NULL THEN to_end ELSE gap END AS t,
         CASE WHEN gap IS NULL THEN 0 ELSE 1 END AS d
  FROM g
),
per_t AS (
  SELECT t, SUM(d) AS d_events, SUM(1 - d) AS c_censored
  FROM obs GROUP BY t
),
risk AS (
  SELECT t, d_events,
         SUM(d_events + c_censored) OVER () 
           - COALESCE(SUM(d_events + c_censored) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS at_risk
  FROM per_t
),
km AS (
  SELECT t, d_events, at_risk,
         SUM(CAST(round(ln(1.0 - CAST(d_events AS DOUBLE) / at_risk), 9)
                  AS DECIMAL(38, 9)))
           OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS log_s
  FROM risk WHERE d_events > 0 AND at_risk > d_events
)
SELECT CAST(t AS BIGINT) AS t_days,
       CAST(d_events AS BIGINT) AS d_events,
       CAST(at_risk AS BIGINT) AS at_risk,
       round(exp(CAST(CAST(log_s AS VARCHAR) AS DOUBLE)), 6) AS survival
FROM km WHERE t <= {_KM_MAX_T}
"""


@register("kaplan_meier_repeat_purchase", _km_sql())
def q_kaplan_meier_repeat_purchase(spark, sf_dir):
    """Kaplan-Meier estimate of P(no repeat order by day t): each
    order contributes either its gap to the customer's next order
    (event) or its distance to the dataset end (censored).  The
    product-limit estimator runs in log space — per-time hazards
    ln(1−d/n) quantized to 1e-9 and prefix-summed in exact DECIMAL —
    so the curve is bit-stable under any partitioning.

    Scale plan: one LEAD window per customer (bounded histories), then
    everything operates on the per-distinct-time relation
    (calendar-bounded); the at-risk prefix and the log-survival prefix
    are windows over THAT, never the orders fact."""
    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("maxd"))
    w_cust = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.crossJoin(F.broadcast(mx)).select(
        F.datediff(
            F.lead(F.col("o_orderdate").cast("date")).over(w_cust),
            F.col("o_orderdate").cast("date"),
        ).alias("gap"),
        F.datediff(F.col("maxd"), F.col("o_orderdate").cast("date")).alias("to_end"),
    )
    obs = g.select(
        F.coalesce(F.col("gap"), F.col("to_end")).alias("t"),
        F.when(F.col("gap").isNull(), 0).otherwise(1).alias("d"),
    )
    per_t = obs.groupBy("t").agg(
        F.sum("d").alias("d_events"), F.sum(1 - F.col("d")).alias("c_censored")
    )
    w_all = Window.partitionBy()
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = per_t.select(
        "t",
        "d_events",
        (
            F.sum(F.col("d_events") + F.col("c_censored")).over(w_all)
            - F.coalesce(
                F.sum(F.col("d_events") + F.col("c_censored")).over(w_prev),
                F.lit(0),
            )
        ).alias("at_risk"),
    )
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    km = risk.filter(
        (F.col("d_events") > 0) & (F.col("at_risk") > F.col("d_events"))
    ).select(
        "t",
        "d_events",
        "at_risk",
        F.sum(
            F.round(
                F.log(1.0 - F.col("d_events").cast("double") / F.col("at_risk")), 9
            ).cast("decimal(38, 9)")
        )
        .over(w_cum)
        .alias("log_s"),
    )
    return km.filter(F.col("t") <= _KM_MAX_T).select(
        F.col("t").cast("long").alias("t_days"),
        F.col("d_events").cast("long").alias("d_events"),
        F.col("at_risk").cast("long").alias("at_risk"),
        F.round(F.exp(F.col("log_s").cast("string").cast("double")), 6).alias(
            "survival"
        ),
    )


# ---------------------------------------------------------------------------
# Revenue mix decomposition (price/volume/cross) between two periods —
# the FP&A bridge: ΔRev per segment = Δn·p̄_A + n_A·Δp̄ + Δn·Δp̄.
# ---------------------------------------------------------------------------

_MIX_CUT = "1997-01-01"


def _mix_sql() -> str:
    dec = "DECIMAL(30, 6)"
    to_d = lambda e: f"CAST(CAST({e} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    return f"""
WITH per AS (
  SELECT o_orderpriority AS segment,
         CASE WHEN CAST(o_orderdate AS DATE) < DATE '{_MIX_CUT}'
              THEN 'A' ELSE 'B' END AS period,
         COUNT(*) AS n,
         SUM(CAST(o_totalprice AS {dec})) AS rev_dec
  FROM orders GROUP BY 1, 2
),
wide AS (
  SELECT segment,
         SUM(CASE WHEN period = 'A' THEN n ELSE 0 END) AS n_a,
         SUM(CASE WHEN period = 'B' THEN n ELSE 0 END) AS n_b,
         {to_d("SUM(CASE WHEN period = 'A' THEN rev_dec END)")} AS rev_a,
         {to_d("SUM(CASE WHEN period = 'B' THEN rev_dec END)")} AS rev_b
  FROM per GROUP BY segment
)
SELECT segment,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(rev_a, 6) AS rev_a, round(rev_b, 6) AS rev_b,
       round((n_b - n_a) * (rev_a / n_a), 6) AS volume_effect,
       round(n_a * (rev_b / n_b - rev_a / n_a), 6) AS price_effect,
       round((n_b - n_a) * (rev_b / n_b - rev_a / n_a), 6) AS cross_effect
FROM wide WHERE n_a > 0 AND n_b > 0
"""


@register("revenue_mix_decomposition", _mix_sql())
def q_revenue_mix_decomposition(spark, sf_dir):
    """Two-period revenue bridge per order-priority segment: the
    volume/price/cross decomposition whose three effects sum exactly to
    ΔRev (pinned by tests).  Revenue sums are exact DECIMAL; the
    average prices divide once each and every downstream product uses
    those identical doubles.

    Scale plan: one scan → (segment, period) aggregate (map-side
    combined, 2·|segments| cells); the pivot-to-wide and the bridge
    arithmetic are dim-sized."""
    o = load_table(spark, sf_dir, "orders")
    dec = "decimal(30, 6)"
    per = o.groupBy(
        F.col("o_orderpriority").alias("segment"),
        F.when(
            F.col("o_orderdate").cast("date") < F.lit(_MIX_CUT).cast("date"), "A"
        )
        .otherwise("B")
        .alias("period"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast(dec)).alias("rev_dec"),
    )
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    wide = per.groupBy("segment").agg(
        F.sum(F.when(F.col("period") == "A", F.col("n")).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("period") == "B", F.col("n")).otherwise(0)).alias("n_b"),
        to_d(F.sum(F.when(F.col("period") == "A", F.col("rev_dec")))).alias("rev_a"),
        to_d(F.sum(F.when(F.col("period") == "B", F.col("rev_dec")))).alias("rev_b"),
    )
    pa = F.col("rev_a") / F.col("n_a")
    pb = F.col("rev_b") / F.col("n_b")
    return wide.filter((F.col("n_a") > 0) & (F.col("n_b") > 0)).select(
        "segment",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round("rev_a", 6).alias("rev_a"),
        F.round("rev_b", 6).alias("rev_b"),
        F.round((F.col("n_b") - F.col("n_a")) * pa, 6).alias("volume_effect"),
        F.round(F.col("n_a") * (pb - pa), 6).alias("price_effect"),
        F.round((F.col("n_b") - F.col("n_a")) * (pb - pa), 6).alias("cross_effect"),
    )


# ---------------------------------------------------------------------------
# Exact trimmed mean: per event type, the mean of values with the top
# and bottom 5% of ROWS removed (rank-exact trimming, the robust
# estimator between plain mean and median).
# ---------------------------------------------------------------------------

_TRIM_PCT = 5  # percent trimmed from EACH tail


def _trim_sql() -> str:
    dec = "DECIMAL(30, 6)"
    return f"""
WITH r AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
kept AS (
  SELECT event_type, value, n FROM r
  WHERE rk > (n * {_TRIM_PCT}) // 100
    AND rk <= n - (n * {_TRIM_PCT}) // 100
)
SELECT event_type,
       CAST(ANY_VALUE(n) AS BIGINT) AS n_total,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(CAST(SUM(CAST(value AS {dec})) AS VARCHAR) AS DOUBLE) / COUNT(*)
         AS trimmed_mean
FROM kept GROUP BY event_type
"""


@register("trimmed_mean_value", _trim_sql())
def q_trimmed_mean_value(spark, sf_dir):
    """{_TRIM_PCT}%-per-tail trimmed mean of event values per type:
    trimming is RANK-exact (row_number with event_id tiebreak, integer
    floor-div cutoffs — both engines drop the identical row set), and
    the surviving mean is an exact DECIMAL sum with one division.
    Joins the robust family beside the MAD and 3σ outlier gates.

    Scale plan: one per-type sort window (partition-parallel across
    types) then a type-keyed aggregate; at unbounded group sizes the
    KLL-sketch quantile cut replaces the exact ranks, same pairing as
    everywhere."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    w_n = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    cut = F.expr(f"(n * {_TRIM_PCT}) div 100")
    kept = r.filter((F.col("rk") > cut) & (F.col("rk") <= F.col("n") - cut))
    return kept.groupBy("event_type").agg(
        F.first("n").cast("long").alias("n_total"),
        F.count(F.lit(1)).alias("n_kept"),
        (
            F.sum(F.col("value").cast("decimal(30, 6)"))
            .cast("string")
            .cast("double")
            / F.count(F.lit(1))
        ).alias("trimmed_mean"),
    )


# ---------------------------------------------------------------------------
# Rolling correlation: 7-day windowed Pearson r between click and
# purchase daily volumes — integer moment sums inside the frame, one
# closed-form evaluation per row.
# ---------------------------------------------------------------------------

_ROLL_W = 7

_ROLLCORR_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY 1
),
w AS (
  SELECT d, COUNT(*) OVER win AS n,
         SUM(x) OVER win AS sx, SUM(y) OVER win AS sy,
         SUM(x * x) OVER win AS sxx, SUM(y * y) OVER win AS syy,
         SUM(x * y) OVER win AS sxy
  FROM daily
  WINDOW win AS (ORDER BY d ROWS BETWEEN {_ROLL_W - 1} PRECEDING AND CURRENT ROW)
)
SELECT CAST(d AS TIMESTAMP) AS day, CAST(n AS BIGINT) AS n_days,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
         AS corr{_ROLL_W}d
FROM w WHERE n = {_ROLL_W}
"""


@register("rolling_correlation_counts", _ROLLCORR_SQL)
def q_rolling_correlation_counts(spark, sf_dir):
    """{_ROLL_W}-day rolling Pearson correlation between click and
    purchase daily volumes — the co-movement monitor.  All five moment
    sums are integer (counts), computed inside the frame; the closed
    form evaluates identically on both engines and rounds at 1e-6.

    Scale plan: the event log collapses to one row per day first; the
    rolling frame runs over the calendar relation."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("y"),
    )
    win = Window.orderBy("d").rowsBetween(-(_ROLL_W - 1), 0)
    w = daily.select(
        "d",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("x").over(win).alias("sx"),
        F.sum("y").over(win).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(win).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(win).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(win).alias("sxy"),
    ).filter(F.col("n") == _ROLL_W)
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return w.select(
        F.col("d").cast("timestamp").alias("day"),
        F.col("n").cast("long").alias("n_days"),
        F.round(corr, 6).alias(f"corr{_ROLL_W}d"),
    )


# ---------------------------------------------------------------------------
# Lagged cross-correlation: does click volume LEAD purchase volume?
# Pearson r of x(t) vs y(t+lag) for lags 0..5 — the lead-lag scan
# behind "which metric moves first".
# ---------------------------------------------------------------------------

_XCORR_MAX_LAG = 5

_XCORR_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY 1
),
lags AS (SELECT unnest(range(0, {_XCORR_MAX_LAG + 1})) AS lag),
j AS (
  SELECT l.lag, a.x, b.y
  FROM lags l
  JOIN daily a ON true
  JOIN daily b ON b.d = a.d + CAST(l.lag AS INTEGER)
)
SELECT CAST(lag AS BIGINT) AS lag, CAST(COUNT(*) AS BIGINT) AS n_days,
       round((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
             / (sqrt(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))
                * sqrt(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y))), 6) AS r
FROM j GROUP BY lag
"""


@register("lagged_cross_correlation", _XCORR_SQL)
def q_lagged_cross_correlation(spark, sf_dir):
    """Cross-correlation of click(t) against purchase(t+lag) for lags
    0..{_XCORR_MAX_LAG}: integer moments per lag, closed-form r,
    deterministic rounding.  (On the fixture's independent generators
    the profile is flat noise — the oracle certifies the machinery, a
    real deployment reads the argmax lag.)

    Scale plan: both series live on the per-day relation; the lag
    alignment is an equi-join on shifted days ({_XCORR_MAX_LAG + 1}×
    calendar rows), then one grouped aggregate."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("y"),
    )
    daily = daily.localCheckpoint(eager=True)  # both join sides + lag fan-out
    a = daily.select("d", "x").crossJoin(
        F.broadcast(
            daily.sparkSession.range(_XCORR_MAX_LAG + 1).select(
                F.col("id").cast("int").alias("lag")
            )
        )
    )
    b = daily.select(F.col("d").alias("d_b"), "y")
    j = a.join(b, F.date_add(a["d"], F.col("lag")) == b["d_b"]).select(
        "lag", "x", "y"
    )
    n = F.count(F.lit(1))
    corr = (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y")) / (
        F.sqrt(n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x"))
        * F.sqrt(n * F.sum(F.col("y") * F.col("y")) - F.sum("y") * F.sum("y"))
    )
    return j.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_days"), F.round(corr, 6).alias("r")
    ).select(F.col("lag").cast("long").alias("lag"), "n_days", "r")


# ---------------------------------------------------------------------------
# Higher-moment profile: skewness and excess kurtosis per event type
# from exact DECIMAL raw-moment sums (the central-moment algebra runs
# on identical doubles afterward).
# ---------------------------------------------------------------------------


def _moments_sql() -> str:
    dec = "DECIMAL(38, 6)"
    to_d = lambda e: f"CAST(CAST({e} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    return f"""
WITH m AS (
  SELECT event_type, COUNT(*) AS n,
         {to_d(f'SUM(CAST(value AS {dec}))')} AS s1,
         {to_d(f'SUM(CAST(value AS {dec}) * CAST(value AS {dec}))')} AS s2,
         {to_d(f'SUM(CAST(value AS {dec}) * CAST(value AS {dec}) * CAST(value AS {dec}))')} AS s3,
         {to_d(f'SUM(CAST(value AS {dec}) * CAST(value AS {dec}) * CAST(value AS {dec}) * CAST(value AS {dec}))')} AS s4
  FROM events GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       round(s1 / n, 6) AS mean,
       round((s2 - s1 * s1 / n) / n, 6) AS var_pop,
       round(((s3 - 3 * (s1 / n) * s2 + 2 * n * (s1 / n) * (s1 / n) * (s1 / n)) / n)
             / pow((s2 - s1 * s1 / n) / n, 1.5), 6) AS skewness,
       round(((s4 - 4 * (s1 / n) * s3 + 6 * (s1 / n) * (s1 / n) * s2
               - 3 * n * pow(s1 / n, 4)) / n)
             / pow((s2 - s1 * s1 / n) / n, 2) - 3, 6) AS excess_kurtosis
FROM m
"""


@register("higher_moments_profile", _moments_sql())
def q_higher_moments_profile(spark, sf_dir):
    """Population mean/variance/skewness/excess-kurtosis per event
    type.  The four raw power sums accumulate in exact DECIMAL (order-
    independent, unlike streaming central-moment updates); the central-
    moment algebra then runs the identical double sequence on both
    engines, rounded at 1e-6.  Extends the profiling family
    (profile_max/min, value_stats_by_type) to shape statistics —
    heavy-tail and asymmetry screens.

    Scale plan: one scan, one |types|-key map-side-combined aggregate;
    ≤6-decimal values keep s4 below DECIMAL(38,6) range for ~10¹² rows
    per group at |value|≤10³ — past that, widen the scale, same plan."""
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(38, 6)"
    v = F.col("value").cast(dec)
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        to_d(F.sum(v)).alias("s1"),
        to_d(F.sum(v * v)).alias("s2"),
        to_d(F.sum(v * v * v)).alias("s3"),
        to_d(F.sum(v * v * v * v)).alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1") / n
    var = (F.col("s2") - F.col("s1") * F.col("s1") / n) / n
    m3 = (
        F.col("s3") - 3 * mu * F.col("s2") + 2 * n * mu * mu * mu
    ) / n
    m4 = (
        F.col("s4")
        - 4 * mu * F.col("s3")
        + 6 * mu * mu * F.col("s2")
        - 3 * n * F.pow(mu, 4)
    ) / n
    return m.select(
        "event_type",
        n.cast("long").alias("n"),
        F.round(mu, 6).alias("mean"),
        F.round(var, 6).alias("var_pop"),
        F.round(m3 / F.pow(var, 1.5), 6).alias("skewness"),
        F.round(m4 / F.pow(var, 2) - 3, 6).alias("excess_kurtosis"),
    )


# ---------------------------------------------------------------------------
# Two-proportion z-test on conversion rates between the two halves of
# the event timeline, z² cleared to exact integers (the same algebraic
# discipline as event_rate_anomaly's z-test).
# ---------------------------------------------------------------------------

_PZ_Z2_NUM, _PZ_Z2_DEN = 384, 100  # z² = 3.84 ⇔ z = 1.96 (α = 0.05)

_PROPZ_SQL = f"""
WITH b AS (SELECT CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP)
             + INTERVAL 15 DAY AS cut FROM events),
s AS (
  SELECT CASE WHEN ts < cut THEN 'A' ELSE 'B' END AS per,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
  FROM events CROSS JOIN b
  WHERE event_type IN ('click', 'purchase')
),
agg AS (
  SELECT SUM(CASE WHEN per = 'A' THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN per = 'A' THEN conv ELSE 0 END) AS x_a,
         SUM(CASE WHEN per = 'B' THEN 1 ELSE 0 END) AS n_b,
         SUM(CASE WHEN per = 'B' THEN conv ELSE 0 END) AS x_b
  FROM s
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(x_a AS BIGINT) AS x_a,
       CAST(n_b AS BIGINT) AS n_b, CAST(x_b AS BIGINT) AS x_b,
       round(CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b, 6)
         AS rate_diff,
       -- z² > 3.84 cleared of all divisions/sqrts:
       -- (x_a·n_b − x_b·n_a)² · (n_a+n_b) · {_PZ_Z2_DEN}
       --   > {_PZ_Z2_NUM} · n_a·n_b · x·(n_a+n_b−x)   where x = x_a+x_b
       -- in DECIMAL(38,0): d² alone passes 2^63 once n ~ 4·10⁴
       (CAST(x_a * n_b - x_b * n_a AS DECIMAL(38, 0))
          * CAST(x_a * n_b - x_b * n_a AS DECIMAL(38, 0))
          * (n_a + n_b) * {_PZ_Z2_DEN}
        > CAST({_PZ_Z2_NUM} AS DECIMAL(38, 0)) * n_a * n_b * (x_a + x_b)
          * (n_a + n_b - x_a - x_b)) AS significant_95
FROM agg
"""


@register("conversion_rate_ab_ztest", _PROPZ_SQL)
def q_conversion_rate_ab_ztest(spark, sf_dir):
    """Pooled two-proportion z-test: did the purchase share of
    click+purchase traffic shift between the first and second half of
    the month?  The significance boolean is the z² inequality cleared
    of every division and square root — exact int64 (magnitudes ~10¹⁵
    at sf0.1; the DECIMAL widening path is noted for beyond) — so the
    verdict is bit-identical on any engine, the same discipline as
    `event_rate_anomaly`.

    Scale plan: one scan → 4 integers.  Inference at 100 TB is the
    cheap part; the discipline is keeping it exact."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        (F.date_trunc("day", F.min("ts")) + F.expr("INTERVAL 15 DAY")).alias("cut")
    )
    s = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .crossJoin(F.broadcast(b))
        .select(
            F.when(F.col("ts") < F.col("cut"), "A").otherwise("B").alias("per"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
        )
    )
    agg = s.agg(
        F.sum(F.when(F.col("per") == "A", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("per") == "A", F.col("conv")).otherwise(0)).alias("x_a"),
        F.sum(F.when(F.col("per") == "B", 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("per") == "B", F.col("conv")).otherwise(0)).alias("x_b"),
    )
    # DECIMAL(38,0) arithmetic: d² alone overflows int64 past n ~ 4e4
    dec0 = "decimal(38, 0)"
    d = (F.col("x_a") * F.col("n_b") - F.col("x_b") * F.col("n_a")).cast(dec0)
    x = F.col("x_a") + F.col("x_b")
    n = F.col("n_a") + F.col("n_b")
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("x_a").cast("long").alias("x_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("x_b").cast("long").alias("x_b"),
        F.round(
            F.col("x_a").cast("double") / F.col("n_a")
            - F.col("x_b").cast("double") / F.col("n_b"),
            6,
        ).alias("rate_diff"),
        (
            d * d * n * _PZ_Z2_DEN
            > F.lit(_PZ_Z2_NUM).cast(dec0)
            * F.col("n_a")
            * F.col("n_b")
            * x
            * (n - x)
        ).alias("significant_95"),
    )


# ---------------------------------------------------------------------------
# Quantile treatment effects: per-decile distributional difference
# between the hash-assigned A/B arms — what a mean-only readout
# (ab_cuped_readout) can't see.
# ---------------------------------------------------------------------------

_QTE_PS = (0.1, 0.25, 0.5, 0.75, 0.9)


def _qte_sql() -> str:
    from ..functions.hashing import portable_hash64_sql

    h = portable_hash64_sql("CAST(user_id AS VARCHAR)", seed="ab:")
    rows = " UNION ALL ".join(
        f"""SELECT {p} AS p,
           round(quantile_cont(CASE WHEN grp = 0 THEN value END, {p}), 6) AS q_a,
           round(quantile_cont(CASE WHEN grp = 1 THEN value END, {p}), 6) AS q_b,
           round(round(quantile_cont(CASE WHEN grp = 1 THEN value END, {p}), 6)
                 - round(quantile_cont(CASE WHEN grp = 0 THEN value END, {p}), 6), 6)
             AS qte
    FROM assigned"""
        for p in _QTE_PS
    )
    return f"""
WITH assigned AS (
  SELECT value, {h} % 2 AS grp FROM events
)
{rows}
"""


@register("ab_quantile_treatment_effects", _qte_sql())
def q_ab_quantile_treatment_effects(spark, sf_dir):
    """Quantile treatment effects at p10/p25/p50/p75/p90 between the
    same deterministic arms as `ab_cuped_readout` — the distributional
    readout (a treatment can move the tails and leave the mean flat).
    Interpolated exact quantiles (Spark percentile ≡ DuckDB
    quantile_cont); the effect is differenced AFTER each side's 1e-6
    rounding so both engines subtract identical doubles.

    Scale plan: one scan; each quantile is the exact per-arm sort path
    at certification scale with the KLL sketch as the declared
    unbounded-scale stand-in."""
    from ..functions.hashing import portable_hash64

    ev = load_table(spark, sf_dir, "events")
    assigned = ev.select(
        "value", (portable_hash64("user_id", seed="ab:") % 2).alias("grp")
    )
    out = None
    for p in _QTE_PS:
        q_a = F.round(
            F.expr(f"percentile(CASE WHEN grp = 0 THEN value END, {p})"), 6
        )
        q_b = F.round(
            F.expr(f"percentile(CASE WHEN grp = 1 THEN value END, {p})"), 6
        )
        row = assigned.agg(
            F.lit(p).alias("p"),
            q_a.alias("q_a"),
            q_b.alias("q_b"),
        ).select("p", "q_a", "q_b", F.round(F.col("q_b") - F.col("q_a"), 6).alias("qte"))
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# Neyman allocation: distribute a fixed sampling budget across strata
# ∝ N_h·S_h (stratum size × within-stratum std) — the optimal-variance
# design for stratified estimation, with largest-remainder integer
# quotas that sum EXACTLY to the budget (token_budget_allocation's
# apportionment discipline applied to sampling design).
# ---------------------------------------------------------------------------

_NEY_BUDGET = 1000


def _neyman_sql() -> str:
    dec = "DECIMAL(38, 6)"
    to_d = lambda e: f"CAST(CAST({e} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    return f"""
WITH m AS (
  SELECT event_type, COUNT(*) AS n,
         {to_d(f'SUM(CAST(value AS {dec}))')} AS s1,
         {to_d(f'SUM(CAST(value AS {dec}) * CAST(value AS {dec}))')} AS s2
  FROM events GROUP BY event_type
),
wgt AS (
  SELECT event_type, n,
         CAST(round(n * sqrt((s2 - s1 * s1 / n) / n), 6) AS DECIMAL(38, 6)) AS nh_sh
  FROM m
),
tot AS (
  SELECT event_type, n, nh_sh, SUM(nh_sh) OVER () AS tot_dec FROM wgt
),
quota AS (
  SELECT event_type, n, nh_sh,
         CAST((CAST(nh_sh * {_NEY_BUDGET} AS DECIMAL(38, 6)) * 1000000)
              AS HUGEINT) // CAST(tot_dec * 1000000 AS HUGEINT) AS base_q,
         CAST((CAST(nh_sh * {_NEY_BUDGET} AS DECIMAL(38, 6)) * 1000000)
              AS HUGEINT) % CAST(tot_dec * 1000000 AS HUGEINT) AS rem_key
  FROM tot
),
ranked AS (
  SELECT event_type, n, base_q,
         ROW_NUMBER() OVER (ORDER BY rem_key DESC, event_type) AS rk,
         {_NEY_BUDGET} - SUM(base_q) OVER () AS missing
  FROM quota
)
SELECT event_type, CAST(n AS BIGINT) AS stratum_n,
       CAST(base_q + CASE WHEN rk <= missing THEN 1 ELSE 0 END AS BIGINT)
         AS sample_quota
FROM ranked
"""


@register("neyman_allocation", _neyman_sql())
def q_neyman_allocation(spark, sf_dir):
    """Per-stratum sample quotas for a {_NEY_BUDGET}-row budget by
    Neyman allocation (∝ N_h·S_h, population std from exact DECIMAL
    moments, quantized to 1e-6 before apportionment).  The
    largest-remainder rounding guarantees Σ quotas = budget exactly —
    the property the downstream stratified sampler requires.  All
    division/remainder arithmetic runs on scaled integers, so quotas
    are bit-identical across engines.

    Scale plan: one scan → per-type moments; the apportionment runs on
    the |types|-row relation (windows dim-sized)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(38, 6)"
    v = F.col("value").cast(dec)
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        to_d(F.sum(v)).alias("s1"),
        to_d(F.sum(v * v)).alias("s2"),
    )
    nh_sh = F.round(
        F.col("n")
        * F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / F.col("n")),
        6,
    ).cast("decimal(38, 6)")
    wgt = m.select("event_type", "n", nh_sh.alias("nh_sh"))
    w_all = Window.partitionBy()
    tot = wgt.withColumn("tot_dec", F.sum("nh_sh").over(w_all))
    scaled = tot.select(
        "event_type",
        "n",
        (F.col("nh_sh") * _NEY_BUDGET * 1000000).cast("decimal(38, 0)").alias("num"),
        (F.col("tot_dec") * 1000000).cast("decimal(38, 0)").alias("den"),
    )
    quota = scaled.select(
        "event_type",
        "n",
        F.expr("CAST(num div den AS BIGINT)").alias("base_q"),
        (F.col("num") % F.col("den")).alias("rem_key"),
    )
    w_rk = Window.orderBy(F.desc("rem_key"), F.asc("event_type"))
    ranked = quota.withColumn("rk", F.row_number().over(w_rk)).withColumn(
        "missing", F.lit(_NEY_BUDGET) - F.sum("base_q").over(w_all)
    )
    return ranked.select(
        "event_type",
        F.col("n").cast("long").alias("stratum_n"),
        (
            F.col("base_q") + F.when(F.col("rk") <= F.col("missing"), 1).otherwise(0)
        )
        .cast("long")
        .alias("sample_quota"),
    )


# ---------------------------------------------------------------------------
# Wilson score intervals for daily conversion rates — the CI that stays
# inside [0,1] and behaves at small n, unlike the Wald interval.
# ---------------------------------------------------------------------------

_WILSON_Z = 1.959963984540054  # exact literal, shared by both engines

_WILSON_SQL = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         COUNT(*) AS n,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY 1
)
SELECT day, CAST(n AS BIGINT) AS n, CAST(x AS BIGINT) AS x,
       round(CAST(x AS DOUBLE) / n, 6) AS rate,
       round(((CAST(x AS DOUBLE) / n) + {_WILSON_Z} * {_WILSON_Z} / (2 * n)
              - {_WILSON_Z} * sqrt((CAST(x AS DOUBLE) / n)
                  * (1 - CAST(x AS DOUBLE) / n) / n
                  + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n)))
             / (1 + {_WILSON_Z} * {_WILSON_Z} / n), 6) AS wilson_lo,
       round(((CAST(x AS DOUBLE) / n) + {_WILSON_Z} * {_WILSON_Z} / (2 * n)
              + {_WILSON_Z} * sqrt((CAST(x AS DOUBLE) / n)
                  * (1 - CAST(x AS DOUBLE) / n) / n
                  + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n)))
             / (1 + {_WILSON_Z} * {_WILSON_Z} / n), 6) AS wilson_hi
FROM daily
"""


@register("wilson_conversion_intervals", _WILSON_SQL)
def q_wilson_conversion_intervals(spark, sf_dir):
    """Daily purchase share of click+purchase traffic with 95% Wilson
    score bounds.  Inputs are exact integers per day; the closed form
    is one identical double sequence (z as a shared exact literal),
    rounded at 1e-6 — the per-day uncertainty band the z-test
    (`conversion_rate_ab_ztest`) summarizes across periods.

    Scale plan: one scan → per-day counts (map-side combined); the
    interval math is free."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "x"
            ),
        )
    )
    p = F.col("x").cast("double") / F.col("n")
    z2 = _WILSON_Z * _WILSON_Z
    center = p + z2 / (2 * F.col("n"))
    margin = _WILSON_Z * F.sqrt(
        p * (1 - p) / F.col("n") + z2 / (4.0 * F.col("n") * F.col("n"))
    )
    denom = 1 + z2 / F.col("n")
    return daily.select(
        "day",
        F.col("n").cast("long").alias("n"),
        F.col("x").cast("long").alias("x"),
        F.round(p, 6).alias("rate"),
        F.round((center - margin) / denom, 6).alias("wilson_lo"),
        F.round((center + margin) / denom, 6).alias("wilson_hi"),
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U / AUC effect size between the click and error value
# populations — the nonparametric "how often does a random click value
# exceed a random error value", exact to the half-tie: 2U is a pure
# integer from per-distinct-value cumulative counts.
# ---------------------------------------------------------------------------

_MWU_SQL = """
WITH s AS (
  SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 2 END AS g
  FROM events WHERE event_type IN ('click', 'error')
),
pv AS (
  SELECT value,
         SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS d1,
         SUM(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS d2
  FROM s GROUP BY value
),
c AS (
  SELECT value, d1, d2,
         COALESCE(SUM(d1) OVER (ORDER BY value
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c1_lt,
         SUM(d1) OVER () AS n1, SUM(d2) OVER () AS n2
  FROM pv
)
SELECT CAST(ANY_VALUE(n1) AS BIGINT) AS n1,
       CAST(ANY_VALUE(n2) AS BIGINT) AS n2,
       CAST(SUM(d2 * (2 * c1_lt + d1)) AS BIGINT) AS two_u,
       CAST(SUM(d2 * (2 * c1_lt + d1)) AS DOUBLE)
         / (2.0 * ANY_VALUE(n1) * ANY_VALUE(n2)) AS auc,
       round(CAST(SUM(d2 * (2 * c1_lt + d1)) AS DOUBLE)
             / (ANY_VALUE(n1) * ANY_VALUE(n2)) - 1.0, 6) AS rank_biserial
FROM c
"""


@register("mann_whitney_auc", _MWU_SQL)
def q_mann_whitney_auc(spark, sf_dir):
    """Exact Mann-Whitney statistic as 2U = Σ_v d₂(v)·(2·c₁(<v)+d₁(v))
    over the per-distinct-value counts — "wins" count double, ties
    once, so 2U is pure int64 and AUC = 2U/(2·n₁·n₂) / rank-biserial
    r = 2·AUC−1 each divide once.  The distribution-free companion to
    `ks_two_sample_drift` (KS asks "are they different anywhere", U
    asks "which one is stochastically larger").

    Scale plan: identical skeleton to the KS query — per-value
    aggregate, cumulative window over the VALUE domain, 1-row out."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type").isin("click", "error")).select(
        "value",
        F.when(F.col("event_type") == "click", 1).otherwise(2).alias("g"),
    )
    pv = s.groupBy("value").agg(
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("g") == 2, 1).otherwise(0)).alias("d2"),
    )
    w_lt = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy()
    c = pv.select(
        "d1",
        "d2",
        F.coalesce(F.sum("d1").over(w_lt), F.lit(0)).alias("c1_lt"),
        F.sum("d1").over(w_all).alias("n1"),
        F.sum("d2").over(w_all).alias("n2"),
    )
    two_u = F.sum(F.col("d2") * (2 * F.col("c1_lt") + F.col("d1")))
    return c.agg(
        F.first("n1").cast("long").alias("n1"),
        F.first("n2").cast("long").alias("n2"),
        two_u.cast("long").alias("two_u"),
        (two_u.cast("double") / (2.0 * F.first("n1") * F.first("n2"))).alias("auc"),
        F.round(
            two_u.cast("double") / (F.first("n1") * F.first("n2")) - 1.0, 6
        ).alias("rank_biserial"),
    )


# ---------------------------------------------------------------------------
# Cramér's V for the same categorical pairs as the MI report — the
# chi-square-based association strength on a fixed [0,1] scale.
# ---------------------------------------------------------------------------


def _cramer_pair_sql(pair: str, table: str, x: str, y: str) -> str:
    # per-cell χ² term (o·N − n_x·n_y)² / (N·n_x·n_y), quantized 1e-9,
    # DECIMAL-summed; V = sqrt(χ²/(N·min(r−1, c−1)))
    return f"""
  SELECT '{pair}' AS pair, CAST(nn AS BIGINT) AS n,
         round(chi2, 6) AS chi2,
         round(sqrt(chi2 / (nn * LEAST(rx - 1, cy - 1))), 6) AS cramers_v
  FROM (
    SELECT ANY_VALUE(nn) AS nn,
           COUNT(DISTINCT x) AS rx, COUNT(DISTINCT y) AS cy,
           -- observed-cell terms + the closed-form zero-cell mass:
           -- Σ_zero n_x·n_y/N = (N² − Σ_obs n_x·n_y)/N
           CAST(CAST(SUM(CAST(round(
             CAST((nxy * nn - nx * ny) AS DOUBLE)
               * (nxy * nn - nx * ny) / (CAST(nn AS DOUBLE) * nx * ny), 9)
             AS DECIMAL(38, 9))) AS VARCHAR) AS DOUBLE)
           + round(CAST(ANY_VALUE(nn) AS DOUBLE)
                   - CAST(SUM(CAST(nx AS DECIMAL(38, 0)) * ny) AS DOUBLE)
                     / ANY_VALUE(nn), 9) AS chi2
    FROM (
      SELECT x, y, nxy, nx, ny, nn FROM (
        SELECT x, y, COUNT(*) AS nxy
        FROM (SELECT {x} AS x, {y} AS y FROM {table}) GROUP BY 1, 2
      )
      JOIN (SELECT x, SUM(c) AS nx FROM (SELECT {x} AS x, COUNT(*) AS c FROM {table} GROUP BY 1) GROUP BY 1) USING (x)
      JOIN (SELECT y, SUM(c) AS ny FROM (SELECT {y} AS y, COUNT(*) AS c FROM {table} GROUP BY 1) GROUP BY 1) USING (y)
      CROSS JOIN (SELECT COUNT(*) AS nn FROM {table})
    )
  )
"""


_CRAMER_SQL = " UNION ALL ".join(
    _cramer_pair_sql(p, t, x, y)
    for p, t, x, y in [
        ("events.type_x_hourband", "events", "event_type",
         "CAST(EXTRACT(hour FROM ts) // 6 AS BIGINT)"),
        ("orders.priority_x_status", "orders", "o_orderpriority", "o_orderstatus"),
    ]
)


@register("cramers_v_report", _CRAMER_SQL)
def q_cramers_v_report(spark, sf_dir):
    """Cramér's V (χ²-based association on a [0,1] scale) for two of
    the MI report's pairs — ZERO cells contribute exactly (observed 0,
    expected >0: the term is e, not skipped), each per-cell term
    quantized at 1e-9 then DECIMAL-summed; one sqrt on identical
    doubles at the end.

    Scale plan: the same contingency-table skeleton as
    `mutual_information_report` — the fact collapses to |X|·|Y| cells
    first."""
    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")

    def branch(pair, df, x_col, y_col):
        j = df.select(x_col.alias("x"), y_col.alias("y"))
        cxy = j.groupBy("x", "y").agg(F.count(F.lit(1)).alias("nxy"))
        cx = j.groupBy("x").agg(F.count(F.lit(1)).alias("nx"))
        cy = j.groupBy("y").agg(F.count(F.lit(1)).alias("ny"))
        nn = j.agg(F.count(F.lit(1)).alias("nn"))
        base = (
            cxy.join(F.broadcast(cx), "x")
            .join(F.broadcast(cy), "y")
            .crossJoin(F.broadcast(nn))
        )
        dev = (F.col("nxy") * F.col("nn") - F.col("nx") * F.col("ny")).cast("double")
        term = F.round(
            dev * dev / (F.col("nn").cast("double") * F.col("nx") * F.col("ny")), 9
        ).cast("decimal(38, 9)")
        # observed-cell terms + closed-form zero-cell mass
        # (N² − Σ_obs n_x·n_y)/N — without it χ² understates whenever a
        # contingency cell is empty
        agg = base.agg(
            F.first("nn").alias("nn"),
            F.countDistinct("x").alias("rx"),
            F.countDistinct("y").alias("cy"),
            (
                F.sum(term).cast("string").cast("double")
                + F.round(
                    F.first("nn").cast("double")
                    - F.sum(
                        F.col("nx").cast("decimal(38, 0)") * F.col("ny")
                    ).cast("double")
                    / F.first("nn"),
                    9,
                )
            ).alias("chi2"),
        )
        return agg.select(
            F.lit(pair).alias("pair"),
            F.col("nn").cast("long").alias("n"),
            F.round("chi2", 6).alias("chi2"),
            F.round(
                F.sqrt(
                    F.col("chi2")
                    / (F.col("nn") * F.least(F.col("rx") - 1, F.col("cy") - 1))
                ),
                6,
            ).alias("cramers_v"),
        )

    out = branch(
        "events.type_x_hourband", ev, F.col("event_type"),
        F.expr("CAST(hour(ts) div 6 AS BIGINT)"),
    )
    return out.unionByName(
        branch(
            "orders.priority_x_status", o, F.col("o_orderpriority"),
            F.col("o_orderstatus"),
        )
    )


# ---------------------------------------------------------------------------
# Decision-stump split scoring: exact information gain of each decile
# threshold on `value` against the event-type label — what MLlib's
# tree trainer computes internally with sketched bins, certified here
# with exact counts and the quantized-log discipline.
# ---------------------------------------------------------------------------

_STUMP_BINS = 10


def _stump_sql() -> str:
    qln = lambda e: f"CAST(round(ln({e}), 9) AS DECIMAL(38, 9))"  # noqa: E731
    to_d = lambda e: f"CAST(CAST({e} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    return f"""
WITH b AS (
  SELECT event_type AS label, value,
         NTILE({_STUMP_BINS}) OVER (ORDER BY value, event_id) AS bucket
  FROM events
),
bl AS (
  SELECT bucket, label, COUNT(*) AS c, MAX(value) AS bmax
  FROM b GROUP BY 1, 2
),
tot AS (
  SELECT label, SUM(c) AS tl FROM bl GROUP BY label
),
-- densify over the bucket x label grid BEFORE cumulating: a label with
-- zero rows in bucket k must still contribute its carried-forward
-- cumulative count to threshold k (sparse cum drops it entirely)
grid AS (
  SELECT t.label, t.tl, k.bucket
  FROM tot t CROSS JOIN (SELECT DISTINCT bucket FROM bl) k
),
cum AS (
  SELECT g.bucket, g.label, g.tl,
         SUM(COALESCE(bl.c, 0)) OVER (PARTITION BY g.label ORDER BY g.bucket
                      ROWS UNBOUNDED PRECEDING) AS cl
  FROM grid g LEFT JOIN bl ON g.bucket = bl.bucket AND g.label = bl.label
),
thrs AS (
  -- thresholds on the BUCKET-grain relation: a running max over the
  -- per-(bucket,label) rows would see different prefixes within a
  -- bucket depending on label order
  SELECT bucket,
         MAX(mb) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS thr
  FROM (SELECT bucket, MAX(bmax) AS mb FROM bl GROUP BY bucket)
),
-- root-entropy numerator from the label-total relation itself, not
-- the bucket-k rows (independent of which labels bucket k contains)
stn AS (
  SELECT {to_d(f"SUM(CAST(tl AS DECIMAL(38, 9)) * {qln('CAST(tl AS DOUBLE)')})")} AS st
  FROM tot
),
per_k AS (
  SELECT cum.bucket AS k, thrs.thr,
         SUM(cum.cl) AS n_left,
         ANY_VALUE(nn.n) AS n,
         ANY_VALUE(stn.st) AS st,
         {to_d(f"SUM(CASE WHEN cum.cl > 0 THEN CAST(cum.cl AS DECIMAL(38, 9)) * {qln('CAST(cum.cl AS DOUBLE)')} ELSE CAST(0 AS DECIMAL(38,9)) END)")} AS sl,
         {to_d(f"SUM(CASE WHEN cum.tl - cum.cl > 0 THEN CAST(cum.tl - cum.cl AS DECIMAL(38, 9)) * {qln('CAST(cum.tl - cum.cl AS DOUBLE)')} ELSE CAST(0 AS DECIMAL(38,9)) END)")} AS sr
  FROM cum
  JOIN thrs ON cum.bucket = thrs.bucket
  CROSS JOIN (SELECT COUNT(*) AS n FROM b) nn
  CROSS JOIN stn
  WHERE cum.bucket < {_STUMP_BINS}
  GROUP BY cum.bucket, thrs.thr
)
SELECT CAST(k AS BIGINT) AS k, thr AS threshold,
       CAST(n_left AS BIGINT) AS n_left,
       round(
         (ln(n) - st / n)
         - (CAST(n_left AS DOUBLE) / n)
             * (CASE WHEN n_left > 0 THEN ln(n_left) ELSE 0 END - sl / GREATEST(n_left, 1))
         - (CAST(n - n_left AS DOUBLE) / n)
             * (CASE WHEN n - n_left > 0 THEN ln(n - n_left) ELSE 0 END
                - sr / GREATEST(n - n_left, 1)), 6) AS info_gain
FROM per_k
"""


@register("stump_split_gains", _stump_sql())
def q_stump_split_gains(spark, sf_dir):
    """Information gain of every decile threshold of `value` against
    the event-type label — the split-scoring inner loop of a decision
    tree, computed from EXACT per-(bucket, label) counts: each entropy
    term n·ln(n) quantizes its log at 1e-9 and sums in DECIMAL, the
    H-combination then runs an identical double sequence.  The
    certified-exact twin of what `ml_train_dt` does internally with
    sketched candidate bins (same pairing as exact vs HLL).

    Scale plan: one global NTILE assignment (the deliberately exact
    form kept as the certification gate); `stump_split_gains_scaled`
    (queries/rangescale.py) computes the identical output with
    rank-selected cutpoints and a map-side bucket CASE — no global
    sort — and shares this oracle."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        F.col("event_type").alias("label"),
        "value",
        F.ntile(_STUMP_BINS).over(Window.orderBy("value", "event_id")).alias("bucket"),
    )
    return stump_gains_from_bucketed(b)


def stump_gains_from_bucketed(b):
    """Shared downstream of both stump twins: exact information gain
    per threshold from a (label, value, bucket) relation — everything
    past bucket assignment runs on the bins×labels grain."""
    bl = b.groupBy("bucket", "label").agg(
        F.count(F.lit(1)).alias("c"), F.max("value").alias("bmax")
    )
    tot = bl.groupBy("label").agg(F.sum("c").alias("tl"))
    # densify over bucket x label BEFORE cumulating: a label absent
    # from bucket k still carries its cumulative count into threshold k
    grid = tot.crossJoin(F.broadcast(bl.select("bucket").distinct()))
    dense = grid.join(
        bl.select("bucket", "label", "c"), ["bucket", "label"], "left"
    )
    w_lbl = Window.partitionBy("label").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = dense.select(
        "bucket",
        "label",
        "tl",
        F.sum(F.coalesce(F.col("c"), F.lit(0))).over(w_lbl).alias("cl"),
    )
    # thresholds on the BUCKET-grain relation (label order inside a
    # bucket must not affect the running max); the prefix max runs as
    # a broadcast triangular self-join over the ≤bins-row relation —
    # no unpartitioned window anywhere in either stump twin
    bm = bl.groupBy("bucket").agg(F.max("bmax").alias("mb"))
    thrs = (
        bm.alias("a")
        .join(F.broadcast(bm.alias("p")), F.col("p.bucket") <= F.col("a.bucket"))
        .groupBy(F.col("a.bucket").alias("bucket"))
        .agg(F.max("p.mb").alias("thr"))
    )
    cum = cum.join(F.broadcast(thrs), "bucket")
    nn = b.agg(F.count(F.lit(1)).alias("n"))
    qln = lambda c: F.round(F.log(c), 9).cast("decimal(38, 9)")  # noqa: E731
    d9 = "decimal(38, 9)"
    zero9 = F.lit(0).cast(d9)
    # root-entropy numerator from the label totals themselves — a 1-row
    # broadcast, independent of which labels any bucket happens to hold
    stn = tot.agg(
        F.sum(F.col("tl").cast(d9) * qln(F.col("tl").cast("double")))
        .cast("string")
        .cast("double")
        .alias("st")
    )
    j = (
        cum.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(stn))
        .filter(F.col("bucket") < _STUMP_BINS)
    )
    cl = F.col("cl")
    cr = F.col("tl") - F.col("cl")
    per_k = j.groupBy("bucket", "thr").agg(
        F.sum("cl").alias("n_left"),
        F.first("n").alias("n"),
        F.first("st").alias("st"),
        F.sum(
            F.when(cl > 0, cl.cast(d9) * qln(cl.cast("double"))).otherwise(zero9)
        )
        .cast("string")
        .cast("double")
        .alias("sl"),
        F.sum(
            F.when(cr > 0, cr.cast(d9) * qln(cr.cast("double"))).otherwise(zero9)
        )
        .cast("string")
        .cast("double")
        .alias("sr"),
    )
    n = F.col("n")
    nl = F.col("n_left")
    nr = n - nl
    h_root = F.log(n.cast("double")) - F.col("st") / n
    h_l = F.when(nl > 0, F.log(nl.cast("double"))).otherwise(F.lit(0.0)) - F.col(
        "sl"
    ) / F.greatest(nl, F.lit(1))
    h_r = F.when(nr > 0, F.log(nr.cast("double"))).otherwise(F.lit(0.0)) - F.col(
        "sr"
    ) / F.greatest(nr, F.lit(1))
    return per_k.select(
        F.col("bucket").cast("long").alias("k"),
        F.col("thr").alias("threshold"),
        nl.cast("long").alias("n_left"),
        F.round(
            h_root - (nl.cast("double") / n) * h_l - (nr.cast("double") / n) * h_r,
            6,
        ).alias("info_gain"),
    )


# ---------------------------------------------------------------------------
# Welch's unequal-variance t-test + one-way ANOVA: the remaining two
# classical mean-comparison tests (the z-test sibling is
# conversion_rate_ab_ztest).  Moments accumulate in DECIMAL and every
# double op runs in the same order on both engines, so the statistics
# are bit-stable before the final 1e-6 rounding.
# ---------------------------------------------------------------------------

_WELCH_SQL = """
WITH g AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent' ELSE 'other' END AS grp,
         COUNT(*) AS n,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30, 6))) AS VARCHAR) AS DOUBLE) AS s,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30, 6)) * CAST(o_totalprice AS DECIMAL(30, 6))) AS VARCHAR) AS DOUBLE) AS ss
  FROM orders GROUP BY 1
),
m AS (
  SELECT grp, n, s / n AS mean, (ss - n * (s / n) * (s / n)) / (n - 1) AS var FROM g
),
w AS (
  SELECT u.n AS n1, u.mean AS m1, u.var AS v1,
         o.n AS n2, o.mean AS m2, o.var AS v2,
         u.var / u.n + o.var / o.n AS se2
  FROM (SELECT * FROM m WHERE grp = 'urgent') u
  CROSS JOIN (SELECT * FROM m WHERE grp = 'other') o
)
SELECT CAST(n1 AS BIGINT) AS n_urgent, CAST(n2 AS BIGINT) AS n_other,
       round(m1 - m2, 6) AS mean_diff,
       round((m1 - m2) / sqrt(se2), 6) AS t_stat,
       round(se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                          + (v2 / n2) * (v2 / n2) / (n2 - 1)), 6) AS df_welch
FROM w
"""


@register("welch_ttest_urgent_orders", _WELCH_SQL)
def q_welch_ttest_urgent_orders(spark, sf_dir):
    """Welch's unequal-variance t-test: do URGENT orders have a
    different mean total price than the rest?  Group moments (n, Σx,
    Σx²) come from ONE scan with decimal accumulation; means/variances
    and the Welch-Satterthwaite df are closed-form doubles evaluated
    in identical op order on both engines.

    Scale plan: a 2-row conditional aggregate (map-side combined) and
    scalar arithmetic — the entire test is one reduction regardless of
    table size, the cheapest possible inference query."""
    o = load_table(spark, sf_dir, "orders")
    dec = "decimal(30, 6)"
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    x = F.col("o_totalprice").cast(dec)
    g = o.groupBy(
        F.when(F.col("o_orderpriority") == "1-URGENT", "urgent")
        .otherwise("other")
        .alias("grp")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        to_d(F.sum(x)).alias("s"),
        to_d(F.sum(x * x)).alias("ss"),
    )
    mean = F.col("s") / F.col("n")
    m = g.select(
        "grp",
        "n",
        mean.alias("mean"),
        ((F.col("ss") - F.col("n") * mean * mean) / (F.col("n") - 1)).alias("var"),
    )
    u = m.filter(F.col("grp") == "urgent").select(
        F.col("n").alias("n1"), F.col("mean").alias("m1"), F.col("var").alias("v1")
    )
    ot = m.filter(F.col("grp") == "other").select(
        F.col("n").alias("n2"), F.col("mean").alias("m2"), F.col("var").alias("v2")
    )
    w = u.crossJoin(F.broadcast(ot)).withColumn(
        "se2", F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    )
    return w.select(
        F.col("n1").cast("long").alias("n_urgent"),
        F.col("n2").cast("long").alias("n_other"),
        F.round(F.col("m1") - F.col("m2"), 6).alias("mean_diff"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt("se2"), 6).alias("t_stat"),
        F.round(
            F.col("se2")
            * F.col("se2")
            / (
                (F.col("v1") / F.col("n1"))
                * (F.col("v1") / F.col("n1"))
                / (F.col("n1") - 1)
                + (F.col("v2") / F.col("n2"))
                * (F.col("v2") / F.col("n2"))
                / (F.col("n2") - 1)
            ),
            6,
        ).alias("df_welch"),
    )


_ANOVA_SQL = """
WITH g AS (
  SELECT o_orderpriority AS grp, COUNT(*) AS n,
         SUM(CAST(o_totalprice AS DECIMAL(30, 6))) AS s_dec,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30, 6))) AS VARCHAR) AS DOUBLE) AS s,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30, 6)) * CAST(o_totalprice AS DECIMAL(30, 6))) AS VARCHAR) AS DOUBLE) AS ss
  FROM orders GROUP BY 1
),
tot AS (
  -- grand total stays DECIMAL across the k-row sum (a double sum here
  -- would be group-order-dependent and cascade into every SSB term)
  SELECT SUM(n) AS nn, COUNT(*) AS k,
         CAST(CAST(SUM(s_dec) AS VARCHAR) AS DOUBLE) AS st
  FROM g
),
parts AS (
  SELECT ANY_VALUE(t.nn) AS nn, ANY_VALUE(t.k) AS k,
         CAST(CAST(SUM(CAST(round(g.n * (g.s / g.n - t.st / t.nn) * (g.s / g.n - t.st / t.nn), 6) AS DECIMAL(38, 6))) AS VARCHAR) AS DOUBLE) AS ssb,
         CAST(CAST(SUM(CAST(round(g.ss - g.n * (g.s / g.n) * (g.s / g.n), 6) AS DECIMAL(38, 6))) AS VARCHAR) AS DOUBLE) AS ssw
  FROM g CROSS JOIN tot t
)
SELECT CAST(nn AS BIGINT) AS n, CAST(k AS BIGINT) AS n_groups,
       round((ssb / (k - 1)) / (ssw / (nn - k)), 6) AS f_stat,
       round(ssb / (ssb + ssw), 6) AS eta_squared
FROM parts
"""


@register("anova_oneway_priority", _ANOVA_SQL)
def q_anova_oneway_priority(spark, sf_dir):
    """One-way ANOVA of order total price across the five order
    priorities: F = (SSB/(k−1)) / (SSW/(N−k)) with η² as the effect
    size.  Same single-scan decimal-moment skeleton as the Welch test
    generalized to k groups; the group relation is 5 rows, so the
    between/within decomposition is dim-sized arithmetic.

    Float-order discipline: each group's SSB/SSW term is computed in
    identical double op order (so the per-group values match
    bit-exactly), then quantized at 1e-6 and summed in DECIMAL — the
    5-row sum is therefore independent of which order the engines
    visit the groups.  Only the SCALE-INVARIANT statistics (F, η²) are
    emitted: the raw sums of squares grow with N until the 1e-6
    rounding grid falls below one double ulp, where round() itself
    stops being cross-engine-stable — the ratios stay O(1) at any
    scale factor."""
    o = load_table(spark, sf_dir, "orders")
    dec = "decimal(30, 6)"
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    x = F.col("o_totalprice").cast(dec)
    g = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s_dec"),
        to_d(F.sum(x)).alias("s"),
        to_d(F.sum(x * x)).alias("ss"),
    )
    # grand total stays DECIMAL across the k-row sum (see oracle note)
    tot = g.agg(
        F.sum("n").alias("nn"),
        F.count(F.lit(1)).alias("k"),
        to_d(F.sum("s_dec")).alias("st"),
    )
    j = g.crossJoin(F.broadcast(tot))
    gm = F.col("s") / F.col("n")
    ov = F.col("st") / F.col("nn")
    parts = j.agg(
        F.first("nn").alias("nn"),
        F.first("k").alias("k"),
        to_d(
            F.sum(
                F.round(F.col("n") * (gm - ov) * (gm - ov), 6).cast(
                    "decimal(38, 6)"
                )
            )
        ).alias("ssb"),
        to_d(
            F.sum(
                F.round(F.col("ss") - F.col("n") * gm * gm, 6).cast(
                    "decimal(38, 6)"
                )
            )
        ).alias("ssw"),
    )
    return parts.select(
        F.col("nn").cast("long").alias("n"),
        F.col("k").cast("long").alias("n_groups"),
        F.round(
            (F.col("ssb") / (F.col("k") - 1)) / (F.col("ssw") / (F.col("nn") - F.col("k"))),
            6,
        ).alias("f_stat"),
        F.round(F.col("ssb") / (F.col("ssb") + F.col("ssw")), 6).alias("eta_squared"),
    )


# ---------------------------------------------------------------------------
# Autocorrelation function of the daily event count at lags 1..7 —
# the seasonality detector that motivates seasonal_naive_wape's weekly
# lag.  Terms are quantized then summed in DECIMAL, so the day-order
# of the aggregation never matters.
# ---------------------------------------------------------------------------

_ACF_MAXLAG = 7

_ACF_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS c FROM events GROUP BY 1
),
m AS (
  SELECT CAST(CAST(SUM(CAST(c AS DECIMAL(30, 6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS mean,
         COUNT(*) AS n
  FROM daily
),
den AS (
  SELECT CAST(CAST(SUM(CAST(round((c - m.mean) * (c - m.mean), 6) AS DECIMAL(38, 6))) AS VARCHAR) AS DOUBLE) AS den
  FROM daily CROSS JOIN m
),
lags AS (SELECT unnest(range(1, {_ACF_MAXLAG + 1})) AS lag),
num AS (
  SELECT l.lag,
         CAST(CAST(SUM(CAST(round((a.c - m.mean) * (b.c - m.mean), 6) AS DECIMAL(38, 6))) AS VARCHAR) AS DOUBLE) AS num,
         COUNT(*) AS n_pairs
  FROM daily a
  CROSS JOIN lags l
  JOIN daily b ON b.d = a.d + CAST(l.lag AS INTEGER)
  CROSS JOIN m
  GROUP BY l.lag
)
SELECT CAST(lag AS BIGINT) AS lag, CAST(n_pairs AS BIGINT) AS n_pairs,
       round(num / den.den, 6) AS acf
FROM num CROSS JOIN den
"""


@register("acf_daily_counts", _ACF_SQL)
def q_acf_daily_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    dec = "decimal(30, 6)"
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    m = daily.agg(
        (to_d(F.sum(F.col("c").cast(dec))) / F.count(F.lit(1))).alias("mean"),
        F.count(F.lit(1)).alias("n"),
    )
    dm = daily.crossJoin(F.broadcast(m))
    cterm = F.round((F.col("c") - F.col("mean")) * (F.col("c") - F.col("mean")), 6)
    den = dm.agg(
        to_d(F.sum(cterm.cast("decimal(38, 6)"))).alias("den")
    )
    lags = (
        daily.sparkSession.range(1, _ACF_MAXLAG + 1)
        .select(F.col("id").cast("int").alias("lag"))
    )
    a = dm.select("d", "c", "mean")
    b = daily.select(F.col("d").alias("d2"), F.col("c").alias("c2"))
    paired = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("d2") == F.expr("date_add(d, lag)"))
    )
    pterm = F.round(
        (F.col("c") - F.col("mean")) * (F.col("c2") - F.col("mean")), 6
    )
    num = paired.groupBy("lag").agg(
        to_d(F.sum(pterm.cast("decimal(38, 6)"))).alias("num"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            F.col("lag").cast("long").alias("lag"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.round(F.col("num") / F.col("den"), 6).alias("acf"),
        )
    )

q_acf_daily_counts.__doc__ = f"""Sample autocorrelation of the daily event count at lags
    1..{_ACF_MAXLAG}: numerators pair each day with day+lag via an
    equi-join on the date (never a window per lag), denominator is the
    centered sum of squares; each centered product is quantized at
    1e-6 and summed in DECIMAL, so day order can't perturb the sums.
    A weekly cycle shows up as the lag-7 peak (this fixture's
    generator has one) — the justification step before committing to
    `seasonal_naive_wape`'s lag-7 forecaster.

    Scale plan: the fact collapses to one row per day first; the
    lag join and moments all run on the |days| relation (dim-sized).
    """


# ---------------------------------------------------------------------------
# Theil-Sen robust trend of the daily event count: the median of all
# pairwise slopes — 29.3% breakdown point where OLS has 0%.  The
# all-pairs relation is |days|², which is exactly why the slopes are
# computed on the DAY-grain aggregate (dim-sized), never the fact.
# ---------------------------------------------------------------------------

_TS_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS c FROM events GROUP BY 1
),
d0 AS (SELECT MIN(d) AS d0 FROM daily),
idx AS (
  SELECT CAST(d - d0.d0 AS BIGINT) AS x, c FROM daily CROSS JOIN d0
),
slopes AS (
  SELECT CAST(b.c - a.c AS DOUBLE) / (b.x - a.x) AS s
  FROM idx a JOIN idx b ON b.x > a.x
),
med AS (
  SELECT round(quantile_cont(s, 0.5), 6) AS slope,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM slopes
),
resid AS (
  SELECT round(quantile_cont(c - m.slope * x, 0.5), 6) AS intercept,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM idx CROSS JOIN med m
)
SELECT r.n_days, m.n_pairs, m.slope AS slope_per_day, r.intercept
FROM med m CROSS JOIN resid r
"""


@register("theil_sen_daily_trend", _TS_SQL)
def q_theil_sen_daily_trend(spark, sf_dir):
    """Theil-Sen estimator of the daily event-count trend: slope =
    median of all pairwise (c_j−c_i)/(x_j−x_i), intercept = median of
    c − slope·x — the robust regression line a volume monitor fits
    (one rogue day moves OLS arbitrarily; Theil-Sen shrugs off 29% of
    days).  Each slope is ONE double divide of exact integers
    (bit-identical across engines); the medians use the interpolated
    rule shared by Spark `percentile` and DuckDB `quantile_cont`, and
    the slope is quantized at 1e-6 before the residual pass.

    Scale plan: the fact collapses to per-day counts first; the
    all-pairs slope relation is |days|² on the DIM relation (~10⁵ rows
    for a year), so 'quadratic' here is dim-sized arithmetic — the
    pattern that makes exact Theil-Sen feasible at any event volume."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    d0 = daily.agg(F.min("d").alias("d0"))
    idx = daily.crossJoin(F.broadcast(d0)).select(
        F.datediff("d", "d0").cast("long").alias("x"), "c"
    )
    a = idx.select(F.col("x").alias("xa"), F.col("c").alias("ca"))
    b = idx.select(F.col("x").alias("xb"), F.col("c").alias("cb"))
    slopes = a.join(b, F.col("xb") > F.col("xa")).select(
        ((F.col("cb") - F.col("ca")).cast("double") / (F.col("xb") - F.col("xa"))).alias("s")
    )
    med = slopes.agg(
        F.round(F.expr("percentile(s, 0.5)"), 6).alias("slope"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    ).localCheckpoint(eager=True)  # 1 row; feeds residuals AND output
    resid = (
        idx.crossJoin(F.broadcast(med))
        .agg(
            F.round(
                F.expr("percentile(c - slope * x, 0.5)"), 6
            ).alias("intercept"),
            F.count(F.lit(1)).cast("long").alias("n_days"),
        )
    )
    return med.crossJoin(F.broadcast(resid)).select(
        "n_days", "n_pairs", F.col("slope").alias("slope_per_day"), "intercept"
    )


# ---------------------------------------------------------------------------
# OLS regression as pure dataflow, oracle-checked end to end: one scan
# builds the normal-equation moments as EXACT decimals (the features
# are small integers, so every cross-moment is an exact decimal
# product — no quantization anywhere), then the 3x3 system solves in
# closed form with identical double-op order on both engines.  What
# MLlib's LinearRegression does iteratively, certified exactly.
# ---------------------------------------------------------------------------

# shared closed-form solve (adjugate / determinant) over the moment
# names — ONE template generates both engines so the formulas cannot
# drift apart.  Matrix: [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]]; rhs:
# [sy, s1y, s2y].
_OLS_DET = "(n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2))"
_OLS_B0 = f"((sy * (s11 * s22 - s12 * s12) - s1y * (s1 * s22 - s12 * s2) + s2y * (s1 * s12 - s11 * s2)) / {_OLS_DET})"
_OLS_B1 = f"((n * (s1y * s22 - s12 * s2y) - s1 * (sy * s22 - s2y * s2) + s2 * (sy * s12 - s1y * s2)) / {_OLS_DET})"
_OLS_B2 = f"((n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - sy * s12) + s2 * (s1 * s1y - sy * s11)) / {_OLS_DET})"
_OLS_SSE = f"(syy - ({_OLS_B0} * sy + {_OLS_B1} * s1y + {_OLS_B2} * s2y))"
_OLS_SST = "(syy - sy * sy / n)"

_OLS_SQL = f"""
WITH m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(CAST(SUM(x1) AS VARCHAR) AS DOUBLE) AS s1,
         CAST(CAST(SUM(x2) AS VARCHAR) AS DOUBLE) AS s2,
         CAST(CAST(SUM(x1 * x1) AS VARCHAR) AS DOUBLE) AS s11,
         CAST(CAST(SUM(x1 * x2) AS VARCHAR) AS DOUBLE) AS s12,
         CAST(CAST(SUM(x2 * x2) AS VARCHAR) AS DOUBLE) AS s22,
         CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(x1 * y) AS VARCHAR) AS DOUBLE) AS s1y,
         CAST(CAST(SUM(x2 * y) AS VARCHAR) AS DOUBLE) AS s2y,
         CAST(CAST(SUM(y * y) AS VARCHAR) AS DOUBLE) AS syy
  FROM (
    SELECT CAST(EXTRACT(month FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS x1,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS x2,
           CAST(o_totalprice AS DECIMAL(30, 6)) AS y
    FROM orders
  )
)
SELECT CAST(n AS BIGINT) AS n,
       round({_OLS_B0}, 6) AS b_intercept,
       round({_OLS_B1}, 6) AS b_month,
       round({_OLS_B2}, 6) AS b_urgent,
       round(1.0 - {_OLS_SSE} / {_OLS_SST}, 6) AS r_squared
FROM m
"""


@register("ols_regression_exact", _OLS_SQL)
def q_ols_regression_exact(spark, sf_dir):
    """Ordinary least squares, trained in ONE aggregate: y =
    o_totalprice on (order month, urgent flag).  Because both features
    are small integers, every normal-equation moment (Σx, Σx², Σxy,
    Σy²) accumulates as an EXACT decimal — zero quantization, zero
    float-order sensitivity — and the closed-form 3×3 solve
    (adjugate/det) runs the same double expression tree on both
    engines, generated from one template so the formulas cannot drift.
    Outputs: coefficients and R² (all O(1)-magnitude after the final
    divide).

    Scale plan: training IS one map-side-combined aggregate over the
    fact scan — the cheapest possible 'fit' at 100 TB (what MLlib's
    LinearRegression needs iterative passes for, p=2 needs none).  The
    same moment template extends to any p with p²/2 decimal sums."""
    o = load_table(spark, sf_dir, "orders")
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    src = o.select(
        F.month(F.col("o_orderdate").cast("date")).cast("long").alias("x1"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("x2"),
        F.col("o_totalprice").cast("decimal(30, 6)").alias("y"),
    )
    m = src.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        to_d(F.sum("x1")).alias("s1"),
        to_d(F.sum("x2")).alias("s2"),
        to_d(F.sum(F.col("x1") * F.col("x1"))).alias("s11"),
        to_d(F.sum(F.col("x1") * F.col("x2"))).alias("s12"),
        to_d(F.sum(F.col("x2") * F.col("x2"))).alias("s22"),
        to_d(F.sum("y")).alias("sy"),
        to_d(F.sum(F.col("x1") * F.col("y"))).alias("s1y"),
        to_d(F.sum(F.col("x2") * F.col("y"))).alias("s2y"),
        to_d(F.sum(F.col("y") * F.col("y"))).alias("syy"),
    )
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.round(F.expr(_OLS_B0), 6).alias("b_intercept"),
        F.round(F.expr(_OLS_B1), 6).alias("b_month"),
        F.round(F.expr(_OLS_B2), 6).alias("b_urgent"),
        F.round(F.expr(f"1.0 - {_OLS_SSE} / {_OLS_SST}"), 6).alias("r_squared"),
    )


# ---------------------------------------------------------------------------
# Logistic regression by unrolled IRLS (Newton) — oracle-checked GLM
# TRAINING as pure dataflow.  Each iteration: one scan computes the
# weighted normal-equation moments (every per-row term quantized at
# 1e-9 and summed in DECIMAL, so row order never matters), the 3x3
# Newton step solves with the SAME adjugate template as OLS, and the
# sigmoid is quantized to the 1e-9 grid so exp() library differences
# can't leak through.  Three iterations unrolled on both engines.
# ---------------------------------------------------------------------------

_IRLS_T = 3

# sigmoid on the 1e-9 grid, clamped away from {0,1} for the log-loss
_IRLS_P = (
    "least(greatest(round(1.0 / (1.0 + exp(-(b0 + b1 * x1 + b2 * x2))), 9),"
    " 0.000000001), 0.999999999)"
)

_IRLS_SRC = """
  SELECT CAST(EXTRACT(month FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS x1,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS x2,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
"""


def _irls_q9_sum(term: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST(round({term}, 9) AS DECIMAL(38, 9))) AS VARCHAR)"
        " AS DOUBLE)"
    )


def _irls_sql(iters: int = _IRLS_T) -> str:
    parts = [f"s AS ({_IRLS_SRC})", "b0_ AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2)"]
    for i in range(1, iters + 1):
        parts.append(
            f"r{i} AS (SELECT x1, x2, y, {_IRLS_P} AS p, b0, b1, b2 "
            f"FROM s CROSS JOIN b{i-1}_)"
        )
        # moment names chosen to REUSE the OLS adjugate/det template:
        # H -> (n,s1,s2,s11,s12,s22), g -> (sy,s1y,s2y)
        parts.append(
            f"a{i} AS (SELECT ANY_VALUE(b0) AS b0, ANY_VALUE(b1) AS b1, ANY_VALUE(b2) AS b2, "
            f"{_irls_q9_sum('p * (1.0 - p)')} AS n, "
            f"{_irls_q9_sum('p * (1.0 - p) * x1')} AS s1, "
            f"{_irls_q9_sum('p * (1.0 - p) * x2')} AS s2, "
            f"{_irls_q9_sum('p * (1.0 - p) * x1 * x1')} AS s11, "
            f"{_irls_q9_sum('p * (1.0 - p) * x1 * x2')} AS s12, "
            f"{_irls_q9_sum('p * (1.0 - p) * x2 * x2')} AS s22, "
            f"{_irls_q9_sum('(y - p)')} AS sy, "
            f"{_irls_q9_sum('(y - p) * x1')} AS s1y, "
            f"{_irls_q9_sum('(y - p) * x2')} AS s2y "
            f"FROM r{i})"
        )
        parts.append(
            f"b{i}_ AS (SELECT b0 + {_OLS_B0} AS b0, b1 + {_OLS_B1} AS b1, "
            f"b2 + {_OLS_B2} AS b2 FROM a{i})"
        )
    t = iters
    parts.append(
        f"rf AS (SELECT x1, x2, y, {_IRLS_P} AS p FROM s CROSS JOIN b{t}_)"
    )
    parts.append(
        "loss AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        + _irls_q9_sum(
            "y * round(ln(p), 9) + (1 - y) * round(ln(1.0 - p), 9)"
        )
        + " AS ll FROM rf)"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT l.n,
       round(b.b0, 6) AS b_intercept,
       round(b.b1, 6) AS b_month,
       round(b.b2, 6) AS b_urgent,
       round(-l.ll / l.n, 6) AS log_loss
FROM b{t}_ b CROSS JOIN loss l
"""
    )


@register("logreg_irls_exact", _irls_sql())
def q_logreg_irls_exact(spark, sf_dir):
    """Logistic regression (is the order finished?) on (month, urgent)
    trained by three unrolled Newton/IRLS steps — distributed GLM
    training certified through the full oracle gate, which MLlib's
    rows-only LogisticRegression cannot be.  Per iteration: ONE fact
    scan reduces to nine weighted moments (each row term quantized at
    1e-9 → DECIMAL sum → double, so partition order can't move a bit),
    and the Newton step is the same closed-form 3×3 adjugate solve as
    `ols_regression_exact` — one shared template, two consumers.  The
    sigmoid and the final log-loss quantize every transcendental to
    the 1e-9 grid (the engine's standard discipline), with p clamped
    off {0,1}.

    Scale plan: T iterations = T map-side-combined aggregates over the
    scan — no gradient state, no driver-side vectors beyond the 3
    coefficients riding a 1-row broadcast.  Convergence is textbook
    Newton (quadratic near the optimum; the unit test pins the fit
    against scikit-free numpy IRLS run to convergence)."""
    o = load_table(spark, sf_dir, "orders")
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    src = o.select(
        F.month(F.col("o_orderdate").cast("date")).cast("long").alias("x1"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("x2"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )

    def q9_sum(term):
        return to_d(F.sum(F.round(term, 9).cast("decimal(38, 9)")))

    beta = src.sparkSession.range(1).select(
        F.lit(0.0).alias("b0"), F.lit(0.0).alias("b1"), F.lit(0.0).alias("b2")
    )
    p_expr = F.expr(_IRLS_P)
    for _ in range(_IRLS_T):
        r = src.crossJoin(F.broadcast(beta)).withColumn("p", p_expr)
        w = F.col("p") * (1.0 - F.col("p"))
        resid = F.col("y") - F.col("p")
        a = r.agg(
            F.first("b0").alias("b0"),
            F.first("b1").alias("b1"),
            F.first("b2").alias("b2"),
            q9_sum(w).alias("n"),
            q9_sum(w * F.col("x1")).alias("s1"),
            q9_sum(w * F.col("x2")).alias("s2"),
            q9_sum(w * F.col("x1") * F.col("x1")).alias("s11"),
            q9_sum(w * F.col("x1") * F.col("x2")).alias("s12"),
            q9_sum(w * F.col("x2") * F.col("x2")).alias("s22"),
            q9_sum(resid).alias("sy"),
            q9_sum(resid * F.col("x1")).alias("s1y"),
            q9_sum(resid * F.col("x2")).alias("s2y"),
        )
        beta = a.select(
            (F.col("b0") + F.expr(_OLS_B0)).alias("b0"),
            (F.col("b1") + F.expr(_OLS_B1)).alias("b1"),
            (F.col("b2") + F.expr(_OLS_B2)).alias("b2"),
        )
    # the fitted coefficients feed BOTH the output row and the loss
    # pass — materialize once (a 1-row, 3-column frame; the 3-scan
    # training job runs here) so the iteration lineage isn't recomputed
    # per consumer
    beta = beta.localCheckpoint(eager=True)
    rf = src.crossJoin(F.broadcast(beta)).withColumn("p", p_expr)
    ll_term = F.col("y") * F.round(F.log("p"), 9) + (1 - F.col("y")) * F.round(
        F.log(1.0 - F.col("p")), 9
    )
    loss = rf.agg(
        F.count(F.lit(1)).cast("long").alias("n"), q9_sum(ll_term).alias("ll")
    )
    return beta.crossJoin(F.broadcast(loss)).select(
        "n",
        F.round("b0", 6).alias("b_intercept"),
        F.round("b1", 6).alias("b_month"),
        F.round("b2", 6).alias("b_urgent"),
        F.round(-F.col("ll") / F.col("n"), 6).alias("log_loss"),
    )


# ---------------------------------------------------------------------------
# Gaussian Naive Bayes, trained AND applied through the oracle gate —
# the certified twin of the reference's NaiveBayes stage (rows-only
# `ml_train_nb` certifies the MLlib library; this certifies the
# algorithm): per-class decimal moments -> quantized-log likelihoods ->
# argmax classification of a hash-held-out test split -> confusion
# counts.
# ---------------------------------------------------------------------------

_GNB_PI2 = "6.283185307179586"  # 2*pi as an exact literal on both engines


def _gnb_sql() -> str:
    split = hash_bucket_sql("o_orderkey", 10, seed="gnb:")
    q9s = lambda t: (  # noqa: E731
        f"CAST(CAST(SUM(CAST(round({t}, 9) AS DECIMAL(38, 9))) AS VARCHAR) AS DOUBLE)"
    )
    ll = (
        "(prior_ln - 0.5 * (lnv1 + (x1 - m1) * (x1 - m1) / v1)"
        " - 0.5 * (lnv2 + (x2 - m2) * (x2 - m2) / v2))"
    )
    return f"""
WITH src AS (
  SELECT o_orderkey, o_orderstatus AS cls,
         CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS DOUBLE) AS x1,
         o_totalprice / 1000.0 AS x2,
         ({split}) AS bkt
  FROM orders
),
train AS (SELECT * FROM src WHERE bkt < 8),
test AS (SELECT * FROM src WHERE bkt >= 8),
stats AS (
  SELECT cls, COUNT(*) AS n_c,
         {q9s('x1')} / COUNT(*) AS m1,
         {q9s('x1 * x1')} / COUNT(*) AS s11,
         {q9s('x2')} / COUNT(*) AS m2,
         {q9s('x2 * x2')} / COUNT(*) AS s22
  FROM train GROUP BY cls
),
model AS (
  SELECT cls, n_c,
         round(ln(CAST(n_c AS DOUBLE) / (SELECT COUNT(*) FROM train)), 9) AS prior_ln,
         m1, s11 - m1 * m1 AS v1,
         round(ln({_GNB_PI2} * (s11 - m1 * m1)), 9) AS lnv1,
         m2, s22 - m2 * m2 AS v2,
         round(ln({_GNB_PI2} * (s22 - m2 * m2)), 9) AS lnv2
  FROM stats
),
scored AS (
  SELECT t.o_orderkey, t.cls AS actual, m.cls AS predicted,
         ROW_NUMBER() OVER (PARTITION BY t.o_orderkey
           ORDER BY {ll} DESC, m.cls ASC) AS rk
  FROM test t CROSS JOIN model m
)
SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n
FROM scored WHERE rk = 1
GROUP BY actual, predicted
"""


@register("gnb_train_confusion_exact", _gnb_sql())
def q_gnb_train_confusion_exact(spark, sf_dir):
    """Gaussian Naive Bayes end to end: train per-class Gaussians of
    (order year, price/1000) on the hash-80% split, classify the held
    -out 20% by quantized-log-likelihood argmax (class-name tiebreak),
    output the confusion matrix — the certified-exact counterpart of
    the reference's NaiveBayes stage (modelling.py:139-151), whose
    MLlib twin is necessarily rows-only.

    Determinism: moments are 1e-9-quantized DECIMAL sums (row order
    can't move a bit), each ln() is rounded to the same grid before it
    enters the likelihood (libm differences can't leak), and the
    remaining arithmetic is identical-double expressions — so the
    argmax, and therefore every confusion cell, matches the oracle
    exactly.

    Scale plan: training is one grouped aggregate (|classes| rows);
    scoring is a |classes|-row broadcast cross join + per-row argmax —
    both map-side; the confusion rollup is |classes|² cells."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    src = o.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("cls"),
        F.year(F.col("o_orderdate").cast("date")).cast("double").alias("x1"),
        (F.col("o_totalprice") / 1000.0).alias("x2"),
        hash_bucket("o_orderkey", 10, seed="gnb:").alias("bkt"),
    )
    train = src.filter(F.col("bkt") < 8)
    test = src.filter(F.col("bkt") >= 8)

    def q9s(t):
        return to_d(F.sum(F.round(t, 9).cast("decimal(38, 9)")))

    stats = train.groupBy("cls").agg(
        F.count(F.lit(1)).alias("n_c"),
        (q9s(F.col("x1")) / F.count(F.lit(1))).alias("m1"),
        (q9s(F.col("x1") * F.col("x1")) / F.count(F.lit(1))).alias("s11"),
        (q9s(F.col("x2")) / F.count(F.lit(1))).alias("m2"),
        (q9s(F.col("x2") * F.col("x2")) / F.count(F.lit(1))).alias("s22"),
    )
    n_train = train.agg(F.count(F.lit(1)).alias("n_train"))
    pi2 = float(_GNB_PI2)
    model = stats.crossJoin(F.broadcast(n_train)).select(
        "cls",
        F.round(F.log(F.col("n_c").cast("double") / F.col("n_train")), 9).alias(
            "prior_ln"
        ),
        "m1",
        (F.col("s11") - F.col("m1") * F.col("m1")).alias("v1"),
        F.round(F.log(pi2 * (F.col("s11") - F.col("m1") * F.col("m1"))), 9).alias(
            "lnv1"
        ),
        "m2",
        (F.col("s22") - F.col("m2") * F.col("m2")).alias("v2"),
        F.round(F.log(pi2 * (F.col("s22") - F.col("m2") * F.col("m2"))), 9).alias(
            "lnv2"
        ),
    )
    m = model
    paired = test.crossJoin(
        F.broadcast(
            m.select(
                F.col("cls").alias("mcls"),
                "prior_ln",
                "m1",
                "v1",
                "lnv1",
                "m2",
                "v2",
                "lnv2",
            )
        )
    )
    ll = (
        F.col("prior_ln")
        - 0.5
        * (
            F.col("lnv1")
            + (F.col("x1") - F.col("m1")) * (F.col("x1") - F.col("m1")) / F.col("v1")
        )
        - 0.5
        * (
            F.col("lnv2")
            + (F.col("x2") - F.col("m2")) * (F.col("x2") - F.col("m2")) / F.col("v2")
        )
    )
    w = Window.partitionBy("o_orderkey").orderBy(ll.desc(), F.col("mcls").asc())
    scored = paired.select(
        "o_orderkey",
        F.col("cls").alias("actual"),
        F.col("mcls").alias("predicted"),
        F.row_number().over(w).alias("rk"),
    ).filter(F.col("rk") == 1)
    return scored.groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# Per-class precision / recall / F1 from the certified GNB confusion
# matrix — the oracle-checked counterpart of the reference's per-label
# MulticlassClassificationEvaluator sweep (modelling.py:160-176),
# which is rows-only when MLlib computes it.
# ---------------------------------------------------------------------------

_GNB_METRICS_SQL = f"""
WITH conf AS (SELECT * FROM ({_gnb_sql()})),
classes AS (
  SELECT actual AS cls FROM conf UNION SELECT predicted FROM conf
),
per AS (
  SELECT c.cls,
         COALESCE((SELECT SUM(n) FROM conf WHERE actual = c.cls AND predicted = c.cls), 0) AS tp,
         COALESCE((SELECT SUM(n) FROM conf WHERE predicted = c.cls AND actual <> c.cls), 0) AS fp,
         COALESCE((SELECT SUM(n) FROM conf WHERE actual = c.cls AND predicted <> c.cls), 0) AS fn
  FROM classes c
)
SELECT cls, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn,
       round(CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 0.0 END, 6) AS precision,
       round(CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 0.0 END, 6) AS recall,
       round(CASE WHEN 2 * tp + fp + fn > 0
                  THEN 2.0 * tp / (2 * tp + fp + fn) ELSE 0.0 END, 6) AS f1
FROM per
"""


@register("gnb_per_class_metrics", _GNB_METRICS_SQL)
def q_gnb_per_class_metrics(spark, sf_dir):
    """Per-class precision/recall/F1 over the certified GNB confusion
    matrix — the oracle-checked counterpart of the reference's
    per-label evaluator sweep (modelling.py:160-176; the MLlib version
    is rows-only by nature).  F1 uses the 2tp/(2tp+fp+fn) form — one
    division of exact integers, no precision·recall float chaining.

    Scale plan: the confusion relation is |classes|² rows; everything
    here is dim-sized arithmetic on top of the GNB query's plan."""
    conf = q_gnb_train_confusion_exact(spark, sf_dir)
    classes = (
        conf.select(F.col("actual").alias("cls"))
        .unionByName(conf.select(F.col("predicted").alias("cls")))
        .distinct()
    )
    tp = conf.filter(F.col("actual") == F.col("predicted")).select(
        F.col("actual").alias("cls"), F.col("n").alias("tp")
    )
    fp = (
        conf.filter(F.col("actual") != F.col("predicted"))
        .groupBy(F.col("predicted").alias("cls"))
        .agg(F.sum("n").alias("fp"))
    )
    fn = (
        conf.filter(F.col("actual") != F.col("predicted"))
        .groupBy(F.col("actual").alias("cls"))
        .agg(F.sum("n").alias("fn"))
    )
    per = (
        classes.join(F.broadcast(tp), "cls", "left")
        .join(F.broadcast(fp), "cls", "left")
        .join(F.broadcast(fn), "cls", "left")
        .select(
            "cls",
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
            F.coalesce("fp", F.lit(0)).cast("long").alias("fp"),
            F.coalesce("fn", F.lit(0)).cast("long").alias("fn"),
        )
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fp")),
    ).otherwise(0.0)
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fn")),
    ).otherwise(0.0)
    f1 = F.when(
        2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
        2.0 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
    ).otherwise(0.0)
    return per.select(
        "cls",
        "tp",
        "fp",
        "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


# ---------------------------------------------------------------------------
# Reliability diagram for the certified GNB: confidence deciles vs
# empirical accuracy — the calibration audit (a model can be accurate
# and badly calibrated; serving thresholds need THIS table).
# ---------------------------------------------------------------------------


def _gnb_calib_sql() -> str:
    split = hash_bucket_sql("o_orderkey", 10, seed="gnb:")
    ll = (
        "(prior_ln - 0.5 * (lnv1 + (x1 - m1) * (x1 - m1) / v1)"
        " - 0.5 * (lnv2 + (x2 - m2) * (x2 - m2) / v2))"
    )
    q9s = lambda t: (  # noqa: E731
        f"CAST(CAST(SUM(CAST(round({t}, 9) AS DECIMAL(38, 9))) AS VARCHAR) AS DOUBLE)"
    )
    return f"""
WITH src AS (
  SELECT o_orderkey, o_orderstatus AS cls,
         CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS DOUBLE) AS x1,
         o_totalprice / 1000.0 AS x2,
         ({split}) AS bkt
  FROM orders
),
train AS (SELECT * FROM src WHERE bkt < 8),
test AS (SELECT * FROM src WHERE bkt >= 8),
stats AS (
  SELECT cls, COUNT(*) AS n_c,
         {q9s('x1')} / COUNT(*) AS m1,
         {q9s('x1 * x1')} / COUNT(*) AS s11,
         {q9s('x2')} / COUNT(*) AS m2,
         {q9s('x2 * x2')} / COUNT(*) AS s22
  FROM train GROUP BY cls
),
model AS (
  SELECT cls, n_c,
         round(ln(CAST(n_c AS DOUBLE) / (SELECT COUNT(*) FROM train)), 9) AS prior_ln,
         m1, s11 - m1 * m1 AS v1,
         round(ln({_GNB_PI2} * (s11 - m1 * m1)), 9) AS lnv1,
         m2, s22 - m2 * m2 AS v2,
         round(ln({_GNB_PI2} * (s22 - m2 * m2)), 9) AS lnv2
  FROM stats
),
scored AS (
  SELECT t.o_orderkey, t.cls AS actual, m.cls AS predicted,
         round({ll}, 9) AS ll,
         ROW_NUMBER() OVER (PARTITION BY t.o_orderkey
           ORDER BY {ll} DESC, m.cls ASC) AS rk
  FROM test t CROSS JOIN model m
),
-- softmax over the (quantized) log-likelihoods: confidence of the
-- argmax class; log-sum-exp anchored at the max for stability
conf AS (
  SELECT o_orderkey,
         MAX(CASE WHEN rk = 1 THEN actual END) AS actual,
         MAX(CASE WHEN rk = 1 THEN predicted END) AS predicted,
         round(1.0 / (CAST(CAST(SUM(CAST(round(exp(ll - mx), 9) AS DECIMAL(38, 9))) AS VARCHAR) AS DOUBLE)), 9) AS confidence
  FROM (SELECT *, MAX(ll) OVER (PARTITION BY o_orderkey) AS mx FROM scored)
  GROUP BY o_orderkey
)
SELECT LEAST(CAST(floor(confidence * 100) AS BIGINT), 99) AS conf_pctbin,
       CAST(COUNT(*) AS BIGINT) AS n,
       {q9s('confidence')} / COUNT(*) AS avg_confidence,
       round(CAST(SUM(CASE WHEN actual = predicted THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS accuracy
FROM conf GROUP BY 1
"""


@register("gnb_calibration_curve", _gnb_calib_sql())
def q_gnb_calibration_curve(spark, sf_dir):
    """Reliability diagram for the certified GNB: the argmax class's
    softmax confidence (log-sum-exp anchored at the row max, quantized
    at 1e-9), binned into deciles, against the empirical accuracy in
    each bin — where avg_confidence and accuracy diverge is exactly
    the miscalibration a serving threshold must correct for (the
    isotonic/conformal rows-only queries are the corrections; this is
    the certified diagnosis).

    Determinism: log-likelihoods quantized before both the argmax and
    the softmax; the confidence re-quantizes after exp so libm can't
    leak; bin membership is floor arithmetic on the grid value.

    Scale plan: same broadcast scoring join as the confusion query,
    plus one per-row window max over the |classes|-row group and a
    <=100-cell rollup."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    src = o.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("cls"),
        F.year(F.col("o_orderdate").cast("date")).cast("double").alias("x1"),
        (F.col("o_totalprice") / 1000.0).alias("x2"),
        hash_bucket("o_orderkey", 10, seed="gnb:").alias("bkt"),
    )
    train = src.filter(F.col("bkt") < 8)
    test = src.filter(F.col("bkt") >= 8)

    def q9s(t):
        return to_d(F.sum(F.round(t, 9).cast("decimal(38, 9)")))

    stats = train.groupBy("cls").agg(
        F.count(F.lit(1)).alias("n_c"),
        (q9s(F.col("x1")) / F.count(F.lit(1))).alias("m1"),
        (q9s(F.col("x1") * F.col("x1")) / F.count(F.lit(1))).alias("s11"),
        (q9s(F.col("x2")) / F.count(F.lit(1))).alias("m2"),
        (q9s(F.col("x2") * F.col("x2")) / F.count(F.lit(1))).alias("s22"),
    )
    n_train = train.agg(F.count(F.lit(1)).alias("n_train"))
    pi2 = float(_GNB_PI2)
    model = stats.crossJoin(F.broadcast(n_train)).select(
        F.col("cls").alias("mcls"),
        F.round(F.log(F.col("n_c").cast("double") / F.col("n_train")), 9).alias(
            "prior_ln"
        ),
        "m1",
        (F.col("s11") - F.col("m1") * F.col("m1")).alias("v1"),
        F.round(F.log(pi2 * (F.col("s11") - F.col("m1") * F.col("m1"))), 9).alias(
            "lnv1"
        ),
        "m2",
        (F.col("s22") - F.col("m2") * F.col("m2")).alias("v2"),
        F.round(F.log(pi2 * (F.col("s22") - F.col("m2") * F.col("m2"))), 9).alias(
            "lnv2"
        ),
    )
    paired = test.crossJoin(F.broadcast(model))
    ll_raw = (
        F.col("prior_ln")
        - 0.5
        * (
            F.col("lnv1")
            + (F.col("x1") - F.col("m1")) * (F.col("x1") - F.col("m1")) / F.col("v1")
        )
        - 0.5
        * (
            F.col("lnv2")
            + (F.col("x2") - F.col("m2")) * (F.col("x2") - F.col("m2")) / F.col("v2")
        )
    )
    w_rk = Window.partitionBy("o_orderkey").orderBy(ll_raw.desc(), F.col("mcls").asc())
    scored = paired.select(
        "o_orderkey",
        F.col("cls").alias("actual"),
        F.col("mcls").alias("predicted"),
        F.round(ll_raw, 9).alias("ll"),
        F.row_number().over(w_rk).alias("rk"),
    )
    w_mx = Window.partitionBy("o_orderkey")
    conf = (
        scored.withColumn("mx", F.max("ll").over(w_mx))
        .groupBy("o_orderkey")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("actual"))).alias("actual"),
            F.max(F.when(F.col("rk") == 1, F.col("predicted"))).alias("predicted"),
            F.round(
                1.0
                / F.sum(
                    F.round(F.exp(F.col("ll") - F.col("mx")), 9).cast(
                        "decimal(38, 9)"
                    )
                )
                .cast("string")
                .cast("double"),
                9,
            ).alias("confidence"),
        )
    )
    return conf.groupBy(
        F.least(F.floor(F.col("confidence") * 100).cast("long"), F.lit(99)).alias(
            "conf_pctbin"
        )
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (q9s(F.col("confidence")) / F.count(F.lit(1))).alias("avg_confidence"),
        F.round(
            F.sum(F.when(F.col("actual") == F.col("predicted"), 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("accuracy"),
    )


# ---------------------------------------------------------------------------
# Ridge regression: the OLS normal equations with l2 regularization on
# the non-intercept diagonal — same exact-decimal moments, same shared
# adjugate solve, one lambda.
# ---------------------------------------------------------------------------

_RIDGE_LAMBDA = 1000.0

_RIDGE_SQL = f"""
WITH m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(CAST(SUM(x1) AS VARCHAR) AS DOUBLE) AS s1,
         CAST(CAST(SUM(x2) AS VARCHAR) AS DOUBLE) AS s2,
         CAST(CAST(SUM(x1 * x1) AS VARCHAR) AS DOUBLE) + {_RIDGE_LAMBDA} AS s11,
         CAST(CAST(SUM(x1 * x2) AS VARCHAR) AS DOUBLE) AS s12,
         CAST(CAST(SUM(x2 * x2) AS VARCHAR) AS DOUBLE) + {_RIDGE_LAMBDA} AS s22,
         CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(x1 * y) AS VARCHAR) AS DOUBLE) AS s1y,
         CAST(CAST(SUM(x2 * y) AS VARCHAR) AS DOUBLE) AS s2y,
         CAST(CAST(SUM(y * y) AS VARCHAR) AS DOUBLE) AS syy
  FROM (
    SELECT CAST(EXTRACT(month FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS x1,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS x2,
           CAST(o_totalprice AS DECIMAL(30, 6)) AS y
    FROM orders
  )
)
SELECT CAST(n AS BIGINT) AS n,
       round({_OLS_B0}, 6) AS b_intercept,
       round({_OLS_B1}, 6) AS b_month,
       round({_OLS_B2}, 6) AS b_urgent
FROM m
"""


@register("ridge_regression_exact", _RIDGE_SQL)
def q_ridge_regression_exact(spark, sf_dir):
    """Ridge regression (λ = {lam}) on the same design as
    `ols_regression_exact`: the exact-decimal normal-equation moments
    gain λ on the two non-intercept diagonal entries, then the SAME
    shared adjugate template solves — demonstrating that the certified
    closed-form solver parameterizes regularization with two added
    constants and zero dataflow change (the shrinkage of b_month /
    b_urgent toward 0 vs the OLS run is visible in the outputs).

    Scale plan: identical to OLS — one map-side-combined aggregate IS
    the fit."""
    o = load_table(spark, sf_dir, "orders")
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    src = o.select(
        F.month(F.col("o_orderdate").cast("date")).cast("long").alias("x1"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("x2"),
        F.col("o_totalprice").cast("decimal(30, 6)").alias("y"),
    )
    m = src.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        to_d(F.sum("x1")).alias("s1"),
        to_d(F.sum("x2")).alias("s2"),
        (to_d(F.sum(F.col("x1") * F.col("x1"))) + _RIDGE_LAMBDA).alias("s11"),
        to_d(F.sum(F.col("x1") * F.col("x2"))).alias("s12"),
        (to_d(F.sum(F.col("x2") * F.col("x2"))) + _RIDGE_LAMBDA).alias("s22"),
        to_d(F.sum("y")).alias("sy"),
        to_d(F.sum(F.col("x1") * F.col("y"))).alias("s1y"),
        to_d(F.sum(F.col("x2") * F.col("y"))).alias("s2y"),
    )
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.round(F.expr(_OLS_B0), 6).alias("b_intercept"),
        F.round(F.expr(_OLS_B1), 6).alias("b_month"),
        F.round(F.expr(_OLS_B2), 6).alias("b_urgent"),
    )


# ---------------------------------------------------------------------------
# Exact ROC-AUC of the certified GNB's class-'F' posterior — the
# ranking-quality member of the certified eval chain (confusion →
# per-class → calibration → AUC), via the tie-aware Mann-Whitney U on
# integer counts.
# ---------------------------------------------------------------------------


def _gnb_auc_sql() -> str:
    split = hash_bucket_sql("o_orderkey", 10, seed="gnb:")
    ll = (
        "(prior_ln - 0.5 * (lnv1 + (x1 - m1) * (x1 - m1) / v1)"
        " - 0.5 * (lnv2 + (x2 - m2) * (x2 - m2) / v2))"
    )
    q9s = lambda t: (  # noqa: E731
        f"CAST(CAST(SUM(CAST(round({t}, 9) AS DECIMAL(38, 9))) AS VARCHAR) AS DOUBLE)"
    )
    return f"""
WITH src AS (
  SELECT o_orderkey, o_orderstatus AS cls,
         CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS DOUBLE) AS x1,
         o_totalprice / 1000.0 AS x2,
         ({split}) AS bkt
  FROM orders
),
train AS (SELECT * FROM src WHERE bkt < 8),
test AS (SELECT * FROM src WHERE bkt >= 8),
stats AS (
  SELECT cls, COUNT(*) AS n_c,
         {q9s('x1')} / COUNT(*) AS m1,
         {q9s('x1 * x1')} / COUNT(*) AS s11,
         {q9s('x2')} / COUNT(*) AS m2,
         {q9s('x2 * x2')} / COUNT(*) AS s22
  FROM train GROUP BY cls
),
model AS (
  SELECT cls, n_c,
         round(ln(CAST(n_c AS DOUBLE) / (SELECT COUNT(*) FROM train)), 9) AS prior_ln,
         m1, s11 - m1 * m1 AS v1,
         round(ln({_GNB_PI2} * (s11 - m1 * m1)), 9) AS lnv1,
         m2, s22 - m2 * m2 AS v2,
         round(ln({_GNB_PI2} * (s22 - m2 * m2)), 9) AS lnv2
  FROM stats
),
scored AS (
  SELECT t.o_orderkey, t.cls AS actual, m.cls AS mcls, round({ll}, 9) AS ll
  FROM test t CROSS JOIN model m
),
probs AS (
  SELECT o_orderkey,
         MAX(CASE WHEN actual = 'F' THEN 1 ELSE 0 END) AS is_pos,
         round(
           (CASE WHEN MAX(CASE WHEN mcls = 'F' THEN ll END) IS NULL THEN 0.0
                 ELSE exp(MAX(CASE WHEN mcls = 'F' THEN ll END) - MAX(ll)) END)
           / (CAST(CAST(SUM(CAST(round(exp(ll - mx), 9) AS DECIMAL(38, 9))) AS VARCHAR) AS DOUBLE)),
           9) AS score
  FROM (SELECT *, MAX(ll) OVER (PARTITION BY o_orderkey) AS mx FROM scored)
  GROUP BY o_orderkey
),
per_v AS (
  SELECT score,
         SUM(is_pos) AS n_pos,
         SUM(1 - is_pos) AS n_neg
  FROM probs GROUP BY score
),
cum AS (
  SELECT n_pos, n_neg,
         COALESCE(SUM(n_neg) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
  FROM per_v
),
u AS (
  SELECT SUM(n_pos * (2 * neg_below + n_neg)) AS u2,
         SUM(n_pos) AS p, SUM(n_neg) AS n
  FROM cum
)
SELECT CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg,
       round(CAST(u2 AS DOUBLE) / (2.0 * p * n), 6) AS auc
FROM u
"""


@register("gnb_auc_exact", _gnb_auc_sql())
def q_gnb_auc_exact(spark, sf_dir):
    """Exact ROC-AUC of the GNB's class-'F' posterior on the held-out
    split: the tie-aware Mann-Whitney identity 2U = Σ_v n_pos(v) ·
    (2·neg_below(v) + n_neg(v)) over the DISTINCT quantized scores —
    all integer until one final division, so ties (which the 1e-9
    score grid creates deliberately) are handled exactly, never by
    row-order luck.  Completes the certified eval chain: confusion →
    per-class P/R/F1 → calibration → ranking quality.

    Scale plan: scoring is the broadcast model join; the U statistic
    runs on the DISTINCT-score relation (grid-bounded), one ordered
    window over it."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    src = o.select(
        "o_orderkey",
        F.col("o_orderstatus").alias("cls"),
        F.year(F.col("o_orderdate").cast("date")).cast("double").alias("x1"),
        (F.col("o_totalprice") / 1000.0).alias("x2"),
        hash_bucket("o_orderkey", 10, seed="gnb:").alias("bkt"),
    )
    train = src.filter(F.col("bkt") < 8)
    test = src.filter(F.col("bkt") >= 8)

    def q9s(t):
        return to_d(F.sum(F.round(t, 9).cast("decimal(38, 9)")))

    stats = train.groupBy("cls").agg(
        F.count(F.lit(1)).alias("n_c"),
        (q9s(F.col("x1")) / F.count(F.lit(1))).alias("m1"),
        (q9s(F.col("x1") * F.col("x1")) / F.count(F.lit(1))).alias("s11"),
        (q9s(F.col("x2")) / F.count(F.lit(1))).alias("m2"),
        (q9s(F.col("x2") * F.col("x2")) / F.count(F.lit(1))).alias("s22"),
    )
    n_train = train.agg(F.count(F.lit(1)).alias("n_train"))
    pi2 = float(_GNB_PI2)
    model = stats.crossJoin(F.broadcast(n_train)).select(
        F.col("cls").alias("mcls"),
        F.round(F.log(F.col("n_c").cast("double") / F.col("n_train")), 9).alias(
            "prior_ln"
        ),
        "m1",
        (F.col("s11") - F.col("m1") * F.col("m1")).alias("v1"),
        F.round(F.log(pi2 * (F.col("s11") - F.col("m1") * F.col("m1"))), 9).alias(
            "lnv1"
        ),
        "m2",
        (F.col("s22") - F.col("m2") * F.col("m2")).alias("v2"),
        F.round(F.log(pi2 * (F.col("s22") - F.col("m2") * F.col("m2"))), 9).alias(
            "lnv2"
        ),
    )
    paired = test.crossJoin(F.broadcast(model))
    ll_raw = (
        F.col("prior_ln")
        - 0.5
        * (
            F.col("lnv1")
            + (F.col("x1") - F.col("m1")) * (F.col("x1") - F.col("m1")) / F.col("v1")
        )
        - 0.5
        * (
            F.col("lnv2")
            + (F.col("x2") - F.col("m2")) * (F.col("x2") - F.col("m2")) / F.col("v2")
        )
    )
    scored = paired.select(
        "o_orderkey",
        F.col("cls").alias("actual"),
        F.col("mcls").alias("mcls"),
        F.round(ll_raw, 9).alias("ll"),
    )
    w_mx = Window.partitionBy("o_orderkey")
    probs = (
        scored.withColumn("mx", F.max("ll").over(w_mx))
        .groupBy("o_orderkey")
        .agg(
            F.max(F.when(F.col("actual") == "F", 1).otherwise(0)).alias("is_pos"),
            F.round(
                F.coalesce(
                    F.exp(
                        F.max(F.when(F.col("mcls") == "F", F.col("ll")))
                        - F.max("ll")
                    ),
                    F.lit(0.0),
                )
                / F.sum(
                    F.round(F.exp(F.col("ll") - F.col("mx")), 9).cast(
                        "decimal(38, 9)"
                    )
                )
                .cast("string")
                .cast("double"),
                9,
            ).alias("score"),
        )
    )
    per_v = probs.groupBy("score").agg(
        F.sum("is_pos").alias("n_pos"),
        F.sum(1 - F.col("is_pos")).alias("n_neg"),
    )
    w_cum = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    cum = per_v.select(
        "n_pos",
        "n_neg",
        F.coalesce(F.sum("n_neg").over(w_cum), F.lit(0)).alias("neg_below"),
    )
    u = cum.agg(
        F.sum(F.col("n_pos") * (2 * F.col("neg_below") + F.col("n_neg"))).alias("u2"),
        F.sum("n_pos").alias("p"),
        F.sum("n_neg").alias("n"),
    )
    return u.select(
        F.col("p").cast("long").alias("n_pos"),
        F.col("n").cast("long").alias("n_neg"),
        F.round(F.col("u2").cast("double") / (2.0 * F.col("p") * F.col("n")), 6).alias(
            "auc"
        ),
    )


# ---------------------------------------------------------------------------
# Model-based quality filtering (the CCNet / fastText-filter design):
# train a tiny logistic classifier to recognize a reference slice of
# the corpus (here: English docs) from cheap text statistics, score
# EVERY document, and report retention per stratum.  This is the
# certified-exact skeleton of "train a quality classifier on weak
# labels, filter the crawl with it" — the third consumer of the
# OLS/IRLS adjugate templates above.
# ---------------------------------------------------------------------------

_QCF_T = 0.44  # retention threshold on the 1e-9-grid score


def _qcf_sql(iters: int = _IRLS_T) -> str:
    stop_sql = "['the', 'a', 'and', 'of', 'to', 'in']"  # queries/text.py list
    toks = r"regexp_split_to_array(trim(text), '\s+')"
    parts = [
        f"""s AS (
  SELECT lang,
         round(CAST(len(list_filter({toks}, t -> list_contains({stop_sql}, t)))
                    AS DOUBLE) / len({toks}), 9) AS x1,
         round(len({toks}) / 100.0, 9) AS x2,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents WHERE len({toks}) > 0
)""",
        "b0_ AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"r{i} AS (SELECT x1, x2, y, {_IRLS_P} AS p, b0, b1, b2 "
            f"FROM s CROSS JOIN b{i-1}_)"
        )
        parts.append(
            f"a{i} AS (SELECT ANY_VALUE(b0) AS b0, ANY_VALUE(b1) AS b1, ANY_VALUE(b2) AS b2, "
            f"{_irls_q9_sum('p * (1.0 - p)')} AS n, "
            f"{_irls_q9_sum('p * (1.0 - p) * x1')} AS s1, "
            f"{_irls_q9_sum('p * (1.0 - p) * x2')} AS s2, "
            f"{_irls_q9_sum('p * (1.0 - p) * x1 * x1')} AS s11, "
            f"{_irls_q9_sum('p * (1.0 - p) * x1 * x2')} AS s12, "
            f"{_irls_q9_sum('p * (1.0 - p) * x2 * x2')} AS s22, "
            f"{_irls_q9_sum('(y - p)')} AS sy, "
            f"{_irls_q9_sum('(y - p) * x1')} AS s1y, "
            f"{_irls_q9_sum('(y - p) * x2')} AS s2y "
            f"FROM r{i})"
        )
        parts.append(
            f"b{i}_ AS (SELECT b0 + {_OLS_B0} AS b0, b1 + {_OLS_B1} AS b1, "
            f"b2 + {_OLS_B2} AS b2 FROM a{i})"
        )
    parts.append(
        f"rf AS (SELECT lang, {_IRLS_P} AS p FROM s CROSS JOIN b{iters}_)"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n,
       round({_irls_q9_sum('p')} / COUNT(*), 6) AS mean_score,
       CAST(SUM(CASE WHEN p >= {_QCF_T} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_retained,
       round(CAST(SUM(CASE WHEN p >= {_QCF_T} THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS retained_share
FROM rf GROUP BY lang
"""
    )


@register("quality_classifier_filter", _qcf_sql())
def q_quality_classifier_filter(spark, sf_dir):
    """Train-and-apply model-based corpus filtering: a logistic
    classifier (stopword ratio, tokens/100 → is-English) fitted by the
    same unrolled IRLS as `logreg_irls_exact`, then scored over the
    whole corpus with per-language retention at the fixed threshold.

    Every transcendental hits the 1e-9 grid before aggregation and all
    moments are DECIMAL sums, so training, scoring, and the threshold
    comparison are bit-identical across engines and partitionings.

    Scale plan: T+1 map-side-combined scans of the corpus (T Newton
    steps + final scoring), a 3-coefficient 1-row broadcast between
    passes — the cheapest honest "train a filter model on 100 TB and
    apply it" shape; the per-language rollup is |langs|-sized."""
    docs = load_table(spark, sf_dir, "documents")
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    stop = ["the", "a", "and", "of", "to", "in"]
    toks = F.split(F.trim(F.col("text")), r"\s+")
    nstop = F.size(
        F.filter(toks, lambda t: t.isin(stop))
    )
    src = (
        docs.filter(F.size(toks) > 0)
        .select(
            "lang",
            F.round(nstop.cast("double") / F.size(toks), 9).alias("x1"),
            F.round(F.size(toks) / F.lit(100.0), 9).alias("x2"),
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        )
    )

    def q9_sum(term):
        return to_d(F.sum(F.round(term, 9).cast("decimal(38, 9)")))

    beta = src.sparkSession.range(1).select(
        F.lit(0.0).alias("b0"), F.lit(0.0).alias("b1"), F.lit(0.0).alias("b2")
    )
    p_expr = F.expr(_IRLS_P)
    for _ in range(_IRLS_T):
        r = src.crossJoin(F.broadcast(beta)).withColumn("p", p_expr)
        w = F.col("p") * (1.0 - F.col("p"))
        resid = F.col("y") - F.col("p")
        a = r.agg(
            F.first("b0").alias("b0"),
            F.first("b1").alias("b1"),
            F.first("b2").alias("b2"),
            q9_sum(w).alias("n"),
            q9_sum(w * F.col("x1")).alias("s1"),
            q9_sum(w * F.col("x2")).alias("s2"),
            q9_sum(w * F.col("x1") * F.col("x1")).alias("s11"),
            q9_sum(w * F.col("x1") * F.col("x2")).alias("s12"),
            q9_sum(w * F.col("x2") * F.col("x2")).alias("s22"),
            q9_sum(resid).alias("sy"),
            q9_sum(resid * F.col("x1")).alias("s1y"),
            q9_sum(resid * F.col("x2")).alias("s2y"),
        )
        beta = a.select(
            (F.col("b0") + F.expr(_OLS_B0)).alias("b0"),
            (F.col("b1") + F.expr(_OLS_B1)).alias("b1"),
            (F.col("b2") + F.expr(_OLS_B2)).alias("b2"),
        )
    beta = beta.localCheckpoint(eager=True)
    rf = src.crossJoin(F.broadcast(beta)).withColumn("p", p_expr)
    keep = F.when(F.col("p") >= _QCF_T, 1).otherwise(0)
    return rf.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(q9_sum(F.col("p")) / F.count(F.lit(1)), 6).alias("mean_score"),
        F.sum(keep).cast("long").alias("n_retained"),
        F.round(
            F.sum(keep).cast("double") / F.count(F.lit(1)), 6
        ).alias("retained_share"),
    )


# ---------------------------------------------------------------------------
# Holt linear (double-exponential) smoothing as a NATIVE array fold —
# the recurrence class one step up from the scalar EWMA fold
# (`user_value_ewma`): the accumulator is a STRUCT (level, trend, step,
# sse), updated per day on the 1e-9 grid, so a genuinely sequential
# state recurrence runs entirely inside whole-stage codegen with a
# bit-exact DuckDB list_reduce twin.
# ---------------------------------------------------------------------------

_HOLT_A = 0.5  # level smoothing
_HOLT_B = 0.3  # trend smoothing  (1-b written as the literal 0.7)

# Oracle NOTE: the obvious list_reduce twin is WRONG in DuckDB 1.0 —
# a struct-building lambda evaluates fields sequentially against the
# accumulator, so a later field's expression sees an EARLIER field's
# new value (verified: the trend update read the already-updated
# level, silently diverging from the recurrence).  A recursive CTE has
# unambiguous semantics, so the oracle steps the recurrence that way.
_HOLT_SQL = f"""
WITH RECURSIVE daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS y
  FROM orders GROUP BY 1
),
sr AS (SELECT ROW_NUMBER() OVER (ORDER BY d) AS rn, y FROM daily),
rec AS (
  SELECT CAST(2 AS BIGINT) AS i,
         (SELECT y FROM sr WHERE rn = 2) AS l,
         round((SELECT y FROM sr WHERE rn = 2)
               - (SELECT y FROM sr WHERE rn = 1), 9) AS t,
         CAST(0.0 AS DOUBLE) AS s
  UNION ALL
  SELECT rec.i + 1,
         round({_HOLT_A} * sr.y + {_HOLT_A} * (rec.l + rec.t), 9),
         round({_HOLT_B} * (round({_HOLT_A} * sr.y
                                  + {_HOLT_A} * (rec.l + rec.t), 9)
                            - rec.l) + 0.7 * rec.t, 9),
         round(rec.s + (sr.y - (rec.l + rec.t)) * (sr.y - (rec.l + rec.t)), 9)
  FROM rec JOIN sr ON sr.rn = rec.i + 1
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sr) AS n_days,
       round(l, 6) AS level_final,
       round(t, 6) AS trend_final,
       round(l + t, 6) AS forecast_next,
       round(sqrt(s / ((SELECT COUNT(*) FROM sr) - 2)), 6) AS rmse
FROM rec WHERE i = (SELECT COUNT(*) FROM sr)
"""


@register("holt_linear_forecast", _HOLT_SQL)
def q_holt_linear_forecast(spark, sf_dir):
    """Holt linear smoothing of the daily order-count series: level and
    trend fold left-to-right over the date-sorted array with every
    update rounded to the 1e-9 grid; output is the final state, the
    one-step forecast, and the in-sample one-step RMSE.  Init follows
    the textbook convention (level=y₂, trend=y₂−y₁, errors accumulate
    from the third point).

    Scale plan: the fold is per-SERIES, not per-corpus — the heavy part
    is the daily rollup (one map-side-combined agg over the fact
    table); the array fold runs over |days| elements.  For thousands
    of parallel series the same fold partitions by series key — never
    a global window over raw rows."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    ser = daily.agg(
        F.array_sort(F.collect_list(F.struct("d", "y"))).alias("a"),
        F.count(F.lit(1)).alias("n"),
    )
    xs = F.transform(
        F.col("a"),
        lambda e: F.struct(
            e["y"].alias("l"),
            F.lit(0.0).alias("t"),
            F.lit(1).cast("long").alias("i"),
            F.lit(0.0).alias("s"),
        ),
    )

    def step(acc, x):
        l2 = F.round(
            F.lit(_HOLT_A) * x["l"] + F.lit(_HOLT_A) * (acc["l"] + acc["t"]), 9
        )
        t2 = F.round(
            F.lit(_HOLT_B) * (l2 - acc["l"]) + F.lit(0.7) * acc["t"], 9
        )
        err = x["l"] - (acc["l"] + acc["t"])
        s2 = F.round(acc["s"] + err * err, 9)
        return F.when(
            acc["i"] == 1,
            F.struct(
                x["l"].alias("l"),
                F.round(x["l"] - acc["l"], 9).alias("t"),
                F.lit(2).cast("long").alias("i"),
                F.lit(0.0).alias("s"),
            ),
        ).otherwise(
            F.struct(
                l2.alias("l"),
                t2.alias("t"),
                (acc["i"] + 1).alias("i"),
                s2.alias("s"),
            )
        )

    folded = ser.select(
        "n",
        F.aggregate(
            F.slice(xs, 2, F.size(xs) - 1),
            F.element_at(xs, 1),
            step,
        ).alias("f"),
    )
    return folded.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(F.col("f.l"), 6).alias("level_final"),
        F.round(F.col("f.t"), 6).alias("trend_final"),
        F.round(F.col("f.l") + F.col("f.t"), 6).alias("forecast_next"),
        F.round(F.sqrt(F.col("f.s") / (F.col("n") - 2)), 6).alias("rmse"),
    )


# ---------------------------------------------------------------------------
# Holt-Winters ADDITIVE SEASONAL smoothing (period 7) — the seasonal
# completion of `holt_linear_forecast`.  Same engine design: the state
# fold runs natively over the date-sorted array with every update on
# the 1e-9 grid; the accumulator now carries the rolling last-m
# seasonal components as an array column.  Same oracle design: a
# recursive CTE (NOT list_reduce — see the Holt oracle note on
# DuckDB's sequential struct-lambda evaluation) stepping the identical
# recurrence, with the level update inlined into the trend update on
# both engines so the expression trees match term-for-term.
# Init is the textbook one-season convention: level = mean of season 1,
# trend = (mean of season 2 − mean of season 1)/m, seasonals = season-1
# deviations from the level (daily counts are integer-valued doubles,
# so the init means are EXACT under any summation order).
# ---------------------------------------------------------------------------

_HW_M = 7  # weekly season on the daily series
_HW_A, _HW_CA = 0.4, 0.6  # level alpha, 1-alpha (written as literals)
_HW_B, _HW_CB = 0.2, 0.8  # trend beta, 1-beta
_HW_G, _HW_CG = 0.3, 0.7  # seasonal gamma, 1-gamma

_HW_LNEW = f"round({_HW_A} * (sr.y - rec.s[1]) + {_HW_CA} * (rec.l + rec.b), 9)"

_HW_SQL = f"""
WITH RECURSIVE daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS y
  FROM orders GROUP BY 1
),
sr AS (SELECT ROW_NUMBER() OVER (ORDER BY d) AS rn, y FROM daily),
n AS (SELECT COUNT(*) AS c FROM sr),
init AS (
  SELECT round((SELECT SUM(y) FROM sr WHERE rn <= {_HW_M}) / {_HW_M}, 9) AS l0,
         round(((SELECT SUM(y) FROM sr WHERE rn BETWEEN {_HW_M + 1} AND {2 * _HW_M}) / {_HW_M}
                - (SELECT SUM(y) FROM sr WHERE rn <= {_HW_M}) / {_HW_M}) / {_HW_M}, 9) AS b0
),
s0 AS (
  SELECT list(round(y - (SELECT l0 FROM init), 9) ORDER BY rn) AS s
  FROM sr WHERE rn <= {_HW_M}
),
rec AS (
  SELECT CAST({_HW_M} AS BIGINT) AS i,
         (SELECT l0 FROM init) AS l,
         (SELECT b0 FROM init) AS b,
         (SELECT s FROM s0) AS s,
         CAST(0.0 AS DOUBLE) AS sse
  UNION ALL
  SELECT rec.i + 1,
         {_HW_LNEW},
         round({_HW_B} * ({_HW_LNEW} - rec.l) + {_HW_CB} * rec.b, 9),
         list_concat(rec.s[2:{_HW_M}],
                     [round({_HW_G} * (sr.y - rec.l - rec.b) + {_HW_CG} * rec.s[1], 9)]),
         round(rec.sse + (sr.y - (rec.l + rec.b + rec.s[1]))
                         * (sr.y - (rec.l + rec.b + rec.s[1])), 9)
  FROM rec JOIN sr ON sr.rn = rec.i + 1
)
SELECT (SELECT CAST(c AS BIGINT) FROM n) AS n_days,
       round(l, 6) AS level_final,
       round(b, 6) AS trend_final,
       round(l + b + s[1], 6) AS forecast_next,
       round(sqrt(sse / ((SELECT c FROM n) - {_HW_M})), 6) AS rmse
FROM rec WHERE i = (SELECT c FROM n)
"""


@register("holt_winters_seasonal_forecast", _HW_SQL)
def q_holt_winters_seasonal_forecast(spark, sf_dir):
    """Holt-Winters additive seasonal smoothing of the daily order
    counts, weekly period: level/trend/seasonal state folds over the
    sorted series, output the final state, the one-step seasonal
    forecast, and the in-sample one-step RMSE (errors accumulate from
    the first post-init point).

    Scale plan: identical to Holt — the daily rollup is the only
    corpus-scale stage (map-side-combined agg); the fold is per-series
    over |days| elements, and for a fleet of series the same fold
    partitions by series key.  The seasonal array in the accumulator
    is m elements, rotated by slice+append per step — O(m) per day,
    never a window over raw rows."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    ser = daily.agg(
        F.array_sort(F.collect_list(F.struct("d", "y"))).alias("a"),
        F.count(F.lit(1)).alias("n"),
    )
    ys = F.transform(F.col("a"), lambda e: e["y"])

    def fold_sum(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)

    l0 = F.round(fold_sum(F.slice(ys, 1, _HW_M)) / _HW_M, 9)
    b0 = F.round(
        (
            fold_sum(F.slice(ys, _HW_M + 1, _HW_M)) / _HW_M
            - fold_sum(F.slice(ys, 1, _HW_M)) / _HW_M
        )
        / _HW_M,
        9,
    )
    s0 = F.transform(F.slice(ys, 1, _HW_M), lambda y: F.round(y - l0, 9))
    acc0 = F.struct(
        l0.alias("l"), b0.alias("b"), s0.alias("s"), F.lit(0.0).alias("sse")
    )

    def step(acc, y):
        head = F.element_at(acc["s"], 1)
        lnew = F.round(
            F.lit(_HW_A) * (y - head) + F.lit(_HW_CA) * (acc["l"] + acc["b"]), 9
        )
        bnew = F.round(
            F.lit(_HW_B) * (lnew - acc["l"]) + F.lit(_HW_CB) * acc["b"], 9
        )
        snew = F.concat(
            F.slice(acc["s"], 2, _HW_M - 1),
            F.array(
                F.round(
                    F.lit(_HW_G) * (y - acc["l"] - acc["b"])
                    + F.lit(_HW_CG) * head,
                    9,
                )
            ),
        )
        err = y - (acc["l"] + acc["b"] + head)
        return F.struct(
            lnew.alias("l"),
            bnew.alias("b"),
            snew.alias("s"),
            F.round(acc["sse"] + err * err, 9).alias("sse"),
        )

    folded = ser.select(
        "n",
        F.aggregate(F.slice(ys, _HW_M + 1, F.size(ys) - _HW_M), acc0, step).alias("f"),
    )
    return folded.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(F.col("f.l"), 6).alias("level_final"),
        F.round(F.col("f.b"), 6).alias("trend_final"),
        F.round(
            F.col("f.l") + F.col("f.b") + F.element_at(F.col("f.s"), 1), 6
        ).alias("forecast_next"),
        F.round(F.sqrt(F.col("f.sse") / (F.col("n") - _HW_M)), 6).alias("rmse"),
    )


# ---------------------------------------------------------------------------
# Difference-in-differences — the panel-data member of the causal
# family (CUPED, z-test, QTE are single-period).  2×2 cell moments in
# one scan; the DiD estimate and its Welch-style SE are closed-form
# doubles evaluated in identical op order on both engines.
# ---------------------------------------------------------------------------

_DID_CUT = "2024-01-16"  # treatment switch-on date (fixture spans Jan 2024)

_DID_CELL = """
  SELECT CASE WHEN user_id % 2 = 1 THEN 'T' ELSE 'C' END AS grp,
         CASE WHEN CAST(ts AS DATE) >= DATE '{cut}' THEN 'post' ELSE 'pre' END AS period,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(CAST(round(value, 9) AS DECIMAL(38, 9))) AS VARCHAR) AS DOUBLE) AS s,
         CAST(CAST(SUM(CAST(round(value, 9) AS DECIMAL(38, 9))
                       * CAST(round(value, 9) AS DECIMAL(38, 9))) AS VARCHAR) AS DOUBLE) AS ss
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
"""

_DID_SQL = f"""
WITH cells AS ({_DID_CELL.format(cut=_DID_CUT)}),
m AS (
  SELECT grp, period, n, s / n AS mean,
         (ss - n * (s / n) * (s / n)) / (n - 1) AS var
  FROM cells
),
w AS (
  SELECT
    (SELECT n FROM m WHERE grp = 'T' AND period = 'pre') AS n_t_pre,
    (SELECT n FROM m WHERE grp = 'T' AND period = 'post') AS n_t_post,
    (SELECT n FROM m WHERE grp = 'C' AND period = 'pre') AS n_c_pre,
    (SELECT n FROM m WHERE grp = 'C' AND period = 'post') AS n_c_post,
    (SELECT mean FROM m WHERE grp = 'T' AND period = 'pre') AS m_t_pre,
    (SELECT mean FROM m WHERE grp = 'T' AND period = 'post') AS m_t_post,
    (SELECT mean FROM m WHERE grp = 'C' AND period = 'pre') AS m_c_pre,
    (SELECT mean FROM m WHERE grp = 'C' AND period = 'post') AS m_c_post,
    (SELECT var / n FROM m WHERE grp = 'T' AND period = 'pre')
      + (SELECT var / n FROM m WHERE grp = 'T' AND period = 'post')
      + (SELECT var / n FROM m WHERE grp = 'C' AND period = 'pre')
      + (SELECT var / n FROM m WHERE grp = 'C' AND period = 'post') AS se2
)
SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
       round(m_t_pre, 6) AS mean_t_pre,
       round(m_t_post, 6) AS mean_t_post,
       round(m_c_pre, 6) AS mean_c_pre,
       round(m_c_post, 6) AS mean_c_post,
       round((m_t_post - m_t_pre) - (m_c_post - m_c_pre), 6) AS did_estimate,
       round(sqrt(se2), 6) AS did_se,
       round(((m_t_post - m_t_pre) - (m_c_post - m_c_pre)) / sqrt(se2), 6) AS did_t
FROM w
"""


@register("diff_in_diff_readout", _DID_SQL)
def q_diff_in_diff_readout(spark, sf_dir):
    """Difference-in-differences on purchase values: treatment = odd
    user ids, post-period = from {_DID_CUT}; DiD estimate = (T,post −
    T,pre) − (C,post − C,pre) with a four-cell Welch-style standard
    error.  On an A/A-like fixture the estimate should hover near 0 —
    the readout is the parallel-trends sanity sheet, not a significance
    claim.

    Scale plan: the whole analysis is ONE conditional aggregate over
    the filtered fact stream (map-side combined, 4 output rows) plus
    scalar arithmetic — cost is a single reduction at any corpus size.
    Moments accumulate as 1e-9-quantized DECIMAL so cell means are
    bit-identical across engines and partitionings."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    x = F.round(F.col("value"), 9).cast("decimal(38, 9)")
    cells = e.groupBy(
        F.when(F.col("user_id") % 2 == 1, "T").otherwise("C").alias("grp"),
        F.when(
            F.col("ts").cast("date") >= F.lit(_DID_CUT).cast("date"), "post"
        )
        .otherwise("pre")
        .alias("period"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        to_d(F.sum(x)).alias("s"),
        to_d(F.sum(x * x)).alias("ss"),
    )
    mean = F.col("s") / F.col("n")
    m = cells.select(
        "grp",
        "period",
        "n",
        mean.alias("mean"),
        ((F.col("ss") - F.col("n") * mean * mean) / (F.col("n") - 1)).alias("var"),
    )

    def cell(grp, period, pfx):
        return m.filter((F.col("grp") == grp) & (F.col("period") == period)).select(
            F.col("n").alias(f"n_{pfx}"),
            F.col("mean").alias(f"m_{pfx}"),
            (F.col("var") / F.col("n")).alias(f"vn_{pfx}"),
        )

    w = (
        cell("T", "pre", "t_pre")
        .crossJoin(F.broadcast(cell("T", "post", "t_post")))
        .crossJoin(F.broadcast(cell("C", "pre", "c_pre")))
        .crossJoin(F.broadcast(cell("C", "post", "c_post")))
        .withColumn(
            "se2",
            F.col("vn_t_pre") + F.col("vn_t_post") + F.col("vn_c_pre") + F.col("vn_c_post"),
        )
    )
    did = (F.col("m_t_post") - F.col("m_t_pre")) - (
        F.col("m_c_post") - F.col("m_c_pre")
    )
    return w.select(
        "n_t_pre",
        "n_t_post",
        "n_c_pre",
        "n_c_post",
        F.round("m_t_pre", 6).alias("mean_t_pre"),
        F.round("m_t_post", 6).alias("mean_t_post"),
        F.round("m_c_pre", 6).alias("mean_c_pre"),
        F.round("m_c_post", 6).alias("mean_c_post"),
        F.round(did, 6).alias("did_estimate"),
        F.round(F.sqrt("se2"), 6).alias("did_se"),
        F.round(did / F.sqrt("se2"), 6).alias("did_t"),
    )


# ---------------------------------------------------------------------------
# STL-lite decomposition of the daily order-count series: trend =
# centered 7-day moving average, seasonal = day-of-week mean of the
# detrended interior, residual = what remains.  The decomposition
# sheet behind `seasonal_naive_wape` / `seasonal_robust_anomaly`:
# those queries consume weekly structure, this one reports it.
# Day-of-week comes from an epoch-anchored day difference (mod 7), not
# an engine dow() function — Spark and DuckDB disagree on week-start
# conventions, day arithmetic they agree on.
# ---------------------------------------------------------------------------

_STL_EPOCH = "1992-01-06"  # a Monday: dow 0 = Monday on both engines

_STL_SQL = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS y
  FROM orders GROUP BY 1
),
tr AS (
  SELECT d, y,
         CASE WHEN COUNT(*) OVER w = 7
              THEN round(SUM(y) OVER w / 7, 9) END AS trend
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
det AS (
  SELECT CAST(datediff('day', DATE '{_STL_EPOCH}', d) % 7 AS BIGINT) AS dow,
         round(y - trend, 9) AS dt
  FROM tr WHERE trend IS NOT NULL
),
seas AS (
  SELECT dow,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         round(CAST(CAST(SUM(CAST(dt AS DECIMAL(38, 9))) AS VARCHAR) AS DOUBLE)
               / COUNT(*), 9) AS seasonal
  FROM det GROUP BY dow
),
resid AS (
  SELECT det.dow, round(det.dt - seas.seasonal, 9) AS r
  FROM det JOIN seas ON det.dow = seas.dow
)
SELECT s.dow, s.n_days, round(s.seasonal, 6) AS seasonal,
       round(CAST(CAST(SUM(CAST(r.r AS DECIMAL(38, 9))) AS VARCHAR) AS DOUBLE)
             / s.n_days, 6) + 0.0 AS resid_mean,
       round(CAST(CAST(SUM(CAST(round(r.r * r.r, 9) AS DECIMAL(38, 9))) AS VARCHAR) AS DOUBLE)
             / s.n_days, 6) AS resid_msq
FROM seas s JOIN resid r ON r.dow = s.dow
GROUP BY s.dow, s.n_days, s.seasonal
"""


@register("stl_decompose_profile", _STL_SQL)
def q_stl_decompose_profile(spark, sf_dir):
    """Trend/seasonal/residual decomposition, one row per day-of-week:
    the seasonal component (mean detrended deviation), and the
    residual mean and mean-square after removing both trend and
    seasonality.  Residual mean ≈ 0 by construction; resid_msq is the
    irreducible noise floor a forecaster compares models against.

    Scale plan: the corpus-scale work is the daily rollup (map-side
    combined); the moving-average window and the dow aggregates run
    over |days| rows.  For a fleet of series everything partitions by
    series key — the decomposition is embarrassingly parallel across
    series."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d",
        "y",
        F.when(
            F.count(F.lit(1)).over(w) == 7, F.round(F.sum("y").over(w) / 7, 9)
        ).alias("trend"),
    )
    det = tr.filter(F.col("trend").isNotNull()).select(
        (F.datediff(F.col("d"), F.lit(_STL_EPOCH).cast("date")) % 7)
        .cast("long")
        .alias("dow"),
        F.round(F.col("y") - F.col("trend"), 9).alias("dt"),
    )
    det = det.localCheckpoint(eager=False)  # feeds seasonal AND residual
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    seas = det.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(
            to_d(F.sum(F.col("dt").cast("decimal(38, 9)"))) / F.count(F.lit(1)), 9
        ).alias("seasonal"),
    )
    resid = det.join(F.broadcast(seas), "dow").select(
        "dow", "n_days", "seasonal", F.round(F.col("dt") - F.col("seasonal"), 9).alias("r")
    )
    return resid.groupBy("dow", "n_days", "seasonal").agg(
        (
            F.round(
                to_d(F.sum(F.col("r").cast("decimal(38, 9)"))) / F.col("n_days"), 6
            )
            + F.lit(0.0)  # −0.0 → +0.0: DuckDB's round keeps the sign bit
        ).alias("resid_mean"),
        F.round(
            to_d(F.sum(F.round(F.col("r") * F.col("r"), 9).cast("decimal(38, 9)")))
            / F.col("n_days"),
            6,
        ).alias("resid_msq"),
    ).select("dow", "n_days", F.round("seasonal", 6).alias("seasonal"), "resid_mean", "resid_msq")


# ---------------------------------------------------------------------------
# Huber M-estimator of location by IRLS — the ESTIMATOR member of the
# robust family (MAD flags outliers, trimmed mean deletes a fixed
# fraction; Huber downweights smoothly with a 1.345·MAD elbow, the
# textbook 95%-efficiency tuning).  Three unrolled reweighting passes:
# weights and weighted terms are 1e-9-quantized and decimal-summed, so
# every iterate is bit-identical across engines.
# ---------------------------------------------------------------------------

_HUB_K = 1.345
_HUB_T = 3

_HUB_D9 = "CAST(round({x}, 9) AS DECIMAL(38, 9))"


def _huber_iter_sql(i: int) -> str:
    w = f"LEAST(1.0, {_HUB_K} * (SELECT s FROM scale) / abs(v - (SELECT m FROM mu{i})))"
    return f"""
mu{i + 1} AS MATERIALIZED (
  SELECT round(
    CAST(CAST(SUM({_HUB_D9.format(x=f'({w}) * v')}) AS VARCHAR) AS DOUBLE)
    / CAST(CAST(SUM({_HUB_D9.format(x=w)}) AS VARCHAR) AS DOUBLE), 9) AS m
  FROM vals
  WHERE v <> (SELECT m FROM mu{i}) OR abs(v - (SELECT m FROM mu{i})) > 0
)"""


_HUB_SQL = (
    f"""
WITH vals AS MATERIALIZED (SELECT o_totalprice AS v FROM orders),
mu0 AS MATERIALIZED (SELECT round(median(v), 9) AS m FROM vals),
scale AS MATERIALIZED (
  SELECT round(1.4826 * median(abs(v - (SELECT m FROM mu0))), 9) AS s FROM vals
),"""
    + ",".join(_huber_iter_sql(i) for i in range(_HUB_T))
    + f"""
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM vals) AS n,
       round((SELECT m FROM mu0), 6) AS median_init,
       round((SELECT s FROM scale), 6) AS mad_scale,
       round((SELECT m FROM mu{_HUB_T}), 6) AS mu_huber,
       round((SELECT CAST(CAST(SUM({_HUB_D9.format(x='v')}) AS VARCHAR) AS DOUBLE) / COUNT(*) FROM vals), 6) AS mean_plain,
       (SELECT CAST(SUM(CASE WHEN abs(v - (SELECT m FROM mu{_HUB_T}))
                              > {_HUB_K} * (SELECT s FROM scale) THEN 1 ELSE 0 END) AS BIGINT)
        FROM vals) AS n_downweighted
"""
)


@register("huber_location_irls", _HUB_SQL)
def q_huber_location_irls(spark, sf_dir):
    """Huber-robust location of the order total-price column:
    median/MAD init, {_HUB_T} IRLS reweighting passes with the
    {_HUB_K}·MAD elbow, reported beside the plain mean and the count
    of observations the final fit downweights.  On TPC-H's symmetric
    prices the two centers should nearly agree — the interesting use
    is exactly when they don't.

    Values exactly AT the current iterate are excluded from each
    reweighted mean (both engines identically) so the k·s/|v−μ| weight
    never divides by zero; at weight 1 such a point would only pull μ
    toward where it already is, so the exclusion is estimator-neutral
    to first order and exact ties are measure-zero on price data.

    Scale plan: the iterative part is {_HUB_T} map-side-combined
    weighted-moment aggregates over the value scan with the current
    iterate riding a 1-row broadcast (scalar-subquery pattern); the
    exact median/MAD init is the one sort-based step — at 100 TB swap
    it for the GK-sketch quantiles, the iterations are unchanged."""
    o = load_table(spark, sf_dir, "orders")
    vals = o.select(F.col("o_totalprice").alias("v")).localCheckpoint(eager=False)
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    d9 = lambda c: F.round(c, 9).cast("decimal(38, 9)")  # noqa: E731
    mu = vals.agg(F.round(F.median("v"), 9).alias("m"))
    scale = (
        vals.crossJoin(F.broadcast(mu))
        .agg(F.round(1.4826 * F.median(F.abs(F.col("v") - F.col("m"))), 9).alias("s"))
        .localCheckpoint(eager=True)
    )
    for _ in range(_HUB_T):
        w = F.least(
            F.lit(1.0),
            F.lit(_HUB_K) * F.col("s") / F.abs(F.col("v") - F.col("m")),
        )
        mu = (
            vals.crossJoin(F.broadcast(mu))
            .crossJoin(F.broadcast(scale))
            .filter(
                (F.col("v") != F.col("m")) | (F.abs(F.col("v") - F.col("m")) > 0)
            )
            .agg(
                F.round(
                    to_d(F.sum(d9(w * F.col("v")))) / to_d(F.sum(d9(w))), 9
                ).alias("m")
            )
            .localCheckpoint(eager=True)  # 1 row; cut the per-pass lineage
        )
    n_down = (
        vals.crossJoin(F.broadcast(mu))
        .crossJoin(F.broadcast(scale))
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("v") - F.col("m")) > F.lit(_HUB_K) * F.col("s"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_downweighted")
        )
    )
    stats = vals.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(to_d(F.sum(d9(F.col("v")))) / F.count(F.lit(1)), 6).alias("mean_plain"),
    )
    mu0 = vals.agg(F.round(F.median("v"), 9).alias("m0"))
    return (
        stats.crossJoin(F.broadcast(mu0))
        .crossJoin(F.broadcast(scale))
        .crossJoin(F.broadcast(mu))
        .crossJoin(F.broadcast(n_down))
        .select(
            "n",
            F.round(F.col("m0"), 6).alias("median_init"),
            F.round(F.col("s"), 6).alias("mad_scale"),
            F.round(F.col("m"), 6).alias("mu_huber"),
            "mean_plain",
            "n_downweighted",
        )
    )


# ---------------------------------------------------------------------------
# Holt fleet: the SAME fold `holt_linear_forecast` certifies on one
# series, partitioned by series key — one forecast state per event
# type.  This is the claim every fold docstring makes ("for a fleet,
# partition by the series key") made concrete and oracle-checked: the
# recursive-CTE oracle steps all series simultaneously, keyed on
# (event_type, rn).
# ---------------------------------------------------------------------------

_HFLEET_SQL = f"""
WITH RECURSIVE daily AS (
  SELECT event_type AS et, CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(COUNT(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
sr AS (SELECT et, ROW_NUMBER() OVER (PARTITION BY et ORDER BY d) AS rn, y FROM daily),
ns AS (SELECT et, CAST(COUNT(*) AS BIGINT) AS n FROM sr GROUP BY et),
rec AS (
  SELECT s2.et, CAST(2 AS BIGINT) AS i, s2.y AS l,
         round(s2.y - s1.y, 9) AS t, CAST(0.0 AS DOUBLE) AS s
  FROM sr s1 JOIN sr s2 ON s1.et = s2.et AND s1.rn = 1 AND s2.rn = 2
  UNION ALL
  SELECT rec.et, rec.i + 1,
         round({_HOLT_A} * sr.y + {_HOLT_A} * (rec.l + rec.t), 9),
         round({_HOLT_B} * (round({_HOLT_A} * sr.y
                                  + {_HOLT_A} * (rec.l + rec.t), 9)
                            - rec.l) + 0.7 * rec.t, 9),
         round(rec.s + (sr.y - (rec.l + rec.t)) * (sr.y - (rec.l + rec.t)), 9)
  FROM rec JOIN sr ON sr.et = rec.et AND sr.rn = rec.i + 1
)
SELECT rec.et AS event_type, ns.n AS n_days,
       round(rec.l, 6) AS level_final,
       round(rec.t, 6) AS trend_final,
       round(rec.l + rec.t, 6) AS forecast_next,
       round(sqrt(rec.s / (ns.n - 2)), 6) AS rmse
FROM rec JOIN ns ON ns.et = rec.et AND rec.i = ns.n
"""


@register("holt_fleet_by_type", _HFLEET_SQL)
def q_holt_fleet_by_type(spark, sf_dir):
    """Holt linear smoothing run as a FLEET: one fold per event type
    over its daily-count series, identical recurrence and literals to
    `holt_linear_forecast`, one forecast row per series.

    Scale plan: the daily rollup is one map-side-combined aggregate
    keyed by (series, day); the folds then run inside a per-series
    groupBy — embarrassingly parallel across thousands or millions of
    series, each fold touching only its own |days| elements.  No
    global window, no cross-series shuffle beyond the rollup."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.col("event_type"),
        F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    ser = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("d", "y"))).alias("a"),
        F.count(F.lit(1)).alias("n"),
    )
    xs = F.transform(
        F.col("a"),
        lambda e_: F.struct(
            e_["y"].alias("l"),
            F.lit(0.0).alias("t"),
            F.lit(1).cast("long").alias("i"),
            F.lit(0.0).alias("s"),
        ),
    )

    def step(acc, x):
        l2 = F.round(
            F.lit(_HOLT_A) * x["l"] + F.lit(_HOLT_A) * (acc["l"] + acc["t"]), 9
        )
        t2 = F.round(F.lit(_HOLT_B) * (l2 - acc["l"]) + F.lit(0.7) * acc["t"], 9)
        err = x["l"] - (acc["l"] + acc["t"])
        s2 = F.round(acc["s"] + err * err, 9)
        return F.when(
            acc["i"] == 1,
            F.struct(
                x["l"].alias("l"),
                F.round(x["l"] - acc["l"], 9).alias("t"),
                F.lit(2).cast("long").alias("i"),
                F.lit(0.0).alias("s"),
            ),
        ).otherwise(
            F.struct(
                l2.alias("l"), t2.alias("t"), (acc["i"] + 1).alias("i"), s2.alias("s")
            )
        )

    folded = ser.select(
        "event_type",
        "n",
        F.aggregate(F.slice(xs, 2, F.size(xs) - 1), F.element_at(xs, 1), step).alias(
            "f"
        ),
    )
    return folded.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.round(F.col("f.l"), 6).alias("level_final"),
        F.round(F.col("f.t"), 6).alias("trend_final"),
        F.round(F.col("f.l") + F.col("f.t"), 6).alias("forecast_next"),
        F.round(F.sqrt(F.col("f.s") / (F.col("n") - 2)), 6).alias("rmse"),
    )


# ---------------------------------------------------------------------------
# Distribution-free median CI from order statistics: ranks n/2 ∓
# z·√n/2 bracket the median with ~95% coverage by the binomial
# argument (no normality assumption on the DATA — the normal approx is
# only to the Binomial(n, ½) rank distribution).  The inference
# counterpart of the exact-median operators: not just the point
# estimate, but how sure the sample size lets you be.
# ---------------------------------------------------------------------------

_MCI_Z = 1.959964  # two-sided 95%

_MCI_SQL = f"""
WITH vals AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
bounds AS (
  SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
         CAST(GREATEST(1, floor(MAX(n) / 2.0 - {_MCI_Z} * sqrt(CAST(MAX(n) AS DOUBLE)) / 2)) AS BIGINT) AS k_lo,
         CAST(LEAST(MAX(n), ceil(MAX(n) / 2.0 + 1 + {_MCI_Z} * sqrt(CAST(MAX(n) AS DOUBLE)) / 2)) AS BIGINT) AS k_hi
  FROM vals GROUP BY event_type
)
SELECT b.event_type, b.n,
       round((SELECT median(value) FROM vals v
              WHERE v.event_type = b.event_type), 6) AS median_value,
       round(MIN(CASE WHEN v.rk = b.k_lo THEN v.value END), 6) AS ci_lo,
       round(MIN(CASE WHEN v.rk = b.k_hi THEN v.value END), 6) AS ci_hi,
       b.k_lo, b.k_hi
FROM bounds b JOIN vals v ON v.event_type = b.event_type
GROUP BY b.event_type, b.n, b.k_lo, b.k_hi
"""


@register("median_ci_order_stats", _MCI_SQL)
def q_median_ci_order_stats(spark, sf_dir):
    """Per-event-type median of the value column with its
    distribution-free ~95% CI: the order statistics at ranks
    n/2 ∓ {_MCI_Z}·√n/2 (clamped to [1, n], deterministic rank
    tiebreak on event_id).

    Scale plan: one rank window PARTITIONED BY TYPE (parallel across
    groups; at 100 TB swap the exact ranks for the GK sketch's
    rank-error guarantee — the CI formula consumes ranks, so a sketch
    with rank tolerance composes directly); the bound arithmetic is a
    per-type scalar aggregate."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    vals = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    ).localCheckpoint(eager=False)  # feeds bounds, the median agg, and the pick
    nmax = F.max("n")
    bounds = vals.groupBy("event_type").agg(
        nmax.cast("long").alias("n"),
        F.greatest(
            F.lit(1).cast("long"),
            F.floor(nmax / 2.0 - F.lit(_MCI_Z) * F.sqrt(nmax.cast("double")) / 2).cast(
                "long"
            ),
        ).alias("k_lo"),
        F.least(
            nmax.cast("long"),
            F.ceil(nmax / 2.0 + 1 + F.lit(_MCI_Z) * F.sqrt(nmax.cast("double")) / 2).cast(
                "long"
            ),
        ).alias("k_hi"),
    )
    meds = vals.groupBy("event_type").agg(
        F.round(F.median("value"), 6).alias("median_value")
    )
    return (
        vals.select("event_type", "value", "rk")
        .join(F.broadcast(bounds.withColumnRenamed("event_type", "bet")),
              F.col("event_type") == F.col("bet"))
        .groupBy("event_type", "n", "k_lo", "k_hi")
        .agg(
            F.round(
                F.min(F.when(F.col("rk") == F.col("k_lo"), F.col("value"))), 6
            ).alias("ci_lo"),
            F.round(
                F.min(F.when(F.col("rk") == F.col("k_hi"), F.col("value"))), 6
            ).alias("ci_hi"),
        )
        .join(F.broadcast(meds), "event_type")
        .select("event_type", "n", "median_value", "ci_lo", "ci_hi", "k_lo", "k_hi")
    )


# ---------------------------------------------------------------------------
# Wald SPRT monitor — the SEQUENTIAL member of the testing family
# (z-test/CUPED/QTE are fixed-horizon): cumulative log-likelihood
# ratio of daily purchase-share against pre-registered H0/H1 rates,
# with the Wald decision boundaries and the first crossing day.  The
# per-trial log terms are Python-computed 1e-9 literals and the walk
# accumulates as DECIMAL, so the day a boundary is crossed — the whole
# point of sequential testing — is engine-identical.
# ---------------------------------------------------------------------------

_SPRT_P0, _SPRT_P1 = 0.19, 0.21  # pre-registered null / alternative share
_SPRT_L1 = round(__import__("math").log(_SPRT_P1 / _SPRT_P0), 9)  # per success
_SPRT_L0 = round(__import__("math").log((1 - _SPRT_P1) / (1 - _SPRT_P0)), 9)  # per failure
_SPRT_BOUND = round(__import__("math").log(0.95 / 0.05), 9)  # alpha = beta = 0.05

_SPRT_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS n_trials,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_success
  FROM events GROUP BY 1
),
walk AS (
  SELECT d, n_trials, n_success,
         CAST(CAST(SUM(CAST(round(n_success * {_SPRT_L1}
                                   + (n_trials - n_success) * {_SPRT_L0}, 9) AS DECIMAL(38, 9)))
                   OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS VARCHAR) AS DOUBLE) AS llr
  FROM daily
),
flagged AS (
  SELECT *, CASE WHEN llr >= {_SPRT_BOUND} THEN 'accept_h1'
                 WHEN llr <= -{_SPRT_BOUND} THEN 'accept_h0'
                 ELSE 'continue' END AS state
  FROM walk
)
SELECT d, n_trials, n_success, round(llr, 6) AS llr, state,
       (SELECT MIN(d) FROM flagged f2 WHERE f2.state <> 'continue') AS first_decision_day
FROM flagged
"""


@register("sprt_ab_monitor", _SPRT_SQL)
def q_sprt_ab_monitor(spark, sf_dir):
    """Daily Wald SPRT walk on the purchase share (H0 p={_SPRT_P0} vs
    H1 p={_SPRT_P1}, α=β=0.05): per day the trial/success counts, the
    cumulative log-likelihood ratio, the boundary state, and the first
    decision day (null if the walk never leaves the continue band —
    the fixture sits near the indifference point by design, the regime
    where sequential monitoring earns its keep).

    Scale plan: one map-side-combined daily aggregate over the fact
    stream; the walk is a cumulative window over |days| rows with
    DECIMAL accumulation of pre-quantized increments — the corpus is
    touched once however long the experiment runs."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("n_trials"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_success"),
    )
    from pyspark.sql import Window

    inc = F.round(
        F.col("n_success") * F.lit(_SPRT_L1)
        + (F.col("n_trials") - F.col("n_success")) * F.lit(_SPRT_L0),
        9,
    )
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    walk = daily.select(
        "d",
        "n_trials",
        "n_success",
        F.sum(inc.cast("decimal(38, 9)"))
        .over(wcum)
        .cast("string")
        .cast("double")
        .alias("llr"),
    )
    flagged = walk.select(
        "*",
        F.when(F.col("llr") >= _SPRT_BOUND, "accept_h1")
        .when(F.col("llr") <= -_SPRT_BOUND, "accept_h0")
        .otherwise("continue")
        .alias("state"),
    ).localCheckpoint(eager=False)  # feeds the rows AND the first-decision scalar
    first = flagged.filter(F.col("state") != "continue").agg(
        F.min("d").alias("first_decision_day")
    )
    return (
        flagged.crossJoin(F.broadcast(first))
        .select(
            "d",
            "n_trials",
            "n_success",
            F.round("llr", 6).alias("llr"),
            "state",
            "first_decision_day",
        )
    )


# ---------------------------------------------------------------------------
# Propensity-weighted causal effect (IPW / Hájek estimator): the
# observational-data complement to the randomized-experiment readouts
# (`ab_cuped_readout`, `diff_in_diff_readout`).  The propensity model
# P(urgent | month, finished) is fitted by the SAME unrolled IRLS as
# `logreg_irls_exact`, then the treated/control outcome means are
# reweighted by 1/p and 1/(1-p) — every per-row weight quantized to
# the 1e-9 grid and DECIMAL-summed, so fit and estimate are bit-exact
# across engines and partitionings.
# ---------------------------------------------------------------------------

_IPW_SRC = """
  SELECT CAST(EXTRACT(month FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS x1,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS x2,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y,
         CAST(o_totalprice AS DOUBLE) AS yo
  FROM orders
"""


def _ipw_sql(iters: int = _IRLS_T) -> str:
    parts = [f"s AS ({_IPW_SRC})", "b0_ AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2)"]
    for i in range(1, iters + 1):
        parts.append(
            f"r{i} AS (SELECT x1, x2, y, {_IRLS_P} AS p, b0, b1, b2 "
            f"FROM s CROSS JOIN b{i-1}_)"
        )
        parts.append(
            f"a{i} AS (SELECT ANY_VALUE(b0) AS b0, ANY_VALUE(b1) AS b1, ANY_VALUE(b2) AS b2, "
            f"{_irls_q9_sum('p * (1.0 - p)')} AS n, "
            f"{_irls_q9_sum('p * (1.0 - p) * x1')} AS s1, "
            f"{_irls_q9_sum('p * (1.0 - p) * x2')} AS s2, "
            f"{_irls_q9_sum('p * (1.0 - p) * x1 * x1')} AS s11, "
            f"{_irls_q9_sum('p * (1.0 - p) * x1 * x2')} AS s12, "
            f"{_irls_q9_sum('p * (1.0 - p) * x2 * x2')} AS s22, "
            f"{_irls_q9_sum('(y - p)')} AS sy, "
            f"{_irls_q9_sum('(y - p) * x1')} AS s1y, "
            f"{_irls_q9_sum('(y - p) * x2')} AS s2y "
            f"FROM r{i})"
        )
        parts.append(
            f"b{i}_ AS (SELECT b0 + {_OLS_B0} AS b0, b1 + {_OLS_B1} AS b1, "
            f"b2 + {_OLS_B2} AS b2 FROM a{i})"
        )
    t = iters
    parts.append(
        f"rf AS (SELECT x1, x2, y, yo, {_IRLS_P} AS p FROM s CROSS JOIN b{t}_)"
    )
    parts.append(
        "ipw AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(y) AS BIGINT) AS n_treated, "
        + _irls_q9_sum("y / p")
        + " AS sw_t, "
        + _irls_q9_sum("y * yo / p")
        + " AS swy_t, "
        + _irls_q9_sum("(1 - y) / (1.0 - p)")
        + " AS sw_c, "
        + _irls_q9_sum("(1 - y) * yo / (1.0 - p)")
        + " AS swy_c FROM rf)"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT i.n, i.n_treated,
       round(b.b0, 6) AS b_intercept,
       round(b.b1, 6) AS b_month,
       round(b.b2, 6) AS b_fstatus,
       round(i.swy_t / i.sw_t, 6) AS mean_treated_ipw,
       round(i.swy_c / i.sw_c, 6) AS mean_control_ipw,
       round(i.swy_t / i.sw_t - i.swy_c / i.sw_c, 6) AS ate_ipw
FROM b{t}_ b CROSS JOIN ipw i
"""
    )


@register("propensity_ipw_ate", _ipw_sql())
def q_propensity_ipw_ate(spark, sf_dir):
    """Average treatment effect of URGENT priority on order value by
    inverse-propensity weighting (Horvitz-Thompson weights, Hájek
    normalization): the propensity P(urgent | month, finished-status)
    is fitted by three unrolled Newton/IRLS steps (the
    `logreg_irls_exact` template verbatim), then treated and control
    means are reweighted by 1/p and 1/(1-p).  The sigmoid's 1e-9 clamp
    doubles as the standard IPW overlap clamp.

    Scale plan: T+1 map-side-combined fact scans (T Newton steps + one
    weighted-mean pass) with a 3-coefficient 1-row broadcast between
    passes — identical shape to `quality_classifier_filter`; nothing
    driver-side but the 1-row beta."""
    o = load_table(spark, sf_dir, "orders")
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    src = o.select(
        F.month(F.col("o_orderdate").cast("date")).cast("long").alias("x1"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("x2"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("y"),
        F.col("o_totalprice").cast("double").alias("yo"),
    )

    def q9_sum(term):
        return to_d(F.sum(F.round(term, 9).cast("decimal(38, 9)")))

    beta = src.sparkSession.range(1).select(
        F.lit(0.0).alias("b0"), F.lit(0.0).alias("b1"), F.lit(0.0).alias("b2")
    )
    p_expr = F.expr(_IRLS_P)
    for _ in range(_IRLS_T):
        r = src.crossJoin(F.broadcast(beta)).withColumn("p", p_expr)
        w = F.col("p") * (1.0 - F.col("p"))
        resid = F.col("y") - F.col("p")
        a = r.agg(
            F.first("b0").alias("b0"),
            F.first("b1").alias("b1"),
            F.first("b2").alias("b2"),
            q9_sum(w).alias("n"),
            q9_sum(w * F.col("x1")).alias("s1"),
            q9_sum(w * F.col("x2")).alias("s2"),
            q9_sum(w * F.col("x1") * F.col("x1")).alias("s11"),
            q9_sum(w * F.col("x1") * F.col("x2")).alias("s12"),
            q9_sum(w * F.col("x2") * F.col("x2")).alias("s22"),
            q9_sum(resid).alias("sy"),
            q9_sum(resid * F.col("x1")).alias("s1y"),
            q9_sum(resid * F.col("x2")).alias("s2y"),
        )
        beta = a.select(
            (F.col("b0") + F.expr(_OLS_B0)).alias("b0"),
            (F.col("b1") + F.expr(_OLS_B1)).alias("b1"),
            (F.col("b2") + F.expr(_OLS_B2)).alias("b2"),
        )
    beta = beta.localCheckpoint(eager=True)
    rf = src.crossJoin(F.broadcast(beta)).withColumn("p", p_expr)
    t_col, p_col, yo = F.col("y"), F.col("p"), F.col("yo")
    agg = rf.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_treated"),
        F.round(F.first("b0"), 6).alias("b_intercept"),
        F.round(F.first("b1"), 6).alias("b_month"),
        F.round(F.first("b2"), 6).alias("b_fstatus"),
        q9_sum(t_col / p_col).alias("sw_t"),
        q9_sum(t_col * yo / p_col).alias("swy_t"),
        q9_sum((1 - t_col) / (1.0 - p_col)).alias("sw_c"),
        q9_sum((1 - t_col) * yo / (1.0 - p_col)).alias("swy_c"),
    )
    return agg.select(
        "n",
        "n_treated",
        "b_intercept",
        "b_month",
        "b_fstatus",
        F.round(F.col("swy_t") / F.col("sw_t"), 6).alias("mean_treated_ipw"),
        F.round(F.col("swy_c") / F.col("sw_c"), 6).alias("mean_control_ipw"),
        F.round(
            F.col("swy_t") / F.col("sw_t") - F.col("swy_c") / F.col("sw_c"), 6
        ).alias("ate_ipw"),
    )


# ---------------------------------------------------------------------------
# Doubly-robust (AIPW) treatment effect: augments the IPW estimate
# with per-arm OLS outcome models, so the estimate stays consistent if
# EITHER the propensity model OR the outcome model is right (Robins,
# Rotnitzky & Zhao 1994).  Propensity = the `logreg_irls_exact`
# template; outcome models = the `ols_regression_exact` closed-form
# template fitted separately on treated and control rows; the
# augmented per-row term is quantized at 1e-9 and DECIMAL-summed.
# ---------------------------------------------------------------------------


def _aipw_moments_sql(pred: str) -> str:
    return f"""
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(CAST(SUM(x1) AS VARCHAR) AS DOUBLE) AS s1,
         CAST(CAST(SUM(x2) AS VARCHAR) AS DOUBLE) AS s2,
         CAST(CAST(SUM(x1 * x1) AS VARCHAR) AS DOUBLE) AS s11,
         CAST(CAST(SUM(x1 * x2) AS VARCHAR) AS DOUBLE) AS s12,
         CAST(CAST(SUM(x2 * x2) AS VARCHAR) AS DOUBLE) AS s22,
         CAST(CAST(SUM(yd) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(x1 * yd) AS VARCHAR) AS DOUBLE) AS s1y,
         CAST(CAST(SUM(x2 * yd) AS VARCHAR) AS DOUBLE) AS s2y
  FROM (SELECT x1, x2, CAST(yo AS DECIMAL(30, 6)) AS yd FROM s WHERE {pred})
"""


_AIPW_DR = (
    "((a0 + a1 * x1 + a2 * x2) - (c0 + c1 * x1 + c2 * x2)"
    " + y * (yo - (a0 + a1 * x1 + a2 * x2)) / p"
    " - (1 - y) * (yo - (c0 + c1 * x1 + c2 * x2)) / (1.0 - p))"
)


def _aipw_sql(iters: int = _IRLS_T) -> str:
    parts = [f"s AS ({_IPW_SRC})", "b0_ AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2)"]
    for i in range(1, iters + 1):
        parts.append(
            f"r{i} AS (SELECT x1, x2, y, {_IRLS_P} AS p, b0, b1, b2 "
            f"FROM s CROSS JOIN b{i-1}_)"
        )
        parts.append(
            f"a{i} AS (SELECT ANY_VALUE(b0) AS b0, ANY_VALUE(b1) AS b1, ANY_VALUE(b2) AS b2, "
            f"{_irls_q9_sum('p * (1.0 - p)')} AS n, "
            f"{_irls_q9_sum('p * (1.0 - p) * x1')} AS s1, "
            f"{_irls_q9_sum('p * (1.0 - p) * x2')} AS s2, "
            f"{_irls_q9_sum('p * (1.0 - p) * x1 * x1')} AS s11, "
            f"{_irls_q9_sum('p * (1.0 - p) * x1 * x2')} AS s12, "
            f"{_irls_q9_sum('p * (1.0 - p) * x2 * x2')} AS s22, "
            f"{_irls_q9_sum('(y - p)')} AS sy, "
            f"{_irls_q9_sum('(y - p) * x1')} AS s1y, "
            f"{_irls_q9_sum('(y - p) * x2')} AS s2y "
            f"FROM r{i})"
        )
        parts.append(
            f"b{i}_ AS (SELECT b0 + {_OLS_B0} AS b0, b1 + {_OLS_B1} AS b1, "
            f"b2 + {_OLS_B2} AS b2 FROM a{i})"
        )
    t = iters
    parts.append(f"mtm AS ({_aipw_moments_sql('y = 1')})")
    parts.append(
        f"mt AS (SELECT {_OLS_B0} AS a0, {_OLS_B1} AS a1, {_OLS_B2} AS a2 FROM mtm)"
    )
    parts.append(f"mcm AS ({_aipw_moments_sql('y = 0')})")
    parts.append(
        f"mc AS (SELECT {_OLS_B0} AS c0, {_OLS_B1} AS c1, {_OLS_B2} AS c2 FROM mcm)"
    )
    parts.append(
        f"rf AS (SELECT x1, x2, y, yo, {_IRLS_P} AS p, a0, a1, a2, c0, c1, c2 "
        f"FROM s CROSS JOIN b{t}_ CROSS JOIN mt CROSS JOIN mc)"
    )
    parts.append(
        "fin AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(y) AS BIGINT) AS n_treated, "
        "ANY_VALUE(a0) AS a0, ANY_VALUE(c0) AS c0, "
        + _irls_q9_sum(_AIPW_DR)
        + " AS sdr FROM rf)"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT f.n, f.n_treated,
       round(f.a0, 6) AS mt_intercept,
       round(f.c0, 6) AS mc_intercept,
       round(b.b0, 6) AS ps_intercept,
       round(f.sdr / f.n, 6) AS ate_aipw
FROM fin f CROSS JOIN b{t}_ b
"""
    )


@register("aipw_doubly_robust_ate", _aipw_sql())
def q_aipw_doubly_robust_ate(spark, sf_dir):
    """Doubly-robust (AIPW) average treatment effect of URGENT
    priority on order value: the IPW estimate augmented with per-arm
    OLS outcome models m1/m0(month, finished-status), consistent if
    either model is correctly specified.  Propensity comes from the
    `logreg_irls_exact` unrolled-Newton template, the outcome models
    from the `ols_regression_exact` closed-form template on the
    treated/control splits, and the per-row augmented term rides the
    1e-9 DECIMAL grid.

    Scale plan: T Newton scans + ONE grouped-moment scan for both
    outcome models + one estimation scan, with three 1-row coefficient
    relations broadcast into the final pass — every pass map-side
    combined; nothing driver-side but 1-row betas."""
    o = load_table(spark, sf_dir, "orders")
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    src = o.select(
        F.month(F.col("o_orderdate").cast("date")).cast("long").alias("x1"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("x2"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("y"),
        F.col("o_totalprice").cast("double").alias("yo"),
    )

    def q9_sum(term):
        return to_d(F.sum(F.round(term, 9).cast("decimal(38, 9)")))

    beta = src.sparkSession.range(1).select(
        F.lit(0.0).alias("b0"), F.lit(0.0).alias("b1"), F.lit(0.0).alias("b2")
    )
    p_expr = F.expr(_IRLS_P)
    for _ in range(_IRLS_T):
        r = src.crossJoin(F.broadcast(beta)).withColumn("p", p_expr)
        w = F.col("p") * (1.0 - F.col("p"))
        resid = F.col("y") - F.col("p")
        a = r.agg(
            F.first("b0").alias("b0"),
            F.first("b1").alias("b1"),
            F.first("b2").alias("b2"),
            q9_sum(w).alias("n"),
            q9_sum(w * F.col("x1")).alias("s1"),
            q9_sum(w * F.col("x2")).alias("s2"),
            q9_sum(w * F.col("x1") * F.col("x1")).alias("s11"),
            q9_sum(w * F.col("x1") * F.col("x2")).alias("s12"),
            q9_sum(w * F.col("x2") * F.col("x2")).alias("s22"),
            q9_sum(resid).alias("sy"),
            q9_sum(resid * F.col("x1")).alias("s1y"),
            q9_sum(resid * F.col("x2")).alias("s2y"),
        )
        beta = a.select(
            (F.col("b0") + F.expr(_OLS_B0)).alias("b0"),
            (F.col("b1") + F.expr(_OLS_B1)).alias("b1"),
            (F.col("b2") + F.expr(_OLS_B2)).alias("b2"),
        )
    beta = beta.localCheckpoint(eager=True)

    def _ols_arm(pred, names):
        yd = F.col("yo").cast("decimal(30, 6)")
        m = src.filter(pred).agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            to_d(F.sum("x1")).alias("s1"),
            to_d(F.sum("x2")).alias("s2"),
            to_d(F.sum(F.col("x1") * F.col("x1"))).alias("s11"),
            to_d(F.sum(F.col("x1") * F.col("x2"))).alias("s12"),
            to_d(F.sum(F.col("x2") * F.col("x2"))).alias("s22"),
            to_d(F.sum(yd)).alias("sy"),
            to_d(F.sum(F.col("x1") * yd)).alias("s1y"),
            to_d(F.sum(F.col("x2") * yd)).alias("s2y"),
        )
        return m.select(
            F.expr(_OLS_B0).alias(names[0]),
            F.expr(_OLS_B1).alias(names[1]),
            F.expr(_OLS_B2).alias(names[2]),
        ).localCheckpoint(eager=True)

    mt = _ols_arm(F.col("y") == 1, ("a0", "a1", "a2"))
    mc = _ols_arm(F.col("y") == 0, ("c0", "c1", "c2"))
    rf = (
        src.crossJoin(F.broadcast(beta))
        .withColumn("p", p_expr)
        .crossJoin(F.broadcast(mt))
        .crossJoin(F.broadcast(mc))
    )
    fin = rf.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_treated"),
        F.round(F.first("a0"), 6).alias("mt_intercept"),
        F.round(F.first("c0"), 6).alias("mc_intercept"),
        F.round(F.first("b0"), 6).alias("ps_intercept"),
        q9_sum(F.expr(_AIPW_DR)).alias("sdr"),
    )
    return fin.select(
        "n",
        "n_treated",
        "mt_intercept",
        "mc_intercept",
        "ps_intercept",
        F.round(F.col("sdr") / F.col("n"), 6).alias("ate_aipw"),
    )


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR screen: one Welch z-test per event_type
# (A/B split by event_id parity), normal p-values via the
# Abramowitz-Stegun 7.1.26 erf polynomial (one shared template, so
# libm differences cannot leak), then the BH step-up at q = 0.10 over
# the tiny per-type relation.
# ---------------------------------------------------------------------------

_BH_Q = 0.10

# erf(x) ~ 1 - poly(1/(1+0.3275911 x)) * exp(-x^2), max abs err 1.5e-7
# (Abramowitz & Stegun 7.1.26); p = 1 - erf(|z| / sqrt(2)) quantized
# to the 1e-9 grid AFTER the exp, the same discipline as _IRLS_P.
_BH_ERF_T = "(1.0 / (1.0 + 0.3275911 * bh_x))"
_BH_P = (
    "round(((((1.061405429 * bh_t - 1.453152027) * bh_t + 1.421413741)"
    " * bh_t - 0.284496736) * bh_t + 0.254829592) * bh_t"
    " * exp(-(bh_x * bh_x)), 9)"
)
# Welch z over per-side moments (n/sv/svv per side a, b) — one shared
# expression tree: side variance then the z statistic.
_BH_VAR = "(({p}svv - {p}sv * {p}sv / {p}n) / ({p}n - 1.0))"
_BH_Z = (
    f"round((a_sv / a_n - b_sv / b_n) /"
    f" sqrt({_BH_VAR.format(p='a_')} / a_n + {_BH_VAR.format(p='b_')} / b_n), 9)"
)


def _bh_sql() -> str:
    side = lambda p, g: (  # noqa: E731
        f"SUM(CASE WHEN grp = {g} THEN 1 ELSE 0 END) * 1.0 AS {p}n,\n"
        f"  {_irls_q9_sum(f'CASE WHEN grp = {g} THEN v END')} AS {p}sv,\n"
        f"  {_irls_q9_sum(f'CASE WHEN grp = {g} THEN v * v END')} AS {p}svv"
    )
    return f"""
WITH s AS (
  SELECT event_type, CAST(event_id % 2 AS BIGINT) AS grp,
         CAST(value AS DOUBLE) AS v
  FROM events
),
m AS (
  SELECT event_type,
  {side('a_', 0)},
  {side('b_', 1)}
  FROM s GROUP BY event_type
),
z_ AS (
  SELECT event_type, CAST(a_n AS BIGINT) AS n_a, CAST(b_n AS BIGINT) AS n_b,
         round(a_sv / a_n - b_sv / b_n, 6) AS mean_diff,
         {_BH_Z} AS z
  FROM m
),
p_ AS (
  SELECT *, {_BH_P} AS p_value
  FROM (SELECT *, {_BH_ERF_T} AS bh_t
        FROM (SELECT *, abs(z) / sqrt(2.0) AS bh_x FROM z_))
),
r_ AS (
  SELECT event_type, n_a, n_b, mean_diff, round(z, 6) AS z_stat, p_value,
         CAST(ROW_NUMBER() OVER (ORDER BY p_value, event_type) AS BIGINT)
           AS bh_rank,
         CAST(COUNT(*) OVER () AS BIGINT) AS n_tests
  FROM p_
)
SELECT event_type, n_a, n_b, mean_diff, z_stat, p_value, bh_rank,
       CAST(CASE WHEN bh_rank <= MAX(CASE WHEN p_value <= bh_rank * {_BH_Q}
                                               / n_tests
                                          THEN bh_rank ELSE 0 END) OVER ()
                 THEN 1 ELSE 0 END AS BIGINT) AS rejected
FROM r_
ORDER BY bh_rank
"""


@register("fdr_bh_metric_screen", _bh_sql())
def q_fdr_bh_metric_screen(spark, sf_dir):
    """Multiple-testing screen with Benjamini-Hochberg FDR control
    (Benjamini & Hochberg 1995): per event_type, a Welch z-test of
    mean(value) between the even/odd event_id halves (a deterministic
    A/A-style split), p-values from the Abramowitz-Stegun 7.1.26 erf
    polynomial, then the BH step-up at q = 0.10 — reject the smallest
    k p-values where p_(k) <= k·q/m.  Per-side moments ride the 1e-9
    DECIMAL grid; z and p are quantized AFTER the sqrt/exp so libm
    last-ulp differences cannot cross engines.

    Scale plan: ONE map-side combined group-by on event_type builds
    all moments; the BH ranking windows run over the |types|-row
    relation (≤ a few hundred metrics in practice), never the fact
    grain."""
    ev = load_table(spark, sf_dir, "events")
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    s = ev.select(
        "event_type",
        (F.col("event_id") % 2).cast("long").alias("grp"),
        F.col("value").cast("double").alias("v"),
    )

    def q9_sum(term):
        return to_d(F.sum(F.round(term, 9).cast("decimal(38, 9)")))

    def side(p, g):
        only = lambda t: F.when(F.col("grp") == g, t)  # noqa: E731
        return [
            F.count(only(F.lit(1))).cast("double").alias(f"{p}n"),
            q9_sum(only(F.col("v"))).alias(f"{p}sv"),
            q9_sum(only(F.col("v") * F.col("v"))).alias(f"{p}svv"),
        ]

    m = s.groupBy("event_type").agg(*(side("a_", 0) + side("b_", 1)))
    z = m.select(
        "event_type",
        F.col("a_n").cast("long").alias("n_a"),
        F.col("b_n").cast("long").alias("n_b"),
        F.round(F.col("a_sv") / F.col("a_n") - F.col("b_sv") / F.col("b_n"), 6).alias(
            "mean_diff"
        ),
        F.expr(_BH_Z).alias("z"),
    )
    p = (
        z.withColumn("bh_x", F.abs(F.col("z")) / F.sqrt(F.lit(2.0)))
        .withColumn("bh_t", F.expr(_BH_ERF_T))
        .withColumn("p_value", F.expr(_BH_P))
    )
    w_rank = Window.orderBy("p_value", "event_type")
    r = p.select(
        "event_type",
        "n_a",
        "n_b",
        "mean_diff",
        F.round(F.col("z"), 6).alias("z_stat"),
        "p_value",
        F.row_number().over(w_rank).cast("long").alias("bh_rank"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("n_tests"),
    )
    w_all = Window.partitionBy()
    k_max = F.max(
        F.when(
            F.col("p_value") <= F.col("bh_rank") * _BH_Q / F.col("n_tests"),
            F.col("bh_rank"),
        ).otherwise(0)
    ).over(w_all)
    return (
        r.withColumn(
            "rejected",
            F.when(F.col("bh_rank") <= k_max, 1).otherwise(0).cast("long"),
        )
        .drop("n_tests")
        .orderBy("bh_rank")
    )


# ---------------------------------------------------------------------------
# Cox proportional hazards, fitted EXACTLY by unrolled Newton on the
# partial likelihood (Breslow tie handling) — the regression
# counterpart of `kaplan_meier_repeat_purchase`, sharing its
# time-to-next-order / right-censoring construction.  With one binary
# covariate the score and information at each event time depend only
# on (d, s1, n0, n1), so the whole fit runs on the per-distinct-time
# relation.
# ---------------------------------------------------------------------------

_COX_T = 3  # Newton iterations, unrolled on both engines

_COX_EB = "round(exp(b), 9)"  # hazard ratio on the 1e-9 grid
_COX_U = f"(s1 - d * (n1 * {_COX_EB}) / (n0 + n1 * {_COX_EB}))"
_COX_I = (
    f"(d * (n0 * n1 * {_COX_EB})"
    f" / ((n0 + n1 * {_COX_EB}) * (n0 + n1 * {_COX_EB})))"
)


def _cox_sql(iters: int = _COX_T) -> str:
    pre = """
WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
g AS (
  SELECT date_diff('day', CAST(o_orderdate AS DATE),
           LEAD(CAST(o_orderdate AS DATE)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) AS gap,
         date_diff('day', CAST(o_orderdate AS DATE), mx.maxd) AS to_end,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS x
  FROM orders CROSS JOIN mx
),
obs AS (
  SELECT CASE WHEN gap IS NULL THEN to_end ELSE gap END AS t,
         CASE WHEN gap IS NULL THEN 0 ELSE 1 END AS d, x
  FROM g
),
per_t AS (
  SELECT t, SUM(d) AS d, SUM(d * x) AS s1, SUM(x) AS m1, SUM(1 - x) AS m0
  FROM obs GROUP BY t
),
risk AS (
  SELECT t, d, s1,
         SUM(m0) OVER () - COALESCE(SUM(m0) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n0,
         SUM(m1) OVER () - COALESCE(SUM(m1) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n1
  FROM per_t
),
ev AS (
  SELECT CAST(d AS DOUBLE) AS d, CAST(s1 AS DOUBLE) AS s1,
         CAST(n0 AS DOUBLE) AS n0, CAST(n1 AS DOUBLE) AS n1
  FROM risk WHERE d > 0
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_obs, CAST(SUM(d) AS BIGINT) AS n_events
  FROM obs
),
b0_ AS (SELECT 0.0 AS b)"""
    parts = [pre]
    for i in range(1, iters + 1):
        parts.append(
            f"i{i} AS (SELECT ANY_VALUE(b) AS b, {_irls_q9_sum(_COX_U)} AS su, "
            f"{_irls_q9_sum(_COX_I)} AS si FROM ev CROSS JOIN b{i-1}_)"
        )
        parts.append(f"b{i}_ AS (SELECT round(b + su / si, 9) AS b FROM i{i})")
    t = iters
    parts.append(
        f"fin AS (SELECT ANY_VALUE(b) AS b, {_irls_q9_sum(_COX_I)} AS si "
        f"FROM ev CROSS JOIN b{t}_)"
    )
    return (
        ",\n".join(parts)
        + """
SELECT tot.n_obs, tot.n_events,
       round(fin.b, 6) AS beta_urgent,
       round(exp(fin.b), 6) AS hazard_ratio,
       round(1.0 / sqrt(fin.si), 6) AS se_beta
FROM fin CROSS JOIN tot
"""
    )


@register("cox_ph_exact", _cox_sql())
def q_cox_ph_exact(spark, sf_dir):
    """Cox proportional-hazards fit of reorder speed on the URGENT
    flag of the index order (Cox 1972, Breslow ties), trained EXACTLY
    by three unrolled Newton steps on the partial likelihood.  Shares
    `kaplan_meier_repeat_purchase`'s observation construction (gap to
    next order = event, distance to dataset end = censored).  With a
    binary covariate, each event time contributes score
    s1 - d·n1·e^β/(n0+n1·e^β) and information
    d·n0·n1·e^β/(n0+n1·e^β)² — both generated from ONE template, e^β
    and every per-time term quantized to the 1e-9 grid and
    DECIMAL-summed, β re-quantized each step.  Outputs β, the hazard
    ratio, and the inverse-information standard error.

    Scale plan: one LEAD window per customer builds observations; the
    per-distinct-time relation (calendar-bounded, ≪ rows) carries the
    at-risk prefix windows AND all three Newton iterations — the fact
    table is scanned once, the iterations never touch it."""
    o = load_table(spark, sf_dir, "orders")
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    mx = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("maxd"))
    w_cust = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.crossJoin(F.broadcast(mx)).select(
        F.datediff(
            F.lead(F.col("o_orderdate").cast("date")).over(w_cust),
            F.col("o_orderdate").cast("date"),
        ).alias("gap"),
        F.datediff(F.col("maxd"), F.col("o_orderdate").cast("date")).alias("to_end"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("x"),
    )
    obs = g.select(
        F.coalesce(F.col("gap"), F.col("to_end")).alias("t"),
        F.when(F.col("gap").isNull(), 0).otherwise(1).alias("d"),
        "x",
    )
    per_t = obs.groupBy("t").agg(
        F.sum("d").alias("d"),
        F.sum(F.col("d") * F.col("x")).alias("s1"),
        F.sum("x").alias("m1"),
        F.sum(1 - F.col("x")).alias("m0"),
    )
    w_all = Window.partitionBy()
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    at_risk = lambda c: (  # noqa: E731
        F.sum(c).over(w_all) - F.coalesce(F.sum(c).over(w_prev), F.lit(0))
    )
    ev = (
        per_t.select(
            F.col("d").cast("double").alias("d"),
            F.col("s1").cast("double").alias("s1"),
            at_risk(F.col("m0")).cast("double").alias("n0"),
            at_risk(F.col("m1")).cast("double").alias("n1"),
        )
        .filter(F.col("d") > 0)
        .localCheckpoint(eager=True)
    )

    def q9_sum(expr):
        return to_d(F.sum(F.round(F.expr(expr), 9).cast("decimal(38, 9)")))

    beta = ev.sparkSession.range(1).select(F.lit(0.0).alias("b"))
    for _ in range(_COX_T):
        it = ev.crossJoin(F.broadcast(beta)).agg(
            F.first("b").alias("b"),
            q9_sum(_COX_U).alias("su"),
            q9_sum(_COX_I).alias("si"),
        )
        beta = it.select(
            F.round(F.col("b") + F.col("su") / F.col("si"), 9).alias("b")
        )
    fin = ev.crossJoin(F.broadcast(beta)).agg(
        F.first("b").alias("b"), q9_sum(_COX_I).alias("si")
    )
    tot = obs.agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum("d").cast("long").alias("n_events"),
    )
    return fin.crossJoin(F.broadcast(tot)).select(
        "n_obs",
        "n_events",
        F.round(F.col("b"), 6).alias("beta_urgent"),
        F.round(F.exp(F.col("b")), 6).alias("hazard_ratio"),
        F.round(1.0 / F.sqrt(F.col("si")), 6).alias("se_beta"),
    )


# ---------------------------------------------------------------------------
# Mahalanobis outliers: the MULTIVARIATE complement of
# `value_outliers_3sigma` / `value_outliers_mad` — rank lineitems by
# their Mahalanobis distance under the exact 2-D covariance of
# (quantity, extendedprice), catching points that are unremarkable on
# each axis but violate the correlation structure.
# ---------------------------------------------------------------------------

_MAHA_TOPK = 20
# one shared distance template over the moment columns (n/sx/sy/sxx/
# sxy/syy are correctly-rounded doubles of exact decimal sums; x/y are
# the raw parquet doubles) — identical expression tree on both engines
_MAHA_D2 = (
    "((cyy * (x - mx) * (x - mx) - 2.0 * cxy * (x - mx) * (y - my)"
    " + cxx * (y - my) * (y - my)) / (cxx * cyy - cxy * cxy))"
)
_MAHA_COV = (
    "SELECT sx / n AS mx, sy / n AS my,"
    " (sxx - sx * sx / n) / (n - 1.0) AS cxx,"
    " (sxy - sx * sy / n) / (n - 1.0) AS cxy,"
    " (syy - sy * sy / n) / (n - 1.0) AS cyy FROM m"
)


def _maha_sql() -> str:
    dx = "CAST(l_quantity AS DECIMAL(19, 6))"
    dy = "CAST(l_extendedprice AS DECIMAL(19, 6))"
    d = lambda e: f"CAST(CAST(SUM({e}) AS VARCHAR) AS DOUBLE)"  # noqa: E731
    return f"""
WITH m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         {d(dx)} AS sx, {d(dy)} AS sy,
         {d(f'{dx} * {dx}')} AS sxx,
         {d(f'{dx} * {dy}')} AS sxy,
         {d(f'{dy} * {dy}')} AS syy
  FROM lineitem
),
c AS ({_MAHA_COV})
SELECT l_orderkey, l_linenumber,
       round(CAST(l_quantity AS DOUBLE), 2) AS quantity,
       round(CAST(l_extendedprice AS DOUBLE), 2) AS extendedprice,
       round(d2, 6) AS mahalanobis_d2
FROM (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
         {_MAHA_D2} AS d2
  FROM (SELECT l_orderkey, l_linenumber, l_quantity,
               CAST(l_quantity AS DOUBLE) AS x,
               l_extendedprice, CAST(l_extendedprice AS DOUBLE) AS y
        FROM lineitem) CROSS JOIN c
)
ORDER BY d2 DESC, l_orderkey, l_linenumber
LIMIT {_MAHA_TOPK}
"""


@register("mahalanobis_outlier_topk", _maha_sql())
def q_mahalanobis_outlier_topk(spark, sf_dir):
    """Top-{k} multivariate outliers by Mahalanobis distance under the
    exact sample covariance of (l_quantity, l_extendedprice): the 2-D
    closed-form d² = (x-μ)ᵀ Σ⁻¹ (x-μ) expanded through the adjugate —
    one template string on both engines — with moments accumulated as
    exact decimals (the `corr_qty_price` discipline) and each row's d²
    a single shared double expression tree.

    Scale plan: pass 1 is ONE map-side combined moment aggregate; the
    1-row covariance relation broadcasts onto pass 2's scoring scan;
    the cut is TakeOrderedAndProject (per-partition heaps).  Higher
    dimensions swap the adjugate for a broadcast precomputed Σ⁻¹ —
    the two-pass shape is unchanged."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(19, 6)"
    x = F.col("l_quantity").cast(dec)
    y = F.col("l_extendedprice").cast(dec)
    m = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("string").cast("double").alias("sx"),
        F.sum(y).cast("string").cast("double").alias("sy"),
        F.sum(x * x).cast("string").cast("double").alias("sxx"),
        F.sum(x * y).cast("string").cast("double").alias("sxy"),
        F.sum(y * y).cast("string").cast("double").alias("syy"),
    )
    cov = m.selectExpr(
        "sx / n AS mx",
        "sy / n AS my",
        "(sxx - sx * sx / n) / (n - 1.0) AS cxx",
        "(sxy - sx * sy / n) / (n - 1.0) AS cxy",
        "(syy - sy * sy / n) / (n - 1.0) AS cyy",
    )
    scored = (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            F.col("l_quantity").cast("double").alias("x"),
            F.col("l_extendedprice").cast("double").alias("y"),
        )
        .crossJoin(F.broadcast(cov))
        .withColumn("d2", F.expr(_MAHA_D2))
    )
    return (
        scored.orderBy(F.desc("d2"), "l_orderkey", "l_linenumber")
        .limit(_MAHA_TOPK)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_quantity").cast("double"), 2).alias("quantity"),
            F.round(F.col("l_extendedprice").cast("double"), 2).alias(
                "extendedprice"
            ),
            F.round(F.col("d2"), 6).alias("mahalanobis_d2"),
        )
    )


# ---------------------------------------------------------------------------
# Overdispersion check on daily event counts: the variance-to-mean
# (index of dispersion) per event_type over the FULL calendar span —
# zero-event days included, which is where the naive active-days-only
# computation silently biases low.  Dispersion ≫ 1 says the Poisson
# assumption behind rate alerting (`event_rate_anomaly`) is wrong and
# a negative-binomial threshold is needed.
# ---------------------------------------------------------------------------

_ODISP_SQL = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT CAST(date_diff('day', MIN(CAST(date_trunc('day', ts) AS DATE)),
                        MAX(CAST(date_trunc('day', ts) AS DATE))) + 1 AS BIGINT)
           AS n_span
  FROM events
),
per_type AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_active,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS ss
  FROM daily GROUP BY event_type
)
SELECT event_type,
       span.n_span AS n_days_span,
       n_active AS n_days_active,
       s AS n_events,
       round(CAST(s AS DOUBLE) / span.n_span, 6) AS mean_per_day,
       round((ss - CAST(s AS DOUBLE) * s / span.n_span)
             / (span.n_span - 1.0), 6) AS var_per_day,
       round(((ss - CAST(s AS DOUBLE) * s / span.n_span)
              / (span.n_span - 1.0)) / (CAST(s AS DOUBLE) / span.n_span), 6)
         AS dispersion_index
FROM per_type CROSS JOIN span
ORDER BY event_type
"""


@register("overdispersion_daily_counts", _ODISP_SQL)
def q_overdispersion_daily_counts(spark, sf_dir):
    """Index of dispersion (variance/mean) of daily counts per
    event_type over the full calendar span — zero days enter the
    moments as Σc and Σc² over N_span days (they add nothing to the
    sums but everything to the denominator), so no day table is ever
    materialized.  Counts are exact integers; the three output ratios
    share one expression tree.

    Scale plan: one map-side combined group-by to (type, day), a tiny
    per-type rollup, and a 1-row span relation broadcast in — the
    zero-day handling is pure arithmetic, not a calendar join."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    span = ev.agg(
        (
            F.datediff(
                F.max(F.date_trunc("day", "ts").cast("date")),
                F.min(F.date_trunc("day", "ts").cast("date")),
            )
            + 1
        )
        .cast("long")
        .alias("n_span")
    )
    per_type = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_active"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n_span")
    var = (F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("n_span")) / (
        F.col("n_span") - 1.0
    )
    return (
        per_type.crossJoin(F.broadcast(span))
        .select(
            "event_type",
            F.col("n_span").alias("n_days_span"),
            F.col("n_active").alias("n_days_active"),
            F.col("s").alias("n_events"),
            F.round(mean, 6).alias("mean_per_day"),
            F.round(var, 6).alias("var_per_day"),
            F.round(var / mean, 6).alias("dispersion_index"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Simpson's-paradox detector: the urgent→finished association overall
# vs within each order-month stratum — the aggregation-reversal audit
# every metrics platform should run before reporting a pooled rate
# difference (Simpson 1951).
# ---------------------------------------------------------------------------

_SIMPSON_SQL = """
WITH s AS (
  SELECT CAST(EXTRACT(month FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS month,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS t,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
),
cells AS (
  SELECT month,
         CAST(SUM(t) AS BIGINT) AS n_urgent,
         CAST(SUM(1 - t) AS BIGINT) AS n_other,
         CAST(SUM(t * y) AS BIGINT) AS f_urgent,
         CAST(SUM((1 - t) * y) AS BIGINT) AS f_other
  FROM s GROUP BY month
),
overall AS (
  SELECT CAST(SUM(f_urgent) AS DOUBLE) / SUM(n_urgent)
           - CAST(SUM(f_other) AS DOUBLE) / SUM(n_other) AS overall_diff
  FROM cells
)
SELECT month, n_urgent, n_other,
       round(CAST(f_urgent AS DOUBLE) / n_urgent, 6) AS rate_urgent,
       round(CAST(f_other AS DOUBLE) / n_other, 6) AS rate_other,
       round(CAST(f_urgent AS DOUBLE) / n_urgent
             - CAST(f_other AS DOUBLE) / n_other, 6) AS diff,
       round(overall_diff, 6) AS overall_diff,
       CAST(CASE WHEN (CAST(f_urgent AS DOUBLE) / n_urgent
                       - CAST(f_other AS DOUBLE) / n_other) * overall_diff < 0
                 THEN 1 ELSE 0 END AS BIGINT) AS sign_reversed
FROM cells CROSS JOIN overall
ORDER BY month
"""


@register("simpson_paradox_detector", _SIMPSON_SQL)
def q_simpson_paradox_detector(spark, sf_dir):
    """Aggregation-reversal audit (Simpson 1951): the pooled
    urgent-vs-other finished-rate difference next to the same contrast
    within every order-month stratum, flagging strata whose sign
    opposes the pooled one.  All rates are single IEEE divisions of
    exact counts.

    Scale plan: one map-side combined group-by to the 12-cell month
    grid; the pooled contrast is a second aggregate over THAT,
    broadcast back — the fact is scanned once."""
    o = load_table(spark, sf_dir, "orders")
    s = o.select(
        F.month(F.col("o_orderdate").cast("date")).cast("long").alias("month"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("t"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    cells = s.groupBy("month").agg(
        F.sum("t").cast("long").alias("n_urgent"),
        F.sum(1 - F.col("t")).cast("long").alias("n_other"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("f_urgent"),
        F.sum((1 - F.col("t")) * F.col("y")).cast("long").alias("f_other"),
    ).localCheckpoint(eager=True)  # 12 rows: the pooled pass reuses it
    overall = cells.agg(
        (
            F.sum("f_urgent").cast("double") / F.sum("n_urgent")
            - F.sum("f_other").cast("double") / F.sum("n_other")
        ).alias("overall_diff")
    )
    diff = F.col("f_urgent").cast("double") / F.col("n_urgent") - F.col(
        "f_other"
    ).cast("double") / F.col("n_other")
    return (
        cells.crossJoin(F.broadcast(overall))
        .select(
            "month",
            "n_urgent",
            "n_other",
            F.round(F.col("f_urgent").cast("double") / F.col("n_urgent"), 6).alias(
                "rate_urgent"
            ),
            F.round(F.col("f_other").cast("double") / F.col("n_other"), 6).alias(
                "rate_other"
            ),
            F.round(diff, 6).alias("diff"),
            F.round(F.col("overall_diff"), 6).alias("overall_diff"),
            F.when(diff * F.col("overall_diff") < 0, 1)
            .otherwise(0)
            .cast("long")
            .alias("sign_reversed"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# James-Stein shrinkage of per-source quality means (Efron & Morris
# 1975, positive-part): noisy per-source means pulled toward the grand
# mean by 1 - (k-3)·v/S — the estimator a mixture owner should use
# instead of raw per-source means when sources are small.  v uses the
# pooled within-source variance at the harmonic mean of the source
# sizes (documented approximation for unequal n).
# ---------------------------------------------------------------------------

_JS_SQL = """
WITH per_doc AS (
  SELECT source,
         round(CAST(length(regexp_replace(text, '[^0-9a-zA-Z]', '', 'g'))
                    AS DOUBLE) / CAST(length(text) AS DOUBLE), 9) AS q
  FROM documents WHERE length(text) > 0
),
per_src AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(CAST(q AS DECIMAL(38, 9))) AS VARCHAR) AS DOUBLE) AS sq,
         CAST(CAST(SUM(CAST(round(q * q, 9) AS DECIMAL(38, 9))) AS VARCHAR)
              AS DOUBLE) AS sqq
  FROM per_doc GROUP BY source
),
g AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS k,
         CAST(CAST(SUM(CAST(round(sq / n, 9) AS DECIMAL(38, 9))) AS VARCHAR)
              AS DOUBLE) AS sum_means,
         CAST(CAST(SUM(CAST(round(sqq - sq * sq / n, 9) AS DECIMAL(38, 9)))
                   AS VARCHAR) AS DOUBLE) AS sum_within,
         CAST(SUM(n - 1) AS DOUBLE) AS df_within,
         CAST(CAST(SUM(CAST(round(1.0 / n, 9) AS DECIMAL(38, 9))) AS VARCHAR)
              AS DOUBLE) AS sum_inv_n
  FROM per_src
),
g2 AS (
  SELECT k, sum_means / k AS grand, sum_within / df_within AS s2p,
         k / sum_inv_n AS h
  FROM g
),
spread AS (
  SELECT CAST(CAST(SUM(CAST(round((sq / n - g2.grand)
                                  * (sq / n - g2.grand), 9)
                            AS DECIMAL(38, 9))) AS VARCHAR) AS DOUBLE) AS ss
  FROM per_src CROSS JOIN g2
),
fac AS (
  SELECT g2.k, g2.grand,
         GREATEST(0.0, 1.0 - (g2.k - 3.0) * (g2.s2p / g2.h) / spread.ss)
           AS shrink
  FROM g2 CROSS JOIN spread
)
SELECT source, n AS n_docs,
       round(sq / n, 6) AS mean_quality,
       round(fac.grand + fac.shrink * (sq / n - fac.grand), 6) AS js_mean,
       round(fac.shrink, 6) AS shrink_factor
FROM per_src CROSS JOIN fac
ORDER BY source
"""


@register("james_stein_source_means", _JS_SQL)
def q_james_stein_source_means(spark, sf_dir):
    """Positive-part James-Stein estimate of each source's mean
    quality (Efron & Morris 1975): x̂_s = x̄ + max(0, 1-(k-3)v/S)·
    (x̄_s - x̄) with S = Σ(x̄_s - x̄)², v = pooled within-source
    variance at the harmonic mean of source sizes.  Per-doc quality
    and every tiny-relation sum ride the 1e-9 DECIMAL grid; the
    shrink factor is one shared expression.

    Scale plan: ONE fact pass to the |sources|-row moment relation
    (checkpointed); grand mean, pooled variance, spread, and the
    shrunk means are all arithmetic on that relation with 1-row
    broadcasts — the corpus is never rescanned."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    q = F.round(
        F.length(F.regexp_replace("text", "[^0-9a-zA-Z]", "")).cast("double")
        / F.length("text").cast("double"),
        9,
    )

    def q9_sum(term):
        return to_d(F.sum(F.round(term, 9).cast("decimal(38, 9)")))

    per_src = (
        docs.select("source", q.alias("q"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            to_d(F.sum(F.col("q").cast("decimal(38, 9)"))).alias("sq"),
            q9_sum(F.col("q") * F.col("q")).alias("sqq"),
        )
        .localCheckpoint(eager=True)
    )
    g = per_src.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        q9_sum(F.col("sq") / F.col("n")).alias("sum_means"),
        q9_sum(F.col("sqq") - F.col("sq") * F.col("sq") / F.col("n")).alias(
            "sum_within"
        ),
        F.sum(F.col("n") - 1).cast("double").alias("df_within"),
        q9_sum(F.lit(1.0) / F.col("n")).alias("sum_inv_n"),
    ).selectExpr(
        "k",
        "sum_means / k AS grand",
        "sum_within / df_within AS s2p",
        "k / sum_inv_n AS h",
    )
    spread = (
        per_src.crossJoin(F.broadcast(g))
        .agg(
            q9_sum(
                (F.col("sq") / F.col("n") - F.col("grand"))
                * (F.col("sq") / F.col("n") - F.col("grand"))
            ).alias("ss")
        )
    )
    fac = (
        g.crossJoin(F.broadcast(spread))
        .select(
            "grand",
            F.greatest(
                F.lit(0.0),
                1.0 - (F.col("k") - 3.0) * (F.col("s2p") / F.col("h")) / F.col("ss"),
            ).alias("shrink"),
        )
    )
    return (
        per_src.crossJoin(F.broadcast(fac))
        .select(
            "source",
            F.col("n").alias("n_docs"),
            F.round(F.col("sq") / F.col("n"), 6).alias("mean_quality"),
            F.round(
                F.col("grand")
                + F.col("shrink") * (F.col("sq") / F.col("n") - F.col("grand")),
                6,
            ).alias("js_mean"),
            F.round(F.col("shrink"), 6).alias("shrink_factor"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Kendall tau-b, EXACT, via the contingency grid: quantity and
# discount have bounded distinct-value sets, so concordant/discordant
# pair counts collapse from O(N²) row pairs to O(K²) CELL pairs
# (K = |grid| ≪ N) — the rank-correlation complement of
# `corr_qty_price` (Pearson) robust to the non-linearity Pearson
# misses.
# ---------------------------------------------------------------------------

_KENDALL_SQL = """
WITH cells AS (
  SELECT l_quantity AS x, l_discount AS y, CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2
),
pairs AS (
  SELECT CAST(SUM(CASE WHEN a.x < b.x AND a.y < b.y THEN a.c * b.c
                       ELSE 0 END) AS BIGINT) AS concordant,
         CAST(SUM(CASE WHEN a.x < b.x AND a.y > b.y THEN a.c * b.c
                       ELSE 0 END) AS BIGINT) AS discordant
  FROM cells a JOIN cells b ON NOT (a.x = b.x AND a.y = b.y)
),
tx AS (
  SELECT CAST(SUM(t * (t - 1) / 2) AS BIGINT) AS ties_x
  FROM (SELECT SUM(c) AS t FROM cells GROUP BY x)
),
ty AS (
  SELECT CAST(SUM(t * (t - 1) / 2) AS BIGINT) AS ties_y
  FROM (SELECT SUM(c) AS t FROM cells GROUP BY y)
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells)
SELECT tot.n, pairs.concordant, pairs.discordant, tx.ties_x, ty.ties_y,
       round((CAST(pairs.concordant AS DOUBLE) - pairs.discordant)
             / sqrt((CAST(tot.n AS DOUBLE) * (tot.n - 1.0) / 2.0 - tx.ties_x)
                    * (CAST(tot.n AS DOUBLE) * (tot.n - 1.0) / 2.0
                       - ty.ties_y)), 6) AS tau_b
FROM pairs CROSS JOIN tx CROSS JOIN ty CROSS JOIN tot
"""


@register("kendall_tau_contingency", _KENDALL_SQL)
def q_kendall_tau_contingency(spark, sf_dir):
    """Exact Kendall tau-b of (l_quantity, l_discount) through the
    contingency grid: C and D are integer sums of cell-count products
    over ordered CELL pairs (each unordered row pair is counted once
    because the join fixes a.x < b.x), tie terms come from the
    row/column marginals, and only the final ratio leaves integer
    arithmetic.

    Scale plan: one map-side combined group-by to the K-cell grid
    (K bounded by the value domains, independent of N), then a K×K
    cell join — quadratic in the GRID, constant in the data.  For
    unbounded-domain columns the same query runs on quantized buckets
    (tau over buckets = tau-b of the bucketed variables)."""
    li = load_table(spark, sf_dir, "lineitem")
    cells = (
        li.groupBy(F.col("l_quantity").alias("x"), F.col("l_discount").alias("y"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    a, b = cells.alias("a"), cells.alias("b")
    pairs = (
        a.join(
            F.broadcast(b),
            ~((F.col("a.x") == F.col("b.x")) & (F.col("a.y") == F.col("b.y"))),
        )
        .agg(
            F.sum(
                F.when(
                    (F.col("a.x") < F.col("b.x")) & (F.col("a.y") < F.col("b.y")),
                    F.col("a.c") * F.col("b.c"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("concordant"),
            F.sum(
                F.when(
                    (F.col("a.x") < F.col("b.x")) & (F.col("a.y") > F.col("b.y")),
                    F.col("a.c") * F.col("b.c"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("discordant"),
        )
    )
    tx = (
        cells.groupBy("x")
        .agg(F.sum("c").alias("t"))
        .agg(F.sum(F.col("t") * (F.col("t") - 1) / 2).cast("long").alias("ties_x"))
    )
    ty = (
        cells.groupBy("y")
        .agg(F.sum("c").alias("t"))
        .agg(F.sum(F.col("t") * (F.col("t") - 1) / 2).cast("long").alias("ties_y"))
    )
    tot = cells.agg(F.sum("c").cast("long").alias("n"))
    half = lambda: F.col("n").cast("double") * (F.col("n") - 1.0) / 2.0  # noqa: E731
    return (
        pairs.crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "concordant",
            "discordant",
            "ties_x",
            "ties_y",
            F.round(
                (F.col("concordant").cast("double") - F.col("discordant"))
                / F.sqrt(
                    (half() - F.col("ties_x")) * (half() - F.col("ties_y"))
                ),
                6,
            ).alias("tau_b"),
        )
    )


# ---------------------------------------------------------------------------
# Spearman rho, EXACT with ties, via contingency marginals: the
# average rank of value v is (rows before v) + (t_v + 1)/2 — a prefix
# sum over the tiny marginal relation — so the rank correlation
# reduces to the Pearson template over cell-weighted average ranks.
# Kendall (`kendall_tau_contingency`) counts pair orientations; this
# is the other canonical rank correlation, same O(K) grid cost.
# ---------------------------------------------------------------------------

_SPEARMAN_SQL = """
WITH cells AS (
  SELECT l_quantity AS x, l_discount AS y, CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2
),
mx AS (
  SELECT x, CAST(COALESCE(SUM(t) OVER (ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + (t + 1) / 2.0 AS DECIMAL(28, 1)) AS rx
  FROM (SELECT x, SUM(c) AS t FROM cells GROUP BY x)
),
my AS (
  SELECT y, CAST(COALESCE(SUM(t) OVER (ORDER BY y
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + (t + 1) / 2.0 AS DECIMAL(28, 1)) AS ry
  FROM (SELECT y, SUM(c) AS t FROM cells GROUP BY y)
),
m AS (
  SELECT CAST(SUM(c) AS DOUBLE) AS n,
         CAST(CAST(SUM(c * rx) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(c * ry) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(c * rx * rx) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(c * rx * ry) AS VARCHAR) AS DOUBLE) AS sxy,
         CAST(CAST(SUM(c * ry * ry) AS VARCHAR) AS DOUBLE) AS syy
  FROM cells JOIN mx USING (x) JOIN my USING (y)
)
SELECT CAST(n AS BIGINT) AS n,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
         AS spearman_rho
FROM m
"""


@register("spearman_rho_contingency", _SPEARMAN_SQL)
def q_spearman_rho_contingency(spark, sf_dir):
    """Exact tie-corrected Spearman rho of (l_quantity, l_discount):
    average ranks from prefix sums over the value marginals (exact
    .5-grid decimals), then the Pearson moment template over
    cell-weighted ranks — every moment an exact decimal sum, one
    shared final expression.

    Scale plan: the grid collapse is one map-side combined group-by;
    marginal prefix windows and the moment aggregate run on the
    K-sized grid relation.  For unbounded domains the same query runs
    over quantized buckets."""
    li = load_table(spark, sf_dir, "lineitem")
    cells = (
        li.groupBy(F.col("l_quantity").alias("x"), F.col("l_discount").alias("y"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )

    def marg(key, rank_name):
        w_prev = Window.orderBy(key).rowsBetween(Window.unboundedPreceding, -1)
        return (
            cells.groupBy(key)
            .agg(F.sum("c").alias("t"))
            .select(
                key,
                (
                    F.coalesce(F.sum("t").over(w_prev), F.lit(0))
                    + (F.col("t") + 1) / 2.0
                )
                .cast("decimal(28, 1)")
                .alias(rank_name),
            )
        )

    joined = cells.join(marg("x", "rx"), "x").join(marg("y", "ry"), "y")
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    m = joined.agg(
        F.sum("c").cast("double").alias("n"),
        to_d(F.sum(F.col("c") * F.col("rx"))).alias("sx"),
        to_d(F.sum(F.col("c") * F.col("ry"))).alias("sy"),
        to_d(F.sum(F.col("c") * F.col("rx") * F.col("rx"))).alias("sxx"),
        to_d(F.sum(F.col("c") * F.col("rx") * F.col("ry"))).alias("sxy"),
        to_d(F.sum(F.col("c") * F.col("ry") * F.col("ry"))).alias("syy"),
    )
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# Two-class linear discriminant analysis, EXACT: class means + pooled
# within-class covariance from one conditional-moment scan, the 2x2
# solve w = S⁻¹(μ₁-μ₀) through the shared adjugate, then a scoring
# pass measures training accuracy with the 1-row weight relation
# broadcast in.  Fisher's discriminant as pure dataflow — the
# closed-form sibling of `logreg_irls_exact` (no iterations at all).
# ---------------------------------------------------------------------------

_LDA_SRC_SQL = """
  SELECT CAST(EXTRACT(month FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS x1,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS x2,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
"""

# pooled-covariance solve over per-class moments {p}n/{p}s1/{p}s2/
# {p}s11/{p}s12/{p}s22 for p in (a_, b_): within-class scatter =
# Σ_class (S_xx - s_x s_x / n); w = S⁻¹ d with d = μ₁ - μ₀.
_LDA_SXX = "((a_s11 - a_s1 * a_s1 / a_n) + (b_s11 - b_s1 * b_s1 / b_n))"
_LDA_SXY = "((a_s12 - a_s1 * a_s2 / a_n) + (b_s12 - b_s1 * b_s2 / b_n))"
_LDA_SYY = "((a_s22 - a_s2 * a_s2 / a_n) + (b_s22 - b_s2 * b_s2 / b_n))"
_LDA_D1 = "(b_s1 / b_n - a_s1 / a_n)"
_LDA_D2 = "(b_s2 / b_n - a_s2 / a_n)"
_LDA_DET = f"({_LDA_SXX} * {_LDA_SYY} - {_LDA_SXY} * {_LDA_SXY})"
_LDA_W1 = f"(({_LDA_SYY} * {_LDA_D1} - {_LDA_SXY} * {_LDA_D2}) / {_LDA_DET})"
_LDA_W2 = f"(({_LDA_SXX} * {_LDA_D2} - {_LDA_SXY} * {_LDA_D1}) / {_LDA_DET})"
# decision threshold: w·(μ₀+μ₁)/2, class 1 iff w·x > c (quantized)
_LDA_C = (
    f"({_LDA_W1} * (a_s1 / a_n + b_s1 / b_n) / 2.0"
    f" + {_LDA_W2} * (a_s2 / a_n + b_s2 / b_n) / 2.0)"
)


def _lda_moments_sql(tag: str, cls: int) -> str:
    only = lambda t: f"CASE WHEN y = {cls} THEN {t} END"  # noqa: E731
    return (
        f"SUM(CASE WHEN y = {cls} THEN 1 ELSE 0 END) * 1.0 AS {tag}n,\n"
        f"  CAST(CAST(SUM({only('x1')}) AS VARCHAR) AS DOUBLE) AS {tag}s1,\n"
        f"  CAST(CAST(SUM({only('x2')}) AS VARCHAR) AS DOUBLE) AS {tag}s2,\n"
        f"  CAST(CAST(SUM({only('x1 * x1')}) AS VARCHAR) AS DOUBLE) AS {tag}s11,\n"
        f"  CAST(CAST(SUM({only('x1 * x2')}) AS VARCHAR) AS DOUBLE) AS {tag}s12,\n"
        f"  CAST(CAST(SUM({only('x2 * x2')}) AS VARCHAR) AS DOUBLE) AS {tag}s22"
    )


_LDA_SQL = f"""
WITH s AS ({_LDA_SRC_SQL}),
m AS (
  SELECT {_lda_moments_sql('a_', 0)},
  {_lda_moments_sql('b_', 1)}
  FROM s
),
w AS (
  SELECT round({_LDA_W1}, 9) AS w1, round({_LDA_W2}, 9) AS w2,
         round({_LDA_C}, 9) AS c,
         CAST(a_n AS BIGINT) AS n0, CAST(b_n AS BIGINT) AS n1
  FROM m
),
acc AS (
  SELECT CAST(SUM(CASE WHEN (w.w1 * s.x1 + w.w2 * s.x2 > w.c) = (s.y = 1)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM s CROSS JOIN w
)
SELECT w.n0, w.n1,
       round(w.w1, 6) AS w_month,
       round(w.w2, 6) AS w_urgent,
       round(w.c, 6) AS threshold,
       round(CAST(acc.n_correct AS DOUBLE) / acc.n, 6) AS train_accuracy
FROM w CROSS JOIN acc
"""


@register("lda_two_class_exact", _LDA_SQL)
def q_lda_two_class_exact(spark, sf_dir):
    """Fisher LDA for finished-vs-open orders on (month, urgent flag),
    EXACT and iteration-free: per-class moments are exact decimal sums
    from ONE conditional scan, pooled within-class scatter and
    w = S⁻¹(μ₁-μ₀) come from one shared 2x2 adjugate template, the
    midpoint threshold and weights are quantized at 1e-9, and a second
    scan scores training accuracy with the 1-row weight relation
    broadcast in.

    Scale plan: train = one map-side combined aggregate (what MLlib
    needs an optimizer for, p=2 LDA needs none); score = one more scan
    with a broadcast — the exact two-pass shape of
    `mahalanobis_outlier_topk`."""
    o = load_table(spark, sf_dir, "orders")
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    s = o.select(
        F.month(F.col("o_orderdate").cast("date")).cast("long").alias("x1"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("x2"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )

    def cls_moments(tag, cls):
        only = lambda t: F.when(F.col("y") == cls, t)  # noqa: E731
        return [
            F.count(only(F.lit(1))).cast("double").alias(f"{tag}n"),
            to_d(F.sum(only(F.col("x1")))).alias(f"{tag}s1"),
            to_d(F.sum(only(F.col("x2")))).alias(f"{tag}s2"),
            to_d(F.sum(only(F.col("x1") * F.col("x1")))).alias(f"{tag}s11"),
            to_d(F.sum(only(F.col("x1") * F.col("x2")))).alias(f"{tag}s12"),
            to_d(F.sum(only(F.col("x2") * F.col("x2")))).alias(f"{tag}s22"),
        ]

    m = s.agg(*(cls_moments("a_", 0) + cls_moments("b_", 1)))
    w = m.select(
        F.round(F.expr(_LDA_W1), 9).alias("w1"),
        F.round(F.expr(_LDA_W2), 9).alias("w2"),
        F.round(F.expr(_LDA_C), 9).alias("c"),
        F.col("a_n").cast("long").alias("n0"),
        F.col("b_n").cast("long").alias("n1"),
    )
    acc = s.crossJoin(F.broadcast(w.select("w1", "w2", "c"))).agg(
        F.sum(
            (
                (
                    F.col("w1") * F.col("x1") + F.col("w2") * F.col("x2")
                    > F.col("c")
                )
                == (F.col("y") == 1)
            ).cast("int")
        )
        .cast("long")
        .alias("n_correct"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return w.crossJoin(F.broadcast(acc)).select(
        "n0",
        "n1",
        F.round(F.col("w1"), 6).alias("w_month"),
        F.round(F.col("w2"), 6).alias("w_urgent"),
        F.round(F.col("c"), 6).alias("threshold"),
        F.round(F.col("n_correct").cast("double") / F.col("n"), 6).alias(
            "train_accuracy"
        ),
    )


# ---------------------------------------------------------------------------
# Circular (directional) statistics of event time-of-day: the
# resultant length R and circular mean hour per event_type — the
# correct "when does this usually happen" summary where a linear mean
# of hours is nonsense across midnight (Mardia & Jupp 2000).
# ---------------------------------------------------------------------------

_TWO_PI = 6.283185307179586


def _circ_sql() -> str:
    theta = f"({_TWO_PI} * (CAST(floor(epoch(ts)) AS BIGINT) % 86400) / 86400.0)"
    return f"""
WITH m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         {_irls_q9_sum(f'cos({theta})')} AS c,
         {_irls_q9_sum(f'sin({theta})')} AS s
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       round(sqrt(c * c + s * s) / n, 6) AS resultant_r,
       round(CASE WHEN atan2(s, c) < 0
                  THEN (atan2(s, c) + {_TWO_PI}) / {_TWO_PI} * 24.0
                  ELSE atan2(s, c) / {_TWO_PI} * 24.0 END, 6) AS mean_hour
FROM m
ORDER BY event_type
"""


@register("circular_hour_stats", _circ_sql())
def q_circular_hour_stats(spark, sf_dir):
    """Circular mean hour and resultant length R per event_type:
    θ = 2π·(second of day)/86400, R = |Σe^{iθ}|/n (1 = perfectly
    concentrated, 0 = uniform around the clock), mean hour from
    atan2 of the quantized component sums.  cos/sin are quantized to
    the 1e-9 grid before the DECIMAL sums (the engine's libm
    discipline), so the statistic is bit-stable.

    Scale plan: ONE map-side combined aggregate per type — circular
    moments are as mergeable as linear ones."""
    ev = load_table(spark, sf_dir, "events")
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    theta = (
        F.lit(_TWO_PI)
        * (F.floor(F.col("ts").cast("double")).cast("long") % 86400)
        / 86400.0
    )

    def q9_sum(term):
        return to_d(F.sum(F.round(term, 9).cast("decimal(38, 9)")))

    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        q9_sum(F.cos(theta)).alias("c"),
        q9_sum(F.sin(theta)).alias("s"),
    )
    ang = F.atan2(F.col("s"), F.col("c"))
    return m.select(
        "event_type",
        "n",
        F.round(
            F.sqrt(F.col("c") * F.col("c") + F.col("s") * F.col("s")) / F.col("n"), 6
        ).alias("resultant_r"),
        F.round(
            F.when(ang < 0, (ang + _TWO_PI) / _TWO_PI * 24.0).otherwise(
                ang / _TWO_PI * 24.0
            ),
            6,
        ).alias("mean_hour"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Poisson regression by unrolled IRLS — the COUNT-outcome GLM beside
# `logreg_irls_exact` (binary) and `ols_regression_exact` (gaussian):
# lineitem count per order on (month, urgent flag), canonical log
# link, Newton weights w = mu.  Same engine/oracle template economy:
# the 3x3 step reuses the OLS adjugate with mu-weighted moments, mu is
# quantized AFTER exp, every sum rides the 1e-9 DECIMAL grid.
# ---------------------------------------------------------------------------

_PGLM_T = 3
_PGLM_MU = "greatest(round(exp(b0 + b1 * x1 + b2 * x2), 9), 0.000000001)"
_PGLM_SRC = """
  SELECT CAST(EXTRACT(month FROM CAST(o.o_orderdate AS DATE)) AS BIGINT) AS x1,
         CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS x2,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, 1, 2
"""


def _pglm_sql(iters: int = _PGLM_T) -> str:
    parts = [
        f"s AS ({_PGLM_SRC})",
        "b0_ AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"r{i} AS (SELECT x1, x2, y, {_PGLM_MU} AS mu, b0, b1, b2 "
            f"FROM s CROSS JOIN b{i-1}_)"
        )
        parts.append(
            f"a{i} AS (SELECT ANY_VALUE(b0) AS b0, ANY_VALUE(b1) AS b1, "
            f"ANY_VALUE(b2) AS b2, "
            f"{_irls_q9_sum('mu')} AS n, "
            f"{_irls_q9_sum('mu * x1')} AS s1, "
            f"{_irls_q9_sum('mu * x2')} AS s2, "
            f"{_irls_q9_sum('mu * x1 * x1')} AS s11, "
            f"{_irls_q9_sum('mu * x1 * x2')} AS s12, "
            f"{_irls_q9_sum('mu * x2 * x2')} AS s22, "
            f"{_irls_q9_sum('(y - mu)')} AS sy, "
            f"{_irls_q9_sum('(y - mu) * x1')} AS s1y, "
            f"{_irls_q9_sum('(y - mu) * x2')} AS s2y "
            f"FROM r{i})"
        )
        parts.append(
            f"b{i}_ AS (SELECT b0 + {_OLS_B0} AS b0, b1 + {_OLS_B1} AS b1, "
            f"b2 + {_OLS_B2} AS b2 FROM a{i})"
        )
    t = iters
    parts.append(f"rf AS (SELECT x1, x2, y, {_PGLM_MU} AS mu FROM s CROSS JOIN b{t}_)")
    parts.append(
        "dev AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        + _irls_q9_sum(
            "2.0 * (CASE WHEN y > 0 THEN y * round(ln(y / mu), 9) ELSE 0.0 END"
            " - (y - mu))"
        )
        + " AS d FROM rf)"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT dev.n,
       round(b.b0, 6) AS b_intercept,
       round(b.b1, 6) AS b_month,
       round(b.b2, 6) AS b_urgent,
       round(dev.d / dev.n, 6) AS mean_deviance
FROM b{t}_ b CROSS JOIN dev
"""
    )


@register("poisson_glm_exact", _pglm_sql())
def q_poisson_glm_exact(spark, sf_dir):
    """Poisson regression of per-order lineitem count on (order month,
    urgent flag), trained by three unrolled Newton/IRLS steps with the
    canonical log link: mu quantized to the 1e-9 grid AFTER exp, each
    step's mu-weighted normal equations solved with the SAME adjugate
    template as OLS/logistic, and the mean deviance
    2[y·ln(y/mu) - (y-mu)]/n reported as fit quality.

    Scale plan: the count outcome is one orderkey-grouped join
    (shuffle on the PK), then T+1 map-side combined scans over the
    per-order relation with 1-row betas broadcast in — identical
    shape to `logreg_irls_exact` at any scale."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    src = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey")
        .agg(
            F.first(
                F.month(F.col("o_orderdate").cast("date")).cast("long")
            ).alias("x1"),
            F.first(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("x2"),
            F.count(F.lit(1)).cast("long").alias("y"),
        )
        .select("x1", "x2", "y")
        .localCheckpoint(eager=True)
    )

    def q9_sum(term):
        return to_d(F.sum(F.round(term, 9).cast("decimal(38, 9)")))

    mu_expr = F.expr(_PGLM_MU)
    beta = src.sparkSession.range(1).select(
        F.lit(0.0).alias("b0"), F.lit(0.0).alias("b1"), F.lit(0.0).alias("b2")
    )
    for _ in range(_PGLM_T):
        r = src.crossJoin(F.broadcast(beta)).withColumn("mu", mu_expr)
        w = F.col("mu")
        resid = F.col("y") - F.col("mu")
        a = r.agg(
            F.first("b0").alias("b0"),
            F.first("b1").alias("b1"),
            F.first("b2").alias("b2"),
            q9_sum(w).alias("n"),
            q9_sum(w * F.col("x1")).alias("s1"),
            q9_sum(w * F.col("x2")).alias("s2"),
            q9_sum(w * F.col("x1") * F.col("x1")).alias("s11"),
            q9_sum(w * F.col("x1") * F.col("x2")).alias("s12"),
            q9_sum(w * F.col("x2") * F.col("x2")).alias("s22"),
            q9_sum(resid).alias("sy"),
            q9_sum(resid * F.col("x1")).alias("s1y"),
            q9_sum(resid * F.col("x2")).alias("s2y"),
        )
        beta = a.select(
            (F.col("b0") + F.expr(_OLS_B0)).alias("b0"),
            (F.col("b1") + F.expr(_OLS_B1)).alias("b1"),
            (F.col("b2") + F.expr(_OLS_B2)).alias("b2"),
        ).localCheckpoint(eager=True)
    rf = src.crossJoin(F.broadcast(beta)).withColumn("mu", mu_expr)
    dev_term = 2.0 * (
        F.when(
            F.col("y") > 0,
            F.col("y") * F.round(F.log(F.col("y") / F.col("mu")), 9),
        ).otherwise(0.0)
        - (F.col("y") - F.col("mu"))
    )
    dev = rf.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        q9_sum(dev_term).alias("d"),
    )
    return dev.crossJoin(F.broadcast(beta)).select(
        "n",
        F.round(F.col("b0"), 6).alias("b_intercept"),
        F.round(F.col("b1"), 6).alias("b_month"),
        F.round(F.col("b2"), 6).alias("b_urgent"),
        F.round(F.col("d") / F.col("n"), 6).alias("mean_deviance"),
    )


# ---------------------------------------------------------------------------
# Brier-score Murphy decomposition of the logistic model's
# probabilities: brier = reliability - resolution + uncertainty over
# 10 fixed-width probability bins (Murphy 1973) — the calibration
# audit `gnb_calibration_curve` draws as a curve, compressed to the
# three numbers a model gate checks.
# ---------------------------------------------------------------------------


def _brier_sql(iters: int = _IRLS_T) -> str:
    parts = [f"s AS ({_IRLS_SRC})", "b0_ AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2)"]
    for i in range(1, iters + 1):
        parts.append(
            f"r{i} AS (SELECT x1, x2, y, {_IRLS_P} AS p, b0, b1, b2 "
            f"FROM s CROSS JOIN b{i-1}_)"
        )
        parts.append(
            f"a{i} AS (SELECT ANY_VALUE(b0) AS b0, ANY_VALUE(b1) AS b1, ANY_VALUE(b2) AS b2, "
            f"{_irls_q9_sum('p * (1.0 - p)')} AS n, "
            f"{_irls_q9_sum('p * (1.0 - p) * x1')} AS s1, "
            f"{_irls_q9_sum('p * (1.0 - p) * x2')} AS s2, "
            f"{_irls_q9_sum('p * (1.0 - p) * x1 * x1')} AS s11, "
            f"{_irls_q9_sum('p * (1.0 - p) * x1 * x2')} AS s12, "
            f"{_irls_q9_sum('p * (1.0 - p) * x2 * x2')} AS s22, "
            f"{_irls_q9_sum('(y - p)')} AS sy, "
            f"{_irls_q9_sum('(y - p) * x1')} AS s1y, "
            f"{_irls_q9_sum('(y - p) * x2')} AS s2y "
            f"FROM r{i})"
        )
        parts.append(
            f"b{i}_ AS (SELECT b0 + {_OLS_B0} AS b0, b1 + {_OLS_B1} AS b1, "
            f"b2 + {_OLS_B2} AS b2 FROM a{i})"
        )
    t = iters
    parts.append(
        f"scored AS (SELECT y, {_IRLS_P} AS p, "
        f"CAST(least(floor({_IRLS_P} * 10), 9) AS BIGINT) AS bin "
        f"FROM s CROSS JOIN b{t}_)"
    )
    parts.append(
        "bins AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_b, "
        "CAST(CAST(SUM(CAST(p AS DECIMAL(38, 9))) AS VARCHAR) AS DOUBLE) AS sp, "
        "CAST(SUM(y) AS BIGINT) AS sy_b FROM scored GROUP BY bin)"
    )
    parts.append(
        "tot AS (SELECT CAST(SUM(n_b) AS BIGINT) AS n, "
        "CAST(SUM(sy_b) AS BIGINT) AS sy FROM bins)"
    )
    parts.append(
        "bs AS (SELECT "
        + _irls_q9_sum("(p - y) * (p - y)")
        + " AS sq FROM scored)"
    )
    parts.append(
        "decomp AS (SELECT "
        + _irls_q9_sum(
            "n_b * (sp / n_b - CAST(sy_b AS DOUBLE) / n_b)"
            " * (sp / n_b - CAST(sy_b AS DOUBLE) / n_b)"
        )
        + " AS rel_num, "
        + _irls_q9_sum(
            "n_b * (CAST(sy_b AS DOUBLE) / n_b - CAST(tot.sy AS DOUBLE) / tot.n)"
            " * (CAST(sy_b AS DOUBLE) / n_b - CAST(tot.sy AS DOUBLE) / tot.n)"
        )
        + " AS res_num FROM bins CROSS JOIN tot)"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT tot.n,
       round(bs.sq / tot.n, 6) AS brier,
       round(decomp.rel_num / tot.n, 6) AS reliability,
       round(decomp.res_num / tot.n, 6) AS resolution,
       round(CAST(tot.sy AS DOUBLE) / tot.n
             * (1.0 - CAST(tot.sy AS DOUBLE) / tot.n), 6) AS uncertainty
FROM tot CROSS JOIN bs CROSS JOIN decomp
"""
    )


@register("brier_decomposition", _brier_sql())
def q_brier_decomposition(spark, sf_dir):
    """Murphy decomposition of the logistic model's Brier score over
    10 fixed-width probability bins: reliability (calibration error),
    resolution (sharpness), uncertainty (base-rate entropy), plus the
    raw Brier — the scalar calibration gate.  Probabilities ride the
    1e-9 sigmoid grid; bin terms and the squared-error sum are
    quantized DECIMAL sums; bin assignment floor(p·10) is exact on the
    grid.

    Scale plan: T Newton scans + one scoring scan to the 10-bin
    relation + one squared-error aggregate — all map-side combined,
    1-row betas broadcast."""
    o = load_table(spark, sf_dir, "orders")
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    src = o.select(
        F.month(F.col("o_orderdate").cast("date")).cast("long").alias("x1"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("x2"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )

    def q9_sum(term):
        return to_d(F.sum(F.round(term, 9).cast("decimal(38, 9)")))

    p_expr = F.expr(_IRLS_P)
    beta = src.sparkSession.range(1).select(
        F.lit(0.0).alias("b0"), F.lit(0.0).alias("b1"), F.lit(0.0).alias("b2")
    )
    for _ in range(_IRLS_T):
        r = src.crossJoin(F.broadcast(beta)).withColumn("p", p_expr)
        w = F.col("p") * (1.0 - F.col("p"))
        resid = F.col("y") - F.col("p")
        a = r.agg(
            F.first("b0").alias("b0"),
            F.first("b1").alias("b1"),
            F.first("b2").alias("b2"),
            q9_sum(w).alias("n"),
            q9_sum(w * F.col("x1")).alias("s1"),
            q9_sum(w * F.col("x2")).alias("s2"),
            q9_sum(w * F.col("x1") * F.col("x1")).alias("s11"),
            q9_sum(w * F.col("x1") * F.col("x2")).alias("s12"),
            q9_sum(w * F.col("x2") * F.col("x2")).alias("s22"),
            q9_sum(resid).alias("sy"),
            q9_sum(resid * F.col("x1")).alias("s1y"),
            q9_sum(resid * F.col("x2")).alias("s2y"),
        )
        beta = a.select(
            (F.col("b0") + F.expr(_OLS_B0)).alias("b0"),
            (F.col("b1") + F.expr(_OLS_B1)).alias("b1"),
            (F.col("b2") + F.expr(_OLS_B2)).alias("b2"),
        ).localCheckpoint(eager=True)
    scored = (
        src.crossJoin(F.broadcast(beta))
        .withColumn("p", p_expr)
        .select(
            "y",
            "p",
            F.least(F.floor(F.col("p") * 10), F.lit(9)).cast("long").alias("bin"),
        )
        .localCheckpoint(eager=True)
    )
    bins = scored.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        to_d(F.sum(F.col("p").cast("decimal(38, 9)"))).alias("sp"),
        F.sum("y").cast("long").alias("sy_b"),
    )
    tot = bins.agg(
        F.sum("n_b").cast("long").alias("n"), F.sum("sy_b").cast("long").alias("sy")
    )
    bs = scored.agg(
        q9_sum((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))).alias("sq")
    )
    pbar = F.col("sp") / F.col("n_b")
    ybar_b = F.col("sy_b").cast("double") / F.col("n_b")
    ybar = F.col("sy").cast("double") / F.col("n")
    decomp = bins.crossJoin(F.broadcast(tot)).agg(
        q9_sum(F.col("n_b") * (pbar - ybar_b) * (pbar - ybar_b)).alias("rel_num"),
        q9_sum(F.col("n_b") * (ybar_b - ybar) * (ybar_b - ybar)).alias("res_num"),
    )
    return (
        tot.crossJoin(F.broadcast(bs))
        .crossJoin(F.broadcast(decomp))
        .select(
            "n",
            F.round(F.col("sq") / F.col("n"), 6).alias("brier"),
            F.round(F.col("rel_num") / F.col("n"), 6).alias("reliability"),
            F.round(F.col("res_num") / F.col("n"), 6).alias("resolution"),
            F.round(ybar * (1.0 - ybar), 6).alias("uncertainty"),
        )
    )


# ---------------------------------------------------------------------------
# Model gains/lift table over the logistic score: cumulative capture
# and lift walking the 10 fixed-width probability bins from high to
# low — the targeting readout next to `brier_decomposition`'s
# calibration numbers (same scored relation, same bin discipline; the
# classic NTILE-decile gains table is the global-sort anti-pattern,
# fixed-width score bins are its scale-safe form).
# ---------------------------------------------------------------------------


def _gains_sql(iters: int = _IRLS_T) -> str:
    base = _brier_sql(iters)
    head, _, _ = base.partition("tot AS (")
    return (
        head
        + """tot AS (SELECT CAST(SUM(n_b) AS BIGINT) AS n,
             CAST(SUM(sy_b) AS BIGINT) AS sy FROM bins)
SELECT bin, n_b AS n, sy_b AS n_pos,
       round(CAST(sy_b AS DOUBLE) / n_b, 6) AS bin_rate,
       CAST(SUM(n_b) OVER w AS BIGINT) AS cum_n,
       CAST(SUM(sy_b) OVER w AS BIGINT) AS cum_pos,
       round(CAST(SUM(sy_b) OVER w AS DOUBLE) / tot.sy, 6) AS cum_capture,
       round((CAST(SUM(sy_b) OVER w AS DOUBLE) / SUM(n_b) OVER w)
             / (CAST(tot.sy AS DOUBLE) / tot.n), 6) AS cum_lift
FROM bins CROSS JOIN tot
WINDOW w AS (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING)
ORDER BY bin DESC
"""
    )


@register("model_gains_table", _gains_sql())
def q_model_gains_table(spark, sf_dir):
    """Cumulative gains/lift of the logistic model: per fixed-width
    score bin (high to low), the positive rate, cumulative capture of
    all positives, and cumulative lift over the base rate — what a
    targeting owner reads to pick an operating point.  Shares the
    scored relation and bin discipline with `brier_decomposition`;
    counts exact, ratios single expressions; the cumulative windows
    run over the 10-row bin relation.

    Scale plan: identical to brier's (T Newton scans + one scoring
    scan to 10 bins); the gains windows are constant-size."""
    o = load_table(spark, sf_dir, "orders")
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    src = o.select(
        F.month(F.col("o_orderdate").cast("date")).cast("long").alias("x1"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("x2"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )

    def q9_sum(term):
        return to_d(F.sum(F.round(term, 9).cast("decimal(38, 9)")))

    p_expr = F.expr(_IRLS_P)
    beta = src.sparkSession.range(1).select(
        F.lit(0.0).alias("b0"), F.lit(0.0).alias("b1"), F.lit(0.0).alias("b2")
    )
    for _ in range(_IRLS_T):
        r = src.crossJoin(F.broadcast(beta)).withColumn("p", p_expr)
        w = F.col("p") * (1.0 - F.col("p"))
        resid = F.col("y") - F.col("p")
        a = r.agg(
            F.first("b0").alias("b0"),
            F.first("b1").alias("b1"),
            F.first("b2").alias("b2"),
            q9_sum(w).alias("n"),
            q9_sum(w * F.col("x1")).alias("s1"),
            q9_sum(w * F.col("x2")).alias("s2"),
            q9_sum(w * F.col("x1") * F.col("x1")).alias("s11"),
            q9_sum(w * F.col("x1") * F.col("x2")).alias("s12"),
            q9_sum(w * F.col("x2") * F.col("x2")).alias("s22"),
            q9_sum(resid).alias("sy"),
            q9_sum(resid * F.col("x1")).alias("s1y"),
            q9_sum(resid * F.col("x2")).alias("s2y"),
        )
        beta = a.select(
            (F.col("b0") + F.expr(_OLS_B0)).alias("b0"),
            (F.col("b1") + F.expr(_OLS_B1)).alias("b1"),
            (F.col("b2") + F.expr(_OLS_B2)).alias("b2"),
        ).localCheckpoint(eager=True)
    bins = (
        src.crossJoin(F.broadcast(beta))
        .withColumn("p", p_expr)
        .select(
            "y",
            F.least(F.floor(F.col("p") * 10), F.lit(9)).cast("long").alias("bin"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_b"),
            F.sum("y").cast("long").alias("sy_b"),
        )
        .localCheckpoint(eager=True)
    )
    tot = bins.agg(
        F.sum("n_b").cast("long").alias("n"), F.sum("sy_b").cast("long").alias("sy")
    )
    w_cum = Window.orderBy(F.desc("bin")).rowsBetween(Window.unboundedPreceding, 0)
    return (
        bins.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.col("n_b").alias("n"),
            F.col("sy_b").alias("n_pos"),
            F.round(F.col("sy_b").cast("double") / F.col("n_b"), 6).alias(
                "bin_rate"
            ),
            F.sum("n_b").over(w_cum).cast("long").alias("cum_n"),
            F.sum("sy_b").over(w_cum).cast("long").alias("cum_pos"),
            F.round(
                F.sum("sy_b").over(w_cum).cast("double") / F.col("sy"), 6
            ).alias("cum_capture"),
            F.round(
                (F.sum("sy_b").over(w_cum).cast("double") / F.sum("n_b").over(w_cum))
                / (F.col("sy").cast("double") / F.col("n")),
                6,
            ).alias("cum_lift"),
        )
        .orderBy(F.desc("bin"))
    )


# ---------------------------------------------------------------------------
# Mantel-Haenszel pooled odds ratio across month strata — the correct
# stratified estimate that `simpson_paradox_detector` motivates:
# OR_MH = Σ(a_i d_i / n_i) / Σ(b_i c_i / n_i), with the
# Robins-Breslow-Greenland variance for the log-OR confidence
# interval (Mantel & Haenszel 1959; Robins et al. 1986).
# ---------------------------------------------------------------------------

_MH_SQL = """
WITH s AS (
  SELECT CAST(EXTRACT(month FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS month,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS t,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
),
cells AS (
  SELECT month,
         CAST(SUM(t * y) AS DOUBLE) AS a,
         CAST(SUM(t * (1 - y)) AS DOUBLE) AS b,
         CAST(SUM((1 - t) * y) AS DOUBLE) AS c,
         CAST(SUM((1 - t) * (1 - y)) AS DOUBLE) AS d,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM s GROUP BY month
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
         CAST(CAST(SUM(CAST(round(a * d / n, 9) AS DECIMAL(38, 9))) AS VARCHAR)
              AS DOUBLE) AS r,
         CAST(CAST(SUM(CAST(round(b * c / n, 9) AS DECIMAL(38, 9))) AS VARCHAR)
              AS DOUBLE) AS sstat,
         CAST(CAST(SUM(CAST(round((a + d) / n * (a * d / n), 9)
                            AS DECIMAL(38, 9))) AS VARCHAR) AS DOUBLE) AS prr,
         CAST(CAST(SUM(CAST(round((a + d) / n * (b * c / n)
                                  + (b + c) / n * (a * d / n), 9)
                            AS DECIMAL(38, 9))) AS VARCHAR) AS DOUBLE) AS psrq,
         CAST(CAST(SUM(CAST(round((b + c) / n * (b * c / n), 9)
                            AS DECIMAL(38, 9))) AS VARCHAR) AS DOUBLE) AS qss
  FROM cells
)
SELECT n_strata,
       round(r / sstat, 6) AS or_mh,
       round(ln(r / sstat), 6) AS log_or,
       round(sqrt(prr / (2.0 * r * r) + psrq / (2.0 * r * sstat)
                  + qss / (2.0 * sstat * sstat)), 6) AS se_log_or,
       round(exp(ln(r / sstat) - 1.959964 * sqrt(prr / (2.0 * r * r)
                 + psrq / (2.0 * r * sstat) + qss / (2.0 * sstat * sstat))), 6)
         AS ci_low,
       round(exp(ln(r / sstat) + 1.959964 * sqrt(prr / (2.0 * r * r)
                 + psrq / (2.0 * r * sstat) + qss / (2.0 * sstat * sstat))), 6)
         AS ci_high
FROM agg
"""


@register("mantel_haenszel_or", _MH_SQL)
def q_mantel_haenszel_or(spark, sf_dir):
    """Mantel-Haenszel pooled odds ratio of URGENT → finished across
    month strata with the Robins-Breslow-Greenland 95% CI — the
    stratification-correct effect estimate that the pooled contrast in
    `simpson_paradox_detector` can get wrong.  Per-stratum 2×2 counts
    are exact; the R/S/variance components ride the 1e-9 DECIMAL grid;
    ln/exp/sqrt enter once in the final shared expression.

    Scale plan: one map-side combined group-by to the 12-stratum
    grid; the estimator is one aggregate over THAT."""
    o = load_table(spark, sf_dir, "orders")
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    s = o.select(
        F.month(F.col("o_orderdate").cast("date")).cast("long").alias("month"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("t"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    cells = s.groupBy("month").agg(
        F.sum(F.col("t") * F.col("y")).cast("double").alias("a"),
        F.sum(F.col("t") * (1 - F.col("y"))).cast("double").alias("b"),
        F.sum((1 - F.col("t")) * F.col("y")).cast("double").alias("c"),
        F.sum((1 - F.col("t")) * (1 - F.col("y"))).cast("double").alias("d"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )

    def q9_sum(term):
        return to_d(F.sum(F.round(term, 9).cast("decimal(38, 9)")))

    a, b, c, d, n = (F.col(x) for x in "abcdn")
    agg = cells.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        q9_sum(a * d / n).alias("r"),
        q9_sum(b * c / n).alias("sstat"),
        q9_sum((a + d) / n * (a * d / n)).alias("prr"),
        q9_sum((a + d) / n * (b * c / n) + (b + c) / n * (a * d / n)).alias("psrq"),
        q9_sum((b + c) / n * (b * c / n)).alias("qss"),
    )
    log_or = F.log(F.col("r") / F.col("sstat"))
    se = F.sqrt(
        F.col("prr") / (2.0 * F.col("r") * F.col("r"))
        + F.col("psrq") / (2.0 * F.col("r") * F.col("sstat"))
        + F.col("qss") / (2.0 * F.col("sstat") * F.col("sstat"))
    )
    return agg.select(
        "n_strata",
        F.round(F.col("r") / F.col("sstat"), 6).alias("or_mh"),
        F.round(log_or, 6).alias("log_or"),
        F.round(se, 6).alias("se_log_or"),
        F.round(F.exp(log_or - 1.959964 * se), 6).alias("ci_low"),
        F.round(F.exp(log_or + 1.959964 * se), 6).alias("ci_high"),
    )


# ---------------------------------------------------------------------------
# Minimum detectable effect at the observed sample sizes — the
# experiment-sizing readout (alpha = 0.05 two-sided, power = 0.80):
# MDE = (z_{a/2} + z_pow) * sqrt(s_t²/n_t + s_c²/n_c).  The inverse of
# the test `welch_ttest_urgent_orders` runs — what effect COULD this
# design have seen.
# ---------------------------------------------------------------------------

_Z_ALPHA2 = 1.959964  # Phi^{-1}(0.975)
_Z_POWER = 0.841621  # Phi^{-1}(0.80)


def _mde_moments(tag: str, arm: int) -> str:
    only = lambda t: f"CASE WHEN t = {arm} THEN {t} END"  # noqa: E731
    return (
        f"SUM(CASE WHEN t = {arm} THEN 1 ELSE 0 END) * 1.0 AS {tag}n,\n"
        f"  {_irls_q9_sum(only('yo'))} AS {tag}s,\n"
        f"  {_irls_q9_sum(only('yo * yo'))} AS {tag}ss"
    )


_MDE_SQL = f"""
WITH s AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS t,
         CAST(o_totalprice AS DOUBLE) AS yo
  FROM orders
),
m AS (
  SELECT {_mde_moments('t_', 1)},
  {_mde_moments('c_', 0)}
  FROM s
)
SELECT CAST(t_n AS BIGINT) AS n_treated,
       CAST(c_n AS BIGINT) AS n_control,
       round(t_s / t_n - c_s / c_n, 6) AS observed_diff,
       round(sqrt((t_ss - t_s * t_s / t_n) / (t_n - 1.0) / t_n
                  + (c_ss - c_s * c_s / c_n) / (c_n - 1.0) / c_n), 6)
         AS se_diff,
       round(({_Z_ALPHA2} + {_Z_POWER})
             * sqrt((t_ss - t_s * t_s / t_n) / (t_n - 1.0) / t_n
                    + (c_ss - c_s * c_s / c_n) / (c_n - 1.0) / c_n), 6)
         AS mde_abs,
       round(({_Z_ALPHA2} + {_Z_POWER})
             * sqrt((t_ss - t_s * t_s / t_n) / (t_n - 1.0) / t_n
                    + (c_ss - c_s * c_s / c_n) / (c_n - 1.0) / c_n)
             / (c_s / c_n), 6) AS mde_rel
FROM m
"""


@register("ab_mde_readout", _MDE_SQL)
def q_ab_mde_readout(spark, sf_dir):
    """Minimum detectable effect at the observed design (two-sided
    alpha 0.05, power 0.80): per-arm moments on the 1e-9 DECIMAL grid,
    MDE = (z_alpha/2 + z_power)·SE(diff) in absolute and
    control-relative units, next to the observed difference — the
    "could we even have seen it" gate an experiment review starts
    with.

    Scale plan: ONE conditional-moment aggregate; the readout is
    arithmetic on a 1-row relation."""
    o = load_table(spark, sf_dir, "orders")
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    s = o.select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("t"),
        F.col("o_totalprice").cast("double").alias("yo"),
    )

    def q9_sum(term):
        return to_d(F.sum(F.round(term, 9).cast("decimal(38, 9)")))

    def arm(tag, a):
        only = lambda c: F.when(F.col("t") == a, c)  # noqa: E731
        return [
            F.count(only(F.lit(1))).cast("double").alias(f"{tag}n"),
            q9_sum(only(F.col("yo"))).alias(f"{tag}s"),
            q9_sum(only(F.col("yo") * F.col("yo"))).alias(f"{tag}ss"),
        ]

    m = s.agg(*(arm("t_", 1) + arm("c_", 0)))
    se = F.sqrt(
        (F.col("t_ss") - F.col("t_s") * F.col("t_s") / F.col("t_n"))
        / (F.col("t_n") - 1.0)
        / F.col("t_n")
        + (F.col("c_ss") - F.col("c_s") * F.col("c_s") / F.col("c_n"))
        / (F.col("c_n") - 1.0)
        / F.col("c_n")
    )
    k = _Z_ALPHA2 + _Z_POWER
    return m.select(
        F.col("t_n").cast("long").alias("n_treated"),
        F.col("c_n").cast("long").alias("n_control"),
        F.round(
            F.col("t_s") / F.col("t_n") - F.col("c_s") / F.col("c_n"), 6
        ).alias("observed_diff"),
        F.round(se, 6).alias("se_diff"),
        F.round(k * se, 6).alias("mde_abs"),
        F.round(k * se / (F.col("c_s") / F.col("c_n")), 6).alias("mde_rel"),
    )


# ---------------------------------------------------------------------------
# Group-sequential monitoring with the O'Brien-Fleming boundary: four
# calendar looks at the urgent-vs-other value contrast, each look's
# Welch z against c/sqrt(t_k) (c = 2.24, the standard K=4 two-sided
# 0.05 OBF constant) — the peeking-safe complement of the always-on
# `sprt_ab_monitor`.
# ---------------------------------------------------------------------------

_GS_LOOKS = ["1997-01-01", "1998-07-01", "2000-01-01", "2002-01-01"]
_GS_C = 2.24


def _gs_sql() -> str:
    look_case = " ".join(
        f"WHEN CAST(o_orderdate AS DATE) < DATE '{d}' THEN {i + 1}"
        for i, d in enumerate(_GS_LOOKS)
    )
    looks_rel = " UNION ALL ".join(
        f"SELECT {i + 1} AS look, DATE '{d}' AS cutoff_date"
        for i, d in enumerate(_GS_LOOKS)
    )
    m = lambda p, arm: (  # noqa: E731
        f"SUM(CASE WHEN t = {arm} THEN 1 ELSE 0 END) * 1.0 AS {p}n,\n"
        f"    {_irls_q9_sum(f'CASE WHEN t = {arm} THEN yo END')} AS {p}s,\n"
        f"    {_irls_q9_sum(f'CASE WHEN t = {arm} THEN yo * yo END')} AS {p}ss"
    )
    var = lambda p: f"(({p}ss_c - {p}s_c * {p}s_c / {p}n_c) / ({p}n_c - 1.0))"  # noqa: E731
    return f"""
WITH s AS (
  SELECT CASE {look_case} ELSE {len(_GS_LOOKS)} END AS slice,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS t,
         CAST(o_totalprice AS DOUBLE) AS yo
  FROM orders
),
per_slice AS (
  SELECT slice,
    {m('t_', 1)},
    {m('c_', 0)}
  FROM s GROUP BY slice
),
looks AS ({looks_rel}),
cum AS (
  SELECT l.look, l.cutoff_date,
         SUM(p.t_n) AS t_n_c, SUM(p.t_s) AS t_s_c, SUM(p.t_ss) AS t_ss_c,
         SUM(p.c_n) AS c_n_c, SUM(p.c_s) AS c_s_c, SUM(p.c_ss) AS c_ss_c
  FROM looks l JOIN per_slice p ON p.slice <= l.look
  GROUP BY l.look, l.cutoff_date
),
tot AS (SELECT MAX(t_n_c + c_n_c) AS n_final FROM cum)
SELECT look, cutoff_date,
       CAST(t_n_c + c_n_c AS BIGINT) AS n_cum,
       round((t_n_c + c_n_c) / tot.n_final, 6) AS info_frac,
       round((t_s_c / t_n_c - c_s_c / c_n_c)
             / sqrt({var('t_')} / t_n_c + {var('c_')} / c_n_c), 6) AS z_stat,
       round({_GS_C} / sqrt((t_n_c + c_n_c) / tot.n_final), 6) AS obf_boundary,
       CAST(CASE WHEN abs((t_s_c / t_n_c - c_s_c / c_n_c)
                          / sqrt({var('t_')} / t_n_c + {var('c_')} / c_n_c))
                      > {_GS_C} / sqrt((t_n_c + c_n_c) / tot.n_final)
                 THEN 1 ELSE 0 END AS BIGINT) AS crossed
FROM cum CROSS JOIN tot
ORDER BY look
"""


@register("group_sequential_obf", _gs_sql())
def q_group_sequential_obf(spark, sf_dir):
    """Four-look group-sequential monitor with the O'Brien-Fleming
    boundary c/sqrt(t_k) (c = {c}, K = 4, two-sided 0.05): cumulative
    Welch z of the urgent-vs-other value contrast at each calendar
    look vs its boundary.  Per-slice moments ride the 1e-9 DECIMAL
    grid; cumulative sums and the z/boundary arithmetic run on the
    4-row look relation — early looks need huge z (peeking-safe),
    late looks approach the fixed-horizon 1.96.

    Scale plan: ONE map-side combined group-by to the 4-slice grid;
    the look×slice join and every statistic live on ≤16 rows."""
    o = load_table(spark, sf_dir, "orders")
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    slice_col = F.when(
        F.col("o_orderdate").cast("date") < F.lit(_GS_LOOKS[0]).cast("date"), 1
    )
    for i, d in enumerate(_GS_LOOKS[1:], start=2):
        slice_col = slice_col.when(
            F.col("o_orderdate").cast("date") < F.lit(d).cast("date"), i
        )
    slice_col = slice_col.otherwise(len(_GS_LOOKS))
    s = o.select(
        slice_col.alias("slice"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("t"),
        F.col("o_totalprice").cast("double").alias("yo"),
    )

    def q9_sum(term):
        return to_d(F.sum(F.round(term, 9).cast("decimal(38, 9)")))

    def arm(p, a):
        only = lambda c: F.when(F.col("t") == a, c)  # noqa: E731
        return [
            F.count(only(F.lit(1))).cast("double").alias(f"{p}n"),
            q9_sum(only(F.col("yo"))).alias(f"{p}s"),
            q9_sum(only(F.col("yo") * F.col("yo"))).alias(f"{p}ss"),
        ]

    per_slice = (
        s.groupBy("slice")
        .agg(*(arm("t_", 1) + arm("c_", 0)))
        .localCheckpoint(eager=True)
    )
    looks = per_slice.sparkSession.createDataFrame(
        [(i + 1, d) for i, d in enumerate(_GS_LOOKS)], "look int, cutoff string"
    ).select("look", F.col("cutoff").cast("date").alias("cutoff_date"))
    cum = (
        looks.join(F.broadcast(per_slice), per_slice["slice"] <= looks["look"])
        .groupBy("look", "cutoff_date")
        .agg(
            F.sum("t_n").alias("t_n_c"),
            F.sum("t_s").alias("t_s_c"),
            F.sum("t_ss").alias("t_ss_c"),
            F.sum("c_n").alias("c_n_c"),
            F.sum("c_s").alias("c_s_c"),
            F.sum("c_ss").alias("c_ss_c"),
        )
    )
    tot = cum.agg(F.max(F.col("t_n_c") + F.col("c_n_c")).alias("n_final"))
    var_t = (
        F.col("t_ss_c") - F.col("t_s_c") * F.col("t_s_c") / F.col("t_n_c")
    ) / (F.col("t_n_c") - 1.0)
    var_c = (
        F.col("c_ss_c") - F.col("c_s_c") * F.col("c_s_c") / F.col("c_n_c")
    ) / (F.col("c_n_c") - 1.0)
    z = (
        F.col("t_s_c") / F.col("t_n_c") - F.col("c_s_c") / F.col("c_n_c")
    ) / F.sqrt(var_t / F.col("t_n_c") + var_c / F.col("c_n_c"))
    info = (F.col("t_n_c") + F.col("c_n_c")) / F.col("n_final")
    bound = _GS_C / F.sqrt(info)
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "look",
            "cutoff_date",
            (F.col("t_n_c") + F.col("c_n_c")).cast("long").alias("n_cum"),
            F.round(info, 6).alias("info_frac"),
            F.round(z, 6).alias("z_stat"),
            F.round(bound, 6).alias("obf_boundary"),
            F.when(F.abs(z) > bound, 1).otherwise(0).cast("long").alias("crossed"),
        )
        .orderBy("look")
    )


# ---------------------------------------------------------------------------
# Theil-T inequality decomposition of customer revenue across nations:
# T_total = T_between + Σ_g share_g · T_within_g — the additively
# decomposable inequality index (`key_skew_gini`'s Gini is NOT
# decomposable, which is why regional attribution needs Theil).
# ---------------------------------------------------------------------------

_THEIL_SQL = """
WITH cust AS (
  SELECT c.c_nationkey AS nation, o.o_custkey,
         CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30, 6))) AS VARCHAR)
              AS DOUBLE) AS x
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
tot AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(CAST(SUM(CAST(round(x, 6) AS DECIMAL(38, 9))) AS VARCHAR)
              AS DOUBLE) AS sx
  FROM cust
),
grp AS (
  SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(CAST(SUM(CAST(round(x, 6) AS DECIMAL(38, 9))) AS VARCHAR)
              AS DOUBLE) AS sx_g
  FROM cust GROUP BY nation
),
within AS (
  SELECT nation, n_g, sx_g,
         round(CAST(CAST(SUM(CAST(round(
             x / (sx_g / n_g) * round(ln(x / (sx_g / n_g)), 6), 9)
           AS DECIMAL(38, 9))) AS VARCHAR) AS DOUBLE) / n_g, 9) AS t_within
  FROM cust JOIN grp USING (nation)
  GROUP BY nation, n_g, sx_g
),
btw AS (
  SELECT round(CAST(CAST(SUM(CAST(round(
             (sx_g / tot.sx) * round(ln((sx_g / n_g) / (tot.sx / tot.n)), 6), 9)
           AS DECIMAL(38, 9))) AS VARCHAR) AS DOUBLE), 9) AS t_between
  FROM grp CROSS JOIN tot
)
SELECT w.nation, w.n_g AS n_customers,
       round(w.sx_g / tot.sx, 6) AS revenue_share,
       round(w.t_within, 6) AS theil_within,
       round((w.sx_g / tot.sx) * w.t_within, 6) AS weighted_within,
       round(btw.t_between, 6) AS theil_between
FROM within w CROSS JOIN tot CROSS JOIN btw
ORDER BY w.nation
"""


@register("theil_index_decomposition", _THEIL_SQL)
def q_theil_index_decomposition(spark, sf_dir):
    """Theil-T inequality of per-customer revenue decomposed across
    nations: per-nation within-group Theil (revenue-share weighted)
    plus the between-group term — additively exact, unlike Gini.
    Per-customer revenue is an exact decimal sum; every x·ln(x/μ) term
    quantizes the log at 1e-6 and the product at 1e-9 before its
    DECIMAL group sum, so the decomposition is bit-stable.

    Scale plan: one PK-grouped join+aggregate to the customer grain,
    one nation-grain rollup, and the within pass re-reads the customer
    relation with group means attached by a nation-keyed broadcast
    join — no windows, nothing driver-side."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    to_d = lambda col: col.cast("string").cast("double")  # noqa: E731
    cust = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nation"), "o_custkey")
        .agg(
            to_d(F.sum(F.col("o_totalprice").cast("decimal(30, 6)"))).alias("x")
        )
        .localCheckpoint(eager=True)
    )

    def q9_sum(term):
        return to_d(F.sum(F.round(term, 9).cast("decimal(38, 9)")))

    def dec_sum(term):
        return to_d(F.sum(F.round(term, 6).cast("decimal(38, 9)")))

    tot = cust.agg(
        F.count(F.lit(1)).cast("double").alias("n"), dec_sum(F.col("x")).alias("sx")
    )
    grp = cust.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        dec_sum(F.col("x")).alias("sx_g"),
    )
    mu_g = F.col("sx_g") / F.col("n_g")
    within = (
        cust.join(F.broadcast(grp), "nation")
        .groupBy("nation", "n_g", "sx_g")
        .agg(
            F.round(
                q9_sum(
                    F.col("x") / mu_g * F.round(F.log(F.col("x") / mu_g), 6)
                )
                / F.col("n_g").cast("double"),
                9,
            ).alias("t_within")
        )
    )
    mu = F.col("sx") / F.col("n")
    btw = (
        grp.crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                q9_sum(
                    (F.col("sx_g") / F.col("sx"))
                    * F.round(F.log(mu_g / mu), 6)
                ),
                9,
            ).alias("t_between")
        )
    )
    return (
        within.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btw))
        .select(
            "nation",
            F.col("n_g").alias("n_customers"),
            F.round(F.col("sx_g") / F.col("sx"), 6).alias("revenue_share"),
            F.round(F.col("t_within"), 6).alias("theil_within"),
            F.round((F.col("sx_g") / F.col("sx")) * F.col("t_within"), 6).alias(
                "weighted_within"
            ),
            F.round(F.col("t_between"), 6).alias("theil_between"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# Jarque-Bera normality test per event_type: skewness and excess
# kurtosis from central moments, JB = n/6·(S² + K²/4) — the
# distributional-assumption gate in front of every z/t-based monitor
# here (`fdr_bh_metric_screen`, `ab_mde_readout` assume approximate
# normality of the mean; JB says how non-normal the raw metric is).
# ---------------------------------------------------------------------------

_JB_SQL = """
WITH m AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(CAST(SUM(CAST(round(value, 9) AS DECIMAL(38, 9))) AS VARCHAR)
              AS DOUBLE) AS s1,
         CAST(CAST(SUM(CAST(round(value * value, 9) AS DECIMAL(38, 9)))
                   AS VARCHAR) AS DOUBLE) AS s2,
         CAST(CAST(SUM(CAST(round(value * value * value, 9)
                            AS DECIMAL(38, 9))) AS VARCHAR) AS DOUBLE) AS s3,
         CAST(CAST(SUM(CAST(round(value * value * value * value, 9)
                            AS DECIMAL(38, 9))) AS VARCHAR) AS DOUBLE) AS s4
  FROM events GROUP BY event_type
),
c AS (
  SELECT event_type, n,
         s2 / n - (s1 / n) * (s1 / n) AS m2,
         s3 / n - 3.0 * (s1 / n) * (s2 / n) + 2.0 * (s1 / n) * (s1 / n)
           * (s1 / n) AS m3,
         s4 / n - 4.0 * (s1 / n) * (s3 / n)
           + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
           - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
  FROM m
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       round(m3 / pow(m2, 1.5), 6) AS skewness,
       round(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis,
       round(n / 6.0 * (pow(m3 / pow(m2, 1.5), 2)
             + pow(m4 / (m2 * m2) - 3.0, 2) / 4.0), 6) AS jarque_bera
FROM c
ORDER BY event_type
"""


@register("jarque_bera_normality", _JB_SQL)
def q_jarque_bera_normality(spark, sf_dir):
    """Jarque-Bera normality statistic per event_type on the value
    metric: central moments from quantized raw-moment sums (one shared
    binomial-expansion expression on both engines), skewness
    m3/m2^1.5, excess kurtosis m4/m2²-3, JB = n/6(S² + K²/4) —
    asymptotically chi²(2) under normality, so JB ≫ 6 rejects at ~5%.

    Scale plan: ONE map-side combined group-by carrying four power
    sums per type — the entire test is moment arithmetic on the
    |types|-row relation."""
    ev = load_table(spark, sf_dir, "events")
    to_d = lambda c: c.cast("string").cast("double")  # noqa: E731
    v = F.col("value")

    def q9_sum(term):
        return to_d(F.sum(F.round(term, 9).cast("decimal(38, 9)")))

    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        q9_sum(v).alias("s1"),
        q9_sum(v * v).alias("s2"),
        q9_sum(v * v * v).alias("s3"),
        q9_sum(v * v * v * v).alias("s4"),
    )
    mu = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mu * mu
    m3 = F.col("s3") / F.col("n") - 3.0 * mu * (F.col("s2") / F.col("n")) + 2.0 * mu * mu * mu
    m4 = (
        F.col("s4") / F.col("n")
        - 4.0 * mu * (F.col("s3") / F.col("n"))
        + 6.0 * mu * mu * (F.col("s2") / F.col("n"))
        - 3.0 * mu * mu * mu * mu
    )
    skew = m3 / F.pow(m2, 1.5)
    kurt = m4 / (m2 * m2) - 3.0
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("excess_kurtosis"),
        F.round(
            F.col("n") / 6.0 * (F.pow(skew, 2.0) + F.pow(kurt, 2.0) / 4.0), 6
        ).alias("jarque_bera"),
    ).orderBy("event_type")
