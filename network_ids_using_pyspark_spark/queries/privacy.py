"""Privacy release-gate family: k-anonymity / l-diversity,
seeded-Laplace differentially-private release, and t-closeness.

Split out of ``datamgmt.py`` per VERDICT r6 ask #5 (≤2,000-LoC file
bar).  ``datamgmt.py`` imports this module at the exact position the
k-anonymity block originally occupied, so registration order — and
therefore the driver's 50-entry correctness window — is unchanged
(``t_closeness_risk`` sits in the round-7 ``_ROUND_PRIORITY`` pin, so
its in-module position never reaches the final registry order).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from . import register

# ---------------------------------------------------------------------------
# Privacy risk: k-anonymity / l-diversity audit over quasi-identifiers.
# ---------------------------------------------------------------------------

_KANON_K = 5  # minimum safe equivalence-class size
_LDIV_L = 3  # minimum distinct sensitive values per class

_KANON_SQL = f"""
WITH classes AS (
  SELECT event_type,
         EXTRACT(hour FROM ts) AS qh,
         CAST(floor(value / 50) AS BIGINT) AS qv,
         COUNT(*) AS class_n,
         COUNT(DISTINCT user_id) AS n_users
  FROM events
  GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN class_n < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_risky_classes,
       CAST(SUM(CASE WHEN class_n < {_KANON_K} THEN class_n ELSE 0 END) AS BIGINT)
         AS n_risky_rows,
       CAST(SUM(CASE WHEN n_users < {_LDIV_L} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_diversity_classes
FROM classes GROUP BY event_type
"""


@register("k_anonymity_risk", _KANON_SQL)
def q_k_anonymity_risk(spark, sf_dir):
    """Re-identification risk audit: equivalence classes over the
    quasi-identifier tuple (event_type, hour-of-day, value band) with
    k-anonymity (class size < {_KANON_K}) and l-diversity (distinct
    users < {_LDIV_L}) violation counts per event type — the gate a
    release pipeline runs before publishing "anonymized" activity data
    (pairs with `pseudonymize_user_activity`, which hides identifiers
    but cannot fix small equivalence classes).

    Scale plan: one scan → one aggregate keyed by the quasi-identifier
    tuple (map-side combined; the distinct-user count is the only
    shuffle-widening term and is bounded per class), then a type-keyed
    rollup of the class relation.  Purely integer outputs."""
    ev = load_table(spark, sf_dir, "events")
    classes = ev.groupBy(
        "event_type",
        F.hour("ts").alias("qh"),
        F.floor(F.col("value") / 50).cast("long").alias("qv"),
    ).agg(
        F.count(F.lit(1)).alias("class_n"),
        F.countDistinct("user_id").alias("n_users"),
    )
    return classes.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.when(F.col("class_n") < _KANON_K, 1).otherwise(0))
        .cast("long")
        .alias("n_risky_classes"),
        F.sum(F.when(F.col("class_n") < _KANON_K, F.col("class_n")).otherwise(0))
        .cast("long")
        .alias("n_risky_rows"),
        F.sum(F.when(F.col("n_users") < _LDIV_L, 1).otherwise(0))
        .cast("long")
        .alias("n_low_diversity_classes"),
    )


# ---------------------------------------------------------------------------
# Differential-privacy-style noisy release: per-(type, day) counts with
# seeded Laplace noise.  The noise is drawn by inverse-CDF over the
# PORTABLE hash uniform — deterministic and bit-identical across
# engines, which is what makes a noisy release *reproducible* (the
# production property: re-running the pipeline must publish the same
# noisy table, not re-draw fresh noise; the seed is the privacy budget
# ledger's job).
# ---------------------------------------------------------------------------

_DP_EPS = 1.0  # per-release epsilon; sensitivity 1 → Laplace scale 1/eps

_DP_SQL = f"""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS epoch_day,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
u AS (
  SELECT event_type, epoch_day, n,
         CAST({{h}} AS DOUBLE) / {{space}} - 0.5 AS u
  FROM daily
)
SELECT event_type, CAST(epoch_day AS BIGINT) AS epoch_day,
       CAST(n AS BIGINT) AS true_n,
       round(n + (1.0 / {_DP_EPS}) * CASE WHEN u < 0 THEN 1 ELSE -1 END
               * ln(1 - 2 * abs(u)), 6) AS noisy_n
FROM u
"""


def _dp_sql() -> str:
    from ..functions.hashing import HASH_SPACE, portable_hash64_sql

    h = portable_hash64_sql("concat(event_type, ':', CAST(epoch_day AS VARCHAR))", seed="dp1:")
    return _DP_SQL.replace("{h}", h).replace("{space}", f"{HASH_SPACE}.0")


@register("dp_noisy_daily_counts", _dp_sql())
def q_dp_noisy_daily_counts(spark, sf_dir):
    """Seeded-Laplace noisy daily counts per event type (inverse-CDF
    over the portable md5 uniform, scale 1/ε with ε={_DP_EPS}).  Noise
    is a pure function of (seed, cell key): the release is reproducible
    AND oracle-checkable, replacing nondeterministic `rand()` exactly
    as the engine's sampling family does.

    Scale plan: one scan → map-side-combined (type, day) aggregate;
    the noise term is a per-row built-in expression (md5/ln), no
    shuffle beyond the aggregate, output calendar-bounded."""
    from ..functions.hashing import HASH_SPACE, portable_hash64

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias(
            "epoch_day"
        ),
    ).agg(F.count(F.lit(1)).alias("n"))
    u = (
        portable_hash64(
            F.concat(F.col("event_type"), F.lit(":"), F.col("epoch_day").cast("string")),
            seed="dp1:",
        ).cast("double")
        / F.lit(float(HASH_SPACE))
        - 0.5
    )
    noise = (
        F.lit(1.0 / _DP_EPS)
        * F.when(u < 0, 1).otherwise(-1)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u))
    )
    return daily.select(
        "event_type",
        F.col("epoch_day").cast("long").alias("epoch_day"),
        F.col("n").cast("long").alias("true_n"),
        F.round(F.col("n") + noise, 6).alias("noisy_n"),
    )

# ---------------------------------------------------------------------------
# t-closeness audit — completes the release-gate privacy triple beside
# `k_anonymity_risk`'s k-anonymity/l-diversity columns (Li, Li &
# Venkatasubramanian, ICDE 2007): a quasi-identifier class leaks when
# the DISTRIBUTION of its sensitive attribute strays from the global
# one, even if the class is large and diverse.  Sensitive attribute =
# ordered value band (m=8 fixed-grid bands); distance = ordered-EMD
# (mean |cumulative difference|).  Exact integer arithmetic: with
# p_i−q_i = (band_n·N − g_i·class_n)/(class_n·N), every cumulative sum
# stays an int64 numerator over the shared denominator; ONE division
# at the end.  |numerators| < class_n·N ≤ N² — int64-safe to ~3·10⁹
# rows, DECIMAL beyond.
# ---------------------------------------------------------------------------

_TCLOSE_M = 8       # value bands (0..7, width 70 covers the fixture range)
_TCLOSE_W = 70      # band width
_TCLOSE_T = "0.2"   # closeness threshold, shared literal

_TCLOSE_SQL = f"""
WITH banded AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS qh,
         least(greatest(CAST(floor(value / {_TCLOSE_W}) AS BIGINT), 0), {_TCLOSE_M - 1}) AS band
  FROM events
),
g AS (SELECT band, COUNT(*) AS gn FROM banded GROUP BY band),
tot AS (SELECT COUNT(*) AS n FROM banded),
cls AS (SELECT event_type, qh, COUNT(*) AS class_n FROM banded GROUP BY 1, 2),
cb AS (
  SELECT event_type, qh, band, COUNT(*) AS bn FROM banded GROUP BY 1, 2, 3
),
grid AS (
  SELECT c.event_type, c.qh, c.class_n, b.band,
         COALESCE(cb.bn, 0) AS bn, COALESCE(g.gn, 0) AS gn
  FROM cls c
  CROSS JOIN (SELECT unnest(range(0, {_TCLOSE_M})) AS band) b
  LEFT JOIN cb ON cb.event_type = c.event_type AND cb.qh = c.qh AND cb.band = b.band
  LEFT JOIN g ON g.band = b.band
),
cum AS (
  SELECT event_type, qh, class_n,
         SUM(abs(cum_num)) AS sum_abs
  FROM (
    SELECT event_type, qh, class_n, band,
           SUM(bn * tot.n - gn * class_n)
             OVER (PARTITION BY event_type, qh ORDER BY band
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_num
    FROM grid CROSS JOIN tot
  )
  GROUP BY 1, 2, 3
),
emd AS (
  SELECT c.event_type, c.qh,
         round(CAST(c.sum_abs AS DOUBLE)
               / (CAST(c.class_n AS DOUBLE) * tot.n * {_TCLOSE_M - 1}), 9) AS emd
  FROM cum c CROSS JOIN tot
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN emd > {_TCLOSE_T} THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_classes,
       round(MAX(emd), 9) AS max_emd
FROM emd GROUP BY event_type
"""


@register("t_closeness_risk", _TCLOSE_SQL)
def q_t_closeness_risk(spark, sf_dir):
    """t-closeness audit over (event_type, hour) classes: ordered-EMD
    between each class's value-band distribution and the global one,
    rolled up per event type with the t=0.2 violation count.

    Scale plan: two map-side-combined aggregates over the fact scan
    (class×band and global band); the dense grid, cumulative sums, and
    EMD all run on the |classes|×m relation (~10³ rows at any corpus
    size) with the 1-row total and m-row global histogram broadcast —
    the window partitions by class, never a global order."""
    ev = load_table(spark, sf_dir, "events")
    band = F.least(
        F.greatest(F.floor(F.col("value") / _TCLOSE_W).cast("long"), F.lit(0)),
        F.lit(_TCLOSE_M - 1),
    )
    banded = ev.select(
        "event_type", F.hour("ts").alias("qh"), band.alias("band")
    )
    g = banded.groupBy("band").agg(F.count(F.lit(1)).alias("gn"))
    tot = banded.agg(F.count(F.lit(1)).alias("n"))
    cls = banded.groupBy("event_type", "qh").agg(
        F.count(F.lit(1)).alias("class_n")
    )
    cb = banded.groupBy("event_type", "qh", "band").agg(
        F.count(F.lit(1)).alias("bn")
    )
    bands = banded.sparkSession.range(0, _TCLOSE_M).select(
        F.col("id").cast("long").alias("band")
    )
    grid = (
        cls.crossJoin(F.broadcast(bands))
        .join(cb, ["event_type", "qh", "band"], "left")
        .join(F.broadcast(g), "band", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type", "qh", "class_n", "band",
            (F.coalesce("bn", F.lit(0)) * F.col("n")
             - F.coalesce("gn", F.lit(0)) * F.col("class_n")).alias("num"),
            "n",
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type", "qh")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.withColumn("cum_num", F.sum("num").over(w))
    emd = (
        cum.groupBy("event_type", "qh", "class_n", "n")
        .agg(F.sum(F.abs("cum_num")).alias("sum_abs"))
        .select(
            "event_type",
            F.round(
                F.col("sum_abs").cast("double")
                / (F.col("class_n").cast("double") * F.col("n") * (_TCLOSE_M - 1)),
                9,
            ).alias("emd"),
        )
    )
    return emd.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum((F.col("emd") > float(_TCLOSE_T)).cast("long")).alias("n_risky_classes"),
        F.round(F.max("emd"), 9).alias("max_emd"),
    )


# ---------------------------------------------------------------------------
# Entropy l-diversity — the information-theoretic strengthening of
# k_anonymity_risk's distinct-count l-diversity (Machanavajjhala et al.,
# "l-Diversity", ICDE 2006 §3.2): a class passes entropy-l only when the
# DISTRIBUTION of its sensitive values is diverse, H(class) ≥ ln(l) —
# distinct-count l can be gamed by one dominant value plus l−1 outliers.
# Bit-reproducibility: H = ln(class_n) − Σ bn·ln(bn) / class_n; each
# bn·ln(bn) term is a pure function of an int64 (identical doubles on
# both engines), the SUM runs in DECIMAL(30,12) (order-independent),
# and the final expression is two double ops on identical inputs.
# ---------------------------------------------------------------------------

_ENTL_L = 3  # entropy-l threshold: H >= ln(3)

_ENTL_SQL = f"""
WITH cb AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS qh,
         CAST(floor(value / 50) AS BIGINT) AS qv, COUNT(*) AS bn
  FROM events GROUP BY 1, 2, 3
),
cls AS (
  SELECT event_type, qh,
         SUM(bn) AS class_n,
         CAST(CAST(SUM(CAST(bn * ln(bn) AS DECIMAL(30, 12))) AS VARCHAR)
              AS DOUBLE) AS sum_nlogn
  FROM cb GROUP BY 1, 2
),
ent AS (
  SELECT event_type, ln(CAST(class_n AS DOUBLE)) - sum_nlogn / class_n AS h
  FROM cls
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN h < ln({_ENTL_L}.0) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_risky_classes,
       round(MIN(h), 6) + 0.0 AS min_entropy,
       round(MAX(h), 6) + 0.0 AS max_entropy
FROM ent GROUP BY event_type
"""


@register("l_diversity_entropy", _ENTL_SQL)
def q_l_diversity_entropy(spark, sf_dir):
    """Entropy l-diversity audit over the (event_type, hour) classes
    with the value band as the sensitive attribute: per-class Shannon
    entropy from exact integer band counts, risky when H < ln(3).

    Scale plan: one scan → one map-side-combined (class × band)
    aggregate, then a class-grain reduce; every post-scan relation is
    bounded by the QI domain (|types|·24), so at 100 TB this is a pure
    scan like its k-anonymity sibling."""
    cb = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.hour("ts").alias("qh"),
            F.floor(F.col("value") / 50).cast("long").alias("qv"),
        )
        .agg(F.count(F.lit(1)).alias("bn"))
    )
    cls = cb.groupBy("event_type", "qh").agg(
        F.sum("bn").alias("class_n"),
        F.sum(
            (F.col("bn") * F.log(F.col("bn").cast("double"))).cast("decimal(30, 12)")
        )
        .cast("double")
        .alias("sum_nlogn"),
    )
    ent = cls.select(
        "event_type",
        (
            F.log(F.col("class_n").cast("double"))
            - F.col("sum_nlogn") / F.col("class_n")
        ).alias("h"),
    )
    return ent.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum(
            F.when(F.col("h") < F.log(F.lit(float(_ENTL_L))), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_risky_classes"),
        # + 0.0 folds IEEE −0.0 (a just-below-zero H rounded at a
        # single-band class) to +0.0 identically on both engines
        (F.round(F.min("h"), 6) + F.lit(0.0)).alias("min_entropy"),
        (F.round(F.max("h"), 6) + F.lit(0.0)).alias("max_entropy"),
    )


# ---------------------------------------------------------------------------
# Quasi-identifier generalization ladder — the REMEDY the k-anonymity
# audit motivates (Sweeney 2002; Samarati's full-domain generalization):
# coarsen the QI grid level by level (hour → 2/4/8-hour bands, value
# band width 50 → 100/200/400) and report, per level, how far the
# release is from k≥5 — the publishing pipeline picks the first level
# whose violation count hits zero (least information loss).  Pure
# integer arithmetic end to end.
# ---------------------------------------------------------------------------

_LADDER_LEVELS = [1, 2, 4, 8]
_LADDER_K = 5

_LADDER_SQL = f"""
WITH lv AS (SELECT unnest([{", ".join(str(g) for g in _LADDER_LEVELS)}]) AS level),
cls AS (
  SELECT lv.level, event_type,
         CAST(floor(EXTRACT(hour FROM ts) / lv.level) AS BIGINT) AS qh,
         CAST(floor(value / (50 * lv.level)) AS BIGINT) AS qv,
         COUNT(*) AS class_n
  FROM events CROSS JOIN lv GROUP BY 1, 2, 3, 4
)
SELECT level,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN class_n < {_LADDER_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_risky_classes,
       CAST(SUM(CASE WHEN class_n < {_LADDER_K} THEN class_n ELSE 0 END) AS BIGINT)
         AS n_risky_rows,
       CAST(MIN(class_n) AS BIGINT) AS min_class_n,
       MIN(class_n) >= {_LADDER_K} AS meets_k
FROM cls GROUP BY level
"""


@register("qi_generalization_ladder", _LADDER_SQL)
def q_qi_generalization_ladder(spark, sf_dir):
    """k-anonymity generalization ladder: the (hour, value-band) QI
    grid coarsened by levels 1/2/4/8, with per-level class counts,
    k<5 violations, and a meets_k flag — one row per level.

    Scale plan: the level dimension explodes the scan 4× BEFORE the
    map-side combine (partial aggregation absorbs the expansion: the
    shuffled relation is the 4-level class grid, bounded by the QI
    domain, not the fact table); no joins, no windows."""
    ev = load_table(spark, sf_dir, "events")
    banded = ev.select(
        "event_type", F.hour("ts").alias("qh0"), "value"
    ).withColumn(
        "level", F.explode(F.array(*[F.lit(g) for g in _LADDER_LEVELS]))
    )
    cls = banded.groupBy(
        "level",
        "event_type",
        F.floor(F.col("qh0") / F.col("level")).cast("long").alias("qh"),
        F.floor(F.col("value") / (50 * F.col("level"))).cast("long").alias("qv"),
    ).agg(F.count(F.lit(1)).alias("class_n"))
    return cls.groupBy("level").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum(F.when(F.col("class_n") < _LADDER_K, 1).otherwise(0))
        .cast("long")
        .alias("n_risky_classes"),
        F.sum(F.when(F.col("class_n") < _LADDER_K, F.col("class_n")).otherwise(0))
        .cast("long")
        .alias("n_risky_rows"),
        F.min("class_n").cast("long").alias("min_class_n"),
        (F.min("class_n") >= _LADDER_K).alias("meets_k"),
    )


# ---------------------------------------------------------------------------
# Stability-thresholded noisy release — the third standard DP release
# mechanism beside dp_noisy_daily_counts' plain Laplace counts: publish
# a (type × hour) histogram cell ONLY if its noisy count clears the
# stability threshold τ = 1 + 2·ln(2/δ)/ε (Korolova et al., WWW 2009;
# the mechanism behind "drop rare search queries from the release").
# Noise is the engine's seeded inverse-CDF Laplace over the portable
# hash uniform — reproducible and oracle-checkable, same contract as
# dp_noisy_daily_counts.
# ---------------------------------------------------------------------------

_DPK_EPS = 1.0
_DPK_DELTA = 1e-6
# τ = 1 + 2·ln(2/δ)/ε, evaluated once so both engines share the literal
_DPK_TAU = f"(1.0 + 2.0 * ln(2.0 / {_DPK_DELTA}) / {_DPK_EPS})"

_DPK_SQL = f"""
WITH cells AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS qh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
noisy AS (
  SELECT event_type, CAST(qh AS BIGINT) AS qh, n,
         n + (1.0 / {_DPK_EPS})
           * CASE WHEN u < 0 THEN 1 ELSE -1 END * ln(1 - 2 * abs(u)) AS noisy_n
  FROM (
    SELECT event_type, qh, n,
           CAST({{h}} AS DOUBLE) / {{space}} - 0.5 AS u
    FROM cells
  )
)
SELECT event_type, qh, CAST(n AS BIGINT) AS true_n,
       round(noisy_n, 6) AS noisy_n,
       CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY noisy_n DESC, qh)
            AS BIGINT) AS released_rank
FROM noisy
WHERE noisy_n > {_DPK_TAU}
"""


def _dpk_sql() -> str:
    from ..functions.hashing import HASH_SPACE, portable_hash64_sql

    h = portable_hash64_sql(
        "concat(event_type, '@', CAST(qh AS VARCHAR))", seed="dpk1:"
    )
    return _DPK_SQL.replace("{h}", h).replace("{space}", f"{HASH_SPACE}.0")


@register("dp_stability_histogram", _dpk_sql())
def q_dp_stability_histogram(spark, sf_dir):
    """Stability-based noisy histogram release over (event_type, hour):
    seeded-Laplace noise (ε=1), cells published only when the noisy
    count clears τ = 1 + 2·ln(2/δ)/ε (δ=1e-6), ranked per type by the
    released noisy count.

    Scale plan: one scan → map-side-combined (type, hour) aggregate;
    noise/threshold are per-row expressions on the ≤|types|·24-cell
    relation, and the rank window partitions by type over that bounded
    relation — never the fact table."""
    from ..functions.hashing import HASH_SPACE, portable_hash64

    cells = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.hour("ts").alias("qh"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    u = (
        portable_hash64(
            F.concat(F.col("event_type"), F.lit("@"), F.col("qh").cast("string")),
            seed="dpk1:",
        ).cast("double")
        / F.lit(float(HASH_SPACE))
        - 0.5
    )
    noisy = cells.select(
        "event_type",
        F.col("qh").cast("long").alias("qh"),
        "n",
        (
            F.col("n")
            + F.lit(1.0 / _DPK_EPS)
            * F.when(u < 0, 1).otherwise(-1)
            * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u))
        ).alias("noisy_n"),
    )
    tau = 1.0 + 2.0 * F.log(F.lit(2.0 / _DPK_DELTA)) / _DPK_EPS
    w = Window.partitionBy("event_type").orderBy(F.desc("noisy_n"), F.asc("qh"))
    return (
        noisy.filter(F.col("noisy_n") > tau)
        .select(
            "event_type",
            "qh",
            F.col("n").cast("long").alias("true_n"),
            F.round("noisy_n", 6).alias("noisy_n"),
            F.row_number().over(w).cast("long").alias("released_rank"),
        )
    )

# ---------------------------------------------------------------------------
# PII release gate: the per-source compliance ROLLUP over the corpus
# scrub machinery (operators/textops.py PII_PATTERNS / scrub_pii —
# the per-document transform is certified row-level by
# `pii_scrub_audit` in corpus_ext.py).  This op answers the question a
# release review actually asks: how much PII does each source carry,
# how much text does redaction remove, and does a rescan of the
# redacted text find ZERO residual matches.  The fixture documents are
# synthetic word salad with no PII, so the query DETERMINISTICALLY
# INJECTS known PII (portable-hash-chosen ~30% of docs) identically on
# both engines, exercising the gate on known positives.
# ---------------------------------------------------------------------------


def _pii_gate_sql() -> str:
    from ..functions.hashing import hash_bucket_sql
    from ..operators.textops import PII_PATTERNS, PII_SCRUB_ORDER

    hb = hash_bucket_sql("doc_id", 100, seed="pii:")
    red = "t"
    for key in PII_SCRUB_ORDER:
        pat, repl = PII_PATTERNS[key]
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    counts = {
        k: f"CAST(len(regexp_extract_all(t, '{PII_PATTERNS[k][0]}')) AS BIGINT)"
        for k in PII_SCRUB_ORDER
    }
    resid = " + ".join(
        f"len(regexp_extract_all(red, '{PII_PATTERNS[k][0]}'))" for k in PII_SCRUB_ORDER
    )
    return f"""
    WITH injected AS (
      SELECT source,
             text || CASE
               WHEN {hb} < 8 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
               WHEN {hb} < 16 THEN ' call 555-867-5309 or 555-123-4567'
               WHEN {hb} < 22 THEN ' ssn 078-05-1120'
               WHEN {hb} < 30 THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
               ELSE '' END AS t
      FROM documents
    ), scanned AS (
      SELECT source, t, {red} AS red,
             {counts['email']} AS ne, {counts['phone']} AS np,
             {counts['ssn']} AS ns, {counts['ip']} AS ni
      FROM injected
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN ne + np + ns + ni > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_with_pii,
           CAST(SUM(ne) AS BIGINT) AS n_email,
           CAST(SUM(np) AS BIGINT) AS n_phone,
           CAST(SUM(ns) AS BIGINT) AS n_ssn,
           CAST(SUM(ni) AS BIGINT) AS n_ip,
           CAST(SUM(length(t) - length(red)) AS BIGINT) AS chars_redacted,
           CAST(SUM({resid}) AS BIGINT) AS n_residual_after_redaction
    FROM scanned
    GROUP BY source
    """


@register("pii_scan_report", _pii_gate_sql())
def q_pii_scan_report(spark, sf_dir):
    """Per-source PII release gate over `documents`: per-kind match
    counts, the share of affected documents, the redacted-character
    volume, and the residual-match count after redaction (must be 0 —
    the redaction pass's self-test, asserted identically by the DuckDB
    oracle).  Complements `pii_scrub_audit` (corpus_ext.py), which
    certifies the per-document scrub TRANSFORM row-level; this is the
    AGGREGATE gate a release pipeline thresholds on before shipping a
    corpus snapshot.  Adds the SSN pattern to the shared family
    (operators/textops.py) and injects all four kinds on a portable-
    hash-chosen ~30% of docs (the corpus itself is PII-free).

    No reference counterpart (SURVEY.md §2.7: the reference has no
    string functions at all) — north-star LLM-data family.

    Scale plan: regexp scan/redact are per-row codegen expressions on
    the column-pruned (doc_id, source, text) projection — no UDF, no
    Python; the only shuffle is the map-side-combined per-source
    rollup.  At 100 TB this is scan-bound and embarrassingly parallel;
    patterns are shared Java/RE2-safe literals."""
    from ..functions.hashing import hash_bucket
    from ..operators.textops import PII_PATTERNS, PII_SCRUB_ORDER, scrub_pii

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    b = hash_bucket("doc_id", 100, seed="pii:")
    t = F.concat(
        F.col("text"),
        F.when(
            b < 8,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        )
        .when(b < 16, F.lit(" call 555-867-5309 or 555-123-4567"))
        .when(b < 22, F.lit(" ssn 078-05-1120"))
        .when(
            b < 30,
            F.concat(
                F.lit(" host 10.0."),
                F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
                F.lit(".7"),
            ),
        )
        .otherwise(F.lit("")),
    )
    red = scrub_pii(t)

    def _n(text_col, kind):
        pat, _ = PII_PATTERNS[kind]
        return F.coalesce(
            F.size(F.regexp_extract_all(text_col, F.lit(pat), F.lit(0))), F.lit(0)
        ).cast("long")

    resid = None
    for kind in PII_SCRUB_ORDER:
        c = _n(red, kind)
        resid = c if resid is None else resid + c
    scanned = docs.select(
        "source",
        F.length(t).alias("len_t"),
        F.length(red).alias("len_red"),
        _n(t, "email").alias("ne"),
        _n(t, "phone").alias("np"),
        _n(t, "ssn").alias("ns"),
        _n(t, "ip").alias("ni"),
        resid.alias("resid"),
    )
    return scanned.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("ne") + F.col("np") + F.col("ns") + F.col("ni") > 0, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_docs_with_pii"),
        F.sum("ne").cast("long").alias("n_email"),
        F.sum("np").cast("long").alias("n_phone"),
        F.sum("ns").cast("long").alias("n_ssn"),
        F.sum("ni").cast("long").alias("n_ip"),
        F.sum(F.col("len_t") - F.col("len_red")).cast("long").alias("chars_redacted"),
        F.sum("resid").cast("long").alias("n_residual_after_redaction"),
    )
