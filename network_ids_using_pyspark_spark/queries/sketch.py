"""Sketch queries — distributed count-min heavy hitters, fully
oracle-checked (the portable md5 bucket hash makes the sketch
bit-identical in DuckDB; see operators/sketch.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.hashing import hash_bucket, hash_bucket_sql
from ..operators.sketch import cms_counters, cms_estimate
from ..sources.tables import load_table
from . import register

_D, _W = 4, 64


def _cms_sql() -> str:
    hashed_union = "\n    UNION ALL ".join(
        f"SELECT {i} AS h, {hash_bucket_sql('user_id', _W, seed=f'cms{i}')} AS bucket, user_id FROM ev"
        for i in range(_D)
    )
    probe_union = "\n    UNION ALL ".join(
        f"SELECT user_id, true_n, {i} AS h, {hash_bucket_sql('user_id', _W, seed=f'cms{i}')} AS bucket FROM top"
        for i in range(_D)
    )
    return f"""
    WITH ev AS (SELECT user_id FROM events),
    hashed AS (
    {hashed_union}
    ),
    counters AS (
      SELECT h, bucket, COUNT(*) AS c FROM hashed GROUP BY h, bucket
    ),
    top AS (
      SELECT user_id, COUNT(*) AS true_n FROM ev GROUP BY user_id
      ORDER BY true_n DESC, user_id ASC LIMIT 10
    ),
    probes AS (
    {probe_union}
    )
    SELECT p.user_id, p.true_n, MIN(c.c) AS cms_est
    FROM probes p JOIN counters c ON p.h = c.h AND p.bucket = c.bucket
    GROUP BY p.user_id, p.true_n
    """


@register("cms_heavy_hitters", _cms_sql())
def q_cms_heavy_hitters(spark, sf_dir):
    """Count-min sketch point queries for the 10 heaviest users: the
    d×w counter relation is built in one grouped agg, estimation is a
    broadcast join, and the oracle recomputes the identical sketch —
    certifying the ≥-true-count guarantee rather than assuming it.
    At 100 TB the sketch is the cheap first pass that prunes the
    exact-count second pass to candidate keys only."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    counters = cms_counters(ev, "user_id", d=_D, w=_W)
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_n"))
        .orderBy(F.desc("true_n"), F.asc("user_id"))
        .limit(10)
    )
    return cms_estimate(top, counters, "user_id", d=_D, w=_W)


_BLOOM_SQL = """
SELECT l_returnflag,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS VARCHAR) AS sum_qty_str
FROM lineitem l
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_orderkey = l.l_orderkey AND o.o_totalprice > 400000
)
GROUP BY l_returnflag
"""


@register("bloom_semi_join_lineitem", _BLOOM_SQL)
def q_bloom_semi_join_lineitem(spark, sf_dir):
    """Bloom-prefiltered semi-join: lineitems of high-value orders.
    The Bloom pass (broadcast bit array, k=3/m=4096, map-side) drops
    most non-matching lineitem rows BEFORE the semi-join shuffle; the
    exact join over survivors guarantees bit-identical results to the
    oracle's plain EXISTS — the sketch accelerates, never approximates,
    the answer."""
    from ..operators.sketch import bloom_semi_join

    li = load_table(spark, sf_dir, "lineitem")
    big_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey")
    )
    filtered = bloom_semi_join(li, big_orders, "l_orderkey", "o_orderkey")
    return filtered.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("string").alias("sum_qty_str"),
    )


_HLL_SQL = """
SELECT COUNT(DISTINCT user_id) AS exact_n, true AS hll_within_3rsd
FROM events
"""


@register("hll_distinct_check", _HLL_SQL)
def q_hll_distinct_check(spark, sf_dir):
    """HyperLogLog++ certified THROUGH the driver gate: the query emits
    the exact distinct count plus a boolean asserting the HLL estimate
    (rsd=0.05) landed within 3×rsd = 15% of it (the ~99.7% bound — a
    1×rsd bound is one STANDARD error and legitimately misses: 6.7%
    observed at sf0.1); the oracle states the exact count and ``true``,
    so a sketch drifting past the statistical bound fails the hash.
    At 100 TB the HLL path is one mergeable register set per partition
    vs the exact path's full shuffle of distinct keys."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.agg(
        F.countDistinct("user_id").alias("exact_n"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("est"),
    )
    return agg.select(
        "exact_n",
        (
            F.abs(F.col("est") - F.col("exact_n"))
            <= 0.15 * F.col("exact_n")
        ).alias("hll_within_3rsd"),
    )


_QSKETCH_SQL = """
SELECT quantile_cont(l_extendedprice, 0.5) AS exact_p50,
       quantile_cont(l_extendedprice, 0.99) AS exact_p99,
       true AS sketch_within_1pct
FROM lineitem
"""


@register("quantile_sketch_check", _QSKETCH_SQL)
def q_quantile_sketch_check(spark, sf_dir):
    """percentile_approx (Greenwald-Khanna sketch) certified THROUGH the
    gate, same pattern as hll_distinct_check: emit the exact p50/p99
    (interpolated, == DuckDB quantile_cont) plus a boolean asserting the
    sketch landed within 1% relative error of both — sketch drift fails
    the hash.  The sketch is the mergeable single-pass 100 TB path; the
    exact percentile costs a per-group sort."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("exact_p99"),
        F.expr("percentile_approx(l_extendedprice, 0.5, 10000)").alias("a50"),
        F.expr("percentile_approx(l_extendedprice, 0.99, 10000)").alias("a99"),
    )
    ok = (
        (F.abs(F.col("a50") - F.col("exact_p50")) <= 0.01 * F.abs(F.col("exact_p50")))
        & (F.abs(F.col("a99") - F.col("exact_p99")) <= 0.01 * F.abs(F.col("exact_p99")))
    )
    return agg.select("exact_p50", "exact_p99", ok.alias("sketch_within_1pct"))


_HLL_GROUP_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_n,
       true AS hll_within_3rsd
FROM events
GROUP BY event_type
"""


@register("hll_distinct_by_type_check", _HLL_GROUP_SQL)
def q_hll_distinct_by_type_check(spark, sf_dir):
    """Per-GROUP HyperLogLog++ through the gate (the keyed variant of
    `hll_distinct_check`): every event_type's estimate must land
    within 3x rsd of its exact count.  The per-key sketch is the op a
    100 TB pipeline actually runs — one mergeable register set per
    (partition, key), merged map-side, never a distinct-key shuffle."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_n"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("est"),
    )
    return agg.select(
        "event_type",
        "exact_n",
        (F.abs(F.col("est") - F.col("exact_n")) <= 0.15 * F.col("exact_n")).alias(
            "hll_within_3rsd"
        ),
    )


_QSKETCH_GROUP_SQL = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS exact_p50,
       true AS sketch_within_1pct
FROM lineitem
GROUP BY l_returnflag
"""


@register("quantile_sketch_by_flag_check", _QSKETCH_GROUP_SQL)
def q_quantile_sketch_by_flag_check(spark, sf_dir):
    """Per-GROUP GK quantile sketch through the gate (keyed variant of
    `quantile_sketch_check`): each returnflag's percentile_approx p50
    must land within 1% of the exact interpolated median.  Keyed
    sketches merge map-side — the per-key distribution profile a
    100 TB pipeline can afford (the exact path sorts per group)."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
        F.expr("percentile_approx(l_extendedprice, 0.5, 10000)").alias("a50"),
    )
    ok = F.abs(F.col("a50") - F.col("exact_p50")) <= 0.01 * F.abs(F.col("exact_p50"))
    return agg.select("l_returnflag", "exact_p50", ok.alias("sketch_within_1pct"))


_HLL_UNION_SQL = """
SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_n,
       true AS merge_equals_whole,
       true AS union_within_5pct
FROM events
"""


@register("hll_union_mergeability", _HLL_UNION_SQL)
def q_hll_union_mergeability(spark, sf_dir):
    """THE property that makes sketches the 100 TB path, certified
    through the gate: HLL sketches built on two disjoint hash-halves of
    the stream, merged with ``hll_union``, must (a) equal the
    whole-stream sketch's estimate EXACTLY (register-wise merge is
    lossless for disjoint unions of the same data) and (b) land within
    5% of the exact distinct count — a deliberately loose ≈6×rsd bound
    at lgK=14 (rsd ≈ 0.81%); the gate certifies MERGEABILITY, not the
    estimator's variance.  Oracle states the exact count and both
    booleans true.

    Scale plan: per-half sketches are map-side-combined partial
    aggregates (one register set per partition), the merge is a
    dim-sized reduce — the exact COUNT(DISTINCT) beside them is the
    expensive witness, present only because this is the certification
    query."""
    ev = load_table(spark, sf_dir, "events")
    halved = ev.withColumn("half", F.pmod(F.col("event_id"), F.lit(2)))
    per_half = halved.groupBy("half").agg(
        F.expr("hll_sketch_agg(user_id, 14)").alias("sk")
    )
    merged = per_half.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est_union")
    )
    whole = ev.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").alias("est_whole"),
        F.countDistinct("user_id").alias("exact_n"),
    )
    return whole.crossJoin(F.broadcast(merged)).select(
        "exact_n",
        (F.col("est_union") == F.col("est_whole")).alias("merge_equals_whole"),
        (
            F.abs(F.col("est_union") - F.col("exact_n")) <= 0.05 * F.col("exact_n")
        ).alias("union_within_5pct"),
    )


_UNI_BUCKETS = 64
# chi-square 99.9th percentile at 63 degrees of freedom — the
# uniformity bound the portable hash must stay under for the engine's
# hash sampling / splits to be trustworthy
_UNI_CRIT = 103.442


def _hash_uniformity_sql() -> str:
    from ..functions.hashing import portable_hash64_sql

    h = portable_hash64_sql("CAST(o_orderkey AS VARCHAR)", seed="uni:")
    return f"""
WITH b AS (
  SELECT {h} % {_UNI_BUCKETS} AS bucket, COUNT(*) AS n
  FROM orders GROUP BY 1
),
b2 AS (SELECT n, SUM(n) OVER () AS n_rows FROM b),
s AS (
  SELECT COUNT(*) AS n_buckets, ANY_VALUE(n_rows) AS n_rows,
         MIN(n) AS min_bucket, MAX(n) AS max_bucket,
         SUM(({_UNI_BUCKETS} * n - n_rows) ** 2) AS chi_num
  FROM b2
)
SELECT CAST(n_buckets AS BIGINT) AS n_buckets,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(min_bucket AS BIGINT) AS min_bucket,
       CAST(max_bucket AS BIGINT) AS max_bucket,
       round(CAST(chi_num AS DOUBLE) / ({_UNI_BUCKETS} * n_rows), 6) AS chi2,
       (CAST(chi_num AS DOUBLE) / ({_UNI_BUCKETS} * n_rows) < {_UNI_CRIT})
         AS uniform_at_999
FROM s
"""


@register("hash_uniformity_chi2", _hash_uniformity_sql())
def q_hash_uniformity_chi2(spark, sf_dir):
    """Statistical self-test of the portable hash that every sampling /
    split / salting op in the engine rides on: chi² uniformity over
    {_UNI_BUCKETS} buckets of hashed order keys, asserted under the
    99.9% critical value (df={_UNI_BUCKETS - 1}).  The statistic is
    computed from the integer identity Σ(k·nᵢ − N)² / (k·N) — exact
    int64 numerator, one final division.

    Scale plan: one scan, {_UNI_BUCKETS}-key map-side-combined count,
    dim-sized window for the total — the certificate costs one
    aggregate."""
    from ..functions.hashing import portable_hash64

    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    b = o.groupBy(
        (portable_hash64("o_orderkey", seed="uni:") % _UNI_BUCKETS).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    w_all = Window.partitionBy()
    b = b.withColumn("n_rows", F.sum("n").over(w_all))
    s = b.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.first("n_rows").alias("n_rows"),
        F.min("n").alias("min_bucket"),
        F.max("n").alias("max_bucket"),
        F.sum(F.pow(_UNI_BUCKETS * F.col("n") - F.col("n_rows"), 2).cast("long")).alias(
            "chi_num"
        ),
    )
    chi2 = F.col("chi_num").cast("double") / (_UNI_BUCKETS * F.col("n_rows"))
    return s.select(
        F.col("n_buckets").cast("long").alias("n_buckets"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("min_bucket").cast("long").alias("min_bucket"),
        F.col("max_bucket").cast("long").alias("max_bucket"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 < _UNI_CRIT).alias("uniform_at_999"),
    )


_WAUH_SQL = """
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
fan AS (
  SELECT d + CAST(i AS INTEGER) AS target_d, user_id
  FROM du, UNNEST(range(0, 7)) AS r(i)
),
days AS (SELECT DISTINCT d FROM du),
wau AS (
  SELECT target_d AS d, COUNT(DISTINCT user_id) AS exact_wau
  FROM fan JOIN days ON fan.target_d = days.d
  GROUP BY 1
)
SELECT CAST(d AS TIMESTAMP) AS day,
       CAST(exact_wau AS BIGINT) AS exact_wau,
       true AS hll_within_5pct
FROM wau
"""


@register("wau_hll_window_merge", _WAUH_SQL)
def q_wau_hll_window_merge(spark, sf_dir):
    """THE sliding-sketch pattern certified through the gate: ONE HLL
    sketch per (day) built once, then each trailing-7-day WAU comes
    from MERGING the 7 daily sketches — no second touch of the raw
    events — and every day's estimate must land within 5% of the exact
    trailing distinct count (lgConfigK=14 ⇒ rsd≈0.8%, so 5% ≈ 6σ).
    This is how DAU/WAU/MAU run at 100 TB: daily register sets are
    tiny, windows of ANY length merge from them, and re-aggregation
    never rescans history.

    Scale plan: one scan → per-day sketches (map-side partials);
    window merge fans the 30 sketch rows ×7 — dim-sized; the exact
    count beside it exists only because this is the certification
    query."""
    ev = load_table(spark, sf_dir, "events")
    daily_sk = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.expr("hll_sketch_agg(user_id, 14)").alias("sk")
    )
    fan = daily_sk.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"), "d", "sk"
    ).select(F.date_add("d", F.col("i")).alias("target_d"), "sk")
    days = daily_sk.select("d").distinct()
    merged = (
        fan.join(F.broadcast(days), fan.target_d == days.d)
        .groupBy("target_d")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
    )
    du = ev.select(F.col("ts").cast("date").alias("d"), "user_id").distinct()
    exact_fan = du.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"), "d", "user_id"
    ).select(F.date_add("d", F.col("i")).alias("target_d"), "user_id")
    exact = (
        exact_fan.join(F.broadcast(days), exact_fan.target_d == days.d)
        .groupBy("target_d")
        .agg(F.countDistinct("user_id").alias("exact_wau"))
    )
    return (
        exact.join(merged, "target_d")
        .select(
            F.col("target_d").cast("timestamp").alias("day"),
            F.col("exact_wau").cast("long").alias("exact_wau"),
            (
                F.abs(F.col("est") - F.col("exact_wau"))
                <= 0.05 * F.col("exact_wau")
            ).alias("hll_within_5pct"),
        )
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) set sketch — the SET-OPERATION member of the
# sketch family: HLL answers |A|, KMV's bottom-k hash signature also
# answers |A ∩ B| / |A ∪ B| (Beyer et al., SIGMOD 2007).  Estimated
# per-source-pair bigram-vocabulary Jaccard vs the exact value, both
# in one query, so the sketch's error is measured honestly in-band.
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_REF = "src0"  # every other source compared against this one


def _kmv_sql() -> str:
    from ..functions.hashing import portable_hash64_sql as h

    return f"""
WITH toks AS (
  SELECT source, regexp_split_to_array(trim(lower(text)), '[^0-9a-z]+') AS ts
  FROM documents
),
bg AS (
  SELECT DISTINCT source, ts[i] || ' ' || ts[i + 1] AS bigram
  FROM toks, UNNEST(range(1, len(ts))) AS t(i)
  WHERE ts[i] <> '' AND ts[i + 1] <> ''
),
hashed AS (
  SELECT source, bigram, {h("bigram", seed="kmv:")} AS h FROM bg
),
a AS (SELECT bigram, h FROM hashed WHERE source = '{_KMV_REF}'),
b AS (SELECT source AS cmp, bigram, h FROM hashed WHERE source <> '{_KMV_REF}'),
cmps AS (SELECT DISTINCT cmp FROM b),
a_exp AS (SELECT c.cmp, a.bigram, a.h, 1 AS in_a FROM cmps c CROSS JOIN a),
merged AS (
  SELECT COALESCE(a.cmp, b.cmp) AS cmp,
         COALESCE(a.bigram, b.bigram) AS bigram,
         COALESCE(a.h, b.h) AS h,
         COALESCE(a.in_a, 0) AS in_a,
         CASE WHEN b.bigram IS NULL THEN 0 ELSE 1 END AS in_b
  FROM a_exp a FULL OUTER JOIN b ON a.cmp = b.cmp AND a.bigram = b.bigram
),
ranked AS (
  SELECT cmp, in_a, in_b,
         ROW_NUMBER() OVER (PARTITION BY cmp ORDER BY h ASC, bigram ASC) AS rk
  FROM merged
)
SELECT cmp AS source,
       CAST(SUM(in_a) AS BIGINT) AS n_ref,
       CAST(SUM(in_b) AS BIGINT) AS n_src,
       round(CAST(SUM(in_a * in_b) AS DOUBLE) / SUM(CAST(1 AS BIGINT)), 6) AS j_exact,
       round(CAST(SUM(CASE WHEN rk <= {_KMV_K} THEN in_a * in_b ELSE 0 END) AS DOUBLE)
             / {_KMV_K}, 6) AS j_kmv,
       round(abs(CAST(SUM(in_a * in_b) AS DOUBLE) / SUM(CAST(1 AS BIGINT))
                 - CAST(SUM(CASE WHEN rk <= {_KMV_K} THEN in_a * in_b ELSE 0 END) AS DOUBLE)
                   / {_KMV_K}), 6) AS abs_err
FROM ranked
GROUP BY cmp
"""


@register("kmv_jaccard_sources", _kmv_sql())
def q_kmv_jaccard_sources(spark, sf_dir):
    """Per-source bigram-vocabulary Jaccard against '{_KMV_REF}': the
    exact value and the bottom-{_KMV_K} KMV estimate (fraction of the
    union's k smallest hashes that fall in the intersection), with the
    absolute error in-band — the honest-eval discipline the ANN family
    uses, applied to the sketch family.

    Scale plan: the sketch's whole point is that only the BOTTOM-K
    hashes of each source's vocabulary would ever be exchanged at
    100 TB — per-partition bottom-k (TakeOrdered-shaped) then a k-sized
    merge per source, with the union/intersection decided purely on the
    16-byte hash signatures.  This query additionally carries the full
    vocabularies to compute the exact Jaccard the estimate is judged
    against; drop the exact branch and the shuffle is k rows per
    source."""
    from ..functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.split(F.trim(F.lower("text")), "[^0-9a-z]+").alias("ts")
    )
    bg = (
        toks.select(
            "source",
            F.explode(
                F.expr(
                    "filter(transform(sequence(1, size(ts) - 1),"
                    " i -> struct(element_at(ts, i) AS w1,"
                    " element_at(ts, i + 1) AS w2)),"
                    " p -> p.w1 <> '' AND p.w2 <> '')"
                )
            ).alias("p"),
        )
        .select("source", F.concat_ws(" ", F.col("p.w1"), F.col("p.w2")).alias("bigram"))
        .distinct()
    )
    hashed = bg.select(
        "source", "bigram", portable_hash64("bigram", seed="kmv:").alias("h")
    ).localCheckpoint(eager=False)  # feeds the ref side, the cmp side, and cmps
    a = hashed.filter(F.col("source") == _KMV_REF).select("bigram", "h")
    b = hashed.filter(F.col("source") != _KMV_REF).select(
        F.col("source").alias("cmp"), "bigram", "h"
    )
    cmps = b.select("cmp").distinct()
    a_exp = cmps.crossJoin(F.broadcast(a)).select(
        "cmp", "bigram", "h", F.lit(1).alias("in_a")
    )
    merged = a_exp.alias("a").join(
        b.alias("b"),
        (F.col("a.cmp") == F.col("b.cmp")) & (F.col("a.bigram") == F.col("b.bigram")),
        "full_outer",
    ).select(
        F.coalesce(F.col("a.cmp"), F.col("b.cmp")).alias("cmp"),
        F.coalesce(F.col("a.bigram"), F.col("b.bigram")).alias("bigram"),
        F.coalesce(F.col("a.h"), F.col("b.h")).alias("h"),
        F.coalesce(F.col("a.in_a"), F.lit(0)).alias("in_a"),
        F.when(F.col("b.bigram").isNull(), 0).otherwise(1).alias("in_b"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cmp").orderBy(F.asc("h"), F.asc("bigram"))
    ranked = merged.select(
        "cmp", "in_a", "in_b", F.row_number().over(w).alias("rk")
    )
    inter = F.sum(F.col("in_a") * F.col("in_b"))
    kmv_inter = F.sum(
        F.when(F.col("rk") <= _KMV_K, F.col("in_a") * F.col("in_b")).otherwise(0)
    )
    union_n = F.sum(F.lit(1).cast("long"))
    return ranked.groupBy(F.col("cmp").alias("source")).agg(
        F.sum("in_a").cast("long").alias("n_ref"),
        F.sum("in_b").cast("long").alias("n_src"),
        F.round(inter.cast("double") / union_n, 6).alias("j_exact"),
        F.round(kmv_inter.cast("double") / _KMV_K, 6).alias("j_kmv"),
        F.round(
            F.abs(inter.cast("double") / union_n - kmv_inter.cast("double") / _KMV_K), 6
        ).alias("abs_err"),
    )


# ---------------------------------------------------------------------------
# CMS inner-product join-size estimation (Cormode & Muthukrishnan,
# 2005): |A ⨝_k B| = Σ_k f_A(k)·f_B(k), estimated as min over hash
# rows of the bucket-wise counter dot product — the sketch a cost-based
# optimizer consults before choosing a join strategy.  Two instances:
# clicks⨝purchases on user_id, and the events self-join (F2, the
# skew/second-moment signal `key_skew_gini` reports exactly).
# ---------------------------------------------------------------------------

_JS_D, _JS_W = 4, 256


def _js_counters_sql(rel: str, name: str) -> str:
    u = "\n    UNION ALL ".join(
        f"SELECT {i} AS h, {hash_bucket_sql('user_id', _JS_W, seed=f'js{i}')} AS bucket"
        f" FROM {rel}"
        for i in range(_JS_D)
    )
    return f"{name} AS (SELECT h, bucket, CAST(COUNT(*) AS BIGINT) AS c FROM ({u}) GROUP BY h, bucket)"


def _js_pair_sql(ca: str, cb: str, fa: str, fb: str, label: str) -> str:
    return f"""
  SELECT '{label}' AS pair,
         (SELECT CAST(SUM(a.n * b.n) AS BIGINT)
          FROM {fa} a JOIN {fb} b ON a.user_id = b.user_id) AS true_size,
         (SELECT CAST(MIN(dp) AS BIGINT) FROM (
            SELECT x.h, SUM(x.c * y.c) AS dp
            FROM {ca} x JOIN {cb} y ON x.h = y.h AND x.bucket = y.bucket
            GROUP BY x.h)) AS cms_size"""


_JS_SQL = (
    f"""
WITH clicks AS (SELECT user_id FROM events WHERE event_type = 'click'),
purch AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
ev AS (SELECT user_id FROM events),
f_clicks AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM clicks GROUP BY 1),
f_purch AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM purch GROUP BY 1),
f_ev AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY 1),
{_js_counters_sql('clicks', 'c_clicks')},
{_js_counters_sql('purch', 'c_purch')},
{_js_counters_sql('ev', 'c_ev')}
SELECT pair, true_size, cms_size,
       round(CAST(cms_size - true_size AS DOUBLE) / true_size, 6) AS rel_overest
FROM ("""
    + _js_pair_sql("c_clicks", "c_purch", "f_clicks", "f_purch", "click_join_purchase")
    + "\n  UNION ALL"
    + _js_pair_sql("c_ev", "c_ev", "f_ev", "f_ev", "events_selfjoin_f2")
    + "\n)"
)


@register("cms_join_size_estimate", _JS_SQL)
def q_cms_join_size_estimate(spark, sf_dir):
    """Join-cardinality estimation from CMS sketches: the true
    Σ f_A·f_B join size beside the min-over-rows counter dot product,
    with the relative overestimate in-band (CMS inner products only
    err upward — collisions add).  Second row sketches the events
    self-join size (F2), the skew statistic that decides salting.

    Scale plan: each side compresses to a d×w counter relation in one
    map-side-combined pass — the dot product then touches d·w cells no
    matter how large either input; the TRUE sizes computed here for
    honesty are the expensive per-key aggregates the sketch exists to
    avoid."""
    from functools import reduce

    from ..functions.hashing import hash_bucket

    e = load_table(spark, sf_dir, "events")

    def counters(df):
        parts = [
            df.select(
                F.lit(i).alias("h"),
                hash_bucket("user_id", _JS_W, seed=f"js{i}").alias("bucket"),
            )
            for i in range(_JS_D)
        ]
        u = reduce(lambda a, b: a.unionByName(b), parts)
        return u.groupBy("h", "bucket").agg(F.count(F.lit(1)).cast("long").alias("c"))

    def freqs(df):
        return df.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("n"))

    def pair(ca, cb, fa, fb, label):
        true_size = (
            fa.join(fb.withColumnRenamed("n", "nb"), "user_id")
            .agg(F.sum(F.col("n") * F.col("nb")).cast("long").alias("true_size"))
        )
        est = (
            ca.alias("x")
            .join(
                cb.alias("y"),
                (F.col("x.h") == F.col("y.h")) & (F.col("x.bucket") == F.col("y.bucket")),
            )
            .groupBy(F.col("x.h"))
            .agg(F.sum(F.col("x.c") * F.col("y.c")).alias("dp"))
            .agg(F.min("dp").cast("long").alias("cms_size"))
        )
        return (
            true_size.crossJoin(F.broadcast(est))
            .select(
                F.lit(label).alias("pair"),
                "true_size",
                "cms_size",
                F.round(
                    (F.col("cms_size") - F.col("true_size")).cast("double")
                    / F.col("true_size"),
                    6,
                ).alias("rel_overest"),
            )
        )

    clicks = e.filter(F.col("event_type") == "click").select("user_id")
    purch = e.filter(F.col("event_type") == "purchase").select("user_id")
    ev = e.select("user_id")
    c_ev = counters(ev).localCheckpoint(eager=False)  # both sides of the F2 pair
    f_ev = freqs(ev).localCheckpoint(eager=False)
    out1 = pair(counters(clicks), counters(purch), freqs(clicks), freqs(purch),
                "click_join_purchase")
    # the round-trip rename mints fresh attribute ids so the F2
    # self-join's two sides are distinguishable to the analyzer
    f_ev2 = f_ev.withColumnRenamed("n", "n2").withColumnRenamed("n2", "n")
    out2 = pair(c_ev, c_ev, f_ev, f_ev2, "events_selfjoin_f2")
    return out1.unionByName(out2)


# ---------------------------------------------------------------------------
# Bloom-filter false-positive audit: build the same k=3/m=4096 filter
# `bloom_semi_join_lineitem` uses, probe it with the known NON-member
# keys, and report measured vs theoretical FPR — the calibration a
# pipeline owner needs before trusting the prefilter's selectivity
# estimate in a cost model.
# ---------------------------------------------------------------------------

_BF_K, _BF_M = 3, 4096
_BF_CUT = 400000


def _bloom_fpr_sql() -> str:
    member = f"o_totalprice > {_BF_CUT}"
    bit_union = "\nUNION ALL\n".join(
        f"SELECT {hash_bucket_sql('o_orderkey', _BF_M, seed=f'bloom{i}')} AS pos"
        f" FROM orders WHERE {member}"
        for i in range(_BF_K)
    )
    hit_all = " AND ".join(
        f"list_contains((SELECT bits FROM bloom),"
        f" {hash_bucket_sql('o_orderkey', _BF_M, seed=f'bloom{i}')})"
        for i in range(_BF_K)
    )
    return f"""
WITH bloom AS (
  SELECT list_sort(list(DISTINCT pos)) AS bits FROM ({bit_union})
),
members AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_members
            FROM orders WHERE {member}),
probes AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
         CAST(SUM(CASE WHEN {hit_all} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_false_positives
  FROM orders WHERE NOT ({member})
)
SELECT m.n_members,
       CAST({_BF_K} AS BIGINT) AS k,
       CAST({_BF_M} AS BIGINT) AS m,
       CAST(len((SELECT bits FROM bloom)) AS BIGINT) AS n_bits_set,
       p.n_probes, p.n_false_positives,
       round(CAST(p.n_false_positives AS DOUBLE) / p.n_probes, 6)
         AS fpr_measured,
       round(pow(1.0 - pow(1.0 - 1.0 / {_BF_M},
                           {_BF_K}.0 * m.n_members), {_BF_K}.0), 6)
         AS fpr_theoretical
FROM members m CROSS JOIN probes p
"""


@register("bloom_fpr_audit", _bloom_fpr_sql())
def q_bloom_fpr_audit(spark, sf_dir):
    """False-positive-rate audit of the Bloom prefilter: the k={k},
    m={m} filter over high-value order keys is probed with every
    non-member key; measured FPR sits next to the closed form
    (1-(1-1/m)^(kn))^k.  Counts are exact; the two rates are single
    IEEE expressions, so the audit is bit-stable.

    Scale plan: the bit array builds in one map-side pass over the
    member keys (the same `bloom_bits` one-row relation the semi-join
    broadcasts); probing is ONE conditional-sum aggregate over the
    non-member scan with the bit array broadcast in — the audit costs
    exactly one extra fact pass."""
    from ..operators.sketch import bloom_bits

    o = load_table(spark, sf_dir, "orders")
    member = F.col("o_totalprice") > _BF_CUT
    keys = o.filter(member).select("o_orderkey")
    bits = bloom_bits(keys, "o_orderkey", k=_BF_K, m=_BF_M)
    cond = None
    for i in range(_BF_K):
        c = F.array_contains(
            F.col("__bloom_bits"), hash_bucket("o_orderkey", _BF_M, seed=f"bloom{i}")
        )
        cond = c if cond is None else (cond & c)
    members = keys.agg(F.count(F.lit(1)).cast("long").alias("n_members"))
    probes = (
        o.filter(~member)
        .crossJoin(F.broadcast(bits))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_probes"),
            F.sum(cond.cast("int")).cast("long").alias("n_false_positives"),
        )
    )
    nbits = bits.select(F.size("__bloom_bits").cast("long").alias("n_bits_set"))
    fpr_th = F.pow(
        1.0 - F.pow(F.lit(1.0 - 1.0 / _BF_M), F.lit(float(_BF_K)) * F.col("n_members")),
        float(_BF_K),
    )
    return (
        members.crossJoin(F.broadcast(nbits))
        .crossJoin(F.broadcast(probes))
        .select(
            "n_members",
            F.lit(_BF_K).cast("long").alias("k"),
            F.lit(_BF_M).cast("long").alias("m"),
            "n_bits_set",
            "n_probes",
            "n_false_positives",
            F.round(
                F.col("n_false_positives").cast("double") / F.col("n_probes"), 6
            ).alias("fpr_measured"),
            F.round(fpr_th, 6).alias("fpr_theoretical"),
        )
    )
