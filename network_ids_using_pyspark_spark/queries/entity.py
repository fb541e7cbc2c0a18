"""Entity-resolution queries: fuzzy duplicate detection over the
customer name column via deletion-neighborhood (SymSpell-style)
blocking — the string-similarity sibling of the MinHash/SimHash
document dedup family.

The fixture's customer names are fixed-format ("Customer#NNNNNNNNN"),
so levenshtein-1 pairs are exactly the pairs whose serial numbers
differ in one digit — thousands of true pairs whose count per edited
position (500 / 5 500 / 6 750 / 6 750 at sf0.01) is a strongly
discriminating signature for the oracle hash.

No reference parity (the reference has no string-matching surface);
part of the engine's data-cleaning extension family.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.fuzzy import edit1_pairs
from ..sources.tables import load_table
from . import register

_FUZZY_SQL = """
WITH names AS (SELECT DISTINCT c_name AS nm FROM customer),
dels AS (
  SELECT nm, i AS del_pos,
         substring(nm, 1, i - 1) || substring(nm, i + 1) AS variant
  FROM names, UNNEST(range(1, len(nm) + 1)) AS t(i)
),
cands AS (
  SELECT a.nm AS nm_a, b.nm AS nm_b
  FROM dels a JOIN dels b ON a.variant = b.variant
  WHERE a.nm < b.nm
  UNION
  SELECT LEAST(a.nm, b.nm) AS nm_a, GREATEST(a.nm, b.nm) AS nm_b
  FROM dels a JOIN names b ON a.variant = b.nm
),
pairs AS (
  SELECT nm_a, nm_b,
         CASE WHEN len(nm_a) = len(nm_b) THEN
           CAST(list_filter(range(1, len(nm_a) + 1),
                i -> substring(nm_a, i, 1) <> substring(nm_b, i, 1))[1] AS BIGINT)
         END AS edit_pos
  FROM cands
  WHERE levenshtein(nm_a, nm_b) = 1
)
SELECT edit_pos,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       MIN(nm_a) AS sample_a,
       MIN(nm_b) AS sample_b
FROM pairs
GROUP BY edit_pos
"""


@register("fuzzy_name_pairs_symspell", _FUZZY_SQL)
def q_fuzzy_name_pairs_symspell(spark, sf_dir):
    """Levenshtein-1 customer-name pairs via deletion-neighborhood
    equi-join blocking (never all-pairs), verified with one exact
    ``levenshtein`` on candidates only; reported as pair counts per
    edited character position.

    Scale plan: the variant relation is |distinct names| × name_len
    rows — linear — and both candidate joins are plain equi-joins on
    the variant string (hash it to 16 bytes for long strings; the
    verify step makes collisions harmless).  The quadratic all-pairs
    comparison never appears at any scale; the only shuffles are the
    two candidate equi-joins and the tiny per-position aggregate.
    """
    customer = load_table(spark, sf_dir, "customer")
    pairs = edit1_pairs(customer, col="c_name")
    return pairs.groupBy("edit_pos").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("nm_a").alias("sample_a"),
        F.min("nm_b").alias("sample_b"),
    )


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking (SNM): the second classic ER candidate
# generator beside deletion-neighborhood — sort on a blocking key, take
# pairs within a fixed window of the sorted order.
# ---------------------------------------------------------------------------

_SNM_W = 2  # pair each record with the next w records in sort order
_SNM_T = 5.0  # verify: account balances within this delta

_SNM_SQL = f"""
WITH s AS (
  SELECT c_custkey, c_acctbal, c_nationkey,
         LEAD(c_custkey, 1) OVER w AS k1, LEAD(c_acctbal, 1) OVER w AS b1,
         LEAD(c_custkey, 2) OVER w AS k2, LEAD(c_acctbal, 2) OVER w AS b2
  FROM customer
  WINDOW w AS (ORDER BY c_acctbal, c_custkey)
),
cands AS (
  SELECT c_custkey AS cust_a, k1 AS cust_b, c_acctbal AS bal_a, b1 AS bal_b FROM s
  WHERE k1 IS NOT NULL
  UNION ALL
  SELECT c_custkey, k2, c_acctbal, b2 FROM s WHERE k2 IS NOT NULL
)
SELECT cust_a, cust_b, bal_a, bal_b, bal_b - bal_a AS bal_diff
FROM cands
WHERE bal_b - bal_a <= {_SNM_T}
"""


@register("snm_candidate_pairs", _SNM_SQL)
def q_snm_candidate_pairs(spark, sf_dir):
    """Sorted-neighborhood candidate pairs over the account-balance
    blocking key (window w={_SNM_W}), verified by a balance-delta
    predicate — the duplicate-account screen.  Expressed entirely as
    LEAD windows: each record pairs with its next {_SNM_W} sorted
    neighbors, so candidate generation is O(n·w) with NO self-join.

    Scale note: the single global sort is the textbook SNM cost — the
    exact gate form.  `snm_candidate_pairs_scaled`
    (queries/rangescale.py) IS the distributed form: contiguous range
    buckets, per-bucket LEAD windows, and the constant boundary
    overlap reconstructed from each bucket's head/tail fringe —
    identical output, shared oracle.  Sort-key skew (many equal
    balances) is tiebroken by key, keeping the order total."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    s = c.select(
        "c_custkey",
        "c_acctbal",
        *[
            F.lead("c_custkey", i).over(w).alias(f"k{i}")
            for i in range(1, _SNM_W + 1)
        ],
        *[
            F.lead("c_acctbal", i).over(w).alias(f"b{i}")
            for i in range(1, _SNM_W + 1)
        ],
    )
    cands = None
    for i in range(1, _SNM_W + 1):
        part = s.filter(F.col(f"k{i}").isNotNull()).select(
            F.col("c_custkey").alias("cust_a"),
            F.col(f"k{i}").alias("cust_b"),
            F.col("c_acctbal").alias("bal_a"),
            F.col(f"b{i}").alias("bal_b"),
        )
        cands = part if cands is None else cands.unionByName(part)
    return cands.withColumn("bal_diff", F.col("bal_b") - F.col("bal_a")).filter(
        F.col("bal_diff") <= _SNM_T
    )


# ---------------------------------------------------------------------------
# Blocking recall eval: inject known typos and measure exactly where
# the deletion-neighborhood blocking radius ends — complete at edit
# distance 1, blind at 2.  The entity-resolution twin of
# `dedup_recall_eval` (a blocking scheme must publish its recall
# boundary, not just its candidates).
# ---------------------------------------------------------------------------

_BLK_P1 = 12  # substitution position (inside the digit zone)
_BLK_P2 = 14  # second substitution for the d=2 clones

_BLOCKING_EVAL_SQL = f"""
WITH names AS (SELECT DISTINCT c_name AS nm FROM customer),
t1 AS (
  SELECT nm, substring(nm, 1, {_BLK_P1 - 1}) || 'X' || substring(nm, {_BLK_P1 + 1}) AS typo
  FROM names
),
t2 AS (
  SELECT nm,
         substring(nm, 1, {_BLK_P1 - 1}) || 'X'
           || substring(nm, {_BLK_P1 + 1}, {_BLK_P2 - _BLK_P1 - 1}) || 'Y'
           || substring(nm, {_BLK_P2 + 1}) AS typo
  FROM names
),
corpus AS (
  SELECT nm FROM names
  UNION SELECT typo FROM t1
  UNION SELECT typo FROM t2
),
dels AS (
  SELECT nm, substring(nm, 1, i - 1) || substring(nm, i + 1) AS variant
  FROM corpus, UNNEST(range(1, len(nm) + 1)) AS t(i)
),
cands AS (
  SELECT DISTINCT LEAST(a.nm, b.nm) AS nm_a, GREATEST(a.nm, b.nm) AS nm_b
  FROM dels a JOIN dels b ON a.variant = b.variant AND a.nm <> b.nm
),
found1 AS (
  SELECT COUNT(*) AS n FROM t1
  JOIN cands ON LEAST(nm, typo) = nm_a AND GREATEST(nm, typo) = nm_b
),
found2 AS (
  SELECT COUNT(*) AS n FROM t2
  JOIN cands ON LEAST(nm, typo) = nm_a AND GREATEST(nm, typo) = nm_b
)
SELECT 'substitution_d1' AS error_type,
       CAST((SELECT COUNT(*) FROM t1) AS BIGINT) AS n_truth,
       CAST((SELECT n FROM found1) AS BIGINT) AS n_found,
       round(CAST((SELECT n FROM found1) AS DOUBLE)
             / (SELECT COUNT(*) FROM t1), 6) AS recall
UNION ALL
SELECT 'substitution_d2',
       CAST((SELECT COUNT(*) FROM t2) AS BIGINT),
       CAST((SELECT n FROM found2) AS BIGINT),
       round(CAST((SELECT n FROM found2) AS DOUBLE)
             / (SELECT COUNT(*) FROM t2), 6)
"""


@register("blocking_recall_eval", _BLOCKING_EVAL_SQL)
def q_blocking_recall_eval(spark, sf_dir):
    """Deletion-neighborhood blocking, recall-audited against injected
    typos: every customer name gets a 1-substitution clone (edit
    distance 1 — the blocking is provably COMPLETE there, recall must
    be 1.0) and a 2-substitution clone (distance 2 — outside the
    1-deletion radius, recall must be 0.0 unless a coincidental
    variant collides).  The output states the blocking boundary as
    data; widening the radius means 2-deletion neighborhoods, at 
    |name|² variants per record — the documented cost of d=2.

    Scale plan: identical to `fuzzy_name_pairs_symspell` — the variant
    explode is map-side, candidates come from the variant equi-join;
    the truth joins are string equality on dim-sized relations."""
    cu = load_table(spark, sf_dir, "customer")
    names = cu.select(F.col("c_name").alias("nm")).distinct()
    sub1 = F.concat(
        F.substring("nm", 1, _BLK_P1 - 1),
        F.lit("X"),
        F.expr(f"substring(nm, {_BLK_P1 + 1})"),
    )
    sub2 = F.concat(
        F.substring("nm", 1, _BLK_P1 - 1),
        F.lit("X"),
        F.expr(f"substring(nm, {_BLK_P1 + 1}, {_BLK_P2 - _BLK_P1 - 1})"),
        F.lit("Y"),
        F.expr(f"substring(nm, {_BLK_P2 + 1})"),
    )
    t1 = names.select("nm", sub1.alias("typo"))
    t2 = names.select("nm", sub2.alias("typo"))
    corpus = (
        names.select("nm")
        .unionByName(t1.select(F.col("typo").alias("nm")))
        .unionByName(t2.select(F.col("typo").alias("nm")))
        .distinct()
    )
    dels = corpus.select(
        "nm",
        F.explode(
            F.expr(
                "transform(sequence(1, length(nm)), i -> "
                "concat(substring(nm, 1, i - 1), substring(nm, i + 1)))"
            )
        ).alias("variant"),
    )
    a = dels.select(F.col("nm").alias("na"), "variant")
    # shuffle_hash: both sides are the same |names|·len exploded
    # relation, so AQE's sort-merge pick pays two full sorts of it
    # plus a sort feeding the distinct on the ~7 M-row raw pair
    # stream; a per-partition hash build is the cheaper shape (same
    # rationale as operators/dedup.py's _light_pair_counts).  r11
    # measured at sf0.1: candidate build 13.8 s → 2.7 s warm.
    # (Deduping (nm, variant) first — the operators/fuzzy.py run-
    # hazard — was measured too: the extra shuffle costs more than
    # the 40% row reduction saves under the hash join.)
    b = dels.select(F.col("nm").alias("nb"), "variant").hint("shuffle_hash")
    cands = (
        a.join(b, ["variant"])
        .filter(F.col("na") != F.col("nb"))
        .select(
            F.least("na", "nb").alias("nm_a"),
            F.greatest("na", "nb").alias("nm_b"),
        )
        .distinct()
    )
    # candidates feed both truth probes — materialize once
    cands = cands.localCheckpoint(eager=True)

    def found(t):
        return (
            t.join(
                cands,
                (F.least("nm", "typo") == F.col("nm_a"))
                & (F.greatest("nm", "typo") == F.col("nm_b")),
                "left_semi",
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )

    n1 = t1.agg(F.count(F.lit(1)).alias("n_truth"))
    n2 = t2.agg(F.count(F.lit(1)).alias("n_truth"))
    f1, f2 = found(t1), found(t2)
    row1 = (
        n1.crossJoin(F.broadcast(f1))
        .select(
            F.lit("substitution_d1").alias("error_type"),
            F.col("n_truth").cast("long").alias("n_truth"),
            F.col("n").cast("long").alias("n_found"),
            F.round(F.col("n").cast("double") / F.col("n_truth"), 6).alias("recall"),
        )
    )
    row2 = (
        n2.crossJoin(F.broadcast(f2))
        .select(
            F.lit("substitution_d2").alias("error_type"),
            F.col("n_truth").cast("long").alias("n_truth"),
            F.col("n").cast("long").alias("n_found"),
            F.round(F.col("n").cast("double") / F.col("n_truth"), 6).alias("recall"),
        )
    )
    return row1.unionByName(row2)


# ---------------------------------------------------------------------------
# ER capstone: golden-record merge.  pairs → cluster label → one merged
# survivor row per cluster, the step that turns candidate matching into
# a deliverable master table.  Clustering is SINGLE-ROUND star
# assignment (label = min of the closed pair-neighborhood), not
# transitive closure: the lev-1 name graph is near-hypercube-connected
# on this fixture (every name joins ~L·9 neighbours), so a recursive
# closure would chain essentially the whole table into one giant
# component — the classic ER over-merge failure.  Star assignment is
# the standard bounded-diameter alternative (Hassanzadeh & Miller,
# VLDB J. 2009); it is exactly the FIRST superstep of the min-label
# propagation that `dedup_clusters` runs to fixpoint on sparse graphs.
# ---------------------------------------------------------------------------

_GOLDEN_TOPK = 50

_GOLDEN_SQL = f"""
WITH names AS (SELECT DISTINCT c_name AS nm FROM customer),
dels AS (
  SELECT DISTINCT nm,
         substring(nm, 1, i - 1) || substring(nm, i + 1) AS variant
  FROM names, UNNEST(range(1, len(nm) + 1)) AS t(i)
),
cands AS (
  SELECT a.nm AS nm_a, b.nm AS nm_b
  FROM dels a JOIN dels b ON a.variant = b.variant
  WHERE a.nm < b.nm
  UNION
  SELECT LEAST(a.nm, b.nm) AS nm_a, GREATEST(a.nm, b.nm) AS nm_b
  FROM dels a JOIN names b ON a.variant = b.nm
),
pairs AS (SELECT nm_a, nm_b FROM cands WHERE levenshtein(nm_a, nm_b) = 1),
sym AS (
  SELECT nm_a AS nm, nm_b AS nb FROM pairs
  UNION ALL
  SELECT nm_b AS nm, nm_a AS nb FROM pairs
),
asg AS (SELECT nm, LEAST(nm, MIN(nb)) AS cluster FROM sym GROUP BY nm),
golden AS (
  SELECT cluster,
         CAST(COUNT(*) AS BIGINT) AS n_members,
         CAST(MIN(c.c_custkey) AS BIGINT) AS rep_custkey,
         MAX(c.c_acctbal) AS max_acctbal,
         CAST(COUNT(DISTINCT c.c_nationkey) AS BIGINT) AS n_nations
  FROM asg JOIN customer c ON c.c_name = asg.nm
  GROUP BY cluster
)
SELECT cluster, n_members, rep_custkey, max_acctbal, n_nations
FROM golden
ORDER BY n_members DESC, cluster ASC
LIMIT {_GOLDEN_TOPK}
"""


@register("er_golden_records", _GOLDEN_SQL)
def q_er_golden_records(spark, sf_dir):
    """Golden-record merge over the fuzzy customer-name match graph:
    every name in a lev-1 pair is assigned the MIN of its closed
    neighborhood as cluster label (single-round star assignment — see
    module note on why transitive closure over-merges here), then each
    cluster emits ONE merged record: member count, representative
    custkey (min), merged account balance (max — "most complete/best
    value wins" survivorship), and the distinct-nation count as a
    conflict signal.  Top-{_GOLDEN_TOPK} clusters by size, total order.

    Scale plan: deletion-neighborhood blocking is linear in names
    (L variants each); the variant equi-join is the only candidate
    generator (never all-pairs); star assignment is ONE map-side-
    combined groupBy (no iteration, no giant-component risk); the
    attribute merge is one aggregate over a name-keyed join; final
    top-k is TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    pairs = edit1_pairs(cust.select(F.col("c_name").alias("nm")))
    sym = pairs.select(F.col("nm_a").alias("nm"), F.col("nm_b").alias("nb")).unionByName(
        pairs.select(F.col("nm_b").alias("nm"), F.col("nm_a").alias("nb"))
    )
    asg = sym.groupBy("nm").agg(F.least(F.col("nm"), F.min("nb")).alias("cluster"))
    golden = (
        asg.join(cust, asg.nm == cust.c_name)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.min("c_custkey").cast("long").alias("rep_custkey"),
            F.max("c_acctbal").alias("max_acctbal"),
            F.countDistinct("c_nationkey").cast("long").alias("n_nations"),
        )
    )
    return golden.orderBy(F.desc("n_members"), F.asc("cluster")).limit(_GOLDEN_TOPK)
