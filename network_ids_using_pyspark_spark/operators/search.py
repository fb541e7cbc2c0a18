"""Full-text relevance search: BM25 scoring + top-k retrieval.

Okapi BM25 over the whitespace-token corpus, built entirely from
map-side array expressions plus ONE tiny corpus-statistics aggregate:

  * per-doc term frequencies: ``F.size(F.filter(tokens, t == term))``
    for each (small, fixed) query-term list — computed inside the scan
    stage, no explode, no shuffle of the exploded token relation;
  * corpus stats (N, avgdl, df per term): a single global aggregate
    producing ONE row, re-attached with a broadcast cross-join (the
    same no-collect scalar-broadcast idiom as the engine's scalar
    subqueries) — the driver never sees data;
  * top-k: ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject
    (per-partition heaps + driver k-merge), never a full global sort.

At 100 TB nothing here changes: two passes over the corpus (one for
stats, one for scoring) with only a 1-row exchange between them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import tokens

K1 = 1.2
B = 0.75


def _tf(term: str):
    return F.size(F.filter(F.col("__toks"), lambda t: t == F.lit(term)))


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k (id, bm25 score) for a bag-of-terms query.

    Scores are rounded to 6 decimals so the value is stable across
    engines (ln/divide are the only non-rational steps; 1-ulp libm
    differences vanish at 1e-6 granularity).
    """
    with_tf = docs.select(
        F.col(id_col),
        tokens(text_col).alias("__toks"),
    ).select(
        id_col,
        F.size("__toks").alias("dl"),
        *[_tf(t).alias(f"tf_{i}") for i, t in enumerate(terms)],
    )

    stats = with_tf.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )

    scored = with_tf.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    norm = F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("dl").cast("double") / avgdl)
    score = None
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        tf = F.col(f"tf_{i}").cast("double")
        part = idf * tf * F.lit(K1 + 1.0) / (tf + norm)
        score = part if score is None else score + part

    return (
        scored.select(id_col, F.round(score, 6).alias("bm25"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
    )


def bm25_topk_sql(
    terms: list[str], k: int = 20, table: str = "documents",
    id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """DuckDB mirror: identical tokenization, tf/df/idf arithmetic, and
    tie-break (score desc, id asc)."""
    tf_exprs = ",\n         ".join(
        f"len(list_filter(w, t -> t = '{t}')) AS tf_{i}" for i, t in enumerate(terms)
    )
    df_exprs = ",\n         ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    parts = " + ".join(
        f"(ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * (CAST(tf_{i} AS DOUBLE) * {K1 + 1.0})"
        f" / (CAST(tf_{i} AS DOUBLE) + {K1} * ({1.0 - B} + {B} * CAST(dl AS DOUBLE)"
        f" / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))"
        for i in range(len(terms))
    )
    return f"""
WITH tf AS (
  SELECT {id_col},
         len(w) AS dl,
         {tf_exprs}
  FROM (SELECT {id_col}, regexp_split_to_array(trim({text_col}), '\\s+') AS w
        FROM {table})
), stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
         {df_exprs}
  FROM tf
)
SELECT {id_col}, bm25 FROM (
  SELECT {id_col}, round({parts}, 6) AS bm25
  FROM tf CROSS JOIN stats
) WHERE bm25 > 0
ORDER BY bm25 DESC, {id_col}
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 + Dirichlet-smoothed query-likelihood, fused
# by Reciprocal Rank Fusion (RRF) — the standard way to combine
# rankers with incomparable score scales (Cormack et al., SIGIR'09).
# ---------------------------------------------------------------------------

MU = 300.0  # Dirichlet smoothing mass
RRF_K = 60  # RRF rank damping


def hybrid_rrf_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    pool: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k (id, rrf, bm25_rank, ql_rank) fusing two rankers.

    Both scorers share ONE corpus scan: per-doc tf columns + the 1-row
    stats aggregate (now also carrying collection term frequencies for
    the LM's background model).  Each ranker's candidate pool is cut
    with ``orderBy().limit(pool)`` — TakeOrderedAndProject, never a
    global sort — and ranks are assigned by a window over the
    ``pool``-row result, so the only global window in the plan runs on
    ≤ pool rows.  The fusion join is pool×pool tiny.  Unranked members
    of either pool contribute 0 to the fused score (the standard RRF
    convention for missing list entries).
    """
    with_tf = docs.select(
        F.col(id_col),
        tokens(text_col).alias("__toks"),
    ).select(
        id_col,
        F.size("__toks").alias("dl"),
        *[_tf(t).alias(f"tf_{i}") for i, t in enumerate(terms)],
    )
    stats = with_tf.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
        *[F.sum(f"tf_{i}").alias(f"cf_{i}") for i in range(len(terms))],
    )
    matched = sum(F.col(f"tf_{i}") for i in range(len(terms))) > 0
    scored = with_tf.filter(matched).crossJoin(F.broadcast(stats))

    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    norm = F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("dl").cast("double") / avgdl)
    bm25 = None
    ql = None
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        tf = F.col(f"tf_{i}").cast("double")
        part = idf * tf * F.lit(K1 + 1.0) / (tf + norm)
        bm25 = part if bm25 is None else bm25 + part
        lm = F.log(
            (tf + F.lit(MU) * (F.col(f"cf_{i}").cast("double") / F.col("sum_dl").cast("double")))
            / (F.col("dl").cast("double") + F.lit(MU))
        )
        ql = lm if ql is None else ql + lm
    scored = scored.select(
        id_col, F.round(bm25, 6).alias("s_bm"), F.round(ql, 6).alias("s_ql")
    )

    from pyspark.sql import Window

    def ranked(score_col: str, rank_name: str) -> DataFrame:
        top = scored.orderBy(F.col(score_col).desc(), F.col(id_col)).limit(pool)
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
        return top.select(id_col, F.row_number().over(w).alias(rank_name))

    bm = ranked("s_bm", "bm25_rank")
    ql_r = ranked("s_ql", "ql_rank")
    fused = (
        bm.join(ql_r, id_col, "full_outer")
        .select(
            id_col,
            F.round(
                F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("bm25_rank")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("ql_rank")), F.lit(0.0)),
                6,
            ).alias("rrf"),
            F.coalesce("bm25_rank", F.lit(0)).alias("bm25_rank"),
            F.coalesce("ql_rank", F.lit(0)).alias("ql_rank"),
        )
    )
    return fused.orderBy(F.col("rrf").desc(), F.col(id_col)).limit(k)


def hybrid_rrf_sql(
    terms: list[str], k: int = 10, pool: int = 50, table: str = "documents",
    id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """DuckDB mirror of :func:`hybrid_rrf_topk` — identical scoring
    arithmetic, rounding, rank tiebreak, and fusion convention."""
    tf_exprs = ",\n         ".join(
        f"len(list_filter(w, t -> t = '{t}')) AS tf_{i}" for i, t in enumerate(terms)
    )
    df_exprs = ",\n         ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    cf_exprs = ",\n         ".join(
        f"SUM(tf_{i}) AS cf_{i}" for i in range(len(terms))
    )
    matched = " + ".join(f"tf_{i}" for i in range(len(terms)))
    bm_parts = " + ".join(
        f"(ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * (CAST(tf_{i} AS DOUBLE) * {K1 + 1.0})"
        f" / (CAST(tf_{i} AS DOUBLE) + {K1} * ({1.0 - B} + {B} * CAST(dl AS DOUBLE)"
        f" / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))"
        for i in range(len(terms))
    )
    ql_parts = " + ".join(
        f"ln((CAST(tf_{i} AS DOUBLE) + {MU} * (CAST(cf_{i} AS DOUBLE)"
        f" / CAST(sum_dl AS DOUBLE))) / (CAST(dl AS DOUBLE) + {MU}))"
        for i in range(len(terms))
    )
    return f"""
WITH tf AS (
  SELECT {id_col}, len(w) AS dl, {tf_exprs}
  FROM (SELECT {id_col}, regexp_split_to_array(trim({text_col}), '\\s+') AS w
        FROM {table})
), stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl, {df_exprs}, {cf_exprs} FROM tf
), scored AS (
  SELECT {id_col}, round({bm_parts}, 6) AS s_bm, round({ql_parts}, 6) AS s_ql
  FROM tf CROSS JOIN stats
  WHERE {matched} > 0
), bm AS (
  SELECT {id_col}, ROW_NUMBER() OVER (ORDER BY s_bm DESC, {id_col}) AS bm25_rank
  FROM scored QUALIFY bm25_rank <= {pool}
), ql AS (
  SELECT {id_col}, ROW_NUMBER() OVER (ORDER BY s_ql DESC, {id_col}) AS ql_rank
  FROM scored QUALIFY ql_rank <= {pool}
)
SELECT COALESCE(bm.{id_col}, ql.{id_col}) AS {id_col},
       round(COALESCE(1.0 / ({RRF_K} + bm.bm25_rank), 0)
             + COALESCE(1.0 / ({RRF_K} + ql.ql_rank), 0), 6) AS rrf,
       COALESCE(bm.bm25_rank, 0) AS bm25_rank,
       COALESCE(ql.ql_rank, 0) AS ql_rank
FROM bm FULL OUTER JOIN ql ON bm.{id_col} = ql.{id_col}
ORDER BY rrf DESC, {id_col}
LIMIT {k}
"""
