"""Tokenizer training + application over the corpus: BPE merge learning.

The classic LLM-pipeline step the rest of the text family feeds into:
given the cleaned corpus, learn the first K BPE merges, then tokenize
the corpus with them.  The reference (modelling.py / ISAA notebook) has
no tokenizer stage at all — this is north-star surface for the 100 TB
training-data engine, built the way production BPE trainers work
(Sennrich et al. 2016): train on the *word histogram*, not the raw
corpus, so the iterative part runs over |vocab| rows no matter how big
the corpus is.

Exactness trick shared by both engines: a word's symbol sequence is
encoded as ``(s1)(s2)...(sk)`` — every symbol individually wrapped —
so applying merge (a,b) is a plain ``replace(w, '(a)(b)', '(ab)')``.
``replace`` scans left-to-right over non-overlapping occurrences in
BOTH Spark and DuckDB, which is exactly greedy BPE pair application
(e.g. pair (x,x) on ``(x)(x)(x)`` → ``(xx)(x)``), and the wrapping
means adjacent matches never share characters (the naive
space-delimited encoding breaks on ``a b a b`` because the middle
delimiter is consumed by the first replacement).  Symbols only ever
contain [0-9a-z], so parentheses are safe sentinels.

No collect in the loop: each iteration's argmax pair is a 1-row
relation attached back via broadcast crossJoin (the G4
scalar-as-literal pattern), and ``localCheckpoint(eager=True)``
truncates the per-iteration lineage — the standard iterative-algorithm
posture (same as kmeans_lloyd_exact / pca_power_iteration_exact).

Scale plan: one corpus scan builds the histogram (map-side-combined
count on the word), then K iterations each do explode→partial-agg→
1-row argmax over the |vocab|-sized relation.  At 100 TB, |vocab| is
millions of rows — executor-trivial; the corpus is never re-read until
tokenization applies the final vocabulary back with one equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..sources.tables import load_table
from . import register

_BPE_K = 8  # merges learned; each adds one chained CTE stage to the oracle

# Every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and each stage
# expands its 1-row argmax b{s} four times (two scalar subqueries in
# each replace argument), which without materialization compounds to
# ~4^K copies of the base scan — enough to exhaust file handles at K=8.
_BPE_HIST_SQL = r"""
w0 AS MATERIALIZED (
  SELECT regexp_replace(tok, '(.)', '(\1)', 'g') AS w,
         CAST(COUNT(*) AS BIGINT) AS freq
  FROM (
    SELECT UNNEST(regexp_split_to_array(trim(lower(text)), '[^0-9a-z]+')) AS tok
    FROM documents
  )
  WHERE tok <> ''
  GROUP BY 1
)
"""


def _bpe_stage_sql(s: int) -> str:
    """One merge iteration: pair counts → deterministic argmax →
    greedy merge application (see module docstring for why plain
    ``replace`` over the wrapped encoding is exact)."""
    a, b = f"(SELECT a FROM b{s})", f"(SELECT b FROM b{s})"
    return f"""
p{s} AS MATERIALIZED (
  SELECT l[i] AS a, l[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (
    SELECT string_split(substring(w, 2, length(w) - 2), ')(') AS l, freq
    FROM w{s}
  ), UNNEST(range(1, len(l))) AS t(i)
  GROUP BY a, b
),
b{s} AS MATERIALIZED (SELECT a, b, cnt FROM p{s} ORDER BY cnt DESC, a, b LIMIT 1),
w{s + 1} AS MATERIALIZED (
  SELECT replace(w, '(' || {a} || ')(' || {b} || ')',
                 '(' || {a} || {b} || ')') AS w, freq
  FROM w{s}
)"""


_BPE_CTES = (
    "WITH "
    + _BPE_HIST_SQL
    + ","
    + ",".join(_bpe_stage_sql(s) for s in range(_BPE_K))
)

_BPE_SQL = (
    _BPE_CTES
    + "\n"
    + "\nUNION ALL ".join(
        f"SELECT CAST({s + 1} AS INTEGER) AS merge_rank, a AS left_sym,"
        f" b AS right_sym, a || b AS merged, cnt AS pair_count FROM b{s}"
        for s in range(_BPE_K)
    )
)

_BPE_APPLY_SQL = (
    _BPE_CTES
    + f""",
vocab AS MATERIALIZED (
  SELECT replace(replace(w, '(', ''), ')', '') AS tok,
         CAST(len(string_split(substring(w, 2, length(w) - 2), ')(')) AS BIGINT)
           AS n_syms
  FROM w{_BPE_K}
),
doctoks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id,
           UNNEST(regexp_split_to_array(trim(lower(text)), '[^0-9a-z]+')) AS tok
    FROM documents
  )
  WHERE tok <> ''
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_syms) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(length(tok)) AS BIGINT) AS n_chars_alnum,
       round(CAST(SUM(length(tok)) AS DOUBLE)
             / CAST(SUM(n_syms) AS DOUBLE), 6) AS chars_per_token
FROM doctoks JOIN vocab USING (tok)
GROUP BY doc_id
"""
)


def _word_histogram(docs: DataFrame) -> DataFrame:
    """Corpus → (encoded word, frequency): the one corpus-wide scan."""
    return (
        docs.select(
            F.explode(F.split(F.trim(F.lower("text")), "[^0-9a-z]+")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy(F.regexp_replace("tok", r"(.)", r"($1)").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .localCheckpoint(eager=True)
    )


def _split_syms(col: str = "w"):
    return F.split(F.expr(f"substring({col}, 2, length({col}) - 2)"), r"\)\(")


def _learn_merges(words: DataFrame) -> tuple[list[DataFrame], DataFrame]:
    """K BPE iterations over the histogram.  Returns the per-rank 1-row
    merge relations and the final merged-symbol histogram."""
    merges = []
    for rank in range(1, _BPE_K + 1):
        pairs = (
            words.select(_split_syms().alias("syms"), "freq")
            .filter(F.size("syms") >= 2)  # sequence() would descend on size 1
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> struct(element_at(syms, i) AS a,"
                        " element_at(syms, i + 1) AS b))"
                    )
                ).alias("p"),
                "freq",
            )
        )
        best = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        merges.append(
            best.select(
                F.lit(rank).cast("int").alias("merge_rank"),
                F.col("a").alias("left_sym"),
                F.col("b").alias("right_sym"),
                F.concat("a", "b").alias("merged"),
                F.col("cnt").alias("pair_count"),
            )
        )
        words = (
            words.crossJoin(
                F.broadcast(
                    best.select(F.col("a").alias("_ba"), F.col("b").alias("_bb"))
                )
            )
            .select(
                F.replace(
                    F.col("w"),
                    F.concat(
                        F.lit("("), F.col("_ba"), F.lit(")("), F.col("_bb"), F.lit(")")
                    ),
                    F.concat(F.lit("("), F.col("_ba"), F.col("_bb"), F.lit(")")),
                ).alias("w"),
                "freq",
            )
            .localCheckpoint(eager=True)
        )
    return merges, words


@register("bpe_merge_training", _BPE_SQL)
def q_bpe_merge_training(spark, sf_dir):
    """Learn the first K BPE merges from the corpus word histogram.

    Output: one row per merge — rank, the two merged symbols, the new
    symbol, and the pair's frequency-weighted count at selection time.
    Tie-break is total (count DESC, then pair lexicographic) so the
    merge table is reproducible across engines and partitionings.
    """
    docs = load_table(spark, sf_dir, "documents")
    merges, _ = _learn_merges(_word_histogram(docs))
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


@register("bpe_tokenize_profile", _BPE_APPLY_SQL)
def q_bpe_tokenize_profile(spark, sf_dir):
    """Tokenize the corpus with the learned merges: per-document BPE
    token counts and the chars-per-token compression ratio (the number
    a tokenizer team actually tracks when sizing a vocab).

    The trained vocabulary (final histogram state) already carries each
    word's post-merge symbol count, so application is ONE equi-join of
    the corpus word stream against the |vocab| relation — the corpus is
    never re-processed per merge.  At 100 TB the join shuffles on the
    word (or broadcasts: a fixed 100k-entry vocab is broadcast-sized);
    per-doc token totals are map-side-combinable sums."""
    docs = load_table(spark, sf_dir, "documents")
    _, words = _learn_merges(_word_histogram(docs))
    vocab = words.select(
        F.translate("w", "()", "").alias("tok"),
        F.size(_split_syms()).cast("long").alias("n_syms"),
    )
    doctoks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), "[^0-9a-z]+")).alias("tok"),
    ).filter(F.col("tok") != "")
    return (
        doctoks.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_syms").cast("long").alias("n_bpe_tokens"),
            F.sum(F.length("tok")).cast("long").alias("n_chars_alnum"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_bpe_tokens",
            "n_chars_alnum",
            F.round(
                F.col("n_chars_alnum").cast("double")
                / F.col("n_bpe_tokens").cast("double"),
                6,
            ).alias("chars_per_token"),
        )
    )
