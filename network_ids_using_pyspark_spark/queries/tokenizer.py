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


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (SentencePiece-style, Kudo 2018): seed a piece
# vocabulary from substring frequencies, segment every word by Viterbi
# under the unigram log-probs, then report the hard-EM usage counts —
# the E-step + count-M-step of the unigram trainer, certified bit-exact.
# The BPE pair above is the merge-based tokenizer; this is the
# probabilistic one, and together they are the two vocabularies used in
# practice.  Viterbi runs as UNROLLED dp stages over the word-position
# grid (the k-means/BPE pattern): stage i picks, per word, the best
# (score, smallest-j) arc into position i from the dp rows of earlier
# positions — scores are 1e-9-grid partial sums, so argmax order is
# engine-portable.
# ---------------------------------------------------------------------------

_UNI_L = 4  # max piece length
_UNI_W = 12  # unrolled dp stages ≥ max word length (fixture max is 8)
_UNI_TOP = 30  # pieces reported


def _uni_stage_sql(i: int) -> str:
    return f"""
s{i} AS MATERIALIZED (
  SELECT w, i, score, pieces FROM (
    SELECT a.w, {i} AS i,
           round(d.score + a.lp, 9) AS score,
           list_append(d.pieces, a.piece) AS pieces, a.j,
           ROW_NUMBER() OVER (PARTITION BY a.w
                              ORDER BY round(d.score + a.lp, 9) DESC, a.j ASC) AS rn
    FROM arcs a JOIN d{i - 1} d ON d.w = a.w AND d.i = a.j
    WHERE a.i = {i}
  ) WHERE rn = 1
),
d{i} AS MATERIALIZED (
  SELECT * FROM d{i - 1} UNION ALL SELECT w, i, score, pieces FROM s{i}
)"""


_UNI_SQL = (
    r"""
WITH words AS MATERIALIZED (
  SELECT tok AS w, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (
    SELECT UNNEST(regexp_split_to_array(trim(lower(text)), '[^0-9a-z]+')) AS tok
    FROM documents
  )
  WHERE tok <> ''
  GROUP BY 1
),
occ AS (
  SELECT substring(w, p, k) AS piece, freq
  FROM words,
       UNNEST(range(1, LEAST("""
    + str(_UNI_L)
    + r""", length(w)) + 1)) AS tk(k),
       UNNEST(range(1, length(w) - k + 2)) AS tp(p)
),
vocab0 AS MATERIALIZED (
  SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM occ GROUP BY 1
),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab0),
vocab AS MATERIALIZED (
  SELECT piece, cnt,
         round(ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)), 9) AS lp
  FROM vocab0 CROSS JOIN tot
),
arcs AS MATERIALIZED (
  SELECT g.w, g.i, g.j, v.lp, g.piece
  FROM (
    SELECT w, i, j, substring(w, j + 1, i - j) AS piece
    FROM words,
         UNNEST(range(1, length(w) + 1)) AS ti(i),
         UNNEST(range(GREATEST(0, i - """
    + str(_UNI_L)
    + r"""), i)) AS tj(j)
  ) g JOIN vocab v ON v.piece = g.piece
),
d0 AS MATERIALIZED (
  SELECT w, CAST(0 AS BIGINT) AS i, CAST(0.0 AS DOUBLE) AS score,
         CAST([] AS VARCHAR[]) AS pieces
  FROM words
),
"""
    + ",".join(_uni_stage_sql(i) for i in range(1, _UNI_W + 1))
    + f"""
, seg AS (
  SELECT d.w, d.pieces, d.score, wo.freq
  FROM d{_UNI_W} d JOIN words wo ON wo.w = d.w
  WHERE d.i = length(d.w)
),
used AS (
  SELECT t.piece, CAST(SUM(freq) AS BIGINT) AS used_count
  FROM seg, UNNEST(pieces) AS t(piece)
  GROUP BY 1
)
SELECT u.piece, v.cnt AS seed_count, round(v.lp, 6) AS lp_seed, u.used_count
FROM used u JOIN vocab v ON v.piece = u.piece
ORDER BY u.used_count DESC, u.piece ASC
LIMIT {_UNI_TOP}
"""
)


@register("unigram_viterbi_tokenize", _UNI_SQL)
def q_unigram_viterbi_tokenize(spark, sf_dir):
    """Unigram-LM segmentation: seed piece probabilities from
    frequency-weighted substring counts (lengths ≤ {_UNI_L}), Viterbi
    the best segmentation of every distinct word, and report the
    top-{_UNI_TOP} pieces by hard-EM usage count with their seed
    counts and log-probs.  Single characters are always in the vocab,
    so every word is segmentable.

    Scale plan: like BPE, everything iterative runs on the WORD
    HISTOGRAM, never the corpus — one corpus scan builds it, and the
    dp grid is |distinct words| × word length rows.  The arc relation
    (word, position, predecessor, piece log-prob) is built once by an
    equi-join on the piece string; each unrolled stage is one
    arcs⨝dp join + per-word rank window over stage-sized relations,
    localCheckpointed so the 12-stage lineage never replays.  At
    100 TB the vocab and dp relations stay executor-trivial while the
    corpus scan parallelizes freely."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.trim(F.lower("text")), "[^0-9a-z]+")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy(F.col("tok").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .localCheckpoint(eager=True)
    )
    occ = words.select(
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, least({_UNI_L}, length(w))),"
                " k -> transform(sequence(1, length(w) - k + 1),"
                " p -> substring(w, p, k))))"
            )
        ).alias("piece"),
        "freq",
    )
    vocab0 = occ.groupBy("piece").agg(F.sum("freq").cast("long").alias("cnt"))
    tot = vocab0.agg(F.sum("cnt").cast("long").alias("total"))
    vocab = (
        vocab0.crossJoin(F.broadcast(tot))
        .select(
            "piece",
            "cnt",
            F.round(
                F.log(F.col("cnt").cast("double") / F.col("total").cast("double")), 9
            ).alias("lp"),
        )
        .localCheckpoint(eager=True)
    )
    grid = words.select(
        "w",
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, length(w)),"
                f" i -> transform(sequence(greatest(0, i - {_UNI_L}), i - 1),"
                " j -> struct(i AS i, j AS j,"
                " substring(w, j + 1, i - j) AS piece))))"
            )
        ).alias("g"),
    ).select("w", F.col("g.i").alias("i"), F.col("g.j").alias("j"), F.col("g.piece").alias("piece"))
    arcs = (
        grid.join(F.broadcast(vocab.select("piece", "lp")), "piece")
        .select("w", F.col("i").cast("long").alias("i"), F.col("j").cast("long").alias("j"), "lp", "piece")
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Window

    dp = words.select(
        "w",
        F.lit(0).cast("long").alias("i"),
        F.lit(0.0).alias("score"),
        F.expr("CAST(array() AS array<string>)").alias("pieces"),
    )
    for i in range(1, _UNI_W + 1):
        cand = (
            arcs.filter(F.col("i") == i)
            .withColumnRenamed("i", "ai")
            .join(
                dp.select(
                    F.col("w").alias("dw"), F.col("i").alias("di"), "score", "pieces"
                ),
                (F.col("dw") == F.col("w")) & (F.col("di") == F.col("j")),
            )
            .select(
                "w",
                F.lit(i).cast("long").alias("i"),
                F.round(F.col("score") + F.col("lp"), 9).alias("score"),
                F.concat("pieces", F.array("piece")).alias("pieces"),
                "j",
            )
        )
        win = Window.partitionBy("w").orderBy(F.desc("score"), F.asc("j"))
        winner = (
            cand.select("w", "i", "score", "pieces", F.row_number().over(win).alias("rn"))
            .filter(F.col("rn") == 1)
            .select("w", "i", "score", "pieces")
        )
        dp = dp.unionByName(winner).localCheckpoint(eager=False)
    seg = dp.join(
        words.select(F.col("w").alias("sw"), "freq"),
        (F.col("sw") == F.col("w")) & (F.col("i") == F.length("w")),
    ).select("w", "pieces", "freq")
    used = (
        seg.select(F.explode("pieces").alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("used_count"))
    )
    return (
        used.join(F.broadcast(vocab), "piece")
        .select(
            "piece",
            F.col("cnt").alias("seed_count"),
            F.round("lp", 6).alias("lp_seed"),
            "used_count",
        )
        .orderBy(F.desc("used_count"), F.asc("piece"))
        .limit(_UNI_TOP)
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility by language: the multilingual-equity readout
# (tokens per word / chars per token by lang) of the corpus-trained
# BPE vocabulary — the number a tokenizer team compares across
# languages before fixing a vocab (high fertility = that language
# pays more sequence length per word).
# ---------------------------------------------------------------------------

_BPE_FERTILITY_SQL = (
    _BPE_CTES
    + f""",
vocab AS MATERIALIZED (
  SELECT replace(replace(w, '(', ''), ')', '') AS tok,
         CAST(len(string_split(substring(w, 2, length(w) - 2), ')(')) AS BIGINT)
           AS n_syms
  FROM w{_BPE_K}
),
doctoks AS (
  SELECT doc_id, lang, tok FROM (
    SELECT doc_id, lang,
           UNNEST(regexp_split_to_array(trim(lower(text)), '[^0-9a-z]+')) AS tok
    FROM documents
  )
  WHERE tok <> ''
)
SELECT lang,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_syms) AS BIGINT) AS n_bpe_tokens,
       round(CAST(SUM(n_syms) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS tokens_per_word,
       round(CAST(SUM(length(tok)) AS DOUBLE) / CAST(SUM(n_syms) AS DOUBLE), 6)
         AS chars_per_token
FROM doctoks JOIN vocab USING (tok)
GROUP BY lang
ORDER BY lang
"""
)


@register("bpe_fertility_by_lang", _BPE_FERTILITY_SQL)
def q_bpe_fertility_by_lang(spark, sf_dir):
    """Fertility of the corpus-trained BPE vocabulary BY LANGUAGE:
    tokens-per-word and chars-per-token for each lang bucket under the
    one shared vocabulary — the standard multilingual tokenizer-equity
    metric (a language with higher fertility pays more context length
    per word, cf. the fertility analyses around multilingual BPE).
    Training is byte-identical to `bpe_merge_training`; application is
    the same vocab equi-join as `bpe_tokenize_profile` with the lang
    column carried through and the rollup on lang instead of doc.

    Scale plan: training cost is |vocab|-bounded (histogram-space BPE);
    the apply join broadcasts the fixed-size vocab against the word
    stream, and the per-lang rollup is a map-side combined group-by on
    a handful of keys.  Integer sums + one final division per metric —
    nothing to quantize."""
    docs = load_table(spark, sf_dir, "documents")
    _, words = _learn_merges(_word_histogram(docs))
    vocab = words.select(
        F.translate("w", "()", "").alias("tok"),
        F.size(_split_syms()).cast("long").alias("n_syms"),
    )
    doctoks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.trim(F.lower("text")), "[^0-9a-z]+")).alias("tok"),
    ).filter(F.col("tok") != "")
    return (
        doctoks.join(F.broadcast(vocab), "tok")
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_syms").cast("long").alias("n_bpe_tokens"),
            F.round(
                F.sum("n_syms").cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("tokens_per_word"),
            F.round(
                F.sum(F.length("tok")).cast("double")
                / F.sum("n_syms").cast("double"),
                6,
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )
