"""Text-analysis + exact-dedup queries over the ``documents`` table.

Every op is a pure projection/agg of built-in string expressions, so all
get full DuckDB oracles.  NOTE on oracle SQL: DuckDB ``regexp_replace``
needs the explicit ``'g'`` flag to match Spark's replace-all semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64_sql
from ..sources.tables import load_table
from ..operators.textops import (
    doc_fingerprint,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)
from . import register

_STOPWORDS = ["the", "a", "and", "of", "to", "in"]
_STOP_SQL = "['the', 'a', 'and', 'of', 'to', 'in']"

_TOKS_SQL = r"regexp_split_to_array(trim(text), '\s+')"
_NTOK_SQL = f"len({_TOKS_SQL})"
_PUNCT_SQL = (
    r"(CASE WHEN length(text) > 0 THEN CAST(length(regexp_replace(text, '[0-9A-Za-z\s]', '', 'g')) AS DOUBLE)"
    r" / CAST(length(text) AS DOUBLE) ELSE 0.0 END)"
)
_STOPR_SQL = (
    f"(CASE WHEN {_NTOK_SQL} > 0 THEN CAST(len(list_filter({_TOKS_SQL},"
    f" t -> list_contains({_STOP_SQL}, t))) AS DOUBLE) / CAST({_NTOK_SQL} AS DOUBLE)"
    f" ELSE 0.0 END)"
)


@register(
    "dedup_exact",
    """
    SELECT MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY text
    """,
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup as hash-groupBy on content: one shuffle on the text
    (at 100 TB: on a 128-bit content fingerprint instead of the raw
    text — same plan shape, tiny keys).  Keeper = min doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    ).select("keeper_doc_id", "n_copies")


@register(
    "token_stats",
    f"""
    SELECT doc_id,
           CAST({_NTOK_SQL} AS INTEGER) AS n_tokens,
           CAST(len(regexp_split_to_array(trim(text), '[^0-9A-Za-z]+')) AS INTEGER)
             AS n_word_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_measured,
           n_chars
    FROM documents
    """,
)
def q_token_stats(spark, sf_dir):
    """Token counting (whitespace + BPE-ish word-piece proxy: the
    word/number boundary regex BPE pre-tokenizers split on) + char
    counts — LLM-pipeline staple."""
    from ..operators.textops import word_token_count

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        word_token_count("text").alias("n_word_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
        "n_chars",
    )


@register(
    "text_quality",
    f"""
    SELECT doc_id,
           {_PUNCT_SQL} AS punct_ratio,
           {_STOPR_SQL} AS stopword_ratio,
           (LEAST(CAST({_NTOK_SQL} AS DOUBLE) / 20.0, 1.0) * 0.4
            + (1.0 - LEAST({_PUNCT_SQL} * 4, 1.0)) * 0.3
            + LEAST({_STOPR_SQL} * 5, 1.0) * 0.3) AS quality
    FROM documents
    """,
)
def q_text_quality(spark, sf_dir):
    """Quality scoring: length/punctuation/stopword heuristics composed
    into a [0,1] score — identical expression tree on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        punct_ratio("text").alias("punct_ratio"),
        stopword_ratio("text", _STOPWORDS).alias("stopword_ratio"),
        quality_score("text", _STOPWORDS).alias("quality"),
    )


@register(
    "doc_fingerprint",
    r"""
    SELECT doc_id,
           substring(md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), 1, 16) AS fingerprint
    FROM documents
    """,
)
def q_doc_fingerprint(spark, sf_dir):
    """Whitespace-normalized md5 content fingerprint (the join key for
    exact dedup at scale)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", doc_fingerprint("text").alias("fingerprint"))


@register(
    "lang_histogram",
    "SELECT lang, source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars "
    "FROM documents GROUP BY lang, source",
)
def q_lang_histogram(spark, sf_dir):
    """Corpus composition: docs + chars per (lang, source) — the
    mixture-accounting query every training-data pipeline runs."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("total_chars"),
    )


_MARKERS = {"de": ["der", "und"], "en": ["the", "a"], "es": ["el", "la"]}


def _hits_sql(lang: str) -> str:
    arr = "[" + ", ".join(f"'{m}'" for m in _MARKERS[lang]) + "]"
    return (
        f"len(list_filter({_TOKS_SQL}, t -> list_contains({arr}, t)))"
    )


@register(
    "lang_id_predict",
    f"""
    SELECT doc_id, lang,
           CASE WHEN h_de >= h_en AND h_de >= h_es AND h_de > 0 THEN 'de'
                WHEN h_en >= h_es AND h_en > 0 THEN 'en'
                WHEN h_es > 0 THEN 'es'
                ELSE 'und' END AS predicted_lang
    FROM (
      SELECT doc_id, lang,
             {_hits_sql('de')} AS h_de,
             {_hits_sql('en')} AS h_en,
             {_hits_sql('es')} AS h_es
      FROM documents
    )
    """,
)
def q_lang_id(spark, sf_dir):
    """Marker-token language ID (n-gram-heuristic family): argmax of
    per-language marker hits, ties to the EARLIER language code
    (sorted order), no hits → 'und'.  Pure array expressions — the
    broadcast-map shape of a real lang-ID at scale."""
    from ..operators.textops import lang_id

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", lang_id("text", _MARKERS).alias("predicted_lang")
    )


@register(
    "dedup_keep_best",
    f"""
    WITH scored AS (
      SELECT doc_id,
             substring(md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))), 1, 16)
               AS fingerprint,
             {_NTOK_SQL} AS n_tokens
      FROM documents
    )
    SELECT fingerprint, doc_id AS keeper_doc_id, n_tokens FROM (
      SELECT fingerprint, doc_id, n_tokens,
             ROW_NUMBER() OVER (
               PARTITION BY fingerprint ORDER BY n_tokens DESC, doc_id ASC
             ) AS rk
      FROM scored
    ) WHERE rk = 1
    """,
)
def q_dedup_keep_best(spark, sf_dir):
    """Dedup keeper policy: within each content-fingerprint group keep
    the 'best' doc (longest, tie → lowest id) — the argmax-per-group
    pattern every dedup pipeline needs, via a partitioned window."""
    from pyspark.sql import Window
    from ..operators.textops import doc_fingerprint, token_count

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        doc_fingerprint("text").alias("fingerprint"),
        token_count("text").alias("n_tokens"),
    )
    w = Window.partitionBy("fingerprint").orderBy(
        F.desc("n_tokens"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("fingerprint", F.col("doc_id").alias("keeper_doc_id"), "n_tokens")
    )


@register(
    "corpus_ngram_counts",
    r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
    ), sh AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w) - 1),
                    i -> array_to_string(w[i:i+2], ' '))) AS ngram
      FROM toks WHERE len(w) >= 3
    )
    SELECT ngram, n, n_docs FROM (
      SELECT ngram, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, ngram ASC) AS rk
      FROM sh GROUP BY ngram
    ) WHERE rk <= 20
    """,
)
def q_corpus_ngram_counts(spark, sf_dir):
    """Corpus-level 3-gram frequency table (top 20) — the LM-data
    n-gram statistics op.  Shingles counted with term frequency (not
    per-doc distinct), plus document frequency; global top-k via
    TakeOrderedAndProject after the grouped agg."""
    from ..operators.dedup import shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", F.explode(shingles("text")).alias("ngram"))
    counts = sh.groupBy("ngram").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return counts.orderBy(F.desc("n"), F.asc("ngram")).limit(20)


@register(
    "top_terms_per_doc",
    r"""
    WITH tk AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tk GROUP BY doc_id, term
    )
    SELECT doc_id, term, tf FROM (
      SELECT doc_id, term, tf,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tf DESC, term ASC) AS rk
      FROM tf
    ) WHERE rk <= 3
    """,
)
def q_top_terms_per_doc(spark, sf_dir):
    """Per-document top-3 terms by term frequency (integer tf → no
    float concerns; the tf half of TF-IDF, with the idf weighting left
    to MLlib's IDF where log portability doesn't matter)."""
    from pyspark.sql import Window
    from ..operators.textops import tokens

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("term"))
    return tf.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3).drop("rk")


@register(
    "pandas_udf_fingerprint",
    r"""
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def q_pandas_udf_fingerprint(spark, sf_dir):
    """The sanctioned slow path, demonstrated: an Arrow-batched
    @pandas_udf (vectorized, ~10-100x a row-at-a-time Python UDF —
    SURVEY.md §4.2) computing the whitespace-normalized content md5.
    Matches the pure-SQL oracle, proving the Python kernel is
    semantics-equivalent to the native expression used everywhere else."""
    import hashlib
    import re as _re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no annotations: `from __future__ import annotations` stringifies
    # hints, which pandas_udf's inference can't read — declare the type
    ws = _re.compile(r"\s+")

    def _fp(texts):
        return texts.map(
            lambda t: hashlib.md5(ws.sub(" ", t.strip()).lower().encode()).hexdigest()
        )

    fp_udf = pandas_udf(_fp, "string")

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fp_udf("text").alias("fp"))


@register(
    "corpus_filter_pipeline",
    f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             {_NTOK_SQL} AS n_tokens,
             (LEAST(CAST({_NTOK_SQL} AS DOUBLE) / 20.0, 1.0) * 0.4
              + (1.0 - LEAST({_PUNCT_SQL} * 4, 1.0)) * 0.3
              + LEAST({_STOPR_SQL} * 5, 1.0) * 0.3) AS quality
      FROM documents
    ) WHERE quality >= 0.5 AND n_tokens >= 10
    """,
)
def q_corpus_filter_pipeline(spark, sf_dir):
    """The training-data filtering pipeline: quality score ≥ 0.5 AND
    length ≥ 10 tokens — the compose-filters-then-keep-ids shape every
    corpus cleaning run uses.  Pure codegen'd expressions; at 100 TB
    this pipelines inside the scan stage."""
    from ..operators.textops import quality_score, token_count

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "lang",
            token_count("text").alias("n_tokens"),
            quality_score("text", _STOPWORDS).alias("quality"),
        )
        .filter((F.col("quality") >= 0.5) & (F.col("n_tokens") >= 10))
        .select("doc_id", "lang")
    )


@register("mllib_tfidf_norms", None)  # hashing-trick bucket ids are engine-internal
def q_mllib_tfidf_norms(spark, sf_dir):
    """MLlib TF-IDF (HashingTF → IDF): per-doc vector norms — the
    library featurization path beside the oracle-checked tf statistics
    (`top_terms_per_doc`).  Rows-only: the hashing trick's bucket
    assignment is Spark-internal."""
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer
    from pyspark.ml.functions import vector_to_array

    docs = load_table(spark, sf_dir, "documents")
    toks = Tokenizer(inputCol="text", outputCol="words").transform(docs)
    tf = HashingTF(inputCol="words", outputCol="tf", numFeatures=1 << 12).transform(toks)
    idf = IDF(inputCol="tf", outputCol="tfidf").fit(tf).transform(tf)
    arr = vector_to_array("tfidf")
    norm = F.sqrt(F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x * x))
    return idf.select("doc_id", norm.alias("tfidf_l2"))


def _winnow_sql(k: int = 3, w: int = 4) -> str:
    h = portable_hash64_sql("g", seed="winnow:")
    return rf"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS wds FROM documents
    ),
    f AS (SELECT doc_id, wds FROM t WHERE len(wds) >= {k + w - 1}),
    g AS (
      SELECT doc_id,
             list_transform(range(1, len(wds) - {k - 1} + 1),
                            i -> array_to_string(wds[i:i + {k - 1}], ' ')) AS grams
      FROM f
    ),
    h AS (SELECT doc_id, list_transform(grams, g -> {h}) AS hs FROM g),
    wnd AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(hs) - {w - 1} + 1),
                                          i -> list_min(hs[i:i + {w - 1}]))) AS fps
      FROM h
    )
    SELECT doc_id, unnest(fps) AS fp FROM wnd
    """


@register("doc_winnow_fingerprints", _winnow_sql())
def q_doc_winnow_fingerprints(spark, sf_dir):
    """Rolling-hash document fingerprinting via winnowing (MOSS): k-gram
    rolling hashes, per-window minima, distinct per doc — detects
    partial overlap, not just whole-doc duplication."""
    from ..operators.textops import winnow_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    return winnow_fingerprints(docs, k=3, w=4)


@register(
    "arrow_udf_fingerprint",
    r"""
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def q_arrow_udf_fingerprint(spark, sf_dir):
    """The Spark 4 Arrow-optimized scalar UDF (`@udf(useArrow=True)`):
    row-at-a-time author ergonomics, Arrow-batch transfer underneath —
    the migration path for legacy @udf code that can't be vectorized.
    Same oracle as `pandas_udf_fingerprint`, proving all three Python
    kernels (pandas_udf, arrow udf, native expression) agree bit-wise.
    Still the slow path at 100 TB: per-row Python call cost remains,
    only serialization improves — prefer the native-expression
    fingerprint (`doc_fingerprint`) in hot paths."""
    import hashlib
    import re as _re

    from pyspark.sql.functions import udf

    ws = _re.compile(r"\s+")

    def _fp(t):
        return hashlib.md5(ws.sub(" ", t.strip()).lower().encode()).hexdigest()

    fp_udf = udf(_fp, "string", useArrow=True)
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fp_udf("text").alias("fp"))


_COLLATE_SQL = """
SELECT lower(min(w)) AS token_lc, COUNT(*) AS n
FROM (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
) t
WHERE regexp_full_match(w, '[A-Za-z]+')
GROUP BY lower(w)
ORDER BY n DESC, token_lc ASC
LIMIT 20
"""


@register("collated_token_histogram", _COLLATE_SQL)
def q_collated_token_histogram(spark, sf_dir):
    """String-collation surface (Spark 4): case-insensitive token
    grouping via `COLLATE UNICODE_CI` — the engine-native way to fold
    case in GROUP BY without rewriting values.  Tokens are restricted
    to ASCII alpha so UNICODE_CI grouping coincides exactly with the
    oracle's lower() grouping (the two differ on locale-special
    casings like ß).  Group representative = binary MIN then lower()
    — deterministic on both engines.  Scale: collation compares are
    JVM-side ICU, grouping is an ordinary hash aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("w")).filter(
        F.col("w").rlike("^[A-Za-z]+$")
    )
    return (
        toks.groupBy(F.expr("w COLLATE UNICODE_CI").alias("wc"))
        .agg(F.lower(F.min("w")).alias("token_lc"), F.count(F.lit(1)).alias("n"))
        .select("token_lc", "n")
        .orderBy(F.desc("n"), F.asc("token_lc"))
        .limit(20)
    )
