"""Corpus-pipeline extension queries: chunking, repetition signals,
PII scrubbing (LLM-data surface, beyond the round-1 text family).

All oracle-checked: the operators are pure built-in string/array
expressions whose DuckDB mirrors are written term-for-term (same
tokenization regex, same slice arithmetic, same PII patterns — the
patterns are deliberately valid in BOTH Java regex and RE2).

The documents fixture is synthetic word-soup with no natural PII, so
``pii_scrub_audit`` *injects* deterministic PII (keyed on doc_id) on
both engine and oracle sides before scrubbing — the redaction logic is
certified against a non-vacuous match set (cf. VERDICT r1 on vacuous
oracles).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.textops import (
    PII_PATTERNS,
    chunk_documents,
    pii_counts,
    repetition_stats,
    scrub_pii,
)
from ..functions.hashing import hash_bucket, hash_bucket_sql, portable_hash64_sql
from ..sources.tables import load_table
from . import register

_W, _S = 50, 40  # chunk window / stride (tokens)

_TOKS = r"regexp_split_to_array(trim(text), '\s+')"

_CHUNKS_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
),
st AS (
  SELECT doc_id, w,
         unnest(range(1, greatest(len(w) - {_W} + {_S}, 1) + 1, {_S})) AS s
  FROM toks WHERE len(w) >= 1
)
SELECT doc_id,
       CAST((s - 1) // {_S} AS INTEGER) AS chunk_idx,
       array_to_string(w[s : s + {_W} - 1], ' ') AS chunk_text,
       CAST(least({_W}, len(w) - s + 1) AS INTEGER) AS n_tokens
FROM st
"""


@register("doc_chunks", _CHUNKS_SQL)
def q_doc_chunks(spark, sf_dir):
    """Overlapping token-window chunking (window=50, stride=40) — the
    document → training-example explosion step.  Map-side only."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, window=_W, stride=_S)


def _dup_frac_sql(n: int) -> str:
    return f"""
      CASE WHEN len(w) - {n - 1} >= 1
           THEN 1.0 - CAST(len(list_distinct(list_transform(
                    range(1, greatest(len(w) - {n - 1}, 1) + 1),
                    i -> array_to_string(w[i : i + {n - 1}], ' ')))) AS DOUBLE)
                / CAST(len(w) - {n - 1} AS DOUBLE)
           ELSE 0.0 END
    """


_REPETITION_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
),
base AS (
  SELECT doc_id,
         {_dup_frac_sql(2)} AS dup_2gram_frac,
         {_dup_frac_sql(3)} AS dup_3gram_frac
  FROM toks
),
counts AS (
  SELECT doc_id, tok, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(w) AS tok FROM toks)
  GROUP BY doc_id, tok
),
per_tok AS (
  SELECT doc_id, CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_token_frac
  FROM counts GROUP BY doc_id
)
SELECT b.doc_id, b.dup_2gram_frac, b.dup_3gram_frac, p.top_token_frac
FROM base b JOIN per_tok p ON b.doc_id = p.doc_id
"""


@register("repetition_profile", _REPETITION_SQL)
def q_repetition_profile(spark, sf_dir):
    """Gopher-style repetition signals per document: duplicate 2/3-gram
    fractions (map-side) + top-token fraction (one doc-keyed shuffle) —
    the quality-filter inputs a corpus-cleaning run thresholds on."""
    from ..operators.skew import spread_scan

    # Two branches re-tokenize every document; a small corpus parquet
    # is one split, so the per-doc n-gram list builds ran serially —
    # spread the scan first (no-op at real scale).
    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    return repetition_stats(docs)


# Deterministic PII injection (engine and oracle MUST match verbatim).
_EMAIL_PAT, _ = PII_PATTERNS["email"]
_PHONE_PAT, _ = PII_PATTERNS["phone"]
_IP_PAT, _ = PII_PATTERNS["ip"]

_INJECT_SQL = """
  CASE CAST(doc_id % 10 AS INTEGER)
    WHEN 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
    WHEN 1 THEN text || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
    WHEN 2 THEN text || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 host'
    ELSE text
  END
"""

_PII_SQL = f"""
WITH injected AS (
  SELECT doc_id, {_INJECT_SQL} AS text FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text,
         '{_EMAIL_PAT}', '<EMAIL>', 'g'),
         '{_IP_PAT}', '<IP>', 'g'),
         '{_PHONE_PAT}', '<PHONE>', 'g') AS scrubbed,
       CAST(len(regexp_extract_all(text, '{_EMAIL_PAT}')) AS INTEGER) AS n_email,
       CAST(len(regexp_extract_all(text, '{_IP_PAT}')) AS INTEGER) AS n_ip,
       CAST(len(regexp_extract_all(text, '{_PHONE_PAT}')) AS INTEGER) AS n_phone
FROM injected
"""


@register("pii_scrub_audit", _PII_SQL)
def q_pii_scrub_audit(spark, sf_dir):
    """PII scrub + audit counts: emails / IPv4s / phone-shaped numbers
    replaced with typed tags, per-kind redaction counts kept beside the
    scrubbed text.  Injection keyed on doc_id makes the match set
    non-vacuous (the fixture corpus itself is PII-free)."""
    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 10) == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        )
        .when(
            (F.col("doc_id") % 10) == 1,
            F.concat(
                F.col("text"),
                F.lit(" call 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                F.lit(" today"),
            ),
        )
        .when(
            (F.col("doc_id") % 10) == 2,
            F.concat(
                F.col("text"),
                F.lit(" from 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7 host"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    counts = pii_counts("text")
    return injected.select(
        "doc_id",
        scrub_pii("text").alias("scrubbed"),
        counts["n_email"].alias("n_email"),
        counts["n_ip"].alias("n_ip"),
        counts["n_phone"].alias("n_phone"),
    )


_VOCAB_K = 20

_VOCAB_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
vocab AS (
  SELECT tok FROM (
    SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
    ORDER BY c DESC, tok ASC LIMIT {_VOCAB_K}
  )
),
per AS (
  SELECT t.doc_id,
         COUNT(*) AS n_tok,
         CAST(SUM(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_in_vocab
  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
  GROUP BY t.doc_id
)
SELECT doc_id, n_tok, n_in_vocab,
       CAST(n_in_vocab AS DOUBLE) / CAST(n_tok AS DOUBLE) AS coverage
FROM per
"""


@register("vocab_coverage_profile", _VOCAB_SQL)
def q_vocab_coverage_profile(spark, sf_dir):
    """Vocabulary-coverage profiling: build the top-K corpus vocabulary
    (K=20, deterministic tie-break), then score every document by the
    fraction of its tokens the vocabulary covers — the pre-tokenizer
    coverage check an LLM data pipeline runs before committing to a
    vocab.  Two grouped aggs + one BROADCAST join (the vocab is ≤ K rows
    by construction — never a shuffle of the token stream against it)."""
    from ..operators.textops import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(_VOCAB_K)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    per = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(F.coalesce(F.col("in_vocab"), F.lit(0))).alias("n_in_vocab"),
        )
    )
    return per.select(
        "doc_id",
        "n_tok",
        "n_in_vocab",
        (F.col("n_in_vocab").cast("double") / F.col("n_tok").cast("double")).alias(
            "coverage"
        ),
    )


_CENTER_SQL = """
WITH med AS (
  SELECT lang, quantile_disc(n_chars, 0.5) AS m FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang, d.n_chars, d.n_chars - med.m AS centered
FROM documents d JOIN med ON d.lang = med.lang
"""


@register("group_median_center", _CENTER_SQL)
def q_group_median_center(spark, sf_dir):
    """Grouped ``applyInPandas`` (the plain Arrow grouped-UDF path —
    mapInPandas, pandas_udf and applyInPandasWithState are certified
    elsewhere): per-language LOWER-median centering of document length.
    Integer arithmetic with an explicit median convention
    (sorted[(n-1)//2] == DuckDB quantile_disc(0.5)) keeps the pandas
    path bit-exact against the oracle.  At scale this is one shuffle on
    the group key with Arrow-batched per-group compute — the custom-
    aggregation escape hatch when built-ins can't express the logic."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def _center(pdf: "pd.DataFrame") -> "pd.DataFrame":
        v = pdf["n_chars"].sort_values().to_numpy()
        m = int(v[(len(v) - 1) // 2])
        out = pdf[["doc_id", "lang", "n_chars"]].copy()
        out["centered"] = pdf["n_chars"] - m
        return out

    return docs.groupBy("lang").applyInPandas(
        _center, schema="doc_id long, lang string, n_chars long, centered long"
    )


_BALANCE_GRAIN = 1_000_000

_BALANCE_SQL = f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
),
target AS (SELECT MIN(n) AS floor_n FROM counts),
thresholds AS (
  SELECT c.lang,
         CAST(t.floor_n * {_BALANCE_GRAIN} / c.n AS BIGINT) AS thr
  FROM counts c, target t
)
SELECT d.doc_id, d.lang
FROM documents d JOIN thresholds th ON d.lang = th.lang
WHERE (CAST(concat('0x', substring(md5(concat('langbal', CAST(d.doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
       % {_BALANCE_GRAIN}) < th.thr
"""


@register("lang_balanced_sample", _BALANCE_SQL)
def q_lang_balanced_sample(spark, sf_dir):
    """Mixture rebalancing: downsample every language toward the
    smallest language's count (uniform target mixture) with the
    deterministic portable-hash sampler — per-language keep-thresholds
    are COMPUTED FROM the data (one tiny agg, broadcast back), so the
    same query self-adjusts as the corpus mixture drifts.  The
    train-mixture control knob of an LLM data pipeline, reproducible on
    any engine/cluster."""
    from ..functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    floor_n = counts.agg(F.min("n").alias("floor_n"))
    thresholds = counts.crossJoin(F.broadcast(floor_n)).select(
        "lang",
        (F.col("floor_n") * _BALANCE_GRAIN / F.col("n")).cast("long").alias("thr"),
    )
    h = F.pmod(portable_hash64(F.col("doc_id"), seed="langbal"), F.lit(_BALANCE_GRAIN))
    return (
        docs.join(F.broadcast(thresholds), "lang")
        .filter(h < F.col("thr"))
        .select("doc_id", "lang")
    )


_SURPRISAL_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
total AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM toks),
probs AS (
  SELECT tok, CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM total) AS p
  FROM toks GROUP BY tok
)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       (-CAST(CAST(SUM(CAST(round(log2(p), 6) AS DECIMAL(30, 6))) AS VARCHAR)
              AS DOUBLE) / COUNT(*)) AS mean_surprisal_bits
FROM toks t JOIN probs pr ON t.tok = pr.tok
GROUP BY t.doc_id
"""


@register("unigram_surprisal_score", _SURPRISAL_SQL)
def q_unigram_surprisal_score(spark, sf_dir):
    """Language-model quality scoring, the unigram base case: per-doc
    mean surprisal  −Σ log2 p(tok) / n  under the corpus's own unigram
    distribution — the perplexity-style filter that flags gibberish
    (high surprisal) and boilerplate (low).  The probability table is
    built FROM the corpus in one agg and broadcast back (at real scale
    a ~1M-row vocab still broadcasts); scoring is an explode + join +
    doc-keyed agg.

    Cross-engine hash parity for a transcendental (VERDICT r2 ask #6):
    each per-term ``log2(p)`` is quantized to a 1e-6 decimal grid BEFORE
    summation, the sum is exact DECIMAL (order-independent, the
    functions/numeric.py discipline), and only the final divide is
    float.  Engines' log2 implementations agree to ~1 ulp, so a grid
    flip needs a value within ~1e-10 of a boundary — vanishing, and the
    quantization costs nothing semantically at 1e-6 bits.  Value
    correctness against an unquantized independent Python model remains
    pinned by tests/test_textops_units.py."""
    from ..operators.textops import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    total = toks.count()  # scalar: one number, not a data collect
    probs = (
        toks.groupBy("tok")
        .agg((F.count(F.lit(1)).cast("double") / F.lit(float(total))).alias("p"))
    )
    quantized = F.round(F.log2("p"), 6).cast("decimal(30, 6)")
    return (
        toks.join(F.broadcast(probs), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (-F.sum(quantized).cast("double") / F.count(F.lit(1))).alias(
                "mean_surprisal_bits"
            ),
        )
    )


# Tag pattern valid in both Java regex and RE2 (no backrefs/lookaround).
_TAG_PAT = r"<[^>]+>"

_HTML_SQL = f"""
WITH injected AS (
  SELECT doc_id,
         CASE CAST(doc_id % 5 AS INTEGER)
           WHEN 0 THEN '<p>' || text || '</p>'
           WHEN 1 THEN '<div class="c">' || text || '</div><br/>'
           WHEN 2 THEN text || ' <a href="x">link</a>'
           ELSE text
         END AS text
  FROM documents
)
SELECT doc_id,
       trim(regexp_replace(text, '{_TAG_PAT}', ' ', 'g')) AS stripped,
       CAST(len(regexp_extract_all(text, '{_TAG_PAT}')) AS INTEGER) AS n_tags
FROM injected
"""


@register("html_strip_audit", _HTML_SQL)
def q_html_strip_audit(spark, sf_dir):
    """Boilerplate/markup stripping: HTML-style tags removed (replaced
    with spaces to preserve token boundaries) with a removed-tag audit
    count per document.  The fixture corpus is plain text, so markup is
    injected deterministically (keyed on doc_id) on both sides — the
    stripping logic is certified against a non-vacuous match set, same
    discipline as pii_scrub_audit.  Map-side regex, pipelines in the
    scan at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 5) == 0,
            F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>")),
        )
        .when(
            (F.col("doc_id") % 5) == 1,
            F.concat(F.lit('<div class="c">'), F.col("text"), F.lit("</div><br/>")),
        )
        .when(
            (F.col("doc_id") % 5) == 2,
            F.concat(F.col("text"), F.lit(' <a href="x">link</a>')),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return injected.select(
        "doc_id",
        F.trim(F.regexp_replace("text", _TAG_PAT, " ")).alias("stripped"),
        F.size(F.regexp_extract_all("text", F.lit(_TAG_PAT), 0)).alias("n_tags"),
    )


# ---------------------------------------------------------------------------
# Distribution drift between corpus snapshots — the monitoring op a
# continuously-ingesting training-data pipeline runs on every refresh.
# ---------------------------------------------------------------------------

_DRIFT_NBINS = 8
_DRIFT_BINW = 250

_DRIFT_SQL = f"""
WITH tagged AS (
  SELECT least({_DRIFT_NBINS - 1}, CAST(n_chars // {_DRIFT_BINW} AS BIGINT)) AS bin,
         ({hash_bucket_sql('doc_id', 2, seed='drift')}) AS half
  FROM documents
),
counts AS (
  SELECT bin,
         CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM tagged GROUP BY bin
)
SELECT bin, n_a, n_b,
       CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b) AS chi2_term,
       (CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b)) > 6.63 AS bin_drifted
FROM counts
"""


@register("corpus_drift_chi2", _DRIFT_SQL)
def q_corpus_drift_chi2(spark, sf_dir):
    """Drift detection between two corpus snapshots (here: the two
    halves of a deterministic hash split — in production, yesterday's
    crawl vs today's): documents binned by length, per-bin chi-square
    contribution (na-nb)^2/(na+nb), flagged past the chi2(1) 1%%
    critical value.  All counts are exact integers and each bin does
    ONE double division, so parity is bit-exact per row (no float
    summation anywhere).  At 100 TB this is a single map-side
    bin+half tag followed by one {_DRIFT_NBINS}-key aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    tagged = docs.select(
        F.least(
            F.lit(_DRIFT_NBINS - 1), F.expr(f"n_chars DIV {_DRIFT_BINW}")
        ).cast("long").alias("bin"),
        hash_bucket("doc_id", 2, seed="drift").alias("half"),
    )
    counts = tagged.groupBy("bin").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("long").alias("n_b"),
    )
    diff2 = ((F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b"))).cast(
        "double"
    )
    term = diff2 / (F.col("n_a") + F.col("n_b"))
    return counts.select(
        "bin", "n_a", "n_b", term.alias("chi2_term"), (term > 6.63).alias("bin_drifted")
    )


_WCAP = 2000

_WEIGHTED_SQL = f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE ({hash_bucket_sql('doc_id', _WCAP, seed='wsample')})
      < least(n_chars, {_WCAP})
"""


@register("weighted_doc_sample", _WEIGHTED_SQL)
def q_weighted_doc_sample(spark, sf_dir):
    """Length-proportional deterministic sampling: each document is
    kept with probability min(n_chars, {_WCAP})/{_WCAP} — the token-
    budget-aware subsample a training-data pipeline uses so short
    fragments don't dominate by count.  Pure integer comparison on the
    portable hash (no RNG state, no floats), so membership is
    reproducible across engines, partitionings, and retries — the same
    seeded-hash discipline as `hash_split_assignments`.  Map-side
    only: the sample IS a pushable filter."""
    docs = load_table(spark, sf_dir, "documents")
    keep = hash_bucket("doc_id", _WCAP, seed="wsample") < F.least(
        F.col("n_chars"), F.lit(_WCAP)
    )
    return docs.filter(keep).select("doc_id", "lang", "n_chars")


# URL pattern valid in both Java regex and DuckDB RE2 (no lookaround);
# hosts come from the capture group, the full match feeds the count.
_URL_PAT = r"https?://[a-z0-9.-]+/[^ ]*"
_HOST_PAT = r"https?://([a-z0-9.-]+)/"

_URL_SQL = f"""
WITH injected AS (
  SELECT doc_id,
         CASE
           WHEN doc_id % 3 = 0 THEN
             text || ' https://host' || CAST(doc_id % 7 AS VARCHAR)
                  || '.example.com/p/' || CAST(doc_id AS VARCHAR)
           ELSE text
         END ||
         CASE
           WHEN doc_id % 5 = 0 THEN
             ' http://mirror' || CAST(doc_id % 3 AS VARCHAR) || '.example.org/x'
           ELSE ''
         END AS text
  FROM documents
), urls AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{_URL_PAT}')) AS url
  FROM injected
)
SELECT regexp_extract(url, '{_HOST_PAT}', 1) AS host,
       COUNT(*) AS n_urls,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM urls
GROUP BY 1
"""


@register("url_host_stats", _URL_SQL)
def q_url_host_stats(spark, sf_dir):
    """Crawl-hygiene URL analytics: extract every URL from each
    document, reduce to per-host frequency + document reach — the
    profile that drives per-host sampling caps and blocklists in a
    crawl pipeline.  The fixture corpus is URL-free, so URLs are
    injected deterministically (keyed on doc_id) on BOTH sides, the
    html_strip_audit discipline — the extraction logic is certified
    against a non-vacuous match set.

    Scale: regex extraction is map-side (whole-stage codegen, no UDF);
    the only shuffle carries (host, doc_id) pairs for the distinct
    count — at 100 TB use approx_count_distinct per host if exact doc
    reach isn't required."""
    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.when(
                (F.col("doc_id") % 3) == 0,
                F.concat(
                    F.col("text"),
                    F.lit(" https://host"),
                    (F.col("doc_id") % 7).cast("string"),
                    F.lit(".example.com/p/"),
                    F.col("doc_id").cast("string"),
                ),
            ).otherwise(F.col("text")),
            F.when(
                (F.col("doc_id") % 5) == 0,
                F.concat(
                    F.lit(" http://mirror"),
                    (F.col("doc_id") % 3).cast("string"),
                    F.lit(".example.org/x"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    urls = injected.select(
        "doc_id",
        F.explode(F.expr(f"regexp_extract_all(text, '{_URL_PAT}', 0)")).alias("url"),
    )
    return (
        urls.select(F.regexp_extract("url", _HOST_PAT, 1).alias("host"), "doc_id")
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


# Accent fold map — identical literal on both sides; covers exactly the
# lowercase accented chars the injection introduces plus the common
# Latin-1 set (a full ICU fold is a library call, not an expression —
# this is the explicit, auditable subset).
_ACC_FROM = "àáâãäåçèéêëìíîïñòóôõöùúûüý"
_ACC_TO = "aaaaaaceeeeiiiinooooouuuuy"

_NORM_SQL = f"""
WITH injected AS (
  SELECT doc_id,
         CASE CAST(doc_id % 4 AS INTEGER)
           WHEN 0 THEN text || '  Café  naïve Über RÉSUMÉ'
           WHEN 1 THEN 'Àé îõ ü ' || text
           ELSE text
         END AS text
  FROM documents
), norm AS (
  SELECT doc_id, text,
         trim(regexp_replace(translate(lower(text), '{_ACC_FROM}', '{_ACC_TO}'),
                             '\\s+', ' ', 'g')) AS normalized
  FROM injected
)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_before,
       CAST(length(normalized) AS BIGINT) AS n_chars_after,
       md5(normalized) AS norm_md5,
       (normalized <> text) AS changed
FROM norm
"""


@register("text_normalize_profile", _NORM_SQL)
def q_text_normalize_profile(spark, sf_dir):
    """Pre-tokenization text normalization: casefold → accent fold
    (explicit char map — auditable, engine-portable; a full ICU fold is
    a library call, not an expression) → whitespace collapse → trim,
    with before/after audit columns.  The corpus is ASCII, so accented
    text is injected deterministically on both sides (the established
    non-vacuous-match discipline; 'Über' also certifies that unmapped
    chars pass through casefold untouched).

    Scale: pure map-side string expressions in whole-stage codegen —
    normalization cost rides the scan, zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 4) == 0,
            F.concat(F.col("text"), F.lit("  Café  naïve Über RÉSUMÉ")),
        )
        .when((F.col("doc_id") % 4) == 1, F.concat(F.lit("Àé îõ ü "), F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    normalized = F.trim(
        F.regexp_replace(
            F.translate(F.lower(F.col("text")), _ACC_FROM, _ACC_TO), r"\s+", " "
        )
    )
    return injected.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_before"),
        F.length(normalized).cast("long").alias("n_chars_after"),
        F.md5(normalized).alias("norm_md5"),
        (normalized != F.col("text")).alias("changed"),
    )


# ---------------------------------------------------------------------------
# Bigram LM log-loss: the CCNet-style perplexity quality filter, one
# order above `unigram_surprisal_score`.  The LM is trained on the
# corpus itself (add-0.5 smoothing over context counts), then every
# doc is scored by mean bits-per-bigram under that model.
# ---------------------------------------------------------------------------

_LM_A = 0.5  # additive smoothing mass

_BIGRAM_LM_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
),
big AS (
  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
  FROM t, UNNEST(range(1, len(w))) AS r(i)
  WHERE len(w) >= 2
),
vocab AS (
  SELECT COUNT(DISTINCT tok) AS v FROM (SELECT unnest(w) AS tok FROM t)
),
cb AS (SELECT w1, w2, COUNT(*) AS n_bi FROM big GROUP BY 1, 2),
cu AS (SELECT w1, COUNT(*) AS n_ctx FROM big GROUP BY 1)
SELECT b.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(-SUM(CAST(round(log2((cb.n_bi + {_LM_A})
                                 / (cu.n_ctx + {_LM_A} * vocab.v)), 6)
                      AS DECIMAL(30, 6))) AS DOUBLE) / COUNT(*)
         AS mean_logloss_bits
FROM big b
JOIN cb ON b.w1 = cb.w1 AND b.w2 = cb.w2
JOIN cu ON b.w1 = cu.w1
CROSS JOIN vocab
GROUP BY b.doc_id
"""


@register("bigram_lm_logloss", _BIGRAM_LM_SQL)
def q_bigram_lm_logloss(spark, sf_dir):
    """Per-doc mean bigram log-loss (bits) under a corpus-trained
    add-{_LM_A} bigram LM — the perplexity filter proper: unusually
    high log-loss flags gibberish/OCR noise, unusually low flags
    boilerplate repetition.  Same parity discipline as
    `unigram_surprisal_score`: each log2 quantized to the 1e-6 grid
    before an exact DECIMAL sum; only the final divide is float.

    Scale plan: the LM tables (bigram and context counts, vocab size)
    are vocabulary-bounded — millions of rows at web scale, far under
    the corpus — so they build with two map-side-combined aggregates
    and attach back by BROADCAST; the scoring pass is then map-side
    with one doc-keyed aggregate.  The corpus is never shuffled on the
    (skewed) token key: frequency skew lives entirely inside the
    map-side combine of the count aggregates."""
    from ..operators.textops import tokens

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens("text").alias("w")).filter(F.size("w") >= 2)
    big = t.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i + 1] AS w2))")
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    vocab = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    cb = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_bi"))
    cu = big.groupBy("w1").agg(F.count(F.lit(1)).alias("n_ctx"))
    logp = F.round(
        F.log2(
            (F.col("n_bi") + F.lit(_LM_A))
            / (F.col("n_ctx") + F.lit(_LM_A) * F.col("v"))
        ),
        6,
    ).cast("decimal(30, 6)")
    return (
        big.join(F.broadcast(cb), ["w1", "w2"])
        .join(F.broadcast(cu), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (-F.sum(logp).cast("double") / F.count(F.lit(1))).alias(
                "mean_logloss_bits"
            ),
        )
    )


# ---------------------------------------------------------------------------
# PSI split drift: population stability index between two deterministic
# hash halves over value bands — the monitoring metric for "did my
# train/serve split (or yesterday/today snapshot) drift", complementing
# `corpus_drift_chi2`'s significance test with the thresholded
# magnitude score ops teams alert on (PSI > 0.2 rule of thumb).
# ---------------------------------------------------------------------------

_PSI_BAND_W = 60_000
_PSI_BANDS = 10


def _psi_sql() -> str:
    from ..functions.hashing import portable_hash64_sql

    h = portable_hash64_sql("CAST(o_orderkey AS VARCHAR)", seed="psi:")
    return f"""
WITH assigned AS (
  SELECT LEAST(CAST(floor(o_totalprice / {_PSI_BAND_W}) AS BIGINT),
               {_PSI_BANDS - 1}) AS band,
         {h} % 2 AS half
  FROM orders
),
counts AS (
  SELECT band,
         SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS na,
         SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS nb
  FROM assigned GROUP BY band
),
tot AS (SELECT SUM(na) AS na_tot, SUM(nb) AS nb_tot FROM counts)
SELECT band, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
       round((CAST(na AS DOUBLE) / na_tot - CAST(nb AS DOUBLE) / nb_tot)
             * ln(CAST(na * nb_tot AS DOUBLE) / (nb * na_tot)), 6) AS psi_term
FROM counts CROSS JOIN tot
"""


@register("psi_split_drift", _psi_sql())
def q_psi_split_drift(spark, sf_dir):
    """Per-band PSI contributions between two halves of a deterministic
    hash split of orders (a self-calibration: true drift ≈ 0, so any
    material psi_term would expose a broken splitter).  Band widths are
    fixed so both engines bin identically; the log-ratio is one ln of
    an exactly-computed double, rounded to 1e-6.

    Scale plan: one scan → band×half counts (map-side combined,
    {_PSI_BANDS}×2 cells), the grand totals re-attached by 1-row
    broadcast; everything after the first aggregate is dim-sized."""
    from ..functions.hashing import portable_hash64

    o = load_table(spark, sf_dir, "orders")
    assigned = o.select(
        F.least(
            F.floor(F.col("o_totalprice") / _PSI_BAND_W).cast("long"),
            F.lit(_PSI_BANDS - 1),
        ).alias("band"),
        (portable_hash64("o_orderkey", seed="psi:") % 2).alias("half"),
    )
    counts = assigned.groupBy("band").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("nb"),
    )
    # totals as a window over the band-count relation, not a re-aggregated
    # branch: a second agg subtree re-scans orders (two FileScans); the
    # window form keeps ONE scan, and a global window over ≤_PSI_BANDS
    # rows is the sanctioned dim-sized idiom (see token_budget_allocation)
    w_all = Window.partitionBy()
    counts = counts.withColumn("na_tot", F.sum("na").over(w_all)).withColumn(
        "nb_tot", F.sum("nb").over(w_all)
    )
    return counts.select(
        "band",
        F.col("na").cast("long").alias("na"),
        F.col("nb").cast("long").alias("nb"),
        F.round(
            (
                F.col("na").cast("double") / F.col("na_tot")
                - F.col("nb").cast("double") / F.col("nb_tot")
            )
            * F.log(
                (F.col("na") * F.col("nb_tot")).cast("double")
                / (F.col("nb") * F.col("na_tot"))
            ),
            6,
        ).alias("psi_term"),
    )


# ---------------------------------------------------------------------------
# Boilerplate-gram share: per doc, the fraction of its distinct 3-gram
# shingles that are "source boilerplate" (present in ≥ 30% of that
# source's docs) — the signal behind header/footer/template stripping
# in web-corpus pipelines (a doc that is MOSTLY boilerplate carries
# little training value even if each line looks clean).
# ---------------------------------------------------------------------------

_BOILER_DF = 0.30

_BOILER_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS w
  FROM documents
), sh AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(range(1, len(w) - 1),
                i -> array_to_string(w[i:i+2], ' ')))) AS shingle
  FROM toks WHERE len(w) >= 3
),
src_docs AS (SELECT source, COUNT(DISTINCT doc_id) AS n_docs FROM sh GROUP BY source),
gram_df AS (
  SELECT source, shingle, COUNT(*) AS df FROM sh GROUP BY 1, 2
),
boiler AS (
  SELECT g.source, g.shingle
  FROM gram_df g JOIN src_docs s ON g.source = s.source
  WHERE g.df * 100 >= {int(_BOILER_DF * 100)} * s.n_docs
)
SELECT h.doc_id,
       ANY_VALUE(h.source) AS source,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boiler,
       CAST(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS boiler_share
FROM sh h
LEFT JOIN boiler b ON h.source = b.source AND h.shingle = b.shingle
GROUP BY h.doc_id
"""


@register("boilerplate_gram_share", _BOILER_SQL)
def q_boilerplate_gram_share(spark, sf_dir):
    """Per-doc boilerplate share: fraction of the doc's distinct 3-gram
    shingles that ≥ {_BOILER_DF:.0%} of same-source docs also contain.
    The threshold compare is pure integer (df·100 ≥ 30·n_docs) so the
    boilerplate set is bit-identical across engines.

    Scale plan: one exploded-shingle relation feeds both the per-source
    document-frequency aggregate and the scoring join; the boilerplate
    gram set is df-thresholded and therefore SMALL (per source, at most
    1/{_BOILER_DF:.0g} grams per doc on average can pass) — it
    broadcasts, and the corpus-side probe is map-side.  The only
    corpus-sized shuffles are the df aggregate and the final doc
    rollup."""
    from ..operators.dedup import shingles
    from ..operators.skew import spread_scan

    # The shingle explode feeds THREE branches (doc counts, gram df,
    # probe) and re-runs per branch from the scan; spread an
    # under-split corpus parquet so the explodes run at cluster
    # parallelism (no-op at real scale).
    docs = spread_scan(load_table(spark, sf_dir, "documents"))

    sh = docs.select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(shingles("text", 3))).alias("shingle"),
    )
    src_docs = sh.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    gram_df = sh.groupBy("source", "shingle").agg(F.count(F.lit(1)).alias("df"))
    boiler = (
        gram_df.join(F.broadcast(src_docs), "source")
        .filter(F.col("df") * 100 >= int(_BOILER_DF * 100) * F.col("n_docs"))
        .select("source", "shingle", F.lit(1).alias("is_boiler"))
    )
    return (
        sh.join(F.broadcast(boiler), ["source", "shingle"], "left")
        .groupBy("doc_id")
        .agg(
            F.first("source").alias("source"),
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("is_boiler").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_boiler"),
            (
                F.sum(F.when(F.col("is_boiler").isNotNull(), 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("boiler_share"),
        )
    )


# ---------------------------------------------------------------------------
# MLM-style span masking: deterministic 15% token masking keyed on
# (doc, position) — the training-example augmentation step, seeded so
# every epoch regenerates the identical mask (or a new one by bumping
# the seed), never RNG state.
# ---------------------------------------------------------------------------

_MASK_RATE = 15  # percent
_MASK_SEED = "mask:"


def _mask_sql() -> str:
    from ..functions.hashing import portable_hash64_sql

    h = portable_hash64_sql(
        "concat(CAST(doc_id AS VARCHAR), ':', CAST(i AS VARCHAR))", seed=_MASK_SEED
    )
    return f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
),
m AS (
  SELECT doc_id,
         list_transform(range(1, len(w) + 1),
           i -> CASE WHEN {h} % 100 < {_MASK_RATE}
                     THEN '<MASK>' ELSE w[i] END) AS mw,
         len(w) AS n_tok
  FROM t
)
SELECT doc_id, array_to_string(mw, ' ') AS masked_text,
       CAST(len(list_filter(mw, x -> x = '<MASK>')) AS BIGINT) AS n_masked,
       CAST(n_tok AS BIGINT) AS n_tokens
FROM m
"""


@register("span_mask_augment", _mask_sql())
def q_span_mask_augment(spark, sf_dir):
    """Deterministic {_MASK_RATE}% token masking per document (the MLM
    data-augmentation op): mask token i of doc d iff
    h(seed, d, i) mod 100 < {_MASK_RATE}.  Position-keyed hashing makes
    the mask reproducible AND independent across epochs (bump the seed
    per epoch) — replacing per-worker RNG state exactly as the
    engine's sampling family does.

    Scale plan: pure map-side array transform inside the scan stage —
    zero shuffles; the mask decision is built-in md5 arithmetic, no
    UDF."""
    from ..functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    from ..operators.textops import tokens as tok_arr

    t = docs.select("doc_id", tok_arr("text").alias("w"))
    mask_expr = (
        "transform(sequence(1, size(w)), i -> "
        "CASE WHEN pmod(cast(conv(substring(md5(concat('"
        + _MASK_SEED
        + "', cast(doc_id as string), ':', cast(i as string))), 1, 15), 16, 10) "
        f"as bigint), 100) < {_MASK_RATE} THEN '<MASK>' ELSE w[i - 1] END)"
    )
    m = t.select(
        "doc_id",
        F.expr(mask_expr).alias("mw"),
        F.size("w").alias("n_tok"),
    )
    return m.select(
        "doc_id",
        F.array_join("mw", " ").alias("masked_text"),
        F.size(F.filter(F.col("mw"), lambda x: x == F.lit("<MASK>")))
        .cast("long")
        .alias("n_masked"),
        F.col("n_tok").cast("long").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Nucleus (top-p) vocabulary coverage per bigram context: how many
# continuations cover 90% of the probability mass — the sampling-time
# statistic behind top-p decoding, computed over the same corpus LM as
# `bigram_lm_logloss`.
# ---------------------------------------------------------------------------

_NUC_P_NUM, _NUC_P_DEN = 9, 10  # p = 0.9 as an exact rational

_NUCLEUS_SQL = f"""
WITH t AS (
  SELECT regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
),
big AS (
  SELECT w[i] AS w1, w[i + 1] AS w2
  FROM t, UNNEST(range(1, len(w))) AS r(i) WHERE len(w) >= 2
),
c AS (SELECT w1, w2, COUNT(*) AS n FROM big GROUP BY 1, 2),
tot AS (SELECT w1, SUM(n) AS tot FROM c GROUP BY 1),
ranked AS (
  SELECT c.w1, c.n, t.tot,
         SUM(c.n) OVER (PARTITION BY c.w1 ORDER BY c.n DESC, c.w2) AS cum
  FROM c JOIN tot t ON c.w1 = t.w1
)
SELECT w1 AS context,
       CAST(ANY_VALUE(tot) AS BIGINT) AS n_continuations,
       CAST(COUNT(*) AS BIGINT) AS n_vocab,
       CAST(SUM(CASE WHEN (cum - n) * {_NUC_P_DEN} < tot * {_NUC_P_NUM}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_nucleus
FROM ranked GROUP BY w1
"""


@register("nucleus_vocab_coverage", _NUCLEUS_SQL)
def q_nucleus_vocab_coverage(spark, sf_dir):
    """Per bigram context: continuation vocabulary size and its 0.9
    nucleus (smallest prefix of the count-sorted continuations whose
    mass reaches 90%).  Membership is the exact integer test
    (cum_before·10 < tot·9) — a continuation is in the nucleus iff the
    mass BEFORE it is still under p — so both engines cut the identical
    prefix, ties broken by token.

    Scale plan: bigram counts are the vocabulary-bounded LM relation;
    the cumulative window partitions by context over THAT, never the
    corpus."""
    from pyspark.sql import Window

    from ..operators.textops import tokens as tok_arr

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(tok_arr("text").alias("w")).filter(F.size("w") >= 2)
    big = t.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 2), "
                "i -> struct(w[i] AS w1, w[i + 1] AS w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    c = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    tot = c.groupBy("w1").agg(F.sum("n").alias("tot"))
    w_cum = Window.partitionBy("w1").orderBy(F.desc("n"), F.asc("w2")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = c.join(F.broadcast(tot), "w1").withColumn(
        "cum", F.sum("n").over(w_cum)
    )
    return ranked.groupBy(F.col("w1").alias("context")).agg(
        F.first("tot").cast("long").alias("n_continuations"),
        F.count(F.lit(1)).alias("n_vocab"),
        F.sum(
            F.when(
                (F.col("cum") - F.col("n")) * _NUC_P_DEN < F.col("tot") * _NUC_P_NUM,
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_nucleus"),
    )


# ---------------------------------------------------------------------------
# Per-source quantile alignment: each source's length deciles against
# the pooled corpus deciles — the fit artifact of quantile
# normalization (mapping every source's distribution onto the pooled
# one before mixing, so no source's length profile skews packing or
# curriculum bins).
# ---------------------------------------------------------------------------

_QN_QS = [0.1, 0.25, 0.5, 0.75, 0.9]
_QN_QS_SQL = ", ".join(str(q) for q in _QN_QS)

_QN_SQL = f"""
WITH pool AS (
  SELECT unnest([{_QN_QS_SQL}]) AS q,
         unnest(quantile_cont(n_chars, [{_QN_QS_SQL}])) AS pool_q
  FROM documents
),
per_src AS (
  SELECT source, unnest([{_QN_QS_SQL}]) AS q,
         unnest(quantile_cont(n_chars, [{_QN_QS_SQL}])) AS src_q
  FROM documents GROUP BY source
)
SELECT s.source, CAST(s.q AS DOUBLE) AS q, round(s.src_q, 6) AS src_q,
       round(p.pool_q, 6) AS pool_q,
       round(s.src_q / p.pool_q, 6) AS length_ratio
FROM per_src s JOIN pool p USING (q)
"""


@register("quantile_norm_report", _QN_SQL)
def q_quantile_norm_report(spark, sf_dir):
    """Quantile-normalization fit report: each source's exact length
    quantiles (p10/p25/p50/p75/p90) beside the pooled corpus's, with
    the per-quantile ratio — ratio far from 1 marks the sources whose
    documents need remapping before temperature mixing (a source of
    10× longer documents eats 10× the token budget per doc).  Exact
    interpolated quantiles on both engines (Spark `percentile` ≡
    DuckDB `quantile_cont`).

    Scale plan: one grouped exact-percentile aggregate per side —
    the per-group sort the exact form costs is the declared
    tradeoff, with `percentile_approx`/KLL as the unbounded-scale
    stand-in (same pairing as `quantile_sketch_by_flag_check`)."""
    docs = load_table(spark, sf_dir, "documents")
    qs_arr = "array(" + ", ".join(str(q) for q in _QN_QS) + ")"
    pool = docs.agg(
        F.expr(f"percentile(n_chars, {qs_arr})").alias("pq")
    ).select(
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(q) for q in _QN_QS]).alias("q"),
                F.col("pq").alias("pool_q"),
            )
        ).alias("z")
    ).select(F.col("z.q").alias("q"), F.col("z.pool_q").alias("pool_q"))
    per_src = docs.groupBy("source").agg(
        F.expr(f"percentile(n_chars, {qs_arr})").alias("sq")
    ).select(
        "source",
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(q) for q in _QN_QS]).alias("q"),
                F.col("sq").alias("src_q"),
            )
        ).alias("z"),
    ).select("source", F.col("z.q").alias("q"), F.col("z.src_q").alias("src_q"))
    return per_src.join(F.broadcast(pool), "q").select(
        "source",
        "q",
        F.round("src_q", 6).alias("src_q"),
        F.round("pool_q", 6).alias("pool_q"),
        F.round(F.col("src_q") / F.col("pool_q"), 6).alias("length_ratio"),
    )


# ---------------------------------------------------------------------------
# URL canonicalization + dedup accounting: the crawl-frontier hygiene
# step (scheme/host case, www, default ports, fragments, tracking
# queries, trailing slashes all collapse) — done entirely in native
# string expressions so the canonicalizer is whole-stage-codegen'd.
# ---------------------------------------------------------------------------

_UC_VARIANTS = 4


def _uc_canon_sql(u: str) -> str:
    # 1 strip fragment, 2 strip query, 3 lowercase scheme://host and
    # drop default port + www., 4 strip trailing slash
    nofrag = f"regexp_replace(regexp_replace({u}, '#.*$', ''), '\\?.*$', '')"
    pre = f"regexp_extract({nofrag}, '^(https?://[^/]+)', 1)"
    canon_pre = (
        f"regexp_replace(regexp_replace(lower({pre}), ':(443|80)$', ''),"
        f" '://www\\.', '://')"
    )
    rest = f"substring({nofrag}, length({pre}) + 1)"
    return f"regexp_replace(concat({canon_pre}, {rest}), '/$', '')"


_UC_RAW_SQL = """
  SELECT doc_id,
         CASE CAST(doc_id % 4 AS INTEGER)
           WHEN 0 THEN concat('https://Example.COM/p/', CAST(doc_id % 50 AS VARCHAR))
           WHEN 1 THEN concat('https://www.example.com:443/p/', CAST(doc_id % 50 AS VARCHAR), '?utm_source=x')
           WHEN 2 THEN concat('https://EXAMPLE.com/p/', CAST(doc_id % 50 AS VARCHAR), '#frag')
           ELSE concat('https://example.com/p/', CAST(doc_id % 50 AS VARCHAR), '/')
         END AS url
  FROM documents
"""

_UC_SQL = f"""
WITH raw AS ({_UC_RAW_SQL}),
canon AS (
  SELECT doc_id, url, {_uc_canon_sql('url')} AS curl FROM raw
)
SELECT regexp_extract(curl, 'https?://([^/]+)', 1) AS host,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_distinct_raw,
       CAST(COUNT(DISTINCT curl) AS BIGINT) AS n_canonical,
       round(CAST(COUNT(DISTINCT url) AS DOUBLE) / COUNT(DISTINCT curl), 6)
         AS variant_factor
FROM canon GROUP BY 1
"""


@register("url_canonicalize_dedup", _UC_SQL)
def q_url_canonicalize_dedup(spark, sf_dir):
    """Frontier URL canonicalization audit: deterministic messy
    variants (case, www, :443, tracking query, fragment, trailing
    slash — one per doc, keyed on doc_id) collapse to their canonical
    form; per host, raw-vs-canonical distinct counts and the variant
    factor the canonicalizer removes.  A crawl frontier without this
    step refetches every page up to `variant_factor` times.

    The canonicalizer is pure regexp/lower/substring expressions —
    identical semantics on both engines, no UDF, fully pushed into the
    scan stage.

    Scale plan: canonicalization is map-side; the only shuffle carries
    (host, url) pairs for the distinct counts — at the frontier's
    scale the distinct pair becomes a bottom-k/HLL sketch with the
    same dataflow."""
    docs = load_table(spark, sf_dir, "documents")
    b = (F.col("doc_id") % 50).cast("string")
    raw = docs.select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 4) == 0,
            F.concat(F.lit("https://Example.COM/p/"), b),
        )
        .when(
            (F.col("doc_id") % 4) == 1,
            F.concat(F.lit("https://www.example.com:443/p/"), b, F.lit("?utm_source=x")),
        )
        .when(
            (F.col("doc_id") % 4) == 2,
            F.concat(F.lit("https://EXAMPLE.com/p/"), b, F.lit("#frag")),
        )
        .otherwise(F.concat(F.lit("https://example.com/p/"), b, F.lit("/")))
        .alias("url"),
    )
    staged = raw.select(
        "doc_id",
        "url",
        F.regexp_replace(
            F.regexp_replace(F.col("url"), "#.*$", ""), "\\?.*$", ""
        ).alias("nofrag"),
    ).withColumn("pre", F.regexp_extract("nofrag", "^(https?://[^/]+)", 1))
    canon_pre = F.regexp_replace(
        F.regexp_replace(F.lower(F.col("pre")), ":(443|80)$", ""),
        "://www\\.",
        "://",
    )
    rest = F.expr("substring(nofrag, length(pre) + 1)")
    curl = F.regexp_replace(F.concat(canon_pre, rest), "/$", "")
    canon = staged.select("doc_id", "url", curl.alias("curl"))
    return canon.groupBy(
        F.regexp_extract("curl", "https?://([^/]+)", 1).alias("host")
    ).agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("url").cast("bigint").alias("n_distinct_raw"),
        F.countDistinct("curl").cast("bigint").alias("n_canonical"),
        F.round(
            F.countDistinct("url").cast("double") / F.countDistinct("curl"), 6
        ).alias("variant_factor"),
    )


# ---------------------------------------------------------------------------
# Per-source document cap: bound any one source's share of the corpus
# by keeping its hash-top-K documents — the anti-monoculture control
# beside temperature mixing (a single crawled domain must not swamp
# the mixture no matter how big its dump is).
# ---------------------------------------------------------------------------

_CAP_K = 300

_CAP_SQL = f"""
WITH ranked AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {portable_hash64_sql('doc_id', seed='cap:')} ASC, doc_id ASC
         ) AS rk
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN rk <= {_CAP_K} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(COUNT(*) - SUM(CASE WHEN rk <= {_CAP_K} THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM ranked GROUP BY source
"""


@register("per_source_capped_sample", _CAP_SQL)
def q_per_source_capped_sample(spark, sf_dir):
    """Per-source cap accounting: each source keeps its hash-smallest
    {K} documents (a uniform, deterministic, append-stable choice —
    the bottom-k rule applied per group), everything beyond the cap is
    dropped.  Sources under the cap keep everything; dominant sources
    are clipped — the hard ceiling that complements proportional
    temperature mixing.

    Scale plan: the rank window partitions by source (parallel across
    sources; for a pathological mega-source the per-group bottom-K is
    computed with the mergeable bottom-k aggregate instead of a full
    sort — same result by construction).  Output is dim-sized."""
    from ..functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        portable_hash64("doc_id", seed="cap:").asc(), F.col("doc_id").asc()
    )
    ranked = docs.select("source", "doc_id", F.row_number().over(w).alias("rk"))
    kept = F.when(F.col("rk") <= _CAP_K, 1).otherwise(0)
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(kept).cast("bigint").alias("n_kept"),
        (F.count(F.lit(1)) - F.sum(kept)).cast("bigint").alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# Weighted median document length per source: the token-weighted
# center of mass (an unweighted median over-represents short docs;
# budgets are spent in tokens, not documents).
# ---------------------------------------------------------------------------

_WMED_SQL = """
WITH w AS (
  SELECT source, doc_id, n_chars AS v, n_chars AS wt FROM documents
),
cum AS (
  SELECT source, v, wt,
         SUM(wt) OVER (PARTITION BY source ORDER BY v, doc_id
                       ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(wt) OVER (PARTITION BY source) AS tw
  FROM w
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(ANY_VALUE(tw) AS BIGINT) AS total_weight,
       CAST(MIN(CASE WHEN 2 * cw >= tw THEN v END) AS BIGINT) AS weighted_median
FROM cum GROUP BY source
"""


@register("weighted_median_length_by_source", _WMED_SQL)
def q_weighted_median_length_by_source(spark, sf_dir):
    """Per source, the length value at which half the source's TOKEN
    mass sits below (weight = n_chars): the lower weighted median —
    first value whose cumulative weight reaches half the total, on the
    (value, doc_id) total order.  Compare with `quantile_norm_report`'s
    unweighted p50 to see how much short-doc count inflation hides.

    Exactness: weights are integers, the cumulative sums exact, the
    pick a pure comparison — no interpolation, no floats.

    Scale plan: one window pass per source partition over the doc
    relation, then a per-source aggregate; the 100 TB form computes
    the same pick from a per-source weighted KLL sketch."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "source", "doc_id", F.col("n_chars").alias("v"), F.col("n_chars").alias("wt")
    )
    win = Window.partitionBy("source").orderBy("v", "doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    win_all = Window.partitionBy("source")
    cum = w.select(
        "source",
        "v",
        F.sum("wt").over(win).alias("cw"),
        F.sum("wt").over(win_all).alias("tw"),
    )
    return cum.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.first("tw").cast("long").alias("total_weight"),
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("v")))
        .cast("long")
        .alias("weighted_median"),
    )


# ---------------------------------------------------------------------------
# 1-D Wasserstein (earth-mover) drift distance between per-source
# document-length distributions — the TRANSPORT member of the drift
# family: KS reports the worst vertical gap, PSI a binned divergence,
# W1 the average horizontal work to morph one distribution into the
# other, in the metric's own units (characters).  In 1-D, W1 between
# equal-size samples is exactly the mean absolute difference of
# aligned order statistics — no LP needed.
# ---------------------------------------------------------------------------

_W1_REF = "src0"

_W1_SQL = f"""
WITH ranked AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS rk
  FROM documents
),
a AS (SELECT rk, n_chars AS va FROM ranked WHERE source = '{_W1_REF}'),
b AS (SELECT source AS cmp, rk, n_chars AS vb FROM ranked WHERE source <> '{_W1_REF}')
SELECT cmp AS source,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(CAST(SUM(abs(vb - va)) AS DOUBLE) / COUNT(*), 6) AS w1_chars,
       round(CAST(SUM(vb - va) AS DOUBLE) / COUNT(*), 6) AS mean_shift
FROM b JOIN a USING (rk)
GROUP BY cmp
"""


@register("wasserstein_length_drift", _W1_SQL)
def q_wasserstein_length_drift(spark, sf_dir):
    """Per-source W1 distance between the document-length distribution
    and the '{_W1_REF}' reference: align order statistics by rank and
    average |Δ| — plus the signed mean shift, which separates "longer
    on average" from "differently shaped".  All sources carry equal doc
    counts on the fixture, making the rank alignment exact; for
    unequal sizes the same query runs on an interpolated quantile grid
    (ntile both sides first).

    Scale plan: one rank window partitioned BY SOURCE (parallel across
    sources, never global), then an equi-join on (rank) against the
    broadcast-sized reference column and a per-source aggregate —
    integer math until the final divisions."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "source", "n_chars", F.row_number().over(w).alias("rk")
    )
    a = ranked.filter(F.col("source") == _W1_REF).select(
        "rk", F.col("n_chars").alias("va")
    )
    b = ranked.filter(F.col("source") != _W1_REF).select(
        F.col("source").alias("cmp"), "rk", F.col("n_chars").alias("vb")
    )
    return (
        b.join(F.broadcast(a), "rk")
        .groupBy(F.col("cmp").alias("source"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                F.sum(F.abs(F.col("vb") - F.col("va"))).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("w1_chars"),
            F.round(
                F.sum(F.col("vb") - F.col("va")).cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_shift"),
        )
    )


# ---------------------------------------------------------------------------
# Dataset card — the per-source governance sheet an LLM-data release
# ships with (Gebru et al., "Datasheets for Datasets"): volume,
# language mix, exact-duplicate exposure, token statistics and
# type-token ratio, each column a one-aggregate composition of
# operators certified elsewhere in the registry.
# ---------------------------------------------------------------------------

_CARD_SQL = """
WITH base AS (
  SELECT source, lang, doc_id, n_chars, md5(text) AS fp,
         len(list_filter(regexp_split_to_array(trim(lower(text)), '[^0-9a-z]+'),
                         t -> t <> '')) AS n_toks
  FROM documents
),
fpc AS (SELECT fp, COUNT(*) AS nfp FROM base GROUP BY fp),
words AS (
  SELECT source, tok FROM (
    SELECT source,
           UNNEST(regexp_split_to_array(trim(lower(text)), '[^0-9a-z]+')) AS tok
    FROM documents
  ) WHERE tok <> ''
),
wstats AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_types
  FROM words GROUP BY source
),
langtop AS (
  SELECT source, lang AS top_lang, cnt AS top_lang_n FROM (
    SELECT source, lang, COUNT(*) AS cnt,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY COUNT(*) DESC, lang ASC) AS rn
    FROM base GROUP BY source, lang
  ) WHERE rn = 1
),
agg AS (
  SELECT b.source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(b.n_chars) AS BIGINT) AS total_chars,
         CAST(COUNT(DISTINCT b.lang) AS BIGINT) AS n_langs,
         CAST(SUM(CASE WHEN f.nfp > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
         CAST(SUM(b.n_toks) AS BIGINT) AS n_tokens
  FROM base b JOIN fpc f ON b.fp = f.fp
  GROUP BY b.source
)
SELECT a.source, a.n_docs, a.total_chars, a.n_langs,
       l.top_lang,
       round(CAST(l.top_lang_n AS DOUBLE) / a.n_docs, 6) AS top_lang_share,
       a.n_dup_docs,
       round(CAST(a.n_tokens AS DOUBLE) / a.n_docs, 6) AS mean_tokens,
       round(CAST(w.n_types AS DOUBLE) / w.n_words, 6) AS type_token_ratio
FROM agg a
JOIN langtop l ON l.source = a.source
JOIN wstats w ON w.source = a.source
"""


@register("dataset_card_report", _CARD_SQL)
def q_dataset_card_report(spark, sf_dir):
    """Per-source dataset card: document and character volume, language
    count and dominant language share, documents exposed to an exact
    duplicate ANYWHERE in the corpus (cross-source — the release-risk
    number, not the within-source one), mean tokens per doc, and the
    type-token ratio (lexical diversity).  One governance row per
    source, every column a certified-operator composition.

    Scale plan: two corpus scans (doc-level stats + the word stream),
    each feeding map-side-combined aggregates keyed by source; the
    duplicate exposure joins the doc relation to the fingerprint-count
    relation on the 16-byte hash (shuffle on fp, never text); the
    lang argmax is a per-source window over the |sources × langs|
    relation."""
    docs = load_table(spark, sf_dir, "documents")
    toks_arr = F.expr(
        "filter(split(trim(lower(text)), '[^0-9a-z]+'), t -> t <> '')"
    )
    base = docs.select(
        "source",
        "lang",
        "doc_id",
        "n_chars",
        F.md5("text").alias("fp"),
        F.size(toks_arr).alias("n_toks"),
    ).localCheckpoint(eager=False)  # feeds fp counts, lang argmax, volume agg
    fpc = base.groupBy("fp").agg(F.count(F.lit(1)).alias("nfp"))
    words = (
        docs.select(
            "source",
            F.explode(F.split(F.trim(F.lower("text")), "[^0-9a-z]+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    wstats = words.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.countDistinct("tok").cast("long").alias("n_types"),
    )
    from pyspark.sql import Window

    lc = base.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("cnt"))
    wl = Window.partitionBy("source").orderBy(F.desc("cnt"), F.asc("lang"))
    langtop = (
        lc.select("source", "lang", "cnt", F.row_number().over(wl).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"), F.col("cnt").alias("top_lang_n"))
    )
    agg = (
        base.join(fpc, "fp")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.sum(F.when(F.col("nfp") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
    )
    return (
        agg.join(F.broadcast(langtop), "source")
        .join(F.broadcast(wstats), "source")
        .select(
            "source",
            "n_docs",
            "total_chars",
            "n_langs",
            "top_lang",
            F.round(F.col("top_lang_n").cast("double") / F.col("n_docs"), 6).alias(
                "top_lang_share"
            ),
            "n_dup_docs",
            F.round(F.col("n_tokens").cast("double") / F.col("n_docs"), 6).alias(
                "mean_tokens"
            ),
            F.round(F.col("n_types").cast("double") / F.col("n_words"), 6).alias(
                "type_token_ratio"
            ),
        )
    )
