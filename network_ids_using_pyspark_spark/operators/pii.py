"""PII detection and redaction over text columns.

A training-data pipeline must scan raw corpora for personally
identifiable information and redact it before the text reaches a
tokenizer (the compliance gate next to dedup and decontamination in
every published LLM data pipeline).  The reference has no text surface
at all (SURVEY.md §2.7: "no string functions anywhere in the
reference"), so this family is specified directly against Spark
primitives, like the rest of the north-star LLM-data operators.

Engine posture: pattern scanning is pure per-row regexp work —
built-in ``regexp_extract_all`` / ``regexp_replace`` expressions, fully
inside whole-stage codegen, no UDF, no shuffle.  At 100 TB the scan is
embarrassingly parallel and column-pruned to the text column; the only
shuffle is the final per-source rollup (map-side combined counts).

The patterns are deliberately conservative ASCII classes (no
backreferences, no lookaround) so the SAME pattern string is valid in
Java regex (Spark) and RE2 (the DuckDB oracle) with identical
semantics — that is what makes the report oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Pattern keys are stable API: reports expose one count column per key.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

REDACTION_TOKEN = "[PII]"  # contains no digits/@/dots → never re-matches


def pii_count(text: Column, kind: str) -> Column:
    """Number of matches of one PII pattern in ``text`` (0 for null)."""
    hits = F.regexp_extract_all(text, F.lit(PII_PATTERNS[kind]), F.lit(0))
    return F.coalesce(F.size(hits), F.lit(0)).cast("long")


def pii_redact(text: Column) -> Column:
    """``text`` with every PII pattern replaced by ``REDACTION_TOKEN``.

    Sequential global replaces; the replacement token can never be
    matched by a later pattern, so application order is irrelevant."""
    out = text
    for pat in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, REDACTION_TOKEN)
    return out


def pii_annotate(df: DataFrame, text_col: str) -> DataFrame:
    """Add per-kind match counts (``n_<kind>``), a redacted text column
    (``<text_col>_redacted``) and the redacted-character delta
    (``chars_redacted``) to every row.  One projection, no shuffle."""
    t = F.col(text_col)
    out = df
    for kind in PII_PATTERNS:
        out = out.withColumn(f"n_{kind}", pii_count(t, kind))
    red = pii_redact(t)
    return out.withColumn(f"{text_col}_redacted", red).withColumn(
        "chars_redacted",
        (F.coalesce(F.length(t), F.lit(0)) - F.coalesce(F.length(red), F.lit(0))).cast(
            "long"
        ),
    )
