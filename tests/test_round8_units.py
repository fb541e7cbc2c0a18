"""Round-8 unit tests: the PII scan/redaction operator family."""

from __future__ import annotations

from network_ids_using_pyspark_spark.operators.pii import (
    PII_PATTERNS,
    REDACTION_TOKEN,
    pii_annotate,
)


def test_pii_annotate_counts_and_redacts(spark):
    rows = [
        (1, "reach me at jane.doe+spam@mail.example.org thanks"),
        (2, "call 555-867-5309 or 555-123-4567 after 5pm"),
        (3, "ssn on file: 078-05-1120"),
        (4, "server at 192.168.0.1 and 10.0.255.7 responded"),
        (5, "nothing sensitive here, just words and 12345 numbers"),
        (6, None),
        # phone must NOT double-count as SSN (different group shapes)
        (7, "x 555-867-5309 y"),
        # version strings: dotted quads of digits DO match the
        # conservative ipv4 pattern (documented false-positive class)
        (8, "pip install pkg==1.2.3.4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_annotate(df, "text").collect()}

    assert (got[1]["n_email"], got[1]["n_phone"], got[1]["n_ssn"], got[1]["n_ipv4"]) == (
        1, 0, 0, 0,
    )
    assert got[2]["n_phone"] == 2 and got[2]["n_ssn"] == 0
    assert got[3]["n_ssn"] == 1 and got[3]["n_phone"] == 0
    assert got[4]["n_ipv4"] == 2
    assert got[5]["n_email"] + got[5]["n_phone"] + got[5]["n_ssn"] + got[5]["n_ipv4"] == 0
    assert got[6]["n_email"] == 0 and got[6]["text_redacted"] is None
    assert got[7]["n_phone"] == 1 and got[7]["n_ssn"] == 0
    assert got[8]["n_ipv4"] == 1

    # redaction removes every match and only the matches
    assert got[1]["text_redacted"] == f"reach me at {REDACTION_TOKEN} thanks"
    assert got[2]["text_redacted"] == (
        f"call {REDACTION_TOKEN} or {REDACTION_TOKEN} after 5pm"
    )
    assert got[5]["text_redacted"] == rows[4][1]  # untouched
    assert got[2]["chars_redacted"] == 2 * (12 - len(REDACTION_TOKEN))

    # redacted text has zero residual matches (idempotence of the gate)
    red = pii_annotate(
        pii_annotate(df, "text")
        .select("doc_id", "text_redacted")
        .withColumnRenamed("text_redacted", "text"),
        "text",
    )
    for r in red.collect():
        assert r["n_email"] + r["n_phone"] + r["n_ssn"] + r["n_ipv4"] == 0, r


def test_pii_patterns_are_re2_safe():
    """The oracle side runs the SAME pattern strings under RE2 (DuckDB):
    no backreferences or lookaround may ever sneak in."""
    for pat in PII_PATTERNS.values():
        assert "(?=" not in pat and "(?!" not in pat and "\\1" not in pat
        import duckdb

        # RE2 must accept the pattern verbatim
        duckdb.connect().execute(
            f"SELECT regexp_extract_all('probe', '{pat}')"
        ).fetchall()
