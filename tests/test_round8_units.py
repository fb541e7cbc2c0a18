"""Round-8 unit tests: the PII release-gate additions to the shared
scrub family (operators/textops.py) — the SSN pattern, scrub-order
safety, and the residual-zero property `pii_scan_report` gates on."""

from __future__ import annotations

from pyspark.sql import functions as F

from network_ids_using_pyspark_spark.operators.textops import (
    PII_PATTERNS,
    PII_SCRUB_ORDER,
    pii_counts,
    scrub_pii,
)


def test_pii_counts_and_scrub_with_ssn(spark):
    rows = [
        (1, "reach me at jane.doe+spam@mail.example.org thanks"),
        (2, "call 555-867-5309 or 555-123-4567 after 5pm"),
        (3, "ssn on file: 078-05-1120"),
        (4, "server at 192.168.0.1 and 10.0.255.7 responded"),
        (5, "nothing sensitive here, just words and 12345 numbers"),
        # ssn and the loose phone pattern are disjoint: an SSN must not
        # count as a phone, a phone must not count as an SSN
        (6, "x 555-867-5309 y 078-05-1120 z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counts = pii_counts("text")
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            scrub_pii("text").alias("scrubbed"),
            *[counts[f"n_{k}"].alias(f"n_{k}") for k in PII_SCRUB_ORDER],
        ).collect()
    }

    assert (got[1]["n_email"], got[1]["n_phone"], got[1]["n_ssn"], got[1]["n_ip"]) == (
        1, 0, 0, 0,
    )
    assert got[2]["n_phone"] == 2 and got[2]["n_ssn"] == 0
    assert got[3]["n_ssn"] == 1 and got[3]["n_phone"] == 0
    assert got[4]["n_ip"] == 2
    assert got[5]["n_email"] + got[5]["n_phone"] + got[5]["n_ssn"] + got[5]["n_ip"] == 0
    assert got[6]["n_phone"] == 1 and got[6]["n_ssn"] == 1

    assert got[1]["scrubbed"] == "reach me at <EMAIL> thanks"
    assert got[2]["scrubbed"] == "call <PHONE> or <PHONE> after 5pm"
    assert got[3]["scrubbed"] == "ssn on file: <SSN>"
    assert got[6]["scrubbed"] == "x <PHONE> y <SSN> z"
    assert got[5]["scrubbed"] == rows[4][1]  # untouched

    # the release-gate property: scrubbed text has ZERO residual matches
    # for every kind (tags contain no digits/@/dots, so no re-matching)
    red = df.select(scrub_pii("text").alias("text"))
    rc = pii_counts("text")
    resid = red.select(
        sum(
            (F.coalesce(rc[f"n_{k}"], F.lit(0)) for k in PII_SCRUB_ORDER),
            F.lit(0),
        ).alias("r")
    ).agg(F.sum("r").alias("total")).collect()[0]["total"]
    assert resid == 0


def test_pii_patterns_are_re2_safe():
    """The oracle side runs the SAME pattern strings under RE2 (DuckDB):
    no backreferences or lookaround may ever sneak in."""
    import duckdb

    con = duckdb.connect()
    for pat, _repl in PII_PATTERNS.values():
        assert "(?=" not in pat and "(?!" not in pat and "\\1" not in pat
        # RE2 must accept the pattern verbatim
        con.execute(f"SELECT regexp_extract_all('probe', '{pat}')").fetchall()
