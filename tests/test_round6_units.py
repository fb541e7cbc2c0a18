"""First-principles recomputation tests for the round-6 additions:
each query's statistic is re-derived from the raw parquet in plain
Python (no Spark, no SQL) and compared against the engine output —
the same harness style as test_round5_units.py."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_EVEN, Decimal

import duckdb

from network_ids_using_pyspark_spark.queries import REGISTRY

from .conftest import SF_DIR


def _daily_counts(table: str, ts_col: str):
    con = duckdb.connect()
    return con.execute(
        f"SELECT CAST({ts_col} AS DATE) AS d, COUNT(*) AS c "
        f"FROM read_parquet('{SF_DIR}/{table}.parquet') GROUP BY 1 ORDER BY 1"
    ).fetchall()


def test_ljung_box_matches_python(spark):
    rows = _daily_counts("events", "ts")
    cs = [float(c) for _, c in rows]
    n = len(cs)
    mean = sum(cs) / n
    den = sum(round((c - mean) ** 2, 6) for c in cs)
    body = 0.0
    for lag in range(1, 8):
        num = sum(
            round((cs[i] - mean) * (cs[i + lag] - mean), 6)
            for i in range(n - lag)
        )
        rho = round(num / den, 6)
        body += round(rho * rho / (n - lag), 12)
    q = round(n * (n + 2) * body, 6)
    got = REGISTRY["ljung_box_acf_test"][0](spark, SF_DIR).collect()[0]
    assert got["n_days"] == n
    assert abs(got["q_stat"] - q) < 1e-6, (got["q_stat"], q)
    assert got["reject_white_noise_95"] == (n * (n + 2) * body > 14.067140449340169)


def test_cohens_kappa_matches_python(spark):
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT n_chars, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    import re

    n = len(docs)
    n11 = n00 = a1 = b1 = 0
    for n_chars, text in docs:
        ra = 1 if n_chars >= 300 else 0
        # NB: regexp_split_to_array/F.split keep empty fields; mirror that
        rb = 1 if len(re.split(r"\s+", text.strip())) >= 60 else 0
        n11 += ra & rb
        n00 += (1 - ra) & (1 - rb)
        a1 += ra
        b1 += rb
    chance = a1 * b1 + (n - a1) * (n - b1)
    kappa = round((n * (n11 + n00) - chance) / (n * n - chance), 6)
    got = REGISTRY["cohens_kappa_raters"][0](spark, SF_DIR).collect()[0]
    assert got["n_docs"] == n
    assert got["n_agree"] == n11 + n00
    assert got["n_both_accept"] == n11
    assert abs(got["kappa"] - kappa) < 1e-9, (got["kappa"], kappa)
    # non-degenerate on the fixture: raters agree beyond chance but
    # not perfectly
    assert 0.0 < got["kappa"] < 1.0


def test_cusum_matches_python(spark):
    rows = _daily_counts("orders", "o_orderdate")
    ys = [float(c) for _, c in rows]
    n = len(ys)
    mean = sum(ys) / n
    sd = round(math.sqrt(sum(round((y - mean) ** 2, 6) for y in ys) / (n - 1)), 9)
    zs = [round((y - mean) / sd, 9) for y in ys]
    sp = sn = maxp = maxn = 0.0
    for z in zs:
        sp = round(max(0.0, sp + z - 0.5), 9)
        sn = round(max(0.0, sn - z - 0.5), 9)
        maxp = max(maxp, sp)
        maxn = max(maxn, sn)
    got = REGISTRY["cusum_mean_shift_daily"][0](spark, SF_DIR).collect()[0]
    assert got["n_days"] == n
    assert abs(got["max_cusum_pos"] - round(maxp, 6)) < 1e-9
    assert abs(got["max_cusum_neg"] - round(maxn, 6)) < 1e-9
    assert got["alarmed"] == (maxp > 4.0 or maxn > 4.0)


def test_rbo_matches_python(spark):
    con = duckdb.connect()
    parts = con.execute(
        f"SELECT p_partkey, p_retailprice, p_size "
        f"FROM read_parquet('{SF_DIR}/part.parquet')"
    ).fetchall()
    K = 50
    ra = {
        pk: i + 1
        for i, (pk, _, _) in enumerate(
            sorted(parts, key=lambda r: (-r[1], r[0]))[:K]
        )
    }
    rb = {
        pk: i + 1
        for i, (pk, _, _) in enumerate(
            sorted(parts, key=lambda r: (-r[2], r[0]))[:K]
        )
    }
    entry = [max(ra[pk], rb[pk]) for pk in set(ra) & set(rb)]
    q = Decimal(1).scaleb(-12)
    rbo = Decimal(0)
    for d in range(1, K + 1):
        wd = ((1 - Decimal("0.9")) * Decimal("0.9") ** (d - 1) / d).quantize(
            q, rounding=ROUND_HALF_EVEN
        )
        rbo += wd * sum(1 for e in entry if e <= d)
    got = REGISTRY["rank_biased_overlap_parts"][0](spark, SF_DIR).collect()[0]
    assert got["overlap_at_k"] == len(entry)
    assert got["rbo_at_k"] == float(rbo), (got["rbo_at_k"], float(rbo))
    # RBO is bounded by the weight mass actually available
    assert 0.0 <= got["rbo_at_k"] < 1.0


def test_t_closeness_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, EXTRACT(hour FROM ts) AS qh, value "
        f"FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    M, W = 8, 70
    from collections import Counter, defaultdict

    g = Counter()
    cls = defaultdict(Counter)
    for et, qh, v in rows:
        b = min(max(int(v // W), 0), M - 1)
        g[b] += 1
        cls[(et, int(qh))][b] += 1
    N = len(rows)
    per_type = defaultdict(list)
    for (et, qh), bands in cls.items():
        cn = sum(bands.values())
        cum = 0
        sum_abs = 0
        for b in range(M):
            cum += bands.get(b, 0) * N - g.get(b, 0) * cn
            sum_abs += abs(cum)
        per_type[et].append(round(sum_abs / (cn * N * (M - 1)), 9))
    got = {
        r["event_type"]: r
        for r in REGISTRY["t_closeness_risk"][0](spark, SF_DIR).collect()
    }
    for et, emds in per_type.items():
        assert got[et]["n_classes"] == len(emds)
        assert abs(got[et]["max_emd"] - round(max(emds), 9)) < 1e-12
        assert got[et]["n_risky_classes"] == sum(1 for e in emds if e > 0.2)
    # the EMD signal is non-trivial on the fixture even when no class
    # crosses the release gate
    assert max(max(v) for v in per_type.values()) > 0.0
