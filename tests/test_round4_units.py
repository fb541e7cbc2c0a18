"""Round-4 fix verification: independent (non-oracle) checks for the
advisor-flagged defects.  The DuckDB oracle mirrors each query's
algorithm, so a shared bug passes the parity gate — these tests
recompute the statistic from first principles in plain Python."""

from __future__ import annotations

import math

import duckdb

from network_ids_using_pyspark_spark.queries import REGISTRY

from .conftest import SF_DIR


def _entropy(counts: list[int]) -> float:
    n = sum(counts)
    return math.log(n) - sum(c * math.log(c) for c in counts if c > 0) / n


def test_mutual_information_entropies_match_python(spark):
    """h_x / h_y against an independent plain-Python entropy over the
    same contingency tables (the advisor-flagged swapped-flag bug made
    h_x sum n_x·ln(n_x) once per distinct *y*)."""
    con = duckdb.connect()
    pairs = {
        "events.type_x_hourband": (
            "events",
            "event_type",
            "CAST(EXTRACT(hour FROM ts) // 6 AS BIGINT)",
        ),
        "orders.priority_x_status": (
            "orders",
            "o_orderpriority",
            "o_orderstatus",
        ),
        "events.type_x_valueband": (
            "events",
            "event_type",
            "LEAST(CAST(floor(value / 100) AS BIGINT), 9)",
        ),
    }
    rows = REGISTRY["mutual_information_report"][0](spark, SF_DIR).collect()
    assert len(rows) == len(pairs)
    for r in rows:
        tbl, x, y = pairs[r["pair"]]
        src = f"read_parquet('{SF_DIR}/{tbl}.parquet')"
        joint = con.execute(
            f"SELECT {x}, {y}, COUNT(*) FROM {src} GROUP BY 1, 2"
        ).fetchall()
        nx: dict = {}
        ny: dict = {}
        for xv, yv, c in joint:
            nx[xv] = nx.get(xv, 0) + c
            ny[yv] = ny.get(yv, 0) + c
        n = sum(nx.values())
        h_x = _entropy(list(nx.values()))
        h_y = _entropy(list(ny.values()))
        mi = sum(
            c * math.log(c * n / (nx[xv] * ny[yv])) for xv, yv, c in joint
        ) / n
        # 1e-9 log quantization + 1e-6 output rounding → 1e-5 bound
        assert abs(r["h_x"] - h_x) < 1e-5, (r["pair"], r["h_x"], h_x)
        assert abs(r["h_y"] - h_y) < 1e-5, (r["pair"], r["h_y"], h_y)
        assert abs(r["mi"] - mi) < 1e-5, (r["pair"], r["mi"], mi)
        if h_x > 0 and h_y > 0:
            assert abs(r["nmi"] - r["mi"] / math.sqrt(r["h_x"] * r["h_y"])) < 1e-5


def test_learned_binning_assigns_every_serve_row_once(spark):
    """Half-open bins: the serve-period row count must equal the sum of
    per-bin counts EXACTLY (the flagged formulation dropped gap values
    and double-counted tie-straddled boundaries)."""
    con = duckdb.connect()
    n_serve = con.execute(
        f"""SELECT COUNT(*) FROM read_parquet('{SF_DIR}/orders.parquet')
            WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'"""
    ).fetchone()[0]
    rows = REGISTRY["learned_binning_apply"][0](spark, SF_DIR).collect()
    assert sum(r["n_apply"] for r in rows) == n_serve
    assert all(1 <= r["bin"] <= 10 for r in rows)


def test_stump_split_gains_match_python(spark):
    """Exact info gain per decile threshold against a brute-force
    Python recomputation (the flagged sparse-cum formulation lost a
    label's cumulative count in buckets where it had zero rows)."""
    con = duckdb.connect()
    data = con.execute(
        f"""SELECT event_type, value, event_id
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchall()
    data.sort(key=lambda r: (r[1], r[2]))
    n = len(data)
    bins = 10
    # NTILE semantics: first (n % bins) buckets get one extra row
    base, extra = divmod(n, bins)
    gains = {}
    idx = 0
    total: dict = {}
    for lbl, _, _ in data:
        total[lbl] = total.get(lbl, 0) + 1
    h_root = _entropy(list(total.values()))
    left: dict = {}
    for k in range(1, bins):
        size = base + (1 if k <= extra else 0)
        for lbl, _, _ in data[idx : idx + size]:
            left[lbl] = left.get(lbl, 0) + 1
        idx += size
        thr = data[idx - 1][1]
        nl = sum(left.values())
        h_l = _entropy(list(left.values()))
        right = [total[x] - left.get(x, 0) for x in total]
        h_r = _entropy([c for c in right if c > 0]) if n - nl else 0.0
        gains[k] = (
            thr,
            nl,
            h_root - (nl / n) * h_l - ((n - nl) / n) * h_r,
        )
    rows = {r["k"]: r for r in REGISTRY["stump_split_gains"][0](spark, SF_DIR).collect()}
    assert set(rows) == set(gains)
    for k, (thr, nl, gain) in gains.items():
        assert rows[k]["n_left"] == nl, (k, rows[k]["n_left"], nl)
        assert abs(rows[k]["threshold"] - thr) < 1e-9
        assert abs(rows[k]["info_gain"] - gain) < 1e-5, (
            k,
            rows[k]["info_gain"],
            gain,
        )


def test_simhash_default_is_32_bits():
    """Library defaults must match the skew-safe configuration the r3
    analysis certified (16-bit banding is quadratic-adjacent on real
    bucket skew)."""
    import inspect

    from network_ids_using_pyspark_spark.operators.dedup import (
        simhash,
        simhash_near_dup_pairs,
    )

    assert inspect.signature(simhash).parameters["bits"].default == 32
    assert (
        inspect.signature(simhash_near_dup_pairs).parameters["bits"].default
        == 32
    )


def test_kcore_matches_brute_force_peel_and_converged(spark):
    """k-core vs a plain Python peel-to-fixpoint over the same edge
    list; the query's min_core_degree >= k certifies in-band that the
    fixed superstep count reached the fixpoint."""
    con = duckdb.connect()
    edges = con.execute(
        f"""
        SELECT a.l_partkey AS p1, b.l_partkey AS p2
        FROM read_parquet('{SF_DIR}/lineitem.parquet') a
        JOIN read_parquet('{SF_DIR}/lineitem.parquet') b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(DISTINCT a.l_orderkey) >= 2
        """
    ).fetchall()
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    k = 3
    alive = set(adj)
    while True:
        drop = {u for u in alive if sum(1 for v in adj[u] if v in alive) < k}
        if not drop:
            break
        alive -= drop
    n_edges = sum(1 for u, v in edges if u in alive and v in alive)

    row = REGISTRY["kcore_decomposition"][0](spark, SF_DIR).collect()[0]
    assert row["n_core_nodes"] == len(alive)
    assert row["n_core_edges"] == n_edges
    if len(alive):
        assert row["min_core_degree"] >= k  # fixpoint reached
