"""Independent verification for the training-prep + graph additions:
invariants the oracle comparison can't see (the oracle runs the SAME
algorithm in SQL — these tests check against brute force / first
principles instead)."""

from __future__ import annotations


import duckdb

from network_ids_using_pyspark_spark.queries import REGISTRY

from .conftest import SF_DIR


def test_triangle_count_matches_brute_force(spark):
    """Degree-ordered orientation vs a plain set-intersection count
    over the same co-purchase edge list."""
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
    brute = 0
    for u, v in edges:
        brute += len(adj[u] & adj[v])
    brute //= 3  # each triangle counted once per edge
    wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())

    row = REGISTRY["triangle_count_copurchase"][0](spark, SF_DIR).collect()[0]
    assert row["n_triangles"] == brute
    assert row["n_wedges"] == wedges
    assert abs(row["clustering_coeff"] - (3.0 * brute / wedges)) < 1e-12


def test_token_budget_sums_exactly(spark):
    """Largest-remainder apportionment: quotas must sum to the budget
    EXACTLY and each quota must be within 1 of the proportional ideal."""
    rows = REGISTRY["token_budget_allocation"][0](spark, SF_DIR).collect()
    budget = 100_000
    assert sum(r["token_quota"] for r in rows) == budget
    total = sum(r["src_chars"] for r in rows)
    for r in rows:
        ideal = budget * r["src_chars"] / total
        assert abs(r["token_quota"] - ideal) < 1.0


def test_mixture_weights_recover_uniform(spark):
    """Applying the computed weights must equalize the mixture: each
    source's weighted char mass equals total/n_sources."""
    rows = REGISTRY["domain_mixture_weights"][0](spark, SF_DIR).collect()
    total = sum(r["src_chars"] for r in rows)
    n = len(rows)
    for r in rows:
        assert abs(r["mix_weight"] * r["src_chars"] - total / n) < 1e-6 * total
    assert abs(sum(r["actual_share"] for r in rows) - 1.0) < 1e-12


def test_epoch_orders_are_decorrelated(spark):
    """The two epochs must be DIFFERENT permutations (salting works)
    and each must be collision-free on order_key."""
    rows = REGISTRY["epoch_shuffle_order"][0](spark, SF_DIR).collect()
    by_epoch: dict[int, list] = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], []).append((r["order_key"], r["doc_id"]))
    assert set(by_epoch) == {0, 1}
    orders = {}
    for ep, lst in by_epoch.items():
        keys = [k for k, _ in lst]
        assert len(set(keys)) == len(keys)  # 60-bit keys: no collisions
        orders[ep] = [d for _, d in sorted(lst)]
    assert orders[0] != orders[1]
    assert sorted(orders[0]) == sorted(orders[1])  # same doc set


def test_pseudonymization_is_stable_and_opaque(spark):
    """Same user -> same pseudonym (referential integrity); no raw id
    appears in the output schema or values."""
    df = REGISTRY["pseudonymize_user_activity"][0](spark, SF_DIR)
    assert "user_id" not in df.columns
    rows = df.collect()
    assert len({r["pseudo_id"] for r in rows}) == len(rows)
    assert all(len(r["pseudo_id"]) == 32 for r in rows)  # md5 hex, not an id


def test_dsir_weights_favor_target_language(spark):
    """The importance weights must actually discriminate: docs in the
    target language (en) should average a higher target/general
    likelihood ratio than docs in any other language."""
    df = REGISTRY["dsir_importance_weights"][0](spark, SF_DIR)
    langs = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    by_lang: dict[str, list[float]] = {}
    for r in df.collect():
        by_lang.setdefault(langs[r["doc_id"]], []).append(r["mean_log2_weight"])
    means = {lg: sum(v) / len(v) for lg, v in by_lang.items()}
    for lg, m in means.items():
        if lg != "en":
            assert means["en"] > m, (lg, means)


def test_fpgrowth_pairs_match_brute_force(spark):
    """FP-Growth's size-2 itemsets must carry the same support counts a
    direct pair count produces (FP-tree vs brute force)."""
    con = duckdb.connect()
    brute = dict(
        ((u, v), c)
        for u, v, c in con.execute(
            f"""
            SELECT a.l_partkey, b.l_partkey, COUNT(DISTINCT a.l_orderkey) AS c
            FROM read_parquet('{SF_DIR}/lineitem.parquet') a
            JOIN read_parquet('{SF_DIR}/lineitem.parquet') b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING COUNT(DISTINCT a.l_orderkey) >= 2
            """
        ).fetchall()
    )
    rows = REGISTRY["mllib_fpgrowth_itemsets"][0](spark, SF_DIR).collect()
    assert rows, "fpgrowth returned nothing"
    # r8: `items` is a comma-joined scalar string (the driver's
    # rows-only canonicalizer can't hash array columns) — split it
    # back into the itemset for the brute-force comparison
    itemsets = [([int(x) for x in r["items"].split(",")], r["freq"]) for r in rows]
    for items, freq in itemsets:
        if len(items) == 2:
            key = (min(items), max(items))
            assert brute.get(key) == freq, (key, freq, brute.get(key))
    # and the top brute-force pair must itself appear with its count
    top_pair, top_c = max(brute.items(), key=lambda kv: (kv[1], kv[0]))
    mined = {(min(i), max(i)): f for i, f in itemsets if len(i) == 2}
    assert mined, "no size-2 itemsets mined"
    assert mined.get(top_pair) == top_c


def test_als_factors_and_fit(spark):
    """ALS must produce full factor matrices and a sane implicit-\
preference fit (predictions near 1 for held-out purchases)."""
    rows = {
        r["metric"]: r["value"]
        for r in REGISTRY["ml_train_als_implicit"][0](spark, SF_DIR).collect()
    }
    assert rows["rank"] == 8.0
    assert rows["n_user_factors"] > 0 and rows["n_item_factors"] > 0
    # implicit preference for actually-purchased pairs should beat the
    # all-zero predictor (rmse vs 1.0 would be 1.0)
    assert rows["rmse_vs_purchased"] < 0.95


def test_linreg_recovers_known_coefficients(spark):
    """The target is synthesized with known coefficients + bounded
    hash-noise: the solver must recover them and fit R² >= 0.99."""
    rows = {
        r["metric"]: r["value"]
        for r in REGISTRY["ml_train_linreg"][0](spark, SF_DIR).collect()
    }
    assert rows["r2"] >= 0.99, rows
    assert abs(rows["coef_qty"] - 3.0) < 0.3, rows
    assert abs(rows["coef_ep"] - 0.5) < 0.01, rows
    assert abs(rows["coef_disc"] - (-20.0)) < 15.0, rows  # tiny-range regressor
    assert abs(rows["coef_tax"] - 100.0) < 60.0, rows     # ditto
    assert rows["rmse"] < 12.0  # noise std ~= 5.8
