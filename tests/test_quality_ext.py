"""First-principles checks for the round-5 quality/graph additions
(same discipline as test_round5_units.py: the DuckDB oracle mirrors
each query's algorithm, so these recompute from the raw parquet in
plain Python — independent of both engines)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from network_ids_using_pyspark_spark.queries import REGISTRY

from .conftest import SF_DIR

_WS = re.compile(r"\s+")


def _docs():
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    return list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


def test_gopher_quality_filter_matches_python(spark):
    stops = {"the", "be", "to", "of", "and", "that", "have", "with"}
    expect = {}
    for doc_id, text in _docs():
        if doc_id % 7 == 0:
            text += " ### ## #"
        if doc_id % 11 == 0:
            text += " wait... more... hmm..."
        w = _WS.split(text.strip())
        n = len(w)
        mean_wl = sum(len(t) for t in w) / n
        n_sym = text.count("#") + text.count("...")
        sym_r = n_sym / n
        alpha = sum(1 for t in w if re.search("[A-Za-z]", t)) / n
        n_stop = sum(1 for t in w if t in stops)
        keep = (
            50 <= n <= 100000
            and 3.0 <= mean_wl <= 10.0
            and sym_r <= 0.1
            and alpha >= 0.8
            and n_stop >= 2
        )
        expect[doc_id] = (n, mean_wl, sym_r, alpha, n_stop, keep)
    rows = REGISTRY["gopher_quality_filter"][0](spark, SF_DIR).collect()
    assert len(rows) == len(expect)
    for r in rows:
        n, mean_wl, sym_r, alpha, n_stop, keep = expect[r["doc_id"]]
        assert r["n_words"] == n
        assert abs(r["mean_word_len"] - mean_wl) < 1e-12
        assert abs(r["symbol_word_ratio"] - sym_r) < 1e-12
        assert abs(r["alpha_word_frac"] - alpha) < 1e-12
        assert r["n_stopwords"] == n_stop
        assert r["keep"] == keep
    # non-vacuity: both decisions must occur
    kept = {r["keep"] for r in rows}
    assert kept == {True, False}


def test_c4_line_filter_report_matches_python(spark):
    width = 12
    expect = {}
    for doc_id, text in _docs():
        w = _WS.split(text.strip())
        nl = math.ceil(len(w) / width)
        lines = []
        for i in range(nl):
            line = " ".join(w[i * width : (i + 1) * width])
            if (doc_id * 31 + i) % 17 == 0:
                line += " lorem ipsum"
            if (doc_id * 13 + i) % 19 == 0:
                line += " {code}"
            if (doc_id * 7 + i) % 23 == 0:
                line += " enable javascript now ok"
            if (doc_id + i) % 4 != 0:
                line += "."
            lines.append(line)
        kept = [
            l
            for l in lines
            if l.endswith(".") and len(_WS.split(l)) >= 5 and "javascript" not in l
        ]
        dropped = (
            any("lorem ipsum" in l for l in lines)
            or any("{" in l for l in lines)
            or len(kept) < 3
        )
        expect[doc_id] = (
            len(lines),
            len(kept),
            sum(len(l) for l in kept),
            dropped,
            hashlib.md5("\n".join(kept).encode()).hexdigest(),
        )
    rows = REGISTRY["c4_line_filter_report"][0](spark, SF_DIR).collect()
    assert len(rows) == len(expect)
    for r in rows:
        nl, nk, nc, dropped, md5 = expect[r["doc_id"]]
        assert (r["n_lines"], r["n_lines_kept"], r["n_chars_kept"]) == (nl, nk, nc)
        assert r["doc_dropped"] == dropped
        assert r["kept_md5"] == md5
    assert {r["doc_dropped"] for r in rows} == {True, False}


def test_hits_hub_authority_matches_python(spark):
    o = pq.read_table(f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    li = pq.read_table(f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"])
    cust_of = dict(
        zip(o.column("o_orderkey").to_pylist(), o.column("o_custkey").to_pylist())
    )
    pairs = set()
    for ok, sk in zip(
        li.column("l_orderkey").to_pylist(), li.column("l_suppkey").to_pylist()
    ):
        pairs.add((cust_of[ok], sk))
    auth1 = Counter(s for _, s in pairs)
    hub1 = defaultdict(int)
    for c, s in pairs:
        hub1[c] += auth1[s]
    auth2 = defaultdict(int)
    for c, s in pairs:
        auth2[s] += hub1[c]
    top_auth = sorted(auth2.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    top_hub = sorted(hub1.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    rows = REGISTRY["hits_hub_authority"][0](spark, SF_DIR).collect()
    got_auth = [(r["node"], r["score"]) for r in rows if r["side"] == "supplier"]
    got_hub = [(r["node"], r["score"]) for r in rows if r["side"] == "customer"]
    assert got_auth == top_auth
    assert got_hub == top_hub


def test_kn_bigram_score_matches_python(spark):
    D = 0.75
    big_by_doc = {}
    all_bigrams = []
    for doc_id, text in _docs():
        w = _WS.split(text.strip())
        if len(w) < 2:
            continue
        bgs = list(zip(w, w[1:]))
        big_by_doc[doc_id] = bgs
        all_bigrams.extend(bgs)
    cb = Counter(all_bigrams)
    n_ctx = Counter(w1 for w1, _ in all_bigrams)
    n_follow = defaultdict(set)
    n_prec = defaultdict(set)
    for w1, w2 in all_bigrams:
        n_follow[w1].add(w2)
        n_prec[w2].add(w1)
    n_types = len(cb)
    rows = {
        r["doc_id"]: r for r in REGISTRY["kn_bigram_score"][0](spark, SF_DIR).collect()
    }
    assert set(rows) == set(big_by_doc)
    for doc_id, bgs in big_by_doc.items():
        total = 0.0
        for w1, w2 in bgs:
            p = (
                max(cb[(w1, w2)] - D, 0.0)
                + D * len(n_follow[w1]) * (len(n_prec[w2]) / n_types)
            ) / n_ctx[w1]
            total += round(math.log2(p), 6)
        r = rows[doc_id]
        assert r["n_bigrams"] == len(bgs)
        assert abs(r["mean_kn_bits"] - (-total / len(bgs))) < 1e-6
        # a valid probability: mean bits must be positive (p < 1 for
        # every bigram in a corpus with >1 context)
        assert r["mean_kn_bits"] > 0


def test_propensity_ipw_ate_matches_python(spark):
    o = pq.read_table(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderdate", "o_orderstatus", "o_orderpriority", "o_totalprice"],
    )
    x1 = [d.month for d in o.column("o_orderdate").to_pylist()]
    x2 = [1 if s == "F" else 0 for s in o.column("o_orderstatus").to_pylist()]
    t = [1 if p == "1-URGENT" else 0 for p in o.column("o_orderpriority").to_pylist()]
    yo = [float(v) for v in o.column("o_totalprice").to_pylist()]
    n = len(t)
    b0 = b1 = b2 = 0.0
    for _ in range(3):
        m = [0.0] * 9  # n,s1,s2,s11,s12,s22,sy,s1y,s2y
        for a, b, y in zip(x1, x2, t):
            p = min(max(round(1.0 / (1.0 + math.exp(-(b0 + b1 * a + b2 * b))), 9), 1e-9), 1 - 1e-9)
            w, r = p * (1 - p), y - p
            m[0] += w; m[1] += w * a; m[2] += w * b
            m[3] += w * a * a; m[4] += w * a * b; m[5] += w * b * b
            m[6] += r; m[7] += r * a; m[8] += r * b
        N, s1, s2, s11, s12, s22, sy, s1y, s2y = m
        det = N * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)
        b0 += (sy * (s11 * s22 - s12 * s12) - s1y * (s1 * s22 - s12 * s2) + s2y * (s1 * s12 - s11 * s2)) / det
        b1 += (N * (s1y * s22 - s12 * s2y) - s1 * (sy * s22 - s2y * s2) + s2 * (sy * s12 - s1y * s2)) / det
        b2 += (N * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - sy * s12) + s2 * (s1 * s1y - sy * s11)) / det
    sw_t = swy_t = sw_c = swy_c = 0.0
    for a, b, y, v in zip(x1, x2, t, yo):
        p = min(max(round(1.0 / (1.0 + math.exp(-(b0 + b1 * a + b2 * b))), 9), 1e-9), 1 - 1e-9)
        if y:
            sw_t += 1.0 / p
            swy_t += v / p
        else:
            sw_c += 1.0 / (1.0 - p)
            swy_c += v / (1.0 - p)
    row = REGISTRY["propensity_ipw_ate"][0](spark, SF_DIR).collect()[0]
    assert row["n"] == n and row["n_treated"] == sum(t)
    assert abs(row["b_intercept"] - b0) < 1e-4
    assert abs(row["b_month"] - b1) < 1e-4
    assert abs(row["b_fstatus"] - b2) < 1e-4
    assert abs(row["mean_treated_ipw"] - swy_t / sw_t) < 1.0
    assert abs(row["mean_control_ipw"] - swy_c / sw_c) < 1.0
    assert abs(row["ate_ipw"] - (swy_t / sw_t - swy_c / sw_c)) < 1.0


def test_geo_grid_neighbor_pairs_matches_bruteforce(spark):
    """Brute-force all-pairs recompute (the O(n*m) form the grid join
    exists to avoid) must agree exactly with the bucketed plan."""
    from network_ids_using_pyspark_spark.queries.geo import _CELL, _R2, _WORLD

    def coord(key, seed):
        h = int(hashlib.md5(f"{seed}{key}".encode()).hexdigest()[:15], 16)
        return h % _WORLD

    c = pq.read_table(f"{SF_DIR}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    s = pq.read_table(f"{SF_DIR}/supplier.parquet", columns=["s_suppkey"])
    n = pq.read_table(f"{SF_DIR}/nation.parquet", columns=["n_nationkey", "n_name"])
    nname = dict(zip(n.column("n_nationkey").to_pylist(), n.column("n_name").to_pylist()))
    supp = [
        (k, coord(k, "geo:sx:"), coord(k, "geo:sy:"))
        for k in s.column("s_suppkey").to_pylist()
    ]
    per_nation = defaultdict(lambda: [0, set(), None])
    knn = defaultdict(list)
    for ck, nk in zip(c.column("c_custkey").to_pylist(), c.column("c_nationkey").to_pylist()):
        cx, cy = coord(ck, "geo:cx:"), coord(ck, "geo:cy:")
        for sk, sx, sy in supp:
            d2 = (cx - sx) ** 2 + (cy - sy) ** 2
            if d2 <= _R2:
                agg = per_nation[nname[nk]]
                agg[0] += 1
                agg[1].add(ck)
                agg[2] = d2 if agg[2] is None else min(agg[2], d2)
                knn[ck].append((d2, sk))
    rows = REGISTRY["geo_grid_neighbor_pairs"][0](spark, SF_DIR).collect()
    got = {r["n_name"]: (r["n_pairs"], r["n_customers_covered"], r["min_d2"]) for r in rows}
    want = {k: (v[0], len(v[1]), v[2]) for k, v in per_nation.items()}
    assert got == want
    krows = REGISTRY["geo_grid_knn_suppliers"][0](spark, SF_DIR).collect()
    got_knn = defaultdict(list)
    for r in sorted(krows, key=lambda r: (r["c_custkey"], r["rnk"])):
        got_knn[r["c_custkey"]].append((r["d2"], r["s_suppkey"]))
    want_knn = {ck: sorted(v)[:3] for ck, v in knn.items()}
    assert dict(got_knn) == want_knn


def test_aipw_matches_python(spark):
    o = pq.read_table(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderdate", "o_orderstatus", "o_orderpriority", "o_totalprice"],
    )
    x1 = [d.month for d in o.column("o_orderdate").to_pylist()]
    x2 = [1 if s == "F" else 0 for s in o.column("o_orderstatus").to_pylist()]
    t = [1 if p == "1-URGENT" else 0 for p in o.column("o_orderpriority").to_pylist()]
    yo = [float(v) for v in o.column("o_totalprice").to_pylist()]
    b0 = b1 = b2 = 0.0
    for _ in range(3):
        m = [0.0] * 9
        for a, b, y in zip(x1, x2, t):
            p = min(max(round(1.0 / (1.0 + math.exp(-(b0 + b1 * a + b2 * b))), 9), 1e-9), 1 - 1e-9)
            w, r = p * (1 - p), y - p
            m[0] += w; m[1] += w * a; m[2] += w * b
            m[3] += w * a * a; m[4] += w * a * b; m[5] += w * b * b
            m[6] += r; m[7] += r * a; m[8] += r * b
        N, s1, s2, s11, s12, s22, sy, s1y, s2y = m
        det = N * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)
        b0 += (sy * (s11 * s22 - s12 * s12) - s1y * (s1 * s22 - s12 * s2) + s2y * (s1 * s12 - s11 * s2)) / det
        b1 += (N * (s1y * s22 - s12 * s2y) - s1 * (sy * s22 - s2y * s2) + s2 * (sy * s12 - s1y * s2)) / det
        b2 += (N * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - sy * s12) + s2 * (s1 * s1y - sy * s11)) / det

    def ols(sel):
        N = s1 = s2 = s11 = s12 = s22 = sy = s1y = s2y = 0.0
        for a, b, y, keep in zip(x1, x2, yo, sel):
            if not keep:
                continue
            N += 1; s1 += a; s2 += b; s11 += a * a; s12 += a * b; s22 += b * b
            sy += y; s1y += a * y; s2y += b * y
        det = N * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)
        return (
            (sy * (s11 * s22 - s12 * s12) - s1y * (s1 * s22 - s12 * s2) + s2y * (s1 * s12 - s11 * s2)) / det,
            (N * (s1y * s22 - s12 * s2y) - s1 * (sy * s22 - s2y * s2) + s2 * (sy * s12 - s1y * s2)) / det,
            (N * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - sy * s12) + s2 * (s1 * s1y - sy * s11)) / det,
        )

    a0, a1, a2 = ols([y == 1 for y in t])
    c0, c1, c2 = ols([y == 0 for y in t])
    sdr = 0.0
    for a, b, y, v in zip(x1, x2, t, yo):
        p = min(max(round(1.0 / (1.0 + math.exp(-(b0 + b1 * a + b2 * b))), 9), 1e-9), 1 - 1e-9)
        m1 = a0 + a1 * a + a2 * b
        m0 = c0 + c1 * a + c2 * b
        sdr += (m1 - m0) + y * (v - m1) / p - (1 - y) * (v - m0) / (1.0 - p)
    row = REGISTRY["aipw_doubly_robust_ate"][0](spark, SF_DIR).collect()[0]
    assert row["n"] == len(t) and row["n_treated"] == sum(t)
    assert abs(row["mt_intercept"] - a0) < 1e-3
    assert abs(row["mc_intercept"] - c0) < 1e-3
    assert abs(row["ps_intercept"] - b0) < 1e-4
    assert abs(row["ate_aipw"] - sdr / len(t)) < 1.0


def _journeys():
    """Per-user event journeys truncated at the first purchase."""
    t = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    )
    by_user = defaultdict(list)
    for u, ts, eid, et in zip(
        t.column("user_id").to_pylist(),
        t.column("ts").to_pylist(),
        t.column("event_id").to_pylist(),
        t.column("event_type").to_pylist(),
    ):
        by_user[u].append((ts, eid, et))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        kept = []
        for _, _, et in evs:
            kept.append(et)
            if et == "purchase":
                break
        out[u] = kept
    return out


def test_shapley_attribution_matches_python(spark):
    channels = ["click", "error", "signup", "view"]
    bits = {c: 1 << i for i, c in enumerate(channels)}
    conv_by_mask = Counter()
    users_touched = Counter()
    conv_touched = Counter()
    for kept in _journeys().values():
        conv = 1 if kept[-1] == "purchase" else 0
        mask = 0
        for et in kept:
            mask |= bits.get(et, 0)
        conv_by_mask[mask] += conv
        for c, b in bits.items():
            if mask & b:
                users_touched[c] += 1
                conv_touched[c] += conv
    v = {
        s: sum(n for m, n in conv_by_mask.items() if (m & s) == m)
        for s in range(16)
    }
    w = {0: 6, 1: 2, 2: 2, 3: 6}
    tot = v[15] - v[0]
    rows = {
        r["channel"]: r
        for r in REGISTRY["shapley_channel_attribution"][0](spark, SF_DIR).collect()
    }
    assert set(rows) == set(channels)
    phi_sum = 0.0
    for c, b in bits.items():
        phi_num = sum(
            w[bin(s).count("1")] * (v[s | b] - v[s])
            for s in range(16)
            if not (s & b)
        )
        r = rows[c]
        assert r["users_touched"] == users_touched[c]
        assert r["conv_touched"] == conv_touched[c]
        assert abs(r["shapley_conversions"] - phi_num / 24.0) < 1e-6
        assert abs(r["shapley_share"] - phi_num / (24.0 * tot)) < 1e-6
        phi_sum += r["shapley_conversions"]
    # efficiency property: Shapley values sum to v(N) - v(empty)
    assert abs(phi_sum - tot) < 1e-4


def test_markov_attribution_matches_python(spark):
    from decimal import ROUND_HALF_UP, Decimal

    q9 = Decimal("0.000000001")

    def d9(x: float) -> Decimal:
        return Decimal(repr(x)).quantize(q9, rounding=ROUND_HALF_UP)

    channels = ["click", "error", "signup", "view"]
    trans = Counter()
    for kept in _journeys().values():
        prev = "start"
        for et in kept:
            dst = "conv" if et == "purchase" else et
            trans[(prev, dst)] += 1
            prev = dst
        if prev != "conv":
            trans[(prev, "null")] += 1
    src_tot = Counter()
    for (s, _), n in trans.items():
        src_tot[s] += n
    pm = {(s, d): n / src_tot[s] for (s, d), n in trans.items()}
    pm[("conv", "conv")] = 1.0
    pm[("null", "null")] = 1.0

    def absorb(mat):
        vec = {"start": 1.0}
        for _ in range(16):
            nxt = defaultdict(Decimal)
            for (s, d), p in mat.items():
                if s in vec:
                    nxt[d] += d9(vec[s] * p)
            vec = {d: float(x) for d, x in nxt.items()}
        return vec.get("conv", 0.0)

    p_base = absorb(pm)
    re = {}
    for c in channels:
        mat = defaultdict(float)
        for (s, d), p in pm.items():
            if s == c:
                continue
            mat[(s, "null" if d == c else d)] += p
        re[c] = round(1.0 - absorb(dict(mat)) / p_base, 9)
    re_sum = float(sum(d9(x) for x in re.values()))
    rows = {
        r["channel"]: r
        for r in REGISTRY["markov_attribution_removal"][0](spark, SF_DIR).collect()
    }
    assert set(rows) == set(channels)
    for c in channels:
        r = rows[c]
        assert abs(r["p_conv_base"] - p_base) < 1e-6
        assert abs(r["removal_effect"] - re[c]) < 1e-6
        assert abs(r["attribution_share"] - re[c] / re_sum) < 1e-6


def test_markov_attribution_degenerate_zero_conversions(spark, tmp_path):
    """ADVICE r10: a dataset with zero purchases makes p_base = 0, so
    the removal-effect division yields non-finite values; the in-process
    iteration must propagate them as NaN/±Inf rows (like the former
    Spark round(double) path) instead of raising
    decimal.InvalidOperation inside d9's quantize."""
    import math as _math

    import pandas as pd

    events = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:01:00",
                 "2024-01-01 00:02:00", "2024-01-01 00:03:00"]
            ),
            "user_id": [1, 1, 2, 2],
            "event_type": ["view", "click", "view", "signup"],
            "value": [1.0, 2.0, 3.0, 4.0],
            "props": ["{}", "{}", "{}", "{}"],
        }
    )
    events.to_parquet(tmp_path / "events.parquet", index=False)
    rows = (
        REGISTRY["markov_attribution_removal"][0](spark, str(tmp_path)).collect()
    )
    assert rows  # did not raise; one row per touched channel
    for r in rows:
        assert r["p_conv_base"] == 0.0
        # removal effect on a zero-conversion base is NaN (0/0) — it
        # must arrive as a value, not an exception
        assert r["removal_effect"] is None or isinstance(
            r["removal_effect"], float
        )
        if isinstance(r["removal_effect"], float):
            assert _math.isnan(r["removal_effect"]) or _math.isinf(
                r["removal_effect"]
            ) or r["removal_effect"] == 0.0
