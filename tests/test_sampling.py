"""Sampling/split invariants (SURVEY.md §5.2 #4/#5): determinism under
reruns, sample ∪ complement = identity, and hypothesis property tests
for the cleaning operators."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from network_ids_using_pyspark_spark.operators.cleaning import (
    impute_median_exact,
    replace_inf,
)
from network_ids_using_pyspark_spark.operators.sampling import (
    anti_join_split,
    hash_sample,
    random_split,
    stratified_sample,
)
from network_ids_using_pyspark_spark.sources.tables import load_table

from .conftest import SF_DIR


def test_stratified_sample_deterministic(spark):
    ev = load_table(spark, SF_DIR, "events")
    fr = {"click": 0.2, "view": 0.3}
    a = {r[0] for r in stratified_sample(ev, "event_type", fr, seed=7).select("event_id").collect()}
    b = {r[0] for r in stratified_sample(ev, "event_type", fr, seed=7).select("event_id").collect()}
    assert a == b and len(a) > 0
    c = {r[0] for r in stratified_sample(ev, "event_type", fr, seed=8).select("event_id").collect()}
    assert a != c  # different seed, different membership


def test_random_split_seeded_and_partitioning(spark):
    o = load_table(spark, SF_DIR, "orders")
    t1, v1 = random_split(o, [0.8, 0.2], seed=42)
    t2, v2 = random_split(o, [0.8, 0.2], seed=42)
    assert t1.count() == t2.count() and v1.count() == v2.count()
    assert t1.count() + v1.count() == o.count()


def test_hash_sample_union_anti_is_identity(spark):
    o = load_table(spark, SF_DIR, "orders")
    s = hash_sample(o, "o_orderkey", 0.3, seed="x")
    rest = anti_join_split(o, s, "o_orderkey")
    assert s.count() + rest.count() == o.count()
    assert s.join(rest, "o_orderkey", "inner").count() == 0
    # membership is engine-independent & stable: re-derive, same ids
    s2 = hash_sample(o, "o_orderkey", 0.3, seed="x")
    assert s2.exceptAll(s).count() == 0


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.floats(allow_nan=False, allow_infinity=False, width=64),
            st.just(float("inf")),
            st.just(float("-inf")),
            st.just(float("nan")),
            st.none(),
        ),
        min_size=1,
        max_size=24,
    )
)
def test_replace_inf_properties(spark, xs):
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i int, v double")
    once = replace_inf(df, ["v"], 4e6)
    twice = replace_inf(once, ["v"], 4e6)
    got_once = {r["i"]: r["v"] for r in once.collect()}
    got_twice = {r["i"]: r["v"] for r in twice.collect()}

    def canon(d):
        return {k: ("nan" if isinstance(v, float) and math.isnan(v) else v) for k, v in d.items()}

    assert canon(got_once) == canon(got_twice)  # idempotent
    for i, x in enumerate(xs):
        if x is None:
            assert got_once[i] is None  # null passes through
        elif math.isinf(x):
            assert got_once[i] == 4e6
        elif math.isnan(x):
            assert math.isnan(got_once[i])  # NaN untouched by replace_inf
        else:
            assert got_once[i] == x  # finite values bit-preserved


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.floats(
                allow_nan=False, allow_infinity=False, width=64, min_value=-1e12, max_value=1e12
            ),
            st.none(),
        ),
        min_size=2,
        max_size=24,
    ).filter(lambda xs: any(x is not None for x in xs))
)
def test_impute_median_invariants(spark, xs):
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i int, v double")
    out = impute_median_exact(df, ["v"])
    got = {r["i"]: r["v"] for r in out.collect()}
    assert all(v is not None for v in got.values())  # no nulls remain
    finite = sorted(x for x in xs if x is not None)
    n = len(finite)
    # Mirror Spark's even-count interpolation EXACTLY: F.median computes
    # lower/2 + upper/2 (ulp-verified against 35 adversarial pairs incl.
    # random bit-pattern doubles, r9).  It differs from (lower+upper)/2
    # in the subnormal range (Hypothesis r7: [2.225e-311, None, 5e-324])
    # and from lower + (upper-lower)/2 on e.g. [1/3, None, 1.0]
    # (Hypothesis r9) — each of those two formulas coincides on one of
    # the counterexamples, which is how r7 documented the wrong one.
    # DuckDB's DOUBLE median uses the same lower/2 + upper/2 form, so
    # oracle parity is principled.  Semantics documented at
    # operators/cleaning.py::impute_median_exact.
    if n % 2 == 1:
        med = finite[n // 2]
    else:
        lo, hi = finite[n // 2 - 1], finite[n // 2]
        med = lo / 2 + hi / 2
    for i, x in enumerate(xs):
        if x is None:
            assert got[i] == med
        else:
            assert got[i] == x  # non-null values bit-preserved
