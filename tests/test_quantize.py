"""Invariants of the int8 embedding quantizer (operators/similarity.py).

Bound proof obligations, not example outputs: clamp range, reconstruction
error ≤ one quantization step, and exactness of the integer dot product
under reassociation (the property the oracle check of cosine_topk_int8
rests on).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from network_ids_using_pyspark_spark.operators.similarity import (
    int8_dequant_err,
    int8_quantize,
    int8_scale,
)


def _vectors():
    rng = random.Random(1234)
    cases = [
        [1e-9, -1e-9, 5e-10],               # tiny magnitudes
        [-3.5, -0.25, -1000.0],             # negative-only
        [127.0, -127.0, 1.0, 0.0],          # exact clamp edges, a zero dim
        [0.1] * 64,                         # constant vector
    ]
    for _ in range(20):
        n = rng.randint(2, 32)
        scale = 10 ** rng.randint(-6, 6)
        cases.append([rng.uniform(-1, 1) * scale for _ in range(n)])
    return cases


def test_quantize_bounds_and_error(spark):
    rows = [(i, v) for i, v in enumerate(_vectors())]
    df = spark.createDataFrame(rows, "id int, e array<double>")
    scale = int8_scale(F.col("e"))
    q = int8_quantize(F.col("e"), scale)
    out = df.select(
        "id",
        F.array_min(q).alias("qmin"),
        F.array_max(q).alias("qmax"),
        F.array_max(int8_dequant_err(F.col("e"), q, scale)).alias("max_err"),
        (F.lit(1.0) / scale).alias("step"),
    ).collect()
    for r in out:
        assert -127 <= r["qmin"] <= r["qmax"] <= 127, r
        # floor quantization: reconstruction error < one step (clamped
        # dims can reach exactly one step at the +127 edge)
        assert r["max_err"] <= r["step"] * (1 + 1e-12), r


def test_integer_dot_reassociation_exact(spark):
    # integer dot products are exact under any accumulation order:
    # sequential fold == python sum == reversed sum, bit-for-bit.
    rng = random.Random(7)
    a = [float(rng.randint(-127, 127)) for _ in range(301)]
    b = [float(rng.randint(-127, 127)) for _ in range(301)]
    from network_ids_using_pyspark_spark.operators.similarity import dot

    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    got = df.select(dot(F.col("a"), F.col("b")).alias("d")).collect()[0]["d"]
    exact = sum(x * y for x, y in zip(a, b))
    rev = sum(x * y for x, y in zip(reversed(a), reversed(b)))
    assert got == exact == rev
    assert float(got).is_integer()
    assert abs(got) < 2**53  # stays in the double-exact integer range


def test_quantized_cosine_in_range(spark):
    rows = [(i, v) for i, v in enumerate(_vectors()) if any(x != 0 for x in v)]
    df = spark.createDataFrame(rows, "id int, e array<double>")
    scale = int8_scale(F.col("e"))
    qd = F.transform(int8_quantize(F.col("e"), scale), lambda v: v.cast("double"))
    from network_ids_using_pyspark_spark.operators.similarity import cosine

    out = df.select(cosine(qd, qd).alias("self_sim")).collect()
    for r in out:
        assert math.isclose(r["self_sim"], 1.0, rel_tol=1e-9), r
