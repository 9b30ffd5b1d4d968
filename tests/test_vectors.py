"""Vector-kernel unit tests: dot/norm/cosine determinism and sign
bucketing (operators/vectors.py)."""

import math

from pyspark.sql import functions as F

from myserver_datawarehouse_spark.operators import vectors as V


def one(spark, data, expr):
    return (
        spark.createDataFrame(data, "a array<float>, b array<float>")
        .select(expr.alias("v"))
        .collect()[0]
        .v
    )


def test_dot_and_norm(spark):
    assert one(spark, [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], V.dot("a", "b")) == 32.0
    assert one(spark, [([3.0, 4.0], [0.0, 0.0])], V.norm2("a")) == 5.0


def test_cosine_identity_orthogonal_zero(spark):
    # [3,4] has an exactly-representable norm (5.0), so identity is exact
    assert one(spark, [([3.0, 4.0], [3.0, 4.0])], V.cosine("a", "b")) == 1.0
    assert one(spark, [([1.0, 0.0], [0.0, 1.0])], V.cosine("a", "b")) == 0.0
    # zero-norm guard -> NULL, not NaN
    assert one(spark, [([0.0, 0.0], [1.0, 1.0])], V.cosine("a", "b")) is None


def test_cosine_known_value(spark):
    got = one(spark, [([1.0, 1.0], [1.0, 0.0])], V.cosine("a", "b"))
    assert math.isclose(got, 1 / math.sqrt(2), rel_tol=1e-12)


def test_sign_bucket(spark):
    # signs of first 4 dims, little-endian bits: [+,-,+,-] -> 0b0101 = 5
    assert one(spark, [([1.0, -1.0, 2.0, -3.0], [0.0])], V.sign_bucket("a", 4)) == 5
    assert one(spark, [([-1.0, -1.0, -1.0, -1.0], [0.0])], V.sign_bucket("a", 4)) == 0
    # zero counts as non-negative
    assert one(spark, [([0.0, 0.0, 0.0, 0.0], [0.0])], V.sign_bucket("a", 4)) == 15
