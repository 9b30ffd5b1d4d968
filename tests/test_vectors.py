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


def test_ivf_assignment_picks_max_cosine_cell(spark):
    # Corpus of axis-aligned vectors; centroids at vec_id 0 (x-axis) and
    # 37 (y-axis). A vector near the y-axis must land in cell 37 and an
    # x-ish probe must rank cell 0 first.
    from myserver_datawarehouse_spark.plans import embeddings as E

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),      # centroid: x axis
        (37, [0.0, 1.0, 0.0, 0.0]),     # centroid: y axis
        (5, [0.9, 0.1, 0.0, 0.0]),      # x-ish
        (6, [0.1, 0.9, 0.0, 0.0]),      # y-ish
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], "l") for i, v in rows],
        "vec_id long, embedding array<double>, label string",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "embeddings.parquet"))
        out = E.embedding_ann_ivf(spark, d).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r.query_id, []).append(r)
    # probe 5 (x-ish, nprobe=2 → both cells searched): nearest neighbor by
    # cosine is centroid 0 itself (cos≈0.993) ahead of y-ish 6 (cos≈0.22)
    q5 = by_query[5]
    assert q5[0].vec_id == 0 and q5[0].cell in (0, 37)
    assert {r.vec_id for r in q5} <= {0, 37, 6}


def test_near_dup_embedding_cosine_threshold(spark):
    from myserver_datawarehouse_spark.plans import embeddings as E

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.99, 0.14, 0.0, 0.0]),   # near-dup of 1 (cos≈0.990)
        (3, [0.0, 0.0, 1.0, 1.0]),     # same bucket sign pattern? bits: +,+ →
        (4, [-1.0, -1.0, -1.0, -1.0]), # negative bucket, alone
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], "l") for i, v in rows],
        "vec_id long, embedding array<double>, label string",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "embeddings.parquet"))
        pairs = {(r.vec_id, r.neighbor_id): r.cosine
                 for r in E.near_dup_embedding_cosine(spark, d).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.98
    assert all(i < j for i, j in pairs)          # canonical orientation
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_gemm_topk_matches_hof_bruteforce(spark):
    """The BLAS tier (mapInPandas gemm) and the JVM fold tier must agree
    exactly after the 6-dp output rounding on real testdata."""
    from myserver_datawarehouse_spark.plans import embeddings as E

    sf = "/root/testdata/sf0.001"
    a = E.embedding_topk_gemm(spark, sf).collect()
    b = E.embedding_topk_bruteforce(spark, sf).collect()
    assert a == b
    assert len(a) > 0


def test_gemm_bucket_topk_matches_hof(spark):
    """Per-bucket gemm tier must agree with the self-join + fold tier."""
    from myserver_datawarehouse_spark.plans import embeddings as E

    sf = "/root/testdata/sf0.001"
    a = E.embedding_ann_bucketed_gemm(spark, sf).collect()
    b = E.embedding_ann_bucketed(spark, sf).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) > 0


def test_gemm_bucket_pairs_matches_hof(spark):
    """Pair-emit gemm tier must agree with the join-form near-dup query."""
    from myserver_datawarehouse_spark.plans import embeddings as E

    sf = "/root/testdata/sf0.001"
    a = E.near_dup_embedding_cosine_gemm(spark, sf).collect()
    b = E.near_dup_embedding_cosine(spark, sf).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_gemm_multiprobe_matches_join_form(spark):
    """Multiprobe gemm tier must agree row-for-row with the DataFrame
    join form (same candidate set, rounding-before-ranking, and
    (cosine DESC, neighbor_id) tie-break)."""
    from myserver_datawarehouse_spark.plans import embeddings as E

    sf = "/root/testdata/sf0.001"
    a = E.embedding_ann_multiprobe(spark, sf).collect()
    b = E.embedding_ann_multiprobe_join(spark, sf).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) > 0
