"""Skew-mitigation primitives: salted joins and salted distinct counts
must be result-identical to their unsalted forms on any distribution —
including a deliberately hot-keyed one."""

from pyspark.sql import functions as F

from myserver_datawarehouse_spark.operators import skew


def _skewed_df(spark):
    # 90% of rows share key 'hot'; user ids overlap across keys.
    rows = [("hot", i % 37) for i in range(900)] + [
        ("cold%d" % (i % 7), i % 11) for i in range(100)
    ]
    return spark.createDataFrame(rows, "k string, uid long")


def test_salted_distinct_count_matches_direct(spark):
    df = _skewed_df(spark)
    direct = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.countDistinct("uid").alias("n")).collect()
    }
    salted = {
        r.k: r.n
        for r in skew.salted_distinct_count(
            df, ["k"], "uid", n_salts=8, alias="n"
        ).collect()
    }
    assert salted == direct
    assert direct["hot"] == 37


def test_salted_join_matches_plain_join(spark):
    df = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", 1), ("cold0", 2), ("cold1", 3)], "k string, tag long"
    )
    plain = sorted(
        tuple(r) for r in df.join(dim, "k").select("k", "uid", "tag").collect()
    )
    salted = sorted(
        tuple(r)
        for r in skew.salted_join(df, dim, ["k"], n_salts=4, entropy=["uid"])
        .select("k", "uid", "tag")
        .collect()
    )
    assert salted == plain
    assert len(plain) == 900 + (100 // 7 + 1) * 2  # hot + cold0 + cold1 rows


def test_salt_is_deterministic(spark):
    df = _skewed_df(spark)
    a = skew.add_salt(df, 8, ["uid"]).select("k", "uid", "_salt").collect()
    b = skew.add_salt(df, 8, ["uid"]).select("k", "uid", "_salt").collect()
    assert a == b
    assert all(0 <= r._salt < 8 for r in a)
