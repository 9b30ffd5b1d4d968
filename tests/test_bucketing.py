"""Bucketed tables must make co-located joins and aggregations
shuffle-free: the exchange is paid once at write time, and the physical
plan of a bucket-key join between two same-bucketed tables contains no
Exchange on either input."""

import pytest
from pyspark.sql import functions as F

from myserver_datawarehouse_spark.operators.merge import write_bucketed


# Module scope: the two bucketed-table writes (~4s) are read-only for
# every test here, so pay the write once.
@pytest.fixture(scope="module")
def bucketed_pair(spark):
    a = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("va")
    )
    b = spark.range(0, 10_000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 31).alias("vb")
    )
    write_bucketed(a, "t_bucket_a", ["k"], 8, sort_keys=["k"])
    write_bucketed(b, "t_bucket_b", ["k"], 8, sort_keys=["k"])
    yield spark.table("t_bucket_a"), spark.table("t_bucket_b")
    spark.sql("DROP TABLE IF EXISTS t_bucket_a")
    spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    # Force the join path that would otherwise shuffle both sides.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ta.join(tb, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 5_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    ta, _ = bucketed_pair
    agg = ta.groupBy("k").agg(F.sum("va").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == 10_000


def test_bucketed_join_matches_unbucketed(spark, bucketed_pair):
    ta, tb = bucketed_pair
    plain = (
        ta.join(tb, "k")
        .groupBy()
        .agg(F.sum(F.col("va") + F.col("vb")).alias("s"))
        .first()
        .s
    )
    a = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("va")
    )
    b = spark.range(0, 10_000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 31).alias("vb")
    )
    ref = (
        a.join(b, "k")
        .groupBy()
        .agg(F.sum(F.col("va") + F.col("vb")).alias("s"))
        .first()
        .s
    )
    assert plain == ref
