"""Streaming/batch unification: the availableNow-drained streaming
queries must equal their batch equivalents on the bounded source
(SURVEY.md §2.12)."""

from pyspark.sql import functions as F

from myserver_datawarehouse_spark.sources.tables import load_table
from myserver_datawarehouse_spark.streaming import jobs as SJ

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_minute_agg_equals_batch(spark):
    stream = SJ.events_stream(spark, SF_DIR)
    got = SJ.run_available_now(
        SJ.minute_agg_query(stream), spark, "t_stream_minute"
    )
    e = load_table(spark, SF_DIR, "events").filter(F.col("value").isNotNull())
    want = (
        e.groupBy(F.date_trunc("minute", "ts").alias("minute_ts"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count("value"),
                6,
            ).alias("avg_value"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_streaming_dedup_counts_equals_batch(spark):
    stream = SJ.events_stream(spark, SF_DIR)
    got = SJ.run_available_now(
        SJ.dedup_counts_query(stream), spark, "t_stream_dedup"
    )
    e = load_table(spark, SF_DIR, "events")
    want = e.groupBy("event_type").agg(
        F.countDistinct("event_id").alias("n_unique_events")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
