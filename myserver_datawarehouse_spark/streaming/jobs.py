"""Structured Streaming variants (SURVEY.md §2.12) of the reference's
hourly cadence: the minute-grain aggregation and the idempotent-upsert
dedup expressed as continuous queries over a file source.

The reference polls hourly with Airflow (`fact_gold_price.py:64-66` pulls
the last closed hour); Spark-first, the same computation is a streaming
query: file source -> event-time window aggregate with a watermark ->
sink. Batch is then just the bounded special case (`Trigger.AvailableNow`
drains the source and stops), which is how the registry runs these
deterministically against a DuckDB batch oracle.

Scale notes:
- The file source lists incrementally; `maxFilesPerTrigger` bounds batch
  size, and the windowed aggregate keeps per-key state bounded by the
  watermark horizon, not stream length.
- The memory sink is for tests/registry only — production writes parquet
  (append mode, partitioned by date) or a message bus.
- `dropDuplicates` with a watermark is the streaming analog of the batch
  merge writer's key-dedup (operators/merge.py): state holds only keys
  newer than the horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# events.parquet carries TIMESTAMP(NANOS); with
# spark.sql.legacy.parquet.nanosAsLong the scan yields a long (see
# sources/tables.py — streaming uses the same reader).
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table with the nanos->timestamp
    conversion applied (integer division: parity with the batch reader)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def minute_agg_query(stream: DataFrame):
    """Minute-grain windowed aggregate with a 10-minute watermark — the
    streaming form of operators/timeseries.minute_observations. Decimal
    accumulation keeps the result independent of batch arrival order."""
    return (
        stream.filter(F.col("value").isNotNull())
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count("value"),
                6,
            ).alias("avg_value"),
        )
        .select(
            F.col("window.start").alias("minute_ts"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


def dedup_counts_query(stream: DataFrame):
    """Streaming exactly-once key dedup (the merge writer's semantics as
    a stream): dropDuplicates on the natural key inside the watermark
    horizon, then a running count per event_type."""
    return (
        stream.withWatermark("ts", "10 minutes")
        .dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique_events"))
    )


def run_available_now(
    agg: DataFrame, spark: SparkSession, sink_name: str
) -> DataFrame:
    """Drain the bounded source through the streaming query into a memory
    sink (complete mode: every window emits regardless of watermark
    closure) and return the sink table. Registry/test harness path."""
    q = (
        agg.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    return agg.sparkSession.table(sink_name)
