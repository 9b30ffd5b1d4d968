"""Registry entries for the streaming variants (§2.12): each runs the
continuous query with Trigger.AvailableNow over the bounded testdata
source, so the result is deterministic and comparable to a batch DuckDB
oracle — the streaming/batch unification Spark promises, made testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myserver_datawarehouse_spark.streaming import jobs as SJ


def streaming_minute_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minute-window streaming aggregate, drained via availableNow."""
    stream = SJ.events_stream(spark, sf_dir)
    out = SJ.run_available_now(
        SJ.minute_agg_query(stream), spark, "streaming_minute_agg_sink"
    )
    return out.orderBy("event_type", "minute_ts")


STREAMING_MINUTE_AGG_SQL = """
SELECT date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute_ts,
       event_type,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value), 6)
         AS avg_value
FROM events
WHERE value IS NOT NULL
GROUP BY 1, 2
ORDER BY event_type, minute_ts
"""


def streaming_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming key-dedup + running count, drained via availableNow."""
    stream = SJ.events_stream(spark, sf_dir)
    out = SJ.run_available_now(
        SJ.dedup_counts_query(stream), spark, "streaming_dedup_counts_sink"
    )
    return out.orderBy("event_type")


STREAMING_DEDUP_COUNTS_SQL = """
SELECT event_type, COUNT(DISTINCT event_id) AS n_unique_events
FROM events
GROUP BY 1
ORDER BY event_type
"""
