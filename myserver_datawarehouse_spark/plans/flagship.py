"""Registry entries for the flagship hourly pipeline (SURVEY.md §3.1) and
its validation block (V1-V3).

The DuckDB oracle replays the whole chain relationally — closed-hour
extract, per-minute collapse, 60-minute grid, nearest-2 fill with the
<2-actuals skip — proving the composed pipeline, not just its stages.
(The merge stage is a single-batch upsert here, which is an identity on
unique event_ids; merge semantics proper are covered by
latest_event_per_user_type and the idempotency pytest.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from myserver_datawarehouse_spark import pipeline as P

_PIPELINE_CTE = """
hb AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h
  FROM events GROUP BY 1 ORDER BY COUNT(*) DESC, h LIMIT 1
),
batch AS (
  SELECT e.* FROM events e, hb
  WHERE CAST(e.ts AS TIMESTAMP) >= hb.h
    AND CAST(e.ts AS TIMESTAMP) < hb.h + INTERVAL 1 HOUR
),
obs AS (
  SELECT event_type,
         date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute_ts,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value), 6) AS value
  FROM batch WHERE value IS NOT NULL
  GROUP BY 1, 2
),
grid AS (
  SELECT t.event_type,
         unnest(generate_series(hb.h, hb.h + INTERVAL 59 MINUTE,
                                INTERVAL 1 MINUTE)) AS minute_ts
  FROM (SELECT DISTINCT event_type FROM obs) t, hb
),
g AS (
  SELECT grid.event_type, grid.minute_ts, o.value
  FROM grid LEFT JOIN obs o USING (event_type, minute_ts)
),
eligible AS (
  SELECT event_type FROM obs GROUP BY 1 HAVING COUNT(*) >= 2
),
missing AS (
  SELECT g.event_type, g.minute_ts
  FROM g JOIN eligible USING (event_type)
  WHERE g.value IS NULL
),
near AS (
  SELECT m.event_type, m.minute_ts, o.minute_ts AS t, o.value AS v,
         ROW_NUMBER() OVER (
           PARTITION BY m.event_type, m.minute_ts
           ORDER BY ABS(date_diff('second', o.minute_ts, m.minute_ts)), o.minute_ts
         ) AS rn
  FROM missing m JOIN obs o USING (event_type)
),
pair AS (
  SELECT event_type, minute_ts,
    MAX(CASE WHEN rn = 1 THEN t END) AS t1,
    MAX(CASE WHEN rn = 1 THEN v END) AS v1,
    MAX(CASE WHEN rn = 2 THEN t END) AS t2,
    MAX(CASE WHEN rn = 2 THEN v END) AS v2
  FROM near WHERE rn <= 2 GROUP BY 1, 2
),
interp AS (
  SELECT event_type, minute_ts,
    CASE WHEN t1 = t2 THEN v1
         ELSE v1 + CAST(date_diff('second', t1, minute_ts) AS DOUBLE)
                   * (v2 - v1)
                   / CAST(date_diff('second', t1, t2) AS DOUBLE)
    END AS value,
    TRUE AS is_interpolated
  FROM pair
  UNION ALL
  SELECT event_type, minute_ts, value, FALSE AS is_interpolated FROM obs
),
result AS (
  SELECT event_type, minute_ts, value, is_interpolated,
    CAST(strftime(minute_ts, '%Y%m%d') AS INT) AS date_id,
    CAST(strftime(minute_ts, '%H%M%S') AS INT) AS time_id,
    CAST(strftime(minute_ts, '%H%M%S') AS INT) AS rounded_time_id
  FROM interp
)
"""


def flagship_hourly_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract → normalize → merge → gap-fill → interpolate, end to end."""
    return P.hourly_pipeline(spark, sf_dir)


FLAGSHIP_HOURLY_PIPELINE_SQL = f"""
WITH {_PIPELINE_CTE}
SELECT * FROM result
ORDER BY event_type, minute_ts
"""


def pipeline_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1-V3 aggregates over the pipeline output (fact_gold_price.py:382-469)."""
    return P.validate(P.hourly_pipeline(spark, sf_dir))


PIPELINE_VALIDATION_SQL = f"""
WITH {_PIPELINE_CTE}
SELECT
  COUNT(*) AS total_records,
  COUNT(CASE WHEN NOT is_interpolated THEN 1 END) AS actual_records,
  COUNT(CASE WHEN is_interpolated THEN 1 END) AS interpolated_records,
  COUNT(DISTINCT event_type) AS unique_event_type,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value), 6) AS avg_value,
  MIN(value) AS min_value,
  MAX(value) AS max_value,
  ROUND(CAST(COUNT(CASE WHEN is_interpolated THEN 1 END) AS DOUBLE) * 100.0
        / COUNT(*), 2) AS interpolation_rate_pct,
  CAST(60 * COUNT(DISTINCT event_type) AS BIGINT) AS expected_records,
  COUNT(*) = 60 * COUNT(DISTINCT event_type) AS is_complete,
  COUNT(CASE WHEN value IS NULL THEN 1 END) AS null_value_count
FROM result
"""
