"""Registry queries for the generated dimensions (S9, P10-P12, P14, A4).

`as_of` is pinned to 2024-01-31 (the driver's events data spans January
2024) so every evaluation-date-dependent flag is deterministic and
oracle-checkable (SURVEY.md §7 risk iv).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myserver_datawarehouse_spark.operators import dims as D
from myserver_datawarehouse_spark.sources.tables import load_table

AS_OF = "2024-01-31"
DATE_START = "2023-06-01"
DATE_END = "2024-06-30"


def dim_date_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full derived-column recompute (dim_date_etl_dag.py:46-75) as a
    deterministic generated table."""
    return D.build_dim_date(spark, DATE_START, DATE_END, AS_OF).orderBy("date_id")


_PREV_SQL = ",\n".join(
    f"  CASE WHEN d >= DATE '{AS_OF}' - INTERVAL {n} DAY AND d < DATE '{AS_OF}'"
    f" THEN 1 ELSE 0 END AS prev_{n}_days"
    for n in D.PREV_WINDOWS
)

DIM_DATE_FLAGS_SQL = f"""
WITH days AS (
  SELECT CAST(unnest(generate_series(DATE '{DATE_START}', DATE '{DATE_END}',
                                     INTERVAL 1 DAY)) AS DATE) AS d
)
SELECT
  CAST(strftime(d, '%Y%m%d') AS INT) AS date_id,
  strftime(d, '%Y-%m-%d') AS date_string,
  date_diff('day', d, DATE '{AS_OF}') AS day_lag,
  CASE WHEN d = DATE '{AS_OF}' THEN 1 ELSE 0 END AS today,
  CASE WHEN d = DATE '{AS_OF}' - INTERVAL 1 DAY THEN 1 ELSE 0 END AS yesterday,
{_PREV_SQL},
  (EXTRACT(YEAR FROM DATE '{AS_OF}') - EXTRACT(YEAR FROM d)) * 12
    + (EXTRACT(MONTH FROM DATE '{AS_OF}') - EXTRACT(MONTH FROM d)) AS persian_month_lag,
  (EXTRACT(YEAR FROM DATE '{AS_OF}') - EXTRACT(YEAR FROM d)) * 52
    + (EXTRACT(WEEK FROM DATE '{AS_OF}') - EXTRACT(WEEK FROM d)) AS persian_week_lag,
  EXTRACT(YEAR FROM DATE '{AS_OF}') - EXTRACT(YEAR FROM d) AS persian_year_lag,
  (EXTRACT(YEAR FROM DATE '{AS_OF}') - EXTRACT(YEAR FROM d)) * 52
    + (EXTRACT(WEEK FROM DATE '{AS_OF}') - EXTRACT(WEEK FROM d)) + 1 AS persian_shifted_week_lag,
  (EXTRACT(MONTH FROM d) = EXTRACT(MONTH FROM DATE '{AS_OF}' - INTERVAL 1 MONTH)
   AND EXTRACT(YEAR FROM d) = EXTRACT(YEAR FROM DATE '{AS_OF}' - INTERVAL 1 MONTH))
    AS is_last_month_mtd
FROM days
ORDER BY date_id
"""


def dim_time_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The static second-of-day dimension (fact_gold_price.py:283-288)."""
    return D.build_dim_time(spark).orderBy("time_id")


DIM_TIME_TABLE_SQL = """
SELECT
  CAST((i // 3600) * 10000 + ((i % 3600) // 60) * 100 + (i % 60) AS INT) AS time_id,
  CAST(i // 3600 AS INT) AS hour24,
  CAST((i % 3600) // 60 AS INT) AS minute,
  CAST(i % 60 AS INT) AS second,
  lpad(CAST(i // 3600 AS VARCHAR), 2, '0') || ':'
    || lpad(CAST((i % 3600) // 60 AS VARCHAR), 2, '0') || ':'
    || lpad(CAST(i % 60 AS VARCHAR), 2, '0') AS minutefullstring24
FROM range(86400) t(i)
ORDER BY time_id
"""


def sources_dim_colors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sources dimension derived from `documents.source`: first-appearance
    id ordering (A5) + deterministic MD5 color (P14)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.sources_from(docs, "source", "doc_id")


SOURCES_DIM_COLORS_SQL = """
SELECT source AS name, MIN(doc_id) AS first_id,
       '#' || substr(md5(source), 1, 6) AS color
FROM documents
GROUP BY source
ORDER BY first_id
"""


def dim_date_flag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: SUM of 0/1 flag columns — the reference's post-update statistics
    block (dim_date_etl_dag.py:82-93)."""
    dd = D.build_dim_date(spark, DATE_START, DATE_END, AS_OF)
    return dd.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.sum("today").alias("today_count"),
        F.sum("yesterday").alias("yesterday_count"),
        F.sum("prev_7_days").alias("prev_7_days_count"),
        F.sum("prev_30_days").alias("prev_30_days_count"),
    )


DIM_DATE_FLAG_STATS_SQL = f"""
WITH dd AS ({DIM_DATE_FLAGS_SQL.replace("ORDER BY date_id", "")})
SELECT COUNT(*) AS total_rows,
       CAST(SUM(today) AS BIGINT) AS today_count,
       CAST(SUM(yesterday) AS BIGINT) AS yesterday_count,
       CAST(SUM(prev_7_days) AS BIGINT) AS prev_7_days_count,
       CAST(SUM(prev_30_days) AS BIGINT) AS prev_30_days_count
FROM dd
"""


def dim_date_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V4 dim_date integrity block (dim_date_etl_dag.py:113-130): key
    uniqueness, contiguity (row count == day span), exactly-one
    today/yesterday, and the prev-window sums at their defining sizes."""
    dd = D.build_dim_date(spark, DATE_START, DATE_END, AS_OF)
    return dd.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("date_id").alias("n_distinct_ids"),
        (F.datediff(F.lit(DATE_END).cast("date"), F.lit(DATE_START).cast("date")) + 1)
        .alias("expected_days"),
        F.min("date_id").alias("min_date_id"),
        F.max("date_id").alias("max_date_id"),
        F.sum("today").alias("n_today"),
        F.sum("yesterday").alias("n_yesterday"),
        F.sum("prev_7_days").alias("sum_prev_7"),
        F.sum("prev_360_days").alias("sum_prev_360"),
    )


DIM_DATE_INTEGRITY_SQL = f"""
WITH dd AS ({DIM_DATE_FLAGS_SQL.replace("ORDER BY date_id", "")})
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT date_id) AS n_distinct_ids,
       date_diff('day', DATE '{DATE_START}', DATE '{DATE_END}') + 1
         AS expected_days,
       MIN(date_id) AS min_date_id,
       MAX(date_id) AS max_date_id,
       CAST(SUM(today) AS BIGINT) AS n_today,
       CAST(SUM(yesterday) AS BIGINT) AS n_yesterday,
       CAST(SUM(prev_7_days) AS BIGINT) AS sum_prev_7,
       CAST(SUM(prev_360_days) AS BIGINT) AS sum_prev_360
FROM dd
"""


def sources_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V5 sources summary (populate_sources_dag.py:208-238): the derived
    sources dimension joined back to per-source corpus counts."""
    docs = load_table(spark, sf_dir, "documents")
    dim = D.sources_from(docs, "source", "doc_id")
    stats = docs.groupBy(F.col("source").alias("name")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
    )
    return (
        dim.join(F.broadcast(stats), "name")
        .select("name", "color", "first_id", "n_docs", "n_langs")
        .orderBy("first_id")
    )


SOURCES_SUMMARY_SQL = """
SELECT source AS name,
       '#' || substr(md5(source), 1, 6) AS color,
       MIN(doc_id) AS first_id,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT lang) AS n_langs
FROM documents
GROUP BY source
ORDER BY first_id
"""


def sources_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sources-dimension maintenance cycle (populate_sources_dag.py:
    41-148) as one relational query: J5 anti-join finds new names, P14
    assigns their colors, P13 COALESCE keeps existing colors on upsert, a
    deterministic synthetic deleted_at exercises the P9 soft-delete
    filter, and the output carries V5's lifecycle flags.

    "Existing" = sources seen among even doc_ids (the prior load);
    "extracted" = all sources. Sources whose numeric suffix is divisible
    by 5 are marked deleted at a fixed timestamp (the driver tables have
    no deleted_at column, so the lifecycle synthesizes one
    deterministically)."""
    docs = load_table(spark, sf_dir, "documents")
    existing = D.sources_from(docs.filter(F.col("doc_id") % 2 == 0))
    extracted = D.sources_from(docs)
    new_names = extracted.join(existing, "name", "left_anti")
    merged = (
        existing.alias("o")
        .join(new_names.alias("n"), "name", "full_outer")
        .select(
            "name",
            # update wins for ordinary columns, keep-existing for color
            # (populate_sources_dag.py:146 COALESCE(sources.color,
            # EXCLUDED.color))
            F.coalesce(F.col("n.first_id"), F.col("o.first_id")).alias("first_id"),
            F.coalesce(F.col("o.color"), F.col("n.color")).alias("color"),
            F.col("o.name").isNull().alias("is_new"),
        )
    )
    from myserver_datawarehouse_spark.functions.scalar import lenient_cast

    src_num = lenient_cast(F.substring("name", 4, 10), "int")
    with_del = merged.withColumn(
        "deleted_at",
        F.when(src_num % 5 == 0, F.lit("2024-01-15 00:00:00").cast("timestamp")),
    )
    active = D.soft_delete_filter(with_del)
    return (
        with_del.select(
            "name",
            "first_id",
            "color",
            "is_new",
            F.col("deleted_at").isNotNull().alias("is_deleted"),
        )
        .join(active.select("name", F.lit(True).alias("is_active")), "name", "left")
        .select(
            "name",
            "first_id",
            "color",
            "is_new",
            "is_deleted",
            F.coalesce("is_active", F.lit(False)).alias("is_active"),
        )
        .orderBy("name")
    )


SOURCES_LIFECYCLE_SQL = """
WITH existing AS (
  SELECT source AS name, MIN(doc_id) AS first_id,
         '#' || substr(md5(source), 1, 6) AS color
  FROM documents WHERE doc_id % 2 = 0 GROUP BY source
),
extracted AS (
  SELECT source AS name, MIN(doc_id) AS first_id,
         '#' || substr(md5(source), 1, 6) AS color
  FROM documents GROUP BY source
),
new_names AS (
  SELECT * FROM extracted e
  WHERE NOT EXISTS (SELECT 1 FROM existing x WHERE x.name = e.name)
),
merged AS (
  SELECT COALESCE(o.name, n.name) AS name,
         COALESCE(n.first_id, o.first_id) AS first_id,
         COALESCE(o.color, n.color) AS color,
         o.name IS NULL AS is_new
  FROM existing o FULL OUTER JOIN new_names n USING (name)
),
with_del AS (
  SELECT *,
         CASE WHEN TRY_CAST(substr(name, 4, 10) AS INT) % 5 = 0
              THEN TIMESTAMP '2024-01-15 00:00:00' END AS deleted_at
  FROM merged
)
SELECT name, first_id, color, is_new,
       deleted_at IS NOT NULL AS is_deleted,
       deleted_at IS NULL AS is_active
FROM with_del
ORDER BY name
"""
