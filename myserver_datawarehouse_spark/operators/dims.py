"""Generated dimensions (SURVEY.md §1.1/§1.3, reference S9/P10-P12/P14).

The reference maintains `dim_date` / `dim_time` / `sources` as mutable
Postgres tables: dim_date's 17 derived columns are recomputed daily against
CURRENT_DATE (`dim_date_etl_dag.py:46-75`), dim_time is a static
second-of-day table (`fact_gold_price.py:283-288`), and the sources dim is
upserted with an MD5-derived color (`populate_sources_dag.py:62-72,100-148`).

Spark-first rebuild: dimensions are **generated, not stored** — a
`F.sequence` + projection produces them deterministically in milliseconds,
so "recompute-and-overwrite" (S9) collapses to calling the builder again.
Every evaluation-date-dependent column is parameterized by `as_of`
(SURVEY.md §7 risk iv): queries like `yesterday = 1` become testable.
Both dims are tiny (≤86,400 rows) — always broadcast them in joins.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myserver_datawarehouse_spark.functions.scalar import color_for_name

# Relative-flag windows recomputed daily in the reference
# (dim_date_etl_dag.py:53-60).
PREV_WINDOWS = (7, 14, 30, 45, 60, 90, 180, 270, 360)


def build_dim_date(
    spark: SparkSession,
    start: str | dt.date,
    end: str | dt.date,
    as_of: str | dt.date,
    with_modify_date: bool = False,
) -> DataFrame:
    """One row per calendar date in [start, end] with the reference's
    derived columns (dim_date_etl_dag.py:49-71), evaluated against the
    explicit `as_of` date instead of the ambient CURRENT_DATE."""
    d = F.col("date")
    a = F.lit(str(as_of)).cast("date")
    row = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(str(start)).cast("date"),
                F.lit(str(end)).cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("date")
    )
    prev_flags = [
        (
            ((d >= F.date_sub(a, n)) & (d < a)).cast("int").alias(f"prev_{n}_days")
        )
        for n in PREV_WINDOWS
    ]
    year_diff = F.year(a) - F.year(d)
    week_diff = year_diff * 52 + (F.weekofyear(a) - F.weekofyear(d))
    last_month = F.add_months(a, -1)
    out = row.select(
        F.date_format(d, "yyyyMMdd").cast("int").alias("date_id"),
        F.date_format(d, "yyyy-MM-dd").alias("date_string"),
        F.datediff(a, d).alias("day_lag"),
        (d == a).cast("int").alias("today"),
        (d == F.date_sub(a, 1)).cast("int").alias("yesterday"),
        *prev_flags,
        (year_diff * 12 + (F.month(a) - F.month(d))).alias("persian_month_lag"),
        week_diff.alias("persian_week_lag"),
        year_diff.alias("persian_year_lag"),
        (week_diff + 1).alias("persian_shifted_week_lag"),
        (
            (F.month(d) == F.month(last_month))
            & (F.year(d) == F.year(last_month))
        ).alias("is_last_month_mtd"),
    )
    if with_modify_date:
        out = out.withColumn("modify_date", F.current_timestamp())
    return out


def build_dim_time(spark: SparkSession) -> DataFrame:
    """86,400 rows, one per second of day (fact_gold_price.py:283-288,
    gold_price_to_sheets.py:50): HHMMSS `time_id`, components, and the
    'HH:mm:ss' string used to reconstruct timestamps (P8). The minute grid
    is `WHERE second = 0`."""
    s = F.col("id")
    hour = (s / 3600).cast("int")
    minute = ((s % 3600) / 60).cast("int")
    second = (s % 60).cast("int")
    pad = lambda c: F.lpad(c.cast("string"), 2, "0")  # noqa: E731
    return spark.range(86400).select(
        (hour * 10000 + minute * 100 + second).cast("int").alias("time_id"),
        hour.alias("hour24"),
        minute.alias("minute"),
        second.alias("second"),
        F.concat_ws(":", pad(hour), pad(minute), pad(second)).alias(
            "minutefullstring24"
        ),
    )


def sources_from(
    df: DataFrame, name_col: str = "source", id_col: str = "doc_id"
) -> DataFrame:
    """Derive the sources dimension from observed data, reference-style:
    first-appearance ordering by MIN(id) (populate_sources_dag.py:41-45, A5)
    and the deterministic '#'+md5(name)[:6] color (P14)."""
    return (
        df.groupBy(F.col(name_col).alias("name"))
        .agg(F.min(id_col).alias("first_id"))
        .select(
            "name",
            "first_id",
            color_for_name("name").alias("color"),
        )
        .orderBy("first_id")
    )


def soft_delete_filter(df: DataFrame, col: str = "deleted_at") -> DataFrame:
    """P9: active rows only (`deleted_at IS NULL`, dw_helpers.py:29,61)."""
    return df.filter(F.col(col).isNull())
