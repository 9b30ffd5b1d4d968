"""Parquet source layer (reference S1-S3, SURVEY.md §2.1).

The reference reads via SQL pushed to Postgres (fact_gold_price.py:46-71);
here the equivalent is a parquet scan whose filters/projections Catalyst
pushes into the file source — `.explain()` shows PushedFilters/ReadSchema.
A JDBC mirror of S1 lives in sources/jdbc.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one TESTDATA table. Plain parquet read — filter/column pruning
    is left to Catalyst (do NOT .cache() here; let pushdown reach the scan).
    """
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() queries mirror the
    DuckDB oracle environment (same table names)."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
