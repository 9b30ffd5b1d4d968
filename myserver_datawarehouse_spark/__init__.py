"""myserver_datawarehouse_spark — a PySpark-native analytics engine.

A ground-up rebuild of the capabilities of the reference warehouse
(Mmd4LIFE/myserver-datawarehouse: Airflow + Postgres + pandas gold-price
star schema, see SURVEY.md) as an idiomatic Spark engine:

- relational layer  -> DataFrame / Spark SQL (Catalyst optimizes)
- per-task compute  -> native pyspark.sql.functions (JVM, codegen)
- hourly cadence    -> incremental batch windows + a Structured
                       Streaming variant (streaming/)
- time-series core  -> gap-fill + interpolation operators (operators/)
- scale extensions  -> dedup / similarity / text analysis for
                       training-data pipelines at 100 TB scale

Nothing here is a translation of the reference's Python; every operator is
re-expressed Spark-first so Catalyst/Tungsten pick the physical plan.
"""

from myserver_datawarehouse_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
