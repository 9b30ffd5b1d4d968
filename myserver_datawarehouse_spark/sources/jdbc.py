"""JDBC source layer (reference S1, SURVEY.md §2.1).

The reference extracts by pushing SQL to the source Postgres
(`PostgresHook.get_pandas_df(query)`, fact_gold_price.py:46-71) — one
connection, one cursor, the whole result through pandas. The Spark
equivalent keeps the pushdown (the database still evaluates the WHERE)
but parallelizes the fetch: `spark.read.jdbc` with a partition column
splits the extract into N concurrent range queries.

No database exists in this test environment, so `read_jdbc` is exercised
through its pure option/SQL builders; the parquet layer (tables.py) is
the live scan path. On a real deployment the two are interchangeable
inputs to the same plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_FETCH_SIZE = 10_000


def closed_hour_extract_sql(
    table: str = "gold_price",
    ts_col: str = "created_at",
    hour_start: str = "2024-01-01 00:00:00",
    tz: str = "Asia/Tehran",
    dialect: str = "postgres",
) -> str:
    """The reference's closed-window extract (fact_gold_price.py:52-68) as
    pushdown SQL: currency normalization (P1), business-timezone key
    derivation (P2-P4), and the one-closed-hour BETWEEN window (S2/P5/P6)
    — all evaluated by the source database, so the wire carries exactly
    one hour of normalized rows.

    ``dialect`` selects the source database's SQL surface for the
    identical semantics: "postgres" (the reference's deployment) or
    "duckdb" (lets tests EXECUTE the generated text against a real
    engine — see tests/test_jdbc.py — and is a live target via the
    DuckDB JDBC driver)."""
    if dialect == "postgres":
        local_ts = f"{ts_col} AT TIME ZONE '{tz}'"
        date_id = f"CAST(TO_CHAR({local_ts}, 'YYYYMMDD') AS INTEGER)"
        time_id = f"CAST(TO_CHAR({local_ts}, 'HH24MISS') AS INTEGER)"
    elif dialect == "duckdb":
        local_ts = f"timezone('{tz}', {ts_col})"
        date_id = f"CAST(strftime({local_ts}, '%Y%m%d') AS INTEGER)"
        time_id = f"CAST(strftime({local_ts}, '%H%M%S') AS INTEGER)"
    else:
        raise ValueError(f"unknown dialect: {dialect!r}")
    return f"""
SELECT
    id,
    source,
    side,
    CASE WHEN currency = 'IRR' THEN ROUND(price / 10)
         WHEN currency = 'IRT' THEN ROUND(price)
    END AS price,
    {date_id} AS date_id,
    {time_id} AS time_id
FROM {table}
WHERE {local_ts}
      BETWEEN TIMESTAMP '{hour_start}' - INTERVAL '1 hour'
          AND TIMESTAMP '{hour_start}'
ORDER BY 1
""".strip()


def jdbc_options(
    url: str,
    query: str,
    partition_col: str | None = None,
    lower: int | None = None,
    upper: int | None = None,
    num_partitions: int = 8,
    fetch_size: int = DEFAULT_FETCH_SIZE,
) -> dict[str, str]:
    """Assemble the spark.read.format('jdbc') option map.

    Unpartitioned: `query` pushdown (single connection). Partitioned:
    the query becomes a derived `dbtable` subquery and Spark issues
    `num_partitions` concurrent range scans on `partition_col` — the
    scale path; at 100 TB source volume you partition on the indexed
    natural key so each range scan is an index range read."""
    opts = {"url": url, "fetchsize": str(fetch_size)}
    if partition_col is None:
        opts["query"] = query
    else:
        if lower is None or upper is None:
            raise ValueError("partitioned JDBC read needs lower and upper bounds")
        opts["dbtable"] = f"({query}) AS src"
        opts["partitionColumn"] = partition_col
        opts["lowerBound"] = str(lower)
        opts["upperBound"] = str(upper)
        opts["numPartitions"] = str(num_partitions)
    return opts


def read_jdbc(spark: SparkSession, **kwargs) -> DataFrame:
    """Execute a JDBC read from `jdbc_options(**kwargs)`. Requires a
    reachable database and driver jar — unavailable in this container;
    kept thin so everything testable lives in the builders above."""
    reader = spark.read.format("jdbc")
    for k, v in jdbc_options(**kwargs).items():
        reader = reader.option(k, v)
    return reader.load()
