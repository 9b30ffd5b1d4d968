"""JDBC source builders (S1): pushdown SQL shape and option assembly —
the database-independent layer (no DB exists in this container)."""

import pytest

from myserver_datawarehouse_spark.sources import jdbc as J


def test_closed_hour_extract_sql_shape():
    sql = J.closed_hour_extract_sql(hour_start="2024-03-01 10:00:00")
    assert "CASE WHEN currency = 'IRR' THEN ROUND(price / 10)" in sql
    assert "AT TIME ZONE 'Asia/Tehran'" in sql
    assert "BETWEEN TIMESTAMP '2024-03-01 10:00:00' - INTERVAL '1 hour'" in sql
    assert sql.endswith("ORDER BY 1")


def test_jdbc_options_query_pushdown():
    opts = J.jdbc_options("jdbc:postgresql://h/db", "SELECT 1")
    assert opts["query"] == "SELECT 1"
    assert "dbtable" not in opts
    assert opts["fetchsize"] == str(J.DEFAULT_FETCH_SIZE)


def test_jdbc_options_partitioned():
    opts = J.jdbc_options(
        "jdbc:postgresql://h/db",
        "SELECT id FROM t",
        partition_col="id",
        lower=0,
        upper=1000,
        num_partitions=4,
    )
    assert opts["dbtable"] == "(SELECT id FROM t) AS src"
    assert opts["partitionColumn"] == "id"
    assert (opts["lowerBound"], opts["upperBound"]) == ("0", "1000")
    assert opts["numPartitions"] == "4"


def test_jdbc_options_partitioned_requires_bounds():
    with pytest.raises(ValueError, match="bounds"):
        J.jdbc_options("jdbc:x", "SELECT 1", partition_col="id")


def test_closed_hour_extract_executes_semantically():
    """Prove the generated pushdown text is semantically right, not just
    well-formed: run the dbtable subquery (the exact string Spark would
    hand the source DB) on DuckDB over a fixture whose expected output is
    hand-computed. Covers the IRR/IRT normalization, the Tehran-local
    (+03:30) date_id/time_id derivation, and the closed-hour BETWEEN
    window with both endpoints inclusive."""
    import duckdb

    con = duckdb.connect()
    try:
        con.execute("SET TimeZone='UTC'")
        con.execute("SELECT timezone('Asia/Tehran', TIMESTAMPTZ '2024-01-01 00:00:00+00')")
    except duckdb.Error:
        pytest.skip("DuckDB build lacks ICU timezone support")
    # Local window for hour_start 2024-03-01 10:00 Tehran = UTC [05:30, 06:30].
    con.execute(
        """
        CREATE TABLE gold_price AS
        SELECT * FROM (VALUES
          (1, 'srcA', 'buy',  'IRR', 1234560.0, TIMESTAMPTZ '2024-03-01 05:30:00+00'),
          (2, 'srcB', 'sell', 'IRT', 2500.4,    TIMESTAMPTZ '2024-03-01 06:00:00+00'),
          (3, 'srcA', 'buy',  'IRR', 70.0,      TIMESTAMPTZ '2024-03-01 06:30:00+00'),
          (4, 'srcA', 'buy',  'IRR', 999.0,     TIMESTAMPTZ '2024-03-01 06:30:01+00'),
          (5, 'srcB', 'sell', 'IRT', 999.0,     TIMESTAMPTZ '2024-03-01 05:29:59+00'),
          (6, 'srcC', 'buy',  'USD', 999.0,     TIMESTAMPTZ '2024-03-01 06:10:00+00')
        ) AS t(id, source, side, currency, price, created_at)
        """
    )
    query = J.closed_hour_extract_sql(
        hour_start="2024-03-01 10:00:00", dialect="duckdb"
    )
    opts = J.jdbc_options(
        "jdbc:duckdb:", query, partition_col="id", lower=0, upper=10
    )
    rows = con.sql(f"SELECT * FROM {opts['dbtable']}").fetchall()
    assert rows == [
        (1, "srcA", "buy", 123456.0, 20240301, 90000),   # start inclusive
        (2, "srcB", "sell", 2500.0, 20240301, 93000),    # IRT rounding
        (3, "srcA", "buy", 7.0, 20240301, 100000),       # end inclusive
        (6, "srcC", "buy", None, 20240301, 94000),       # unknown ccy -> NULL
    ]
