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
