"""Guard the guard: tools/verify_local.py's dtype lints must actually
fire — a HUGEINT oracle column or a NULL-promoted Spark int column was
the round-2 failure mode, and the lint is what keeps it from recurring."""

import sys

import duckdb

sys.path.insert(0, "/root/repo/tools")

from verify_local import compare  # noqa: E402


def test_lint_flags_hugeint_oracle(spark):
    sdf = spark.createDataFrame([(5,)], "total bigint")
    con = duckdb.connect()
    # Bare SUM(INTEGER) -> HUGEINT: must be flagged (value comparison
    # still runs; the lint is appended alongside any value diffs).
    probs = compare("t", sdf, con, "SELECT SUM(5) AS total")
    assert any("HUGEINT" in p for p in probs)
    # The cast form passes clean.
    assert compare("t", sdf, con, "SELECT CAST(SUM(5) AS BIGINT) AS total") == []


def test_lint_flags_null_promoted_spark_int(spark):
    sdf = spark.createDataFrame([(1,), (None,)], "k int")
    con = duckdb.connect()
    probs = compare(
        "t", sdf, con, "SELECT * FROM (VALUES (1), (NULL)) AS t(k)"
    )
    assert any("toPandas" in p for p in probs)
