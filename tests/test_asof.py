"""Backward as-of join semantics: inclusive vs strict ties, NULL-payload
right rows winning over older non-null ones, and unmatched left rows."""

from pyspark.sql import functions as F

from myserver_datawarehouse_spark.operators.asof import asof_join_backward


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b"), (2, 150, "c"), (3, 50, "d")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 150, 20.0), (2, 150, 30.0)],
        "k long, ts long, v double",
    )
    return left, right


def test_inclusive_backward(spark):
    left, right = _frames(spark)
    out = {
        (r.k, r.ts): r.v
        for r in asof_join_backward(left, right, ["k"], "ts", ["v"]).collect()
    }
    assert out[(1, 100)] == 10.0  # equal ts visible (inclusive)
    assert out[(1, 200)] == 20.0  # latest at-or-before
    assert out[(2, 150)] == 30.0
    assert out[(3, 50)] is None  # key never seen on the right


def test_strict_excludes_equal_ts(spark):
    left, right = _frames(spark)
    out = {
        (r.k, r.ts): r.v
        for r in asof_join_backward(
            left, right, ["k"], "ts", ["v"], strict=True
        ).collect()
    }
    assert out[(1, 100)] is None  # equal ts no longer visible
    assert out[(2, 150)] is None


def test_null_payload_row_wins_over_older_value(spark):
    left = spark.createDataFrame([(1, 300)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 200, None)], "k long, ts long, v double"
    )
    out = asof_join_backward(left, right, ["k"], "ts", ["v"]).collect()
    # The ts=200 row is the as-of match even though its payload is NULL —
    # per-column carry would wrongly resurrect 10.0.
    assert out[0].v is None


def test_left_columns_preserved(spark):
    left, right = _frames(spark)
    out = asof_join_backward(left, right, ["k"], "ts", ["v"])
    assert out.columns == ["k", "ts", "tag", "v"]
    assert out.count() == 4


def test_inclusive_forward(spark):
    from myserver_datawarehouse_spark.operators.asof import asof_join_forward

    left, right = _frames(spark)
    out = {
        (r.k, r.ts): r.v
        for r in asof_join_forward(left, right, ["k"], "ts", ["v"]).collect()
    }
    assert out[(1, 100)] == 10.0  # equal ts visible (inclusive)
    assert out[(1, 200)] is None  # nothing after
    assert out[(2, 150)] == 30.0
    assert out[(3, 50)] is None


def test_strict_forward_excludes_equal_ts(spark):
    from myserver_datawarehouse_spark.operators.asof import asof_join_forward

    left, right = _frames(spark)
    out = {
        (r.k, r.ts): r.v
        for r in asof_join_forward(
            left, right, ["k"], "ts", ["v"], strict=True
        ).collect()
    }
    assert out[(1, 100)] == 20.0  # equal ts skipped -> next one (ts=150)
    assert out[(2, 150)] is None
