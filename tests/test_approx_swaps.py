"""The 100 TB approximate swaps, asserted against their exact forms:
`value_percentiles` documents approx_percentile as its at-scale variant
and `stats_profile`'s COUNT(DISTINCT) maps to approx_count_distinct —
these tests pin the accuracy contract of the swap (so the claim in the
docstrings/SCALE.md is a tested property, not prose)."""

from pyspark.sql import functions as F

from myserver_datawarehouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_approx_percentile_close_to_exact(spark):
    e = load_table(spark, SF, "events")
    row = e.agg(
        F.expr("percentile(value, array(0.5, 0.95))").alias("exact"),
        F.expr("approx_percentile(value, array(0.5, 0.95), 1000)").alias(
            "approx"
        ),
    ).first()
    for ex, ap in zip(row.exact, row.approx):
        assert abs(ap - ex) / ex < 0.05


def test_approx_count_distinct_close_to_exact(spark):
    e = load_table(spark, SF, "events")
    row = e.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.06
