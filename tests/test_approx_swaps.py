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


def test_count_min_sketch_matches_independent_reconstruction(
    spark, tmp_path
):
    """heavy_hitters_cm_audit's sketch must agree bit-for-bit with an
    independent numpy reconstruction of the same count-min (same
    integer polynomial hashes), and its invariants must hold on an
    adversarial skew: never_under always true, estimate == exact
    whenever the candidate's buckets are collision-free."""
    import datetime as dt

    import numpy as np
    import pandas as pd

    from myserver_datawarehouse_spark.plans import relational as R

    # Power-law-ish user distribution + one dominant key.
    ids = [7] * 500 + [i % 211 + 100 for i in range(700)] + [9999] * 3
    pdf = pd.DataFrame(
        {
            "event_id": range(len(ids)),
            "ts": [dt.datetime(2024, 1, 1, 0, i % 60) for i in range(len(ids))],
            "user_id": ids,
            "event_type": ["a"] * len(ids),
            "value": [1.0] * len(ids),
            "props": ["{}"] * len(ids),
        }
    )
    sf = tmp_path / "cm_sf"
    sf.mkdir()
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        str(tmp_path / "stage")
    )
    import glob
    import shutil

    (part,) = glob.glob(str(tmp_path / "stage" / "part-*.parquet"))
    shutil.copy(part, str(sf / "events.parquet"))

    out = {
        r.user_id: r
        for r in R.heavy_hitters_cm_audit(spark, str(sf)).collect()
    }

    # Independent reconstruction.
    arr = np.array(ids, dtype=np.int64)
    cm = {}
    for d, (a, b) in enumerate(R.CM_DEPTH_PARAMS):
        buckets = (((arr % R.CM_P) * a + b) % R.CM_P) % R.CM_W
        cm[d] = np.bincount(buckets, minlength=R.CM_W)
    exact = pd.Series(ids).value_counts()
    # Expected top-k under the query's exact tie-break: count DESC,
    # user_id ASC — an arbitrary-5-rows regression must fail here.
    expected_top = [
        uid
        for uid, _n in sorted(
            exact.items(), key=lambda kv: (-kv[1], kv[0])
        )[: R.CM_TOPK]
    ]
    assert set(out) == set(expected_top)
    for uid, row in out.items():
        est = min(
            cm[d][(((uid % R.CM_P) * a + b) % R.CM_P) % R.CM_W]
            for d, (a, b) in enumerate(R.CM_DEPTH_PARAMS)
        )
        assert row.cm_estimate == int(est)
        assert row.exact_n == int(exact[uid])
        assert row.never_under  # CM can only over-count
        assert row.cm_estimate >= row.exact_n
