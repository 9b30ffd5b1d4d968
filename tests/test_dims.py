"""Generated-dimension correctness: dim_date relative flags against a
pinned as-of date, dim_time key encoding, sources color hash + soft
delete (S9/P9/P10-P12/P14)."""

import hashlib

from myserver_datawarehouse_spark.operators import dims as D


def test_dim_date_flags_pinned_asof(spark):
    df = D.build_dim_date(spark, "2024-02-25", "2024-03-05", as_of="2024-03-03")
    by_id = {r.date_id: r for r in df.collect()}
    assert by_id[20240303].today == 1 and by_id[20240303].yesterday == 0
    assert by_id[20240302].yesterday == 1
    assert by_id[20240302].day_lag == 1 and by_id[20240305].day_lag == -2
    # prev_7_days: [as_of-7, as_of) — boundary in, as_of out
    assert by_id[20240225].prev_7_days == 1
    assert by_id[20240303].prev_7_days == 0
    assert by_id[20240302].prev_7_days == 1
    # February is as-of-month minus one
    assert by_id[20240229].is_last_month_mtd is True
    assert by_id[20240301].is_last_month_mtd is False


def test_dim_date_month_lag(spark):
    df = D.build_dim_date(spark, "2023-12-30", "2024-01-02", as_of="2024-03-03")
    by_id = {r.date_id: r for r in df.collect()}
    assert by_id[20240101].persian_month_lag == 2
    assert by_id[20231230].persian_month_lag == 3
    assert by_id[20231230].persian_year_lag == 1


def test_dim_time_shape_and_encoding(spark):
    df = D.build_dim_time(spark)
    assert df.count() == 86400
    rows = {r.time_id: r for r in df.where("time_id in (0, 235959, 93001)").collect()}
    assert rows[235959].hour24 == 23 and rows[235959].second == 59
    assert rows[93001].minutefullstring24 == "09:30:01"
    assert df.where("second = 0").count() == 1440  # minute grid


def test_sources_color_and_first_appearance(spark):
    df = spark.createDataFrame(
        [(3, "milli"), (1, "taline"), (2, "milli")], "doc_id long, source string"
    )
    got = {r.name: r for r in D.sources_from(df).collect()}
    expected = "#" + hashlib.md5(b"milli").hexdigest()[:6]
    assert got["milli"].color == expected
    assert got["milli"].first_id == 2 and got["taline"].first_id == 1


def test_soft_delete_filter(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "2024-01-01 00:00:00")], "id long, deleted_at string"
    )
    assert [r.id for r in D.soft_delete_filter(df).collect()] == [1]
