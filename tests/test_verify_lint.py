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


def test_refresh_adjudication_latest_wins_and_fail_invalidates(tmp_path):
    import json
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from refresh_adjudication import latest_green_round

    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "q_stays_r1": {"rows_match": True, "schema_match": True, "hash_match": True},
                "q_rechecked": {"rows_match": True, "schema_match": True, "hash_match": True},
                "q_later_fail": {"rows_match": True, "schema_match": True, "hash_match": True},
                "q_rows_only": {"rows_match": True, "schema_match": None, "hash_match": None},
                "q_never_green": {"rows_match": True, "schema_match": True, "hash_match": False},
            }
        )
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps(
            {
                "q_rechecked": {"rows_match": True, "schema_match": True, "hash_match": True},
                "q_later_fail": {"rows_match": False, "schema_match": True, "hash_match": False},
            }
        )
    )
    latest = latest_green_round(str(tmp_path / "CORRECTNESS_r*.json"))
    assert latest["q_stays_r1"] == 1
    assert latest["q_rechecked"] == 2  # latest verdict wins
    assert "q_later_fail" not in latest  # later FAIL invalidates
    assert latest["q_rows_only"] == 1  # rows-only entries count
    assert "q_never_green" not in latest
