"""Registry queries for the time-series core (T1/T2, SURVEY.md §2.9) over
the driver's `events` table.

Grain: (event_type, date_id) groups, minute grid bounded to the observed
[min, max] minute per group (the rebuild_all_time_interpolation.py:74-99
shape). The DuckDB oracles mirror every expression shape exactly — same
decimal accumulation, same linear-blend operand order — so double outputs
are bit-identical (see plans/relational.py float policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myserver_datawarehouse_spark.operators import timeseries as TS
from myserver_datawarehouse_spark.sources.tables import load_table

KEYS = ["event_type", "date_id"]

# The minute-grid plan functions take an optional [date_lo, date_hi]
# window and default to the FULL event history — the narrowing is an
# explicit caller choice, never a hidden constant. The registry registers
# additional `*_windowed` forms bound to this 6-day window (name makes the
# bound visible) because hashing |groups| x 1440 grid rows/day per query
# is differential-check cost, not extra coverage: full-range bracketing
# interpolation over every date is already adjudicated via
# full_history_rebuild, and the 6-day window still spans cross-day edges.
TS_WINDOW_LO = 20240110
TS_WINDOW_HI = 20240115


def _event_minutes(
    spark: SparkSession,
    sf_dir: str,
    date_lo: int | None = None,
    date_hi: int | None = None,
) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn(
        "date_id", F.date_format("ts", "yyyyMMdd").cast("int")
    )
    if date_lo is not None or date_hi is not None:
        e = e.filter(
            F.col("date_id").between(
                date_lo if date_lo is not None else 0,
                date_hi if date_hi is not None else 99999999,
            )
        )
    return TS.minute_observations(e, KEYS)


_OBS_SQL = """
  SELECT event_type,
         CAST(strftime(date_trunc('minute', CAST(ts AS TIMESTAMP)), '%Y%m%d') AS INT) AS date_id,
         date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute_ts,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value), 6) AS value
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2, 3
"""

_OBS_BOUNDED_SQL = f"""
  SELECT * FROM ({_OBS_SQL})
  WHERE date_id BETWEEN {TS_WINDOW_LO} AND {TS_WINDOW_HI}
"""

_GRID_SQL = """
  bounds AS (
    SELECT event_type, date_id, MIN(minute_ts) AS t0, MAX(minute_ts) AS t1
    FROM obs GROUP BY 1, 2
  ),
  grid AS (
    SELECT event_type, date_id,
           unnest(generate_series(t0, t1, INTERVAL 1 MINUTE)) AS minute_ts
    FROM bounds
  ),
  g AS (
    SELECT grid.event_type, grid.date_id, grid.minute_ts, o.value
    FROM grid LEFT JOIN obs o USING (event_type, date_id, minute_ts)
  )
"""


def gapfill_missing_minutes(
    spark: SparkSession,
    sf_dir: str,
    date_lo: int | None = None,
    date_hi: int | None = None,
) -> DataFrame:
    """T1: emit every missing minute per (event_type, date) group.

    Defaults to the full event history; pass ``date_lo``/``date_hi``
    (yyyymmdd ints) to bound the scan."""
    obs = _event_minutes(spark, sf_dir, date_lo, date_hi)
    missing = TS.gapfill_missing(obs, KEYS)
    return (
        TS.with_minute_ts(missing)
        .select(*KEYS, "minute_ts")
        .orderBy(*KEYS, "minute_ts")
    )


def gapfill_missing_minutes_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 bound to the 6-day adjudication window (bound visible in name)."""
    return gapfill_missing_minutes(spark, sf_dir, TS_WINDOW_LO, TS_WINDOW_HI)


GAPFILL_MISSING_MINUTES_WINDOWED_SQL = f"""
WITH obs AS ({_OBS_BOUNDED_SQL}), {_GRID_SQL}
SELECT event_type, date_id, minute_ts
FROM g WHERE value IS NULL
ORDER BY event_type, date_id, minute_ts
"""


def interpolate_minutes_bracketing(
    spark: SparkSession,
    sf_dir: str,
    date_lo: int | None = None,
    date_hi: int | None = None,
) -> DataFrame:
    """T2 bracketing mode: window-function linear fill (the 100 TB path).

    Defaults to the full event history; pass ``date_lo``/``date_hi``
    (yyyymmdd ints) to bound the scan."""
    obs = _event_minutes(spark, sf_dir, date_lo, date_hi)
    filled = TS.interpolate_bracketing(obs, KEYS)
    return (
        TS.with_minute_ts(filled)
        .select(*KEYS, "minute_ts", "value", "is_interpolated")
        .orderBy(*KEYS, "minute_ts")
    )


def interpolate_minutes_bracketing_windowed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """T2 bracketing bound to the 6-day adjudication window."""
    return interpolate_minutes_bracketing(
        spark, sf_dir, TS_WINDOW_LO, TS_WINDOW_HI
    )


INTERPOLATE_MINUTES_BRACKETING_WINDOWED_SQL = f"""
WITH obs AS ({_OBS_BOUNDED_SQL}), {_GRID_SQL},
f AS (
  SELECT *,
    last_value(value IGNORE NULLS) OVER w_before AS pv,
    last_value(CASE WHEN value IS NOT NULL THEN minute_ts END IGNORE NULLS)
      OVER w_before AS pt,
    first_value(value IGNORE NULLS) OVER w_after AS nv,
    first_value(CASE WHEN value IS NOT NULL THEN minute_ts END IGNORE NULLS)
      OVER w_after AS nt
  FROM g
  WINDOW
    w_before AS (PARTITION BY event_type, date_id ORDER BY minute_ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_after AS (PARTITION BY event_type, date_id ORDER BY minute_ts
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, date_id, minute_ts,
  COALESCE(value,
           pv + CAST(date_diff('second', pt, minute_ts) AS DOUBLE)
                * (nv - pv)
                / CAST(date_diff('second', pt, nt) AS DOUBLE)
  ) AS value,
  (value IS NULL) AS is_interpolated
FROM f
ORDER BY event_type, date_id, minute_ts
"""


def interpolate_minutes_nearest2(
    spark: SparkSession,
    sf_dir: str,
    date_lo: int | None = None,
    date_hi: int | None = None,
) -> DataFrame:
    """T2 exact parity mode: the reference's nearest-2 numpy kernel as a
    grouped applyInPandas (fact_gold_price.py:317-351 semantics).

    Defaults to the full event history; pass ``date_lo``/``date_hi``
    (yyyymmdd ints) to bound the scan."""
    obs = _event_minutes(spark, sf_dir, date_lo, date_hi)
    filled = TS.interpolate_nearest2(obs, KEYS)
    return (
        TS.with_minute_ts(filled)
        .select(*KEYS, "minute_ts", "value", "is_interpolated")
        .orderBy(*KEYS, "minute_ts")
    )


def interpolate_minutes_nearest2_windowed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """T2 nearest-2 parity bound to the 6-day adjudication window."""
    return interpolate_minutes_nearest2(spark, sf_dir, TS_WINDOW_LO, TS_WINDOW_HI)


def interpolate_cross_midnight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: interpolation across the date boundary (fact_gold_price_temp.py:
    240-394). The reference needed a one-off backfill DAG with a +240000
    HHMMSS hack to linearize hour-23 gaps; on real epoch timestamps the
    boundary is a non-event — we key by event_type only (no date in the
    grain) and simply emit the gap runs whose bracketing observations fall
    on different calendar dates, linearly filled."""
    e = load_table(spark, sf_dir, "events")
    obs = TS.minute_observations(e, ["event_type"])
    gaps = TS.gap_runs(obs, ["event_type"])
    crossing = gaps.filter(
        F.to_date(F.timestamp_seconds("pt")) != F.to_date(F.timestamp_seconds("nt"))
    )
    interp = F.col("pv") + (F.col("minute_epoch") - F.col("pt")).cast("double") * (
        F.col("nv") - F.col("pv")
    ) / (F.col("nt") - F.col("pt")).cast("double")
    return (
        crossing.select(
            "event_type",
            F.timestamp_seconds("minute_epoch").alias("minute_ts"),
            F.date_format(F.timestamp_seconds("minute_epoch"), "yyyyMMdd")
            .cast("int")
            .alias("date_id"),
            interp.alias("value"),
        )
        .orderBy("event_type", "minute_ts")
    )


INTERPOLATE_CROSS_MIDNIGHT_SQL = """
WITH obs AS (
  SELECT event_type,
         date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute_ts,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value), 6) AS value
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
runs AS (
  SELECT event_type, minute_ts AS pt, value AS pv,
         lead(minute_ts) OVER w AS nt, lead(value) OVER w AS nv
  FROM obs
  WINDOW w AS (PARTITION BY event_type ORDER BY minute_ts)
),
crossing AS (
  SELECT * FROM runs
  WHERE nt > pt + INTERVAL 1 MINUTE AND CAST(pt AS DATE) != CAST(nt AS DATE)
),
g AS (
  SELECT event_type, pt, pv, nt, nv,
         unnest(generate_series(pt + INTERVAL 1 MINUTE,
                                nt - INTERVAL 1 MINUTE,
                                INTERVAL 1 MINUTE)) AS minute_ts
  FROM crossing
)
SELECT event_type, minute_ts,
  CAST(strftime(minute_ts, '%Y%m%d') AS INT) AS date_id,
  pv + CAST(date_diff('second', pt, minute_ts) AS DOUBLE)
       * (nv - pv)
       / CAST(date_diff('second', pt, nt) AS DOUBLE) AS value
FROM g
ORDER BY event_type, minute_ts
"""


def full_history_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: the all-dates rebuild (rebuild_all_time_interpolation.py:5-204) as
    ONE Spark job — no per-date driver loop; the shuffle partitions on the
    group keys ARE the reference's "per-date to avoid memory issues"
    batching. Returns the per-date rebuild log the reference prints
    (rebuild_all_time_interpolation.py:185-193): row counts + interp rate.
    The truncate+overwrite write path (S7) is exercised in
    tests/test_merge.py over this same frame."""
    obs = _event_minutes(spark, sf_dir)
    filled = TS.interpolate_bracketing(obs, KEYS)
    interp_cnt = F.count(F.when(F.col("is_interpolated"), 1))
    total = F.count("*")
    return (
        filled.groupBy("date_id")
        .agg(
            total.alias("total_minutes"),
            F.count(F.when(~F.col("is_interpolated"), 1)).alias("actual_cnt"),
            interp_cnt.alias("interpolated_cnt"),
            F.round(interp_cnt.cast("double") * 100.0 / total, 2).alias(
                "interp_rate_pct"
            ),
        )
        .orderBy("date_id")
    )


FULL_HISTORY_REBUILD_SQL = f"""
WITH obs AS ({_OBS_SQL}), {_GRID_SQL},
f AS (
  SELECT *,
    last_value(value IGNORE NULLS) OVER w_before AS pv,
    first_value(value IGNORE NULLS) OVER w_after AS nv
  FROM g
  WINDOW
    w_before AS (PARTITION BY event_type, date_id ORDER BY minute_ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_after AS (PARTITION BY event_type, date_id ORDER BY minute_ts
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT date_id,
  COUNT(*) AS total_minutes,
  COUNT(CASE WHEN value IS NOT NULL THEN 1 END) AS actual_cnt,
  COUNT(CASE WHEN value IS NULL THEN 1 END) AS interpolated_cnt,
  ROUND(CAST(COUNT(CASE WHEN value IS NULL THEN 1 END) AS DOUBLE) * 100.0
        / COUNT(*), 2) AS interp_rate_pct
FROM f
GROUP BY date_id
ORDER BY date_id
"""


INTERPOLATE_MINUTES_NEAREST2_WINDOWED_SQL = f"""
WITH obs AS ({_OBS_BOUNDED_SQL}), {_GRID_SQL},
missing AS (
  SELECT event_type, date_id, minute_ts FROM g WHERE value IS NULL
),
near AS (
  SELECT m.event_type, m.date_id, m.minute_ts, o.minute_ts AS t, o.value AS v,
         ROW_NUMBER() OVER (
           PARTITION BY m.event_type, m.date_id, m.minute_ts
           ORDER BY ABS(date_diff('second', o.minute_ts, m.minute_ts)), o.minute_ts
         ) AS rn
  FROM missing m JOIN obs o USING (event_type, date_id)
),
pair AS (
  SELECT event_type, date_id, minute_ts,
    MAX(CASE WHEN rn = 1 THEN t END) AS t1,
    MAX(CASE WHEN rn = 1 THEN v END) AS v1,
    MAX(CASE WHEN rn = 2 THEN t END) AS t2,
    MAX(CASE WHEN rn = 2 THEN v END) AS v2
  FROM near WHERE rn <= 2 GROUP BY 1, 2, 3
)
SELECT event_type, date_id, minute_ts,
  CASE WHEN t2 IS NULL OR t1 = t2 THEN v1
       ELSE v1 + CAST(date_diff('second', t1, minute_ts) AS DOUBLE)
                 * (v2 - v1)
                 / CAST(date_diff('second', t1, t2) AS DOUBLE)
  END AS value,
  TRUE AS is_interpolated
FROM pair
UNION ALL
SELECT event_type, date_id, minute_ts, value, FALSE AS is_interpolated
FROM obs
ORDER BY event_type, date_id, minute_ts
"""


def gapfill_locf(
    spark: SparkSession,
    sf_dir: str,
    date_lo: int | None = None,
    date_hi: int | None = None,
) -> DataFrame:
    """T2's carry-forward mode (LOCF) on the minute grid; the oracle
    states the same fill as an IGNORE NULLS running last_value frame over
    the gap-filled grid.

    Defaults to the full event history; pass ``date_lo``/``date_hi``
    (yyyymmdd ints) to bound the scan."""
    obs = _event_minutes(spark, sf_dir, date_lo, date_hi)
    filled = TS.fill_locf(obs, KEYS)
    return (
        TS.with_minute_ts(filled)
        .select(*KEYS, "minute_ts", "value", "is_filled")
        .orderBy(*KEYS, "minute_ts")
    )


def gapfill_locf_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF bound to the 6-day adjudication window."""
    return gapfill_locf(spark, sf_dir, TS_WINDOW_LO, TS_WINDOW_HI)


GAPFILL_LOCF_WINDOWED_SQL = f"""
WITH obs AS ({_OBS_BOUNDED_SQL}), {_GRID_SQL}
SELECT event_type, date_id, minute_ts,
       last_value(value IGNORE NULLS) OVER (
         PARTITION BY event_type, date_id ORDER BY minute_ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS value,
       (value IS NULL) AS is_filled
FROM g
ORDER BY event_type, date_id, minute_ts
"""


ROLLING_WINDOW_MINUTES = 7


def rolling_minute_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-minute moving average over the per-type minute series —
    the smoothing pass of any monitoring/reporting layer, and the
    explicit ROWS-frame window the reference never needed (SURVEY §2.5
    notes its windows are frameless).

    The frame sum accumulates the 6dp-rounded minute means in DECIMAL:
    within a sorted frame the order is defined, but decimal keeps the
    result independent of how Spark merges partial buffers — same policy
    as every other sum. One shuffle on event_type, one sort.
    """
    from pyspark.sql import Window

    obs = _event_minutes(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("minute_epoch")
        .rowsBetween(-(ROLLING_WINDOW_MINUTES - 1), 0)
    )
    val_dec = F.col("value").cast("decimal(18,6)")
    return (
        TS.with_minute_ts(
            obs.select(
                "event_type",
                "minute_epoch",
                F.round(
                    F.sum(val_dec).over(w).cast("double")
                    / F.count(F.lit(1)).over(w),
                    6,
                ).alias("rolling_avg"),
                F.count(F.lit(1)).over(w).alias("n_in_window"),
            )
        )
        .select("event_type", "minute_ts", "rolling_avg", "n_in_window")
        .orderBy("event_type", "minute_ts")
    )


ROLLING_MINUTE_AVG_SQL = f"""
WITH obs AS ({_OBS_SQL})
SELECT event_type, minute_ts,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
             / COUNT(*) OVER w, 6) AS rolling_avg,
       COUNT(*) OVER w AS n_in_window
FROM obs
WINDOW w AS (PARTITION BY event_type ORDER BY minute_ts
             ROWS BETWEEN {ROLLING_WINDOW_MINUTES - 1} PRECEDING
                      AND CURRENT ROW)
ORDER BY event_type, minute_ts
"""


# ------------------------------------------------- anomaly detection

ZSCORE_WINDOW = 60  # trailing minutes feeding the rolling baseline
ZSCORE_MIN_N = 30  # minimum observations before a verdict is allowed
ZSCORE_TAU = 2.5


def minute_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection over the per-type minute series:
    each minute is scored against the trailing 60-minute baseline
    (current row excluded, verdicts gated on >= 30 observations) and only
    |z| > 2.5 breaches are returned — the
    alerting pass a monitoring layer runs downstream of the reference's
    minute rollups (rebuild_all_time_interpolation.py:74-99 grain).

    Determinism: the rolling moments accumulate the 6-dp minute means as
    DECIMAL(18,6) and their exact decimal squares (decimal x decimal is
    exact in both engines), so mean and variance derive from identical
    rationals; every subsequent double op (divide, subtract, sqrt) is
    IEEE-deterministic. One shuffle on event_type, one sort.

    The rolling sums are computed as DIFFERENCES OF RUNNING SUMS
    (cum(t-1) − cum(t-61)) rather than a 60-row sliding frame:
    WindowExec evaluates a running (UNBOUNDED PRECEDING) frame
    incrementally in O(1) per row but rescans sliding frames in
    O(width) per row, so the prefix-sum form drops the window pass from
    O(rows × width) to O(rows) — the formulation that survives wide
    baselines at scale. Decimal addition is associative, so the
    difference is bit-equal to the frame sum: the DuckDB oracle keeps
    the literal ROWS-frame spec, and the differential gate is therefore
    also a proof that the rewrite preserves the frame semantics exactly.
    """
    from pyspark.sql import Window

    obs = _event_minutes(spark, sf_dir)
    wc = (
        Window.partitionBy("event_type")
        .orderBy("minute_epoch")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wo = Window.partitionBy("event_type").orderBy("minute_epoch")
    vi = F.col("value").cast("decimal(18,6)")
    zero1 = F.lit(0).cast("decimal(28,6)")
    zero2 = F.lit(0).cast("decimal(38,12)")
    cum = obs.select(
        "event_type",
        "minute_epoch",
        "value",
        F.row_number().over(wo).alias("rn"),
        F.sum(vi).over(wc).cast("decimal(28,6)").alias("c1"),
        F.sum(vi * vi).over(wc).cast("decimal(38,12)").alias("c2"),
    )
    scored = cum.select(
        "event_type",
        "minute_epoch",
        "value",
        F.least(F.col("rn") - 1, F.lit(ZSCORE_WINDOW)).alias("n_win"),
        (
            F.coalesce(F.lag("c1", 1).over(wo), zero1)
            - F.coalesce(F.lag("c1", ZSCORE_WINDOW + 1).over(wo), zero1)
        ).cast("double").alias("s1"),
        (
            F.coalesce(F.lag("c2", 1).over(wo), zero2)
            - F.coalesce(F.lag("c2", ZSCORE_WINDOW + 1).over(wo), zero2)
        ).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n_win")
    var = F.col("s2") / F.col("n_win") - mean * mean
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        TS.with_minute_ts(
            scored.withColumn("zscore", z)
            .filter(F.col("n_win") >= ZSCORE_MIN_N)
            .filter(var > 0)
            .filter(F.abs(F.col("zscore")) > ZSCORE_TAU)
        )
        .select(
            "event_type",
            "minute_ts",
            "value",
            F.round(mean, 6).alias("win_mean"),
            F.round("zscore", 6).alias("zscore"),
            F.col("n_win").alias("n_in_window"),
        )
        .orderBy("event_type", "minute_ts")
    )


MINUTE_ANOMALY_ZSCORE_SQL = f"""
WITH obs AS ({_OBS_SQL}),
scored AS (
  SELECT event_type, minute_ts, value,
         COUNT(*) OVER w AS n_win,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s1,
         CAST(SUM(CAST(value AS DECIMAL(18,6))
                  * CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s2
  FROM obs
  WINDOW w AS (PARTITION BY event_type ORDER BY minute_ts
               ROWS BETWEEN {ZSCORE_WINDOW} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, minute_ts, value,
       ROUND(s1 / n_win, 6) AS win_mean,
       ROUND((value - s1 / n_win)
             / sqrt(s2 / n_win - (s1 / n_win) * (s1 / n_win)), 6) AS zscore,
       n_win AS n_in_window
FROM scored
WHERE n_win >= {ZSCORE_MIN_N}
  AND s2 / n_win - (s1 / n_win) * (s1 / n_win) > 0
  AND abs((value - s1 / n_win)
          / sqrt(s2 / n_win - (s1 / n_win) * (s1 / n_win))) > {ZSCORE_TAU}
ORDER BY event_type, minute_ts
"""
