"""The composed ranking report and operational probe queries
(cheap_expensive_chart.py:40-84, A7, P8, P16, V4, V5).

`ranking_report` is the reference's flagship analytics query re-expressed
over `events`: per-minute average value per event_type (the "source"),
rank each minute's types cheapest/most-expensive, then per type count the
minutes won and format the share of the day as the reference's HH:MM
duration string. Rounding inside the duration formula uses the explicit
floor(x + 0.5) form in BOTH engines — Spark ROUND is HALF_UP while
DuckDB's double ROUND is banker's, so the naive translation drifts on
exact midpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from myserver_datawarehouse_spark.functions.scalar import (
    color_for_name,
    duration_hhmm,
    lenient_cast,
    reconstruct_timestamp,
)
from myserver_datawarehouse_spark.sources.tables import load_table


def _pad2(c):
    return F.lpad(c.cast("int").cast("string"), 2, "0")


def _duration_expr(cnt, total):
    """Reference duration formula (cheap_expensive_chart.py:73-78) with
    engine-neutral rounding: frac rounded to 2dp, scaled to 24h, minutes
    rounded half-up via floor(x + 0.5)."""
    frac = F.floor(cnt * 100.0 / total + 0.5) / 100.0
    hours = F.floor(frac * 24)
    mins = F.floor((frac * 24 - hours) * 60 + 0.5)
    return F.concat(_pad2(hours), F.lit(":"), _pad2(mins))


def ranking_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest + most-expensive winners per minute, composed W1/W2/W3 +
    P14 color + P15 duration (cheap_expensive_chart.py:40-84). Restricted
    to the latest event date (the reference's `dd.yesterday = 1`), joined
    declaratively via a broadcast scalar frame rather than a collect().
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    max_day = e.agg(F.max(F.to_date("ts")).alias("max_day"))
    mt = (
        e.join(F.broadcast(max_day), F.to_date("ts") == F.col("max_day"))
        .groupBy(
            F.date_trunc("minute", "ts").alias("minute_ts"),
            F.col("event_type").alias("source"),
        )
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count("value"),
                6,
            ).alias("price")
        )
    )
    w_cheap = Window.partitionBy("minute_ts").orderBy("price", "source")
    w_exp = Window.partitionBy("minute_ts").orderBy(F.col("price").desc(), "source")
    ranked = mt.select(
        "*",
        F.row_number().over(w_cheap).alias("cheap"),
        F.row_number().over(w_exp).alias("expensive"),
    )

    def winners(flag: str) -> DataFrame:
        g = (
            ranked.filter(F.col(flag) == 1)
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("minute_count"))
        )
        total = F.sum("minute_count").over(Window.partitionBy())
        return g.select(
            F.lit(flag).alias("ranking"),
            "source",
            color_for_name("source").alias("color"),
            "minute_count",
            _duration_expr(F.col("minute_count"), total).alias("duration"),
            duration_hhmm(F.col("minute_count")).alias("span_hhmm"),
        )

    return (
        winners("cheap")
        .unionByName(winners("expensive"))
        .orderBy("ranking", F.col("minute_count").desc(), "source")
    )


RANKING_REPORT_SQL = """
WITH e AS (
  SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value
  FROM events WHERE value IS NOT NULL
),
mt AS (
  SELECT date_trunc('minute', ts) AS minute_ts, event_type AS source,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value), 6)
           AS price
  FROM e
  WHERE CAST(ts AS DATE) = (SELECT MAX(CAST(ts AS DATE)) FROM e)
  GROUP BY 1, 2
),
mt2 AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY minute_ts ORDER BY price, source) AS cheap,
    ROW_NUMBER() OVER (PARTITION BY minute_ts ORDER BY price DESC, source)
      AS expensive
  FROM mt
),
wins AS (
  SELECT 'cheap' AS ranking, source, COUNT(*) AS minute_count
  FROM mt2 WHERE cheap = 1 GROUP BY source
  UNION ALL
  SELECT 'expensive' AS ranking, source, COUNT(*) AS minute_count
  FROM mt2 WHERE expensive = 1 GROUP BY source
),
d AS (
  SELECT *,
         FLOOR(minute_count * 100.0
               / SUM(minute_count) OVER (PARTITION BY ranking) + 0.5) / 100.0
           AS frac
  FROM wins
)
SELECT ranking, source,
       '#' || substr(md5(source), 1, 6) AS color,
       minute_count,
       lpad(CAST(CAST(FLOOR(frac * 24) AS INT) AS VARCHAR), 2, '0') || ':'
         || lpad(CAST(CAST(FLOOR((frac * 24 - FLOOR(frac * 24)) * 60 + 0.5) AS INT)
                      AS VARCHAR), 2, '0') AS duration,
       lpad(CAST(CAST(FLOOR(minute_count / 60) AS INT) AS VARCHAR), 2, '0') || ':'
         || lpad(CAST(CAST(minute_count % 60 AS INT) AS VARCHAR), 2, '0')
         AS span_hhmm
FROM d
ORDER BY ranking, minute_count DESC, source
"""


def chart_clock_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11's data side as a first-class query: the EXACT numbers the
    pie-on-clock renderer consumes (cheap_expensive_chart.py:205-247),
    computed in-plan instead of driver-side matplotlib state — per
    (ranking, slice): the legend label ``source (HH:MM)``, the wedge
    fraction, and the wedge's [theta1, theta2) angles under
    matplotlib's convention (startangle=90, counterclockwise), in the
    reference's slice order (minute_count DESC; source tie-break added
    for determinism).

    Plan: composes the adjudicated `ranking_report` output — one
    bounded frame per ranking (|sources| slices), so the windows here
    run over slice-count rows, never facts. Angles derive from
    INTEGER cumulative minute counts divided once at the edge
    (identical IEEE expression tree in both engines), ROUND(6).
    """
    rr = ranking_report(spark, sf_dir)
    wr = Window.partitionBy("ranking")
    word = wr.orderBy(F.col("minute_count").desc(), "source")
    s = rr.select(
        "ranking",
        "source",
        "color",
        "minute_count",
        F.concat(
            F.col("source"), F.lit(" ("), F.col("duration"), F.lit(")")
        ).alias("label"),
        F.row_number().over(word).cast("long").alias("slice_order"),
        F.sum("minute_count").over(wr).alias("t"),
        (F.sum("minute_count").over(word) - F.col("minute_count")).alias(
            "cb"
        ),
        F.sum("minute_count").over(word).alias("ci"),
    )
    return s.select(
        "ranking",
        "slice_order",
        "source",
        "color",
        "label",
        F.round(
            F.col("minute_count").cast("double") / F.col("t"), 6
        ).alias("frac"),
        F.round(
            F.lit(90.0)
            + F.lit(360.0) * (F.col("cb").cast("double") / F.col("t")),
            6,
        ).alias("theta1"),
        F.round(
            F.lit(90.0)
            + F.lit(360.0) * (F.col("ci").cast("double") / F.col("t")),
            6,
        ).alias("theta2"),
    ).orderBy("ranking", "slice_order")


CHART_CLOCK_PAYLOAD_SQL = f"""
WITH rr AS ({RANKING_REPORT_SQL}),
s AS (
  SELECT ranking, source, color, minute_count,
         source || ' (' || duration || ')' AS label,
         ROW_NUMBER() OVER w AS slice_order,
         SUM(minute_count) OVER (PARTITION BY ranking) AS t,
         SUM(minute_count) OVER w - minute_count AS cb,
         SUM(minute_count) OVER w AS ci
  FROM rr
  WINDOW w AS (PARTITION BY ranking ORDER BY minute_count DESC, source)
)
SELECT ranking, slice_order, source, color, label,
       ROUND(CAST(minute_count AS DOUBLE) / t, 6) AS frac,
       ROUND(90.0 + 360.0 * (CAST(cb AS DOUBLE) / t), 6) AS theta1,
       ROUND(90.0 + 360.0 * (CAST(ci AS DOUBLE) / t), 6) AS theta2
FROM s
ORDER BY ranking, slice_order
"""


def freshness_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/A6: per-type freshness + range probe — MAX(timestamp) is the
    reference's staleness check (fact_gold_price.py:446-452)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("event_type")
    )


FRESHNESS_PROBE_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       MIN(CAST(ts AS TIMESTAMP)) AS first_ts,
       MAX(CAST(ts AS TIMESTAMP)) AS last_ts
FROM events
GROUP BY 1
ORDER BY event_type
"""


def timestamp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/P18: rebuild timestamps from dimension-style strings
    (date_string + 'HH:mm:ss', fact_gold_price.py:273) and count exact
    second-truncated roundtrips per type — the bounds check that string
    reconstruction loses nothing."""
    e = load_table(spark, sf_dir, "events")
    rebuilt = reconstruct_timestamp(
        F.date_format("ts", "yyyy-MM-dd"), F.date_format("ts", "HH:mm:ss")
    )
    return (
        e.select(
            "event_type",
            (rebuilt == F.date_trunc("second", F.col("ts")))
            .cast("int")
            .alias("ok"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("ok").alias("n_roundtrip_exact"),
        )
        .orderBy("event_type")
    )


TIMESTAMP_ROUNDTRIP_SQL = """
WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events)
SELECT event_type,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN CAST(strftime(ts, '%Y-%m-%d') || ' '
                              || strftime(ts, '%H:%M:%S') AS TIMESTAMP)
                          = date_trunc('second', ts)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_exact
FROM e
GROUP BY 1
ORDER BY event_type
"""


def source_numeric_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P16 lenient numeric coercion: parse the numeric suffix of
    documents.source with try_cast (unparsable -> NULL, never a job
    failure — pd.to_numeric(errors='coerce') semantics)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "source",
            lenient_cast(F.substring("source", 4, 10), "int").alias("src_num"),
            lenient_cast(F.col("lang"), "int").alias("lang_num"),  # always NULL
        )
        .groupBy("source", "src_num")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("lang_num").alias("n_lang_numeric"),
        )
        .orderBy("src_num", "source")
    )


SOURCE_NUMERIC_IDS_SQL = """
SELECT source,
       TRY_CAST(substr(source, 4, 10) AS INT) AS src_num,
       COUNT(*) AS n_docs,
       COUNT(TRY_CAST(lang AS INT)) AS n_lang_numeric
FROM documents
GROUP BY 1, 2
ORDER BY src_num, source
"""


def sheets_export_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 extract + P19 serialization (gold_price_to_sheets.py:46-82): the
    interpolated fact joined to dim_date (J1, USING date_id) and dim_time
    (J2, ON dt.time_id = fact.rounded_time_id — equi-join on a non-key
    column), one source selected, presentation-sorted (O4), timestamps
    stringified Spark-side. `sinks.SheetsSink.write` collects this frame as
    the `[headers]+rows` grid; the network write is the injectable edge."""
    from myserver_datawarehouse_spark import pipeline as P
    from myserver_datawarehouse_spark.operators import dims as D
    from myserver_datawarehouse_spark.plans.dims import AS_OF, DATE_END, DATE_START
    from myserver_datawarehouse_spark.sinks import serialize_for_export

    fact = P.hourly_pipeline(spark, sf_dir).filter(F.col("event_type") == "click")
    dd = D.build_dim_date(spark, DATE_START, DATE_END, AS_OF).select(
        "date_id", "date_string"
    )
    dt = D.build_dim_time(spark).select("time_id", "minutefullstring24")
    joined = (
        fact.join(F.broadcast(dd), "date_id")
        .join(F.broadcast(dt), fact.rounded_time_id == dt.time_id)
        .orderBy("date_id", fact.time_id)
        .select(
            "date_string",
            "minutefullstring24",
            "minute_ts",
            "value",
            "is_interpolated",
        )
    )
    return serialize_for_export(joined)


from myserver_datawarehouse_spark.plans.flagship import _PIPELINE_CTE  # noqa: E402

SHEETS_EXPORT_FRAME_SQL = f"""
WITH {_PIPELINE_CTE}
SELECT strftime(minute_ts, '%Y-%m-%d') AS date_string,
       strftime(minute_ts, '%H:%M:%S') AS minutefullstring24,
       strftime(minute_ts, '%Y-%m-%d %H:%M:%S') AS minute_ts,
       value,
       is_interpolated
FROM result
WHERE event_type = 'click'
ORDER BY date_id, time_id
"""


def normalized_quotes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The extract-normalize block (fact_gold_price.py:52-68) as a query:
    P1 CASE currency normalization (IRR -> ROUND(price/10), IRT ->
    ROUND(price), unknown -> NULL), P2 business-timezone conversion, P3
    business-local date key, rolled up per (currency, business date) with
    the V3 null-price count.

    The driver's events table has no currency column, so one is derived
    deterministically from event_id (with a sliver of unknown-currency
    rows to exercise the CASE fall-through). Oracle parity: values are
    non-negative, so Spark's HALF_UP ROUND equals FLOOR(x + 0.5), which
    is what the oracle computes (DuckDB's double ROUND is banker's);
    Asia/Tehran has no DST as of 2024, and both engines share IANA tz
    rules for the conversion."""
    from myserver_datawarehouse_spark.functions.keys import date_id, to_business_tz
    from myserver_datawarehouse_spark.functions.scalar import currency_normalize

    e = load_table(spark, sf_dir, "events")
    currency = (
        F.when(F.col("event_id") % 7 == 0, F.lit("XXX"))
        .when(F.col("event_id") % 2 == 0, F.lit("IRR"))
        .otherwise(F.lit("IRT"))
    )
    q = e.select(
        currency.alias("currency"),
        currency_normalize(currency, F.col("value")).alias("price"),
        to_business_tz("ts").alias("local_ts"),
    )
    return (
        q.groupBy("currency", date_id("local_ts").alias("biz_date_id"))
        .agg(
            F.count(F.lit(1)).alias("n_quotes"),
            F.count(F.when(F.col("price").isNull(), 1)).alias("n_null_price"),
            # COALESCE(0): an all-NULL-price group (unknown currency) must
            # not round-trip as NaN through pandas on the Spark side vs NULL
            # on the oracle side
            F.coalesce(
                F.round(
                    F.sum(F.col("price").cast("decimal(18,2)")).cast("double"), 2
                ),
                F.lit(0.0),
            ).alias("sum_price"),
        )
        .orderBy("currency", "biz_date_id")
    )


NORMALIZED_QUOTES_SQL = """
WITH q AS (
  SELECT
    CASE WHEN event_id % 7 = 0 THEN 'XXX'
         WHEN event_id % 2 = 0 THEN 'IRR'
         ELSE 'IRT' END AS currency,
    CASE WHEN event_id % 7 = 0 THEN NULL
         WHEN event_id % 2 = 0 THEN FLOOR(value / 10 + 0.5)
         ELSE FLOOR(value + 0.5) END AS price,
    (CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Tehran'
      AS local_ts
  FROM events
)
SELECT currency,
       CAST(strftime(local_ts, '%Y%m%d') AS INT) AS biz_date_id,
       COUNT(*) AS n_quotes,
       COUNT(CASE WHEN price IS NULL THEN 1 END) AS n_null_price,
       COALESCE(ROUND(CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE), 2), 0.0)
         AS sum_price
FROM q
GROUP BY 1, 2
ORDER BY currency, biz_date_id
"""
