"""Surrogate time-key derivations (reference P2-P8, SURVEY.md §2.2).

The reference keys its fact rows by integer date_id (YYYYMMDD) and time_id
(HHMMSS) derived in Postgres via TO_CHAR (fact_gold_price.py:61-62), and
truncates seconds with ``time_id - time_id % 100``
(fact_gold_price.py:262-266). All of that is pure expression work — it
stays JVM-side inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from myserver_datawarehouse_spark.session import BUSINESS_TZ


def to_business_tz(ts: Column | str, tz: str = BUSINESS_TZ) -> Column:
    """``created_at AT TIME ZONE 'Asia/Tehran'`` (fact_gold_price.py:61-66):
    UTC instant -> business-local wall-clock timestamp."""
    return F.from_utc_timestamp(ts, tz)


def date_id(ts: Column | str) -> Column:
    """``CAST(TO_CHAR(ts,'YYYYMMDD') AS INT)`` (fact_gold_price.py:61)."""
    return F.date_format(ts, "yyyyMMdd").cast("int")


def time_id(ts: Column | str) -> Column:
    """``CAST(TO_CHAR(ts,'HH24MISS') AS INT)`` (fact_gold_price.py:62)."""
    return F.date_format(ts, "HHmmss").cast("int")


def rounded_time_id(tid: Column | str) -> Column:
    """Seconds truncation ``time_id - time_id % 100``
    (fact_gold_price.py:262-266). The reference wraps this in a redundant
    CASE; the plain expression is equivalent for the HHMMSS domain."""
    c = F.col(tid) if isinstance(tid, str) else tid
    return (c - c % 100).cast("int")


def minute_bucket(ts: Column | str) -> Column:
    """True-timestamp minute truncation — the engine-internal replacement
    for HHMMSS integer arithmetic (SURVEY.md §7 risk ii)."""
    return F.date_trunc("minute", ts)
