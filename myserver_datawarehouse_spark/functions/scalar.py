"""Scalar expression surface (reference P1, P13-P15, SURVEY.md §2.2/2.8).

Everything here is native Spark expressions — zero Python UDFs
(SURVEY.md §2.11 target).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def currency_normalize(currency: Column | str, price: Column | str) -> Column:
    """CASE WHEN currency normalization (fact_gold_price.py:57-60):
    IRR -> ROUND(price/10), IRT -> ROUND(price), else NULL (SQL CASE
    fall-through). Spark ``round`` is HALF_UP like Postgres numeric ROUND.
    """
    cur = F.col(currency) if isinstance(currency, str) else currency
    p = F.col(price) if isinstance(price, str) else price
    return (
        F.when(cur == "IRR", F.round(p / 10))
        .when(cur == "IRT", F.round(p))
    )


def color_for_name(name: Column | str) -> Column:
    """Deterministic color hash ``'#' + md5(name)[:6]``
    (populate_sources_dag.py:62-72)."""
    n = F.col(name) if isinstance(name, str) else name
    return F.concat(F.lit("#"), F.substring(F.md5(n), 1, 6))


def duration_hhmm(minute_count: Column | str) -> Column:
    """Minutes -> 'HH:MM' presentation string via LPAD/FLOOR/ROUND/CONCAT —
    expression-for-expression the reference's duration formatting
    (cheap_expensive_chart.py:74-78)."""
    m = F.col(minute_count) if isinstance(minute_count, str) else minute_count
    hours = F.floor(m / 60).cast("int")
    mins = (m % 60).cast("int")
    return F.concat(
        F.lpad(hours.cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad(mins.cast("string"), 2, "0"),
    )


def lenient_cast(col: Column | str, dtype: str = "double") -> Column:
    """P16 lenient numeric coercion (fact_gold_price.py:96-99's
    pd.to_numeric(errors='coerce')): unparsable values become NULL
    instead of failing the job — Spark's try_cast."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(dtype)


def reconstruct_timestamp(date_string: Column | str, time_string: Column | str) -> Column:
    """P8 timestamp reconstruction from dimension strings
    (fact_gold_price.py:273: date_string + ' ' + minutefullstring24)."""
    d = F.col(date_string) if isinstance(date_string, str) else date_string
    t = F.col(time_string) if isinstance(time_string, str) else time_string
    return F.to_timestamp(F.concat_ws(" ", d, t), "yyyy-MM-dd HH:mm:ss")


def md5_fingerprint(text: Column | str, length: int = 16) -> Column:
    """Exact-content fingerprint: md5 hex prefix."""
    t = F.col(text) if isinstance(text, str) else text
    return F.substring(F.md5(t), 1, length)
