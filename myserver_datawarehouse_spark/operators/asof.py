"""As-of joins (backward and forward): enrich each left row with the
nearest right row at-or-before (backward) or at-or-after (forward) its
timestamp, per key.

The reference's nearest-2 interpolation is its only as-of-shaped
computation (SURVEY.md §2.3 note); a training-data pipeline needs the
general primitive (join features/labels/prices "as of" an event time).

Spark-first design — NO join at all: tag both sides, union, and carry the
right side's payload forward with one `last(..., ignorenulls=True)`
window. One shuffle (hash by key), one sort (ts within key) — the same
cost as a sort-merge join's shuffle, but skew-proof against hot right
keys (no pair blowup: each row is touched once) and linear in rows, not
in candidate pairs like a range-join formulation.

Correctness details:
- The right payload is carried as ONE struct, so a right row whose
  payload columns are NULL still wins over an older non-null row
  (matching ASOF semantics; per-column `last ignorenulls` would not).
- Tie handling at equal timestamps is explicit: inclusive (r.ts <= l.ts,
  the default, right rows sort before left rows) or strict (r.ts < l.ts,
  left first).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: every left row, plus `payload_cols` from the
    latest right row with r.ts <= l.ts (or < when strict) and equal keys;
    NULL payload when no such right row exists.

    Right rows should be unique per (keys, ts) — pre-aggregate if not;
    otherwise which same-timestamp row wins is partition-order-dependent.
    """
    left_cols = [c for c in left.columns]
    # Equal-ts ordering decides inclusivity: inclusive puts right rows
    # first (visible to same-ts left rows); strict puts left rows first.
    tie = F.col("_is_left").asc() if not strict else F.col("_is_left").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), tie)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = _tagged_union(
        left, right, keys, ts_col, payload_cols
    ).withColumn("_carry", F.last("_p", ignorenulls=True).over(w))
    return carried.filter(F.col("_is_left")).select(
        *left_cols,
        *[F.col(f"_carry.{c}").alias(c) for c in payload_cols],
    )

def _tagged_union(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Union of left rows (payload NULL) and right rows (left columns
    NULL except keys/ts), with `_is_left` tag and `_p` payload struct —
    the shared input of both as-of directions."""
    left_cols = [c for c in left.columns]
    payload_struct = F.struct(*[F.col(c) for c in payload_cols])
    lt = left.select(
        *left_cols,
        F.lit(True).alias("_is_left"),
        F.lit(None).cast(
            right.select(payload_struct.alias("_p")).schema["_p"].dataType
        ).alias("_p"),
    )
    rt = right.select(
        *[
            F.col(c) if c in [*keys, ts_col] else F.lit(None).cast(
                left.schema[c].dataType
            ).alias(c)
            for c in left_cols
        ],
        F.lit(False).alias("_is_left"),
        payload_struct.alias("_p"),
    )
    return lt.unionByName(rt)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    strict: bool = False,
) -> DataFrame:
    """Forward twin of `asof_join_backward`: every left row, plus
    `payload_cols` from the EARLIEST right row with r.ts >= l.ts (or >
    when strict) and equal keys; NULL payload when none exists. Same
    union-and-carry shape, with `first(..., ignorenulls)` over the
    following frame instead of `last` over the preceding one — identical
    one-shuffle/one-sort cost and skew posture.
    """
    left_cols = [c for c in left.columns]
    # Inclusive: right rows at the same ts sort AFTER left rows, landing
    # inside the left row's [current, following] frame; strict flips it.
    tie = F.col("_is_left").desc() if not strict else F.col("_is_left").asc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), tie)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = _tagged_union(
        left, right, keys, ts_col, payload_cols
    ).withColumn("_carry", F.first("_p", ignorenulls=True).over(w))
    return carried.filter(F.col("_is_left")).select(
        *left_cols,
        *[F.col(f"_carry.{c}").alias(c) for c in payload_cols],
    )
