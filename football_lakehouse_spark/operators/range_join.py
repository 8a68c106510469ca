"""Banded range (interval) join — the scale path for time-window joins.

The naive form — ``l JOIN r ON l.key = r.key AND r.ts BETWEEN l.ts - W
AND l.ts`` — gives Catalyst only the equi-key to shuffle on, so every
key's full history meets every probe row: O(n·m) per key, quadratic on
hot keys. The banded form quantises time into buckets of exactly the
window span W and turns the range predicate into a second equi-join
key: a right row at time t can only match left rows in bucket
``floor(t/W)`` or ``floor(t/W)+1``, so the right side is exploded to
those two buckets and the join runs as a plain equi-join on
``(key, bucket)`` with the exact range predicate re-checked on the
candidates. Candidate count per pair is exact (the two buckets are
disjoint), so no dedup pass is needed.

Cost: one narrow 2× explode + one equi-shuffle — same topology as any
equi-join, survives 100 TB. The reference has no range joins
(SURVEY.md §2.5 note); this is an engine addition in the spirit of its
fixture-horizon windows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.scalars import epoch_micros


def _micros(df: DataFrame, c: str) -> Column:
    """Timestamp columns (LTZ or NTZ) → epoch microseconds via the
    NTZ-safe shared helper; integer columns pass through (already in
    caller-chosen units, e.g. property tests)."""
    if dict(df.dtypes)[c].startswith("timestamp"):
        return epoch_micros(F.col(c))
    return F.col(c).cast("bigint")


def banded_prior_window_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_micros: int,
    payload: Sequence[str],
) -> DataFrame:
    """Inner-join each left row to the right rows of the same ``key``
    with ``right.ts`` in ``[left.ts - W, left.ts)`` (strictly before the
    left row, at most W earlier). Returns one row per matching pair:
    all left columns plus ``__p_<c>`` for each payload column.

    Timestamps are compared at microsecond precision (``unix_micros``)
    — the fixtures' storage precision, so band membership and the exact
    predicate agree bit-for-bit with a SQL oracle on the same files.
    """
    w = F.lit(window_micros).cast("bigint")
    lm = _micros(left, left_ts)

    def floor_div(c: F.Column) -> F.Column:
        # EXACT floor division on bigints: floor(a / b) promotes to
        # double and mis-buckets past 2^53 (the q91 class — see
        # tests/test_advanced.py::test_ppm_div_exactness_witnesses).
        # Subtracting the non-negative remainder first makes the value
        # exactly divisible, so the decimal division below is an exact
        # integer (no scale-6 rounding can move it) and truncation ==
        # floor for negatives too.
        exact = (c - F.pmod(c, w)).cast("decimal(38,0)")
        return (exact / w).cast("bigint")

    l = left.withColumn("__lm", lm).withColumn("__lb", floor_div(lm))
    rb = floor_div(F.col("__rm"))
    r = right.select(
        F.col(key).alias("__rk"),
        _micros(right, right_ts).alias("__rm"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    ).withColumn("__rb", F.explode(F.array(rb, rb + 1)))
    cand = l.join(
        r,
        (F.col(key) == F.col("__rk"))
        & (F.col("__lb") == F.col("__rb"))
        & (F.col("__rm") >= F.col("__lm") - w)
        & (F.col("__rm") < F.col("__lm")),
    )
    return cand.drop("__rk", "__rb", "__lb", "__rm", "__lm")
