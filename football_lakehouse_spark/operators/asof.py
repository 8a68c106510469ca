"""As-of (temporal) join — a custom operator Spark lacks natively
(pyspark_guide 'Common OLAP patterns'; the reference solves as-of with
its latest-snapshot top-1 idiom, SURVEY.md §2.5 note).

Implemented as the UNION + WINDOW forward-fill pattern, NOT a range
cross-join and NOT per-group ``pd.merge_asof``:

    tag right rows, union with left rows, sort per key by (ts, side),
    forward-fill the right-side payload with ``last(ignorenulls)``,
    keep left rows.

Cost: one shuffle on the join key + one in-partition sort — identical
asymptotics to a regular sort-merge join, no range explosion, no
Python. This is the 100 TB-safe as-of; a banded range join would
re-shuffle per band and ``merge_asof`` would drag every row through
Arrow.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    strictly_before: bool = True,
    tolerance: float | None = None,
    right_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """For each left row, attach the payload of the latest right row
    with ``right.ts < left.ts`` (or <= when not strict) and the same
    key. Left rows with no prior right row keep NULL payload. A NULL
    payload value ON the matched row is returned as NULL (pandas
    ``merge_asof`` parity) — the fill never reaches past the latest
    matching row to an older non-NULL value.

    ``tolerance`` (pandas ``merge_asof(tolerance=...)`` parity): when
    set, the match is kept only if ``left.ts - matched.ts <=
    tolerance`` in the ts columns' own units (seconds for timestamps,
    raw difference for numerics) — the latest prior row IS the nearest,
    so an out-of-tolerance latest means no match. Implemented by
    forward-filling the matched timestamp alongside the payload and
    null-gating in the same projection: zero extra shuffles, the
    staleness test rides the existing window pass.

    Ties inside the right table resolve to the later-sorted row —
    deterministic given a unique right_ts per key. When the raw
    timestamp CAN tie, pass ``right_tiebreak`` (right-side column
    names): equal-ts right rows then sort ascending by the tiebreak and
    the LARGEST tiebreak wins, pinning a run- and partition-independent
    winner instead of whichever row the sort happened to place last.
    """
    # Left columns travel flat (prefixed, right side null-fills them) —
    # struct-packing the row costs an extra per-row copy on both sides
    # of the shuffle and measured ~30% slower at sf0.1.
    ltypes = dict(left.dtypes)
    rtypes = dict(right.dtypes)
    tb = list(right_tiebreak)
    lt = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
        *[F.lit(None).cast(rtypes[c]).alias(f"__p_{c}") for c in payload],
        *[F.lit(None).cast(rtypes[c]).alias(f"__tb_{i}") for i, c in enumerate(tb)],
    )
    rt = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(ltypes[c]).alias(f"__l_{c}") for c in left.columns],
        *[F.col(c).alias(f"__p_{c}") for c in payload],
        *[F.col(c).alias(f"__tb_{i}") for i, c in enumerate(tb)],
    )
    # sort order decides tie semantics: with strictly_before, a left row
    # at the same instant as a right row must NOT see it → left sorts
    # first (0 < 1 on __is_left would break this, so order by ts then
    # __is_left ASC puts right rows (0) before left (1) — i.e. <= ; for
    # strict <, left rows sort before right rows at equal ts.
    tie = F.col("__is_left").desc() if strictly_before else F.col("__is_left").asc()
    # tiebreak columns sort ASC among equal-ts right rows, so last()
    # picks the largest — deterministic when right_ts alone can tie.
    # Left rows carry NULL tiebreaks but are already separated by the
    # __is_left term, so their relative order is irrelevant.
    w = (
        Window.partitionBy("__k")
        .orderBy(
            F.col("__ts").asc(),
            tie,
            *[F.col(f"__tb_{i}").asc() for i in range(len(tb))],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = lt.unionByName(rt)
    # Forward-fill ONE struct carrying the whole matched right row
    # (its ts + every payload column). Filling payload columns
    # individually with last(ignorenulls) is wrong when the LATEST
    # matching right row has a NULL in some payload column: ignorenulls
    # would skip past it to an older row's value, violating merge_asof
    # semantics ("the payload of the latest row, even if NULL") — and
    # with tolerance set, the staleness gate would validate the latest
    # row's ts while the value came from a different, possibly
    # out-of-tolerance row. The struct is non-NULL for every right row,
    # so ignorenulls only skips LEFT rows; all fields travel together.
    # SQL equality/inequality semantics (the q49/q133 DuckDB ASOF
    # oracle): a right row with NULL ts can never satisfy r.ts < l.ts,
    # so it must never become the fill (NULLS-FIRST ordering would
    # otherwise hand its payload to every early left row)
    matched = (
        F.last(
            F.when(
                (F.col("__is_left") == 0) & F.col("__ts").isNotNull(),
                F.struct(
                    F.col("__ts").alias("__m_ts"),
                    *[F.col(f"__p_{c}").alias(c) for c in payload],
                ),
            ),
            ignorenulls=True,
        )
        .over(w)
        .alias("__m")
    )
    keep = ["__is_left", "__k", *[f"__l_{c}" for c in left.columns]]
    if tolerance is not None:
        keep.append("__ts")
    filled = unioned.select(*keep, matched)
    filled = filled.where(F.col("__is_left") == 1)
    # SQL equality semantics: NULL keys never match (the window
    # partition groups NULLs together, so gate the fill instead); a
    # NULL-ts LEFT row likewise has no "prior" (l.ts > r.ts is NULL) —
    # NULLS-FIRST ordering already places it before every non-NULL-ts
    # right row, and NULL-ts right fills are excluded above, so only
    # the key gate needs to be explicit
    filled = filled.withColumn(
        "__m", F.when(F.col("__k").isNotNull(), F.col("__m"))
    )
    if tolerance is not None:
        from football_lakehouse_spark.functions.scalars import epoch_micros

        integral = {"tinyint", "smallint", "int", "bigint"}

        def as_exact(c: F.Column, dtype: str) -> F.Column:
            # EXACT lag arithmetic: dividing each side by 1e6 in double
            # rounded independently, so an exactly-on-boundary match
            # could flip (and bigint ts lost exactness past 2^53).
            # Timestamps compare in integer micros; integral ts columns
            # in DECIMAL(38,0); true doubles keep double (inherent).
            if "timestamp" in dtype:
                return epoch_micros(c)
            if dtype in integral:
                return c.cast("decimal(38,0)")
            return c.cast("double")

        lt_dtype, rt_dtype = ltypes[left_ts], rtypes[right_ts]
        lag = as_exact(F.col("__ts"), lt_dtype) - as_exact(
            F.col("__m.__m_ts"), rt_dtype
        )
        if "timestamp" in lt_dtype:
            # tolerance is seconds; the lag is integer micros — compare
            # against integer micros (the boundary is exact)
            in_tol = lag <= F.lit(int(round(float(tolerance) * 1000000)))
        else:
            in_tol = lag <= F.lit(tolerance)
        out = filled.select(
            *[F.col(f"__l_{c}").alias(c) for c in left.columns],
            *[
                F.when(in_tol, F.col(f"__m.{c}")).alias(f"asof_{c}")
                for c in payload
            ],
        )
        return out
    out = filled.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col(f"__m.{c}").alias(f"asof_{c}") for c in payload],
    )
    return out
