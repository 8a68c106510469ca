"""Bounded-memory EXACT heavy hitters (Misra–Gries two-pass).

The q178 count-min sketch gives frequency *estimates* with one-sided
error; this module gives the *exact* heavy-hitter set with a
completeness guarantee, using bounded memory where a plain
``groupBy(key).count()`` would spill: at web-corpus vocabulary sizes
(billions of distinct n-grams across 100 TB) the map-side hash
aggregate holds one counter per distinct key per task and spills to
disk, while a Misra–Gries summary holds exactly ``m`` counters per
task no matter how many distinct keys stream through it.

Two-pass protocol (Misra & Gries 1982; merge rule from Agarwal et al.,
"Mergeable Summaries", PODS 2012):

1. CANDIDATES — per-partition MG summaries of size ``m`` via
   Arrow-batched ``mapInPandas`` (each batch is exact-counted
   vectorised, then MG-merged into the partition state: add counts,
   subtract the (m+1)-th largest, keep positives). Pigeonhole: if an
   item's GLOBAL count exceeds n/(m+1), some partition has a local
   count above n_p/(m+1), so the item survives that partition's
   summary — the union of summaries is a guaranteed superset of the
   true heavy-hitter set for ANY partitioning of the input.
2. VERIFY — exact recount of candidates only (broadcast semi-join →
   groupBy over ≤ m·n_partitions keys, never the full vocabulary),
   filtered by the exact integer test ``cnt·(m+1) > n``.

The final output is therefore partition-independent and exact — the
determinism the oracle gate needs — while the only unbounded-state
operator in the plan (the recount groupBy) runs over a key set capped
by the summaries, not by the corpus.

Reference parity: no heavy-hitter op exists in the reference
(SURVEY.md §2.14 north-star surface); the closest analogue is its
top-k notebook cells, which sort the full aggregate.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import pandas as pd

from pyspark import cloudpickle
from pyspark.sql import DataFrame, functions as F

# Python workers cannot `import football_lakehouse_spark` (the package is
# not on their path when a driver harness runs from another cwd), so this
# module ships BY VALUE inside the mapInPandas closure — the same worker-
# shipping contract as operators/multimodal.py.
cloudpickle.register_pickle_by_value(sys.modules[__name__])


def _mg_merge(state: dict[str, int], batch: dict[str, int], m: int) -> dict[str, int]:
    """Mergeable-summaries MG merge: pointwise add, then truncate to the
    top ``m`` counters by subtracting the (m+1)-th largest count."""
    for k, v in batch.items():
        state[k] = state.get(k, 0) + int(v)
    if len(state) > m:
        sub = sorted(state.values(), reverse=True)[m]
        state = {k: v - sub for k, v in state.items() if v > sub}
    return state


def misra_gries_candidates(items: DataFrame, col: str, m: int) -> DataFrame:
    """Per-partition Misra–Gries summaries of ``items[col]`` (size ≤ m
    each). Returns ``(item string, residual bigint)`` — the union of the
    partition summaries, a superset of every item whose global count
    exceeds n/(m+1). Arrow-batched; per-task memory is O(m + batch)."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict[str, int] = {}
        for pdf in batches:
            counts = pdf[col].value_counts()
            state = _mg_merge(state, counts.to_dict(), m)
        if state:
            yield pd.DataFrame(
                {"item": list(state.keys()), "residual": list(state.values())}
            )

    return items.select(F.col(col).cast("string").alias(col)).mapInPandas(
        summarize, "item string, residual bigint"
    )


def exact_heavy_hitters(
    items: DataFrame, col: str, m: int, scale: int = 1_000_000
) -> DataFrame:
    """Exact heavy hitters: every item with count > n/(m+1), with its
    exact count and floor share in 1/scale units. See module docstring
    for the two-pass bound."""
    # dunder-rename the candidate column so the semi-join condition never
    # collides with an input column named "item" (AMBIGUOUS_REFERENCE)
    cands = (
        misra_gries_candidates(items, col, m)
        .select(F.col("item").alias("__mg_item"))
        .distinct()
    )
    total = items.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        # compare as STRING on both sides — the candidate pass cast to
        # string, and a native bigint == string comparison would coerce
        # both to double, mis-matching ids above 2^53
        items.join(
            F.broadcast(cands),
            items[col].cast("string") == F.col("__mg_item"),
            "left_semi",
        )
        .groupBy(F.col(col).alias("item"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_item"))
        .crossJoin(F.broadcast(total))
        # same decimal discipline for the pigeonhole test: n_item·(m+1)
        # in bigint errors under ANSI past ~9.2e18/(m+1) global counts
        .where(F.expr(f"cast(n_item as decimal(38,0)) * {m + 1} > n"))
        .select(
            "item",
            "n_item",
            # decimal product: bigint n_item * scale wraps past ~9.2e12
            # counts (inside the 100 TB envelope); decimal(38,0) does not
            F.expr(f"cast(n_item as decimal(38,0)) * {scale} div n")
            .cast("bigint")
            .alias("share_ppm"),
        )
    )
