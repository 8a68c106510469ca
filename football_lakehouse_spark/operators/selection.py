"""Corpus selection under a global token budget.

Training-data curation routinely ends with "take the best documents
until the token budget is spent" (quality-ranked selection). The naive
plan is a single global window cumsum — `Window.orderBy(score)` with no
partition key, which serialises the whole corpus through one task. This
module computes the EXACT same global prefix with distributed pieces:

1. bucket every doc by a coarse score range (map-side),
2. aggregate per-bucket token totals (one tiny shuffle — n_buckets
   rows),
3. window over the BUCKET table (n_buckets rows, driver-scale) to get
   the cumulative tokens of all better buckets,
4. per-bucket doc windows (partitioned by bucket — distributed) for the
   within-bucket running sum,

so ``global_cum(doc) = cum_of_better_buckets + cum_within_bucket(doc)``
holds exactly and no stage ever sees more than one bucket's rows in a
single task. Cliff: a corpus where every doc has the same score
collapses into one bucket — pick ``bucket_width`` so score spread maps
to hundreds of buckets (the same knob IVF has with n_cells).

Reference parity note: the reference lakehouse has no corpus-selection
ops (SURVEY.md §2.14) — north-star surface for LLM pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def token_budget_select(
    docs: DataFrame,
    budget: int,
    score_col: str = "score",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    bucket_width: int = 16,
) -> DataFrame:
    """Exact quality-ranked selection: order docs by (score DESC, id
    ASC) and select the prefix whose cumulative ``tokens_col`` stays
    within ``budget``. Returns every doc with its global running total
    (``cum_tokens``) and the ``selected`` verdict — the boundary doc
    that would overflow the budget is NOT selected (and neither is
    anything after it).

    Equivalent to ``sum(...) OVER (ORDER BY score DESC, id)`` but
    distributed: per-score-bucket windows plus a broadcast bucket-prefix
    table (see module docstring for the decomposition).
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(score_col).cast("bigint").alias("score"),
        F.col(tokens_col).cast("bigint").alias("n_tokens"),
    ).withColumn("bucket", F.floor(F.col("score") / bucket_width).cast("bigint"))

    # per-bucket totals: n_buckets rows — tiny at any corpus scale
    bucket_tot = base.groupBy("bucket").agg(F.sum("n_tokens").alias("btok"))
    w_better = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bucket_prefix = bucket_tot.select(
        "bucket",
        F.coalesce(F.sum("btok").over(w_better), F.lit(0)).alias("cum_before"),
    )

    # within-bucket running sum: partitioned by bucket → distributed
    w_in = (
        Window.partitionBy("bucket")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.join(F.broadcast(bucket_prefix), "bucket")
        .withColumn("cum_in", F.sum("n_tokens").over(w_in))
        .select(
            "doc_id",
            "score",
            "n_tokens",
            (F.col("cum_before") + F.col("cum_in")).alias("cum_tokens"),
            ((F.col("cum_before") + F.col("cum_in")) <= budget).alias("selected"),
        )
    )
