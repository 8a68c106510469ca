"""Bucketing & skew operators — the physical-layout tools for 100 TB
joins (pyspark_guide 'Partitioning & shuffle').

- :func:`write_bucketed` / :func:`read_bucketed_join`: persist both
  sides bucketed+sorted on the join key so later joins co-locate with
  ZERO exchange (asserted against the physical plan in tests). This is
  what replaces the shuffle for repeated fact-fact joins at scale.
- :func:`salted_aggregate`: two-phase aggregation over a salted key for
  hot-key skew — partial agg on (key, salt) spreads a hot key over N
  reducers, final agg merges. AQE's skew-join handling covers joins;
  salting covers aggregations, which AQE does not rebalance.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from football_lakehouse_spark.functions.scalars import (
    _sum_micros_exact,
    _trunc_div,
    micros,
)

#: fixed-point scale shared with functions.scalars.money_sum
_MONEY_SCALE = 2


def _content_salt(df: DataFrame, n_salt: int) -> F.Column:
    """Deterministic salt in [0, n_salt): xxhash64 over every column
    PLUS the input partition id. Content alone collapses duplicate rows
    onto one salt (zero skew mitigation exactly when rows repeat); the
    partition id spreads cross-partition duplicates while staying
    deterministic under task retries (a retried task recomputes the
    same partition index). Residual: duplicates WITHIN one input
    partition share a salt, bounded by maxPartitionBytes."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns], F.spark_partition_id()),
        F.lit(n_salt),
    ).cast("int")


def write_bucketed(
    df: DataFrame, name: str, path: str, key: str, n_buckets: int = 8
) -> None:
    """Persist as an external bucketed+sorted table: later equi-joins /
    aggregations on ``key`` read co-located, pre-sorted buckets."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(name)
    )


def read_bucketed_join(
    spark: SparkSession, left_name: str, right_name: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables — Catalyst elides both exchanges."""
    return spark.table(left_name).join(spark.table(right_name), key)


def salted_aggregate(
    df: DataFrame,
    key: str,
    n_salt: int,
    sums: Sequence[str] = (),
    counts: bool = True,
) -> DataFrame:
    """count/sum per key via salted two-phase aggregation. The salt is
    derived from row content + input partition id (not RNG) so the plan
    stays deterministic under task retries; partial results per (key,
    salt) merge exactly for algebraic aggs. Mixing in
    ``spark_partition_id`` matters when the hot key's rows are exact
    duplicates (repeated events, constant payload): a pure content hash
    would collapse them all onto ONE salt and silently degrade to the
    unsalted plan — with the partition id, each (key, salt) group is
    bounded by rows-per-input-partition."""
    salt = _content_salt(df, n_salt)
    shift = 10 ** (6 - _MONEY_SCALE)
    unit = 10 ** _MONEY_SCALE
    partial_aggs = []
    final_aggs = []
    if counts:
        partial_aggs.append(F.count(F.lit(1)).alias("__pn"))
        final_aggs.append(F.sum("__pn").cast("bigint").alias("n"))
    for c in sums:
        # micro-unit quantisation (functions.scalars.micros — the shared
        # portable fixed-point rule): the two-phase salted sum lands on
        # the identical double as the single-phase oracle because
        # integer partials merge exactly
        # bigint-limb partials (r13): the per-row quantised sum is the
        # hot phase — _sum_micros_exact keeps it in codegen'd longs;
        # the final merge sums only n_keys×n_salt decimal partials
        partial_aggs.append(_sum_micros_exact(F.col(c)).alias(f"__ps_{c}"))
        final_aggs.append(
            # _trunc_div, not floor(/): floor reads one cent low on a
            # negative group total and decimal / HALF_UP-rounds first
            (_trunc_div(F.sum(f"__ps_{c}"), F.lit(shift)).cast("double") / unit)
            .alias(f"sum_{c}")
        )
    partial = df.withColumn("__salt", salt).groupBy(key, "__salt").agg(*partial_aggs)
    return partial.groupBy(key).agg(*final_aggs)


def salted_join(fact: DataFrame, dim: DataFrame, key: str, n_salt: int) -> DataFrame:
    """Skew-proof equi-join WITHOUT broadcast: replicate the dim side
    ``n_salt``× (one copy per salt value) and spread fact rows across
    salts by a content-derived hash, so a hot join key lands on
    ``n_salt`` reducers instead of one.

    Where it sits among the skew tools: AQE's skew-join split
    (``spark.sql.adaptive.skewJoin``) rebalances most skewed sort-merge
    joins at runtime and should be the default; explicit salting is for
    the cases it does not cover — a downstream same-key aggregation
    that wants the (key, salt) partials (compose with
    :func:`salted_aggregate`'s merge phase), AQE disabled, or skew so
    extreme one key exceeds a single task's feasible input. The dim
    side pays an ``n_salt``× shuffle volume: use when dim ≪ fact but
    is too large (or too wide) to broadcast — if the dim broadcasts,
    you don't need salt at all, so the join is merge-hinted on purpose.

    INNER joins only — a replicated dim would emit ``n_salt`` NULL
    rows per unmatched outer key. The salt is content+partition-id
    derived (not RNG — see :func:`_content_salt`), so the plan is
    deterministic under retries and re-runs, and a hot key whose rows
    are exact duplicates still spreads across reducers.
    """
    fact_s = fact.withColumn("__salt", _content_salt(fact, n_salt))
    dim_s = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).hint("merge")
    return fact_s.join(dim_s, [key, "__salt"], "inner").drop("__salt")
