"""Advanced relational operators beyond the reference surface: as-of
join (temporal), approximate aggregates, bucketed co-located joins.
These are the idiomatic-Spark additions SURVEY.md §2.4/§2.5 flags as
cheap built-ins the engine should expose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from football_lakehouse_spark.catalog import load_table
from football_lakehouse_spark.operators.asof import asof_join
from football_lakehouse_spark.plans.registry import query


@query(
    "q49_asof_join",
    oracle="""
    SELECT a.event_id, a.user_id,
           strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           a.event_type,
           b.event_id AS asof_event_id,
           b.value AS asof_value
    FROM events a
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id AND a.ts > b.ts
    """,
    doc="As-of (temporal) join: each event annotated with the latest "
    "STRICTLY-prior purchase of the same user. Implemented as the "
    "union+window forward-fill (one shuffle + one sort — no range "
    "explosion, no Python); oracle is DuckDB's native ASOF JOIN, so two "
    "completely different algorithms must agree.",
    bench=True,
    tags=("advanced", "join"),
)
def asof_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    joined = asof_join(
        ev,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        payload=["event_id", "value"],
        strictly_before=True,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "event_type",
        F.col("asof_event_id"),
        F.col("asof_value"),
    )


@query(
    "q50_approx_stats",
    oracle=None,  # sketch-based: HLL/KLL differ across engines by design;
    # error bounds vs exact values asserted in tests/test_advanced.py
    doc="Approximate aggregates (SURVEY §2.4 note: built-ins worth exposing): "
    "approx_count_distinct (HLL) + percentile_approx (KLL-style) per "
    "order-month over lineitem.",
    tags=("advanced",),
)
def approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q64_range_join",
    oracle="""
    SELECT p.event_id, p.user_id,
           count(e.event_id) AS n_prior,
           CAST(sum(CAST(floor(e.value * 1000000.0 + 0.5) AS HUGEINT)) // 10000
                AS DOUBLE) / 100 AS sum_prior_value
    FROM events p LEFT JOIN events e
      ON e.user_id = p.user_id
     AND e.ts >= p.ts - INTERVAL 1 HOUR
     AND e.ts < p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id
    """,
    doc="Interval/range join: each purchase annotated with the count and "
    "value-sum of the same user's events in the preceding hour (the "
    "attribution-window shape). Implemented as the BANDED equi-join "
    "(operators/range_join.py) — time buckets of exactly the window span "
    "become a second join key, so the plan is a plain equi-shuffle, never "
    "a per-key cross product; the oracle is DuckDB's native range join, "
    "so two different algorithms must agree.",
    tags=("advanced", "join"),
)
def range_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from football_lakehouse_spark.functions.scalars import money_sum
    from football_lakehouse_spark.operators.range_join import banded_prior_window_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    cand = banded_prior_window_join(
        purchases,
        ev,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        window_micros=3_600_000_000,
        payload=["value"],
    )
    agg = cand.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("__n"),
        money_sum(F.col("__p_value")).alias("sum_prior_value"),
    )
    return (
        purchases.select("event_id", "user_id")
        .join(agg, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n_prior"),
            F.col("sum_prior_value"),
        )
    )


@query(
    "q79_salted_hot_key_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(l_extendedprice * 1000000.0 + 0.5) AS HUGEINT))
                // 10000 AS DOUBLE) / 100 AS sum_l_extendedprice
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Hot-key aggregation via explicit salting (operators/bucketing."
    "salted_aggregate): l_returnflag has only 3 values, so a naive "
    "groupBy lands the whole table on 3 reducers — the canonical skew "
    "case AQE does NOT rebalance (it splits skewed JOIN partitions, "
    "not agg groups). The salted form spreads each hot key over 16 "
    "(key, salt) partials, then merges 3x16 tiny partials; the sums "
    "are micro-unit-quantised integers so the two-phase result is "
    "bit-identical to the single-phase oracle. At 100 TB this is the "
    "difference between 3 straggler reducers and even utilisation.",
    tags=("advanced", "skew"),
)
def salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from football_lakehouse_spark.operators.bucketing import salted_aggregate

    li = load_table(spark, sf_dir, "lineitem")
    return salted_aggregate(
        li.select("l_returnflag", "l_extendedprice"),
        key="l_returnflag",
        n_salt=16,
        sums=["l_extendedprice"],
    )


@query(
    "q80_bucketed_join",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(floor(l_extendedprice * 1000000.0 + 0.5) AS HUGEINT))
                // 10000 AS DOUBLE) / 100 AS sum_price
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
    doc="Co-located fact-fact join via bucketing (operators/bucketing."
    "write_bucketed): both sides are persisted bucketed+sorted on the "
    "order key, so the join reads co-located buckets with ZERO "
    "exchange on either side — the layout investment that amortises "
    "repeated 100 TB fact-fact joins (vs paying a full shuffle per "
    "query). The only exchange left in the plan is the tiny post-join "
    "status rollup. Uses persistent scratch + lazy readers (no "
    "driver-side materialisation).",
    tags=("advanced", "layout"),
)
def bucketed_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from football_lakehouse_spark.functions.scalars import money_sum
    from football_lakehouse_spark.operators.bucketing import (
        read_bucketed_join,
        write_bucketed,
    )
    from football_lakehouse_spark.scratch import scratch_dir

    root = scratch_dir("q80_bucketed_join")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice")
    )
    for name in ("q80_orders", "q80_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    write_bucketed(orders, "q80_orders", os.path.join(root, "orders"), "o_orderkey")
    write_bucketed(items, "q80_lineitem", os.path.join(root, "lineitem"), "o_orderkey")
    joined = read_bucketed_join(spark, "q80_orders", "q80_lineitem", "o_orderkey")
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        money_sum(F.col("l_extendedprice")).alias("sum_price"),
    )
