"""Deterministic transfer optimizer — reference SURVEY.md §2 M4/JN5.

Spec (docs/backlog.md:94-100, docs/architecture.md:149-161, output DDL
resources/uc/objects.sql:250-261): given a current squad, a candidate
pool, and constraints (same position, budget, ≤3 per team post-swap),
emit the best transfers maximising expected-points delta, with
``constraint_flags`` and a human-readable ``rationale`` — fully
explainable, no ML in the loop.

Spark-first realisation: a constrained equi-join (position is an
equality key, so this is NOT a cross join — Catalyst hash-joins on
position) + broadcast of the squad + a window rank. At 100 TB-pool
scale the squad and its per-team counts are tiny → both broadcast;
the only big-data pass is one scan of the candidate pool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def best_transfers(
    squad: DataFrame,
    pool: DataFrame,
    *,
    key: str,
    position: str,
    price: str,
    team: str,
    points: str,
    bank: float,
    max_per_team: int = 3,
    top_n: int = 10,
) -> DataFrame:
    """Rank (out, in) swaps. Columns in both inputs: key, position,
    price, team, points. Returns top_n rows with flags + rationale."""
    s = squad.select(
        F.col(key).alias("out_key"),
        F.col(position).alias("out_position"),
        F.col(price).alias("out_price"),
        F.col(team).alias("out_team"),
        F.col(points).alias("out_points"),
    )
    c = pool.select(
        F.col(key).alias("in_key"),
        F.col(position).alias("in_position"),
        F.col(price).alias("in_price"),
        F.col(team).alias("in_team"),
        F.col(points).alias("in_points"),
    )
    team_counts = squad.groupBy(F.col(team).alias("in_team")).agg(
        F.count(F.lit(1)).alias("squad_team_count")
    )

    pairs = (
        c.join(F.broadcast(s), c.in_position == s.out_position)  # position parity
        .join(F.broadcast(team_counts), "in_team", "left")
        .withColumn("squad_team_count", F.coalesce("squad_team_count", F.lit(0)))
        .withColumn("cost_delta", F.round(F.col("in_price") - F.col("out_price"), 2))
        .withColumn("points_delta", (F.col("in_points") - F.col("out_points")).cast("bigint"))
        .withColumn(
            "post_swap_team_count",
            F.col("squad_team_count")
            - F.when(F.col("out_team") == F.col("in_team"), 1).otherwise(0)
            + 1,
        )
    )
    feasible = pairs.where(
        (F.col("cost_delta") <= F.lit(bank))
        & (F.col("post_swap_team_count") <= F.lit(max_per_team))
        & (F.col("points_delta") > 0)
    )
    w = Window.partitionBy("out_key").orderBy(
        F.col("points_delta").desc(), F.col("in_key").asc()
    )
    ranked = feasible.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return (
        ranked.select(
            "out_key",
            "in_key",
            F.col("out_position").alias("position"),
            "cost_delta",
            "points_delta",
            # constant by construction: every row here already passed the
            # feasibility filter (cost<=bank AND team<=max), so re-testing
            # the same predicates could never vary — the SQL oracle pins
            # the same literal (plans/ml_plans.py)
            F.lit("position_ok,budget_ok,team_limit_ok").alias("constraint_flags"),
            F.format_string(
                "swap %s -> %s: +%s points for %s cost within %s bank",
                F.col("out_key").cast("string"),
                F.col("in_key").cast("string"),
                F.col("points_delta").cast("string"),
                F.col("cost_delta").cast("string"),
                F.lit(str(bank)),
            ).alias("rationale"),
        )
        .orderBy(F.col("points_delta").desc(), F.col("out_key").asc())
        .limit(top_n)
    )
