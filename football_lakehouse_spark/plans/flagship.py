"""Flagship query: fixture-horizon build (reference EP3 end-to-end).

Re-expresses ``notebooks/04_gold/42_build_fixture_horizons.py`` over
the fixture star schema: lineitem rows play the role of fixtures,
suppliers the role of teams, ship-months the role of gameweeks, and
scaled discount/tax the home/away difficulty readings. One plan that
exercises scan → unpivot-union → range filter → three grouped
aggregates → broadcast left-join assembly → dim join → top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from football_lakehouse_spark.catalog import load_table
from football_lakehouse_spark.operators.horizons import (
    assemble_horizons,
    fused_horizon_features,
    horizon_aggregate,
    unpivot_roles,
    unpivot_roles_fused,
)
from football_lakehouse_spark.plans.registry import query

# Anchor "gameweek": months since 1995-01 (gw 0) — 1996-01 → 12.
ANCHOR_GW = 12

_GW_EXPR = "(year(l_shipdate) - 1995) * 12 + month(l_shipdate) - 1"

FLAGSHIP_ORACLE = f"""
WITH unp AS (
    SELECT l_suppkey AS team_id, {_GW_EXPR} AS gw, l_discount * 10 AS fdr
    FROM lineitem
    UNION ALL
    SELECT l_suppkey AS team_id, {_GW_EXPR} AS gw, l_tax * 10 AS fdr
    FROM lineitem
),
f AS (SELECT * FROM unp WHERE gw >= {ANCHOR_GW}),
h3 AS (
    SELECT team_id, CAST(sum(CAST(floor(fdr * 1000000.0 + 0.5) AS HUGEINT)) // (count(*) * 100) AS DOUBLE) / 10000 AS h3_avg_fdr, count(*) AS h3_n
    FROM f WHERE gw < {ANCHOR_GW + 3} GROUP BY team_id
),
h5 AS (
    SELECT team_id, CAST(sum(CAST(floor(fdr * 1000000.0 + 0.5) AS HUGEINT)) // (count(*) * 100) AS DOUBLE) / 10000 AS h5_avg_fdr, count(*) AS h5_n
    FROM f WHERE gw < {ANCHOR_GW + 5} GROUP BY team_id
),
h8 AS (
    SELECT team_id, CAST(sum(CAST(floor(fdr * 1000000.0 + 0.5) AS HUGEINT)) // (count(*) * 100) AS DOUBLE) / 10000 AS h8_avg_fdr, count(*) AS h8_n
    FROM f WHERE gw < {ANCHOR_GW + 8} GROUP BY team_id
)
SELECT h3.team_id, s.s_name,
       h3.h3_avg_fdr, h3.h3_n,
       h5.h5_avg_fdr, h5.h5_n,
       h8.h8_avg_fdr, h8.h8_n,
       {ANCHOR_GW} AS asof_gw
FROM h3
LEFT JOIN h5 USING (team_id)
LEFT JOIN h8 USING (team_id)
JOIN supplier s ON s.s_suppkey = h3.team_id
ORDER BY h5.h5_avg_fdr ASC, h3.team_id ASC
LIMIT 20
"""


def _gw_col() -> F.Column:
    return (F.year("l_shipdate") - F.lit(1995)) * 12 + F.month("l_shipdate") - F.lit(1)


def _readings() -> dict[str, F.Column]:
    return {
        "home": F.col("l_discount") * 10,
        "away": F.col("l_tax") * 10,
    }


def _finish(fact: DataFrame, supplier: DataFrame) -> DataFrame:
    """Shared tail: broadcast dim join + literal + easiest-fixtures
    top-k (reference O3)."""
    return (
        fact.join(F.broadcast(supplier), fact.team_id == supplier.s_suppkey, "inner")
        .select(
            "team_id",
            "s_name",
            "h3_avg_fdr",
            "h3_n",
            "h5_avg_fdr",
            "h5_n",
            "h8_avg_fdr",
            "h8_n",
            F.lit(ANCHOR_GW).alias("asof_gw"),
        )
        .orderBy(F.col("h5_avg_fdr").asc(), F.col("team_id").asc())
        .limit(20)
    )


@query(
    "q01_fixture_horizons",
    oracle=FLAGSHIP_ORACLE,
    doc="Flagship: horizon FDR build (reference 42_build_fixture_horizons.py; "
    "SURVEY.md §2 U1+P4+P5+A1+JN1+JN2+D1+O3), fused for scale: single "
    "lineitem scan (explode unpivot) + one conditional aggregate replaces "
    "the reference's 3 aggregates + 2 joins — same result, 1 shuffle.",
    bench=True,
    tags=("relational", "flagship"),
)
def fixture_horizons(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    unp = unpivot_roles_fused(lineitem, key="l_suppkey", period=_gw_col(), readings=_readings())
    fact = fused_horizon_features(unp, ANCHOR_GW, (3, 5, 8))
    return _finish(fact, supplier)


@query(
    "q02_horizon_assembly_joins",
    oracle=FLAGSHIP_ORACLE,
    doc="Compositional form of the horizon build, faithful to the reference's "
    "plan shape (SURVEY.md §2 U1 unionByName unpivot, A1 per-horizon "
    "aggregates, JN1 left-join assembly). Verified against the SAME oracle "
    "as q01 — proves the fused rewrite is semantics-preserving.",
    tags=("relational",),
)
def fixture_horizons_compositional(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    unp = unpivot_roles(lineitem, key="l_suppkey", period=_gw_col(), readings=_readings())
    f = unp.where(F.col("gw") >= F.lit(ANCHOR_GW))
    fact = assemble_horizons(
        horizon_aggregate(f, ANCHOR_GW, 3, "h3"),
        horizon_aggregate(f, ANCHOR_GW, 5, "h5"),
        horizon_aggregate(f, ANCHOR_GW, 8, "h8"),
    )
    return _finish(fact, supplier)
