"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``football_lakehouse_spark.plans.registry`` — the
engine's single source of truth. Each registered query implements one
operator family from SURVEY.md §2 (or a north-star LLM-data op) and,
where SQL-expressible, carries a DuckDB oracle twin with identical
column aliases.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from football_lakehouse_spark.plans import registry


def _tune(spark: SparkSession) -> None:
    """Engine configs that are runtime-settable — applied here because
    the driver owns SparkSession construction. All verified settable
    post-build on Spark 4."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set(
        "spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set(
        "spark.sql.files.minPartitionNum", os.environ.get("SPARK_GRAFT_CPUS", "32")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (fixture-horizon build) on /root/testdata/sf0.001."""
    _tune(spark)
    flagship = registry.REGISTRY["q01_fixture_horizons"]
    return flagship.builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(builder):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _tune(spark)
            return builder(spark, sf_dir)

        return run

    return {name: _wrap(b) for name, b in registry.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query (same aliases)."""
    return registry.all_oracles()
