"""SparkSession factory with the engine's standard configuration.

Mirrors the reference's session conventions (UTC session timezone,
single-node ``local[*]`` envelope — see SURVEY.md §6 / BASELINE.md) while
adding the scale-oriented defaults the reference left implicit: AQE,
shuffle-partition sizing, Arrow transfer for the Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "football_lakehouse_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    At 100 TB the same plan runs on a multi-executor cluster; everything
    here except ``master`` is cluster-valid. ``shuffle_partitions``
    defaults to the core count locally — on a real cluster AQE coalesces
    from a larger initial number, so we enable AQE unconditionally.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # the driver-generated events table stores TIMESTAMP(NANOS);
        # Spark has no nanosecond type, so read as long and normalise in
        # catalog.load_table (truncation to micros matches DuckDB).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # fixture files are tens of MB → one 128 MB split each; force
        # enough input splits to use every core (at real scale files
        # exceed maxPartitionBytes and this floor is a no-op)
        .config("spark.sql.files.minPartitionNum", str(cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "90g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
