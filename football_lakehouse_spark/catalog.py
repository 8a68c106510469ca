"""Table catalog over the driver-provided parquet fixtures.

The engine's equivalent of the reference's governed 3-level namespace
(``catalog.schema.table``, SURVEY.md §1.1): a thin loader that
normalises physical quirks once so every operator sees clean, typed
DataFrames. Registers temp views so SQL-form plans work too.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: per-process schema cache — the metastore role a real catalog plays.
#: Parquet schema INFERENCE is a driver-side footer read costing
#: ~0.1 s per call; every query builder re-loads its tables, so the
#: bench paid it dozens of times per pass for immutable fixtures
#: (r14: explicit-schema reads are ~5× cheaper to construct). Keyed on
#: (sf_dir, table, nanosAsLong, mtime) because that legacy flag changes
#: how a TIMESTAMP(NANOS) column surfaces, and the file mtime (r15,
#: ADVICE r14) invalidates the entry when a fixture is regenerated IN
#: PLACE — a contract violation nothing enforced, which previously made
#: renamed/retyped columns come back as NULLs/mis-casts instead of a
#: fresh inference. Caches METADATA only — every scan still reads the
#: parquet data in full; fixture dirs are immutable by contract (a
#: regenerated dir must use a fresh path, which the fuzz / scale
#: generators do).
_schema_cache: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalising storage quirks.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS) which Spark has
    no type for; with ``spark.sql.legacy.parquet.nanosAsLong`` it
    arrives as a long which we truncate to microseconds — the exact
    behaviour DuckDB applies when it reads the same file, so oracle
    comparisons line up.
    """
    path = f"{sf_dir}/{name}.parquet"
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = None  # missing/remote path: let the Spark read report it
    key = (
        sf_dir,
        name,
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false"),
        mtime,
    )
    sch = _schema_cache.get(key)
    if sch is None:
        df = spark.read.parquet(path)
        _schema_cache[key] = df.schema
    else:
        df = spark.read.schema(sch).parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register it as a temp view (by bare name)."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
