"""Table-format connectors (SURVEY.md §7 Phase 2 risk note;
pyspark_guide 'Sources & sinks': Delta/Iceberg/Hudi jars are not in
this image — gate behind import/classpath checks with the versioned
parquet layer as the functional fallback).

The engine's lakehouse semantics (append/overwrite/MERGE/time travel/
vacuum/compact) are format-agnostic: `LakehouseTable` implements them
on plain parquet + a manifest log; when a delta-spark or Iceberg
runtime IS on the classpath these helpers return native tables instead,
preserving the same call surface.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from football_lakehouse_spark.lakehouse.tables import LakehouseTable


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.catalog.Catalog")
        return True
    except Exception:
        return False


def open_table(
    spark: SparkSession, root: str, schema: str, name: str, partition_by=(),
    prefer: str = "auto",
):
    """Open (or create-on-first-write) a lakehouse table with the best
    available format. ``prefer`` ∈ {auto, parquet, delta}.

    - delta-spark on classpath → DeltaTable-backed implementation would
      be returned here; NOT present in this image, so requesting
      ``prefer='delta'`` raises with a clear message.
    - fallback (always works): manifest-log versioned parquet
      (`lakehouse.tables.LakehouseTable`) with the same semantics.
    """
    if prefer == "delta":
        if not delta_available():
            raise ModuleNotFoundError(
                "delta-spark is not installed in this environment; use "
                "prefer='parquet' (LakehouseTable provides append/overwrite/"
                "MERGE/time-travel/vacuum on parquet + manifest log)"
            )
        raise NotImplementedError(
            "native Delta binding intentionally unimplemented in this image "
            "(no jar to test against); LakehouseTable is the supported path"
        )
    return LakehouseTable(spark, root, schema, name, partition_by=partition_by)
