"""DDL / catalog operators — reference SURVEY.md §2.12: idempotent
schema/table/view DDL, catalog listings, USE-scoping
(``notebooks/00_admin/00_create_uc_objects.py``,
``01_environment_smoke_test.py``, ``02_uc_smoke_and_grants.py``).

All native ``spark.sql``; the reference's 3-level Unity-Catalog names
collapse to ``schema.table`` in the session catalog (SURVEY.md §1.1).
Grants are governance metadata with no local analogue — documented,
not implemented (SURVEY.md §2.12)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_schema(spark: SparkSession, name: str) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def create_table(spark: SparkSession, name: str, ddl_cols: str, using: str = "parquet",
                 partitioned_by: str | None = None, location: str | None = None) -> None:
    """Idempotent CREATE TABLE (reference S6). Adds the PARTITIONED BY
    clause the reference documents but never ships (SURVEY.md §1.4)."""
    parts = f" PARTITIONED BY ({partitioned_by})" if partitioned_by else ""
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({ddl_cols}) USING {using}{parts}{loc}"
    )


def create_or_replace_view(spark: SparkSession, name: str, select_sql: str) -> None:
    spark.sql(f"CREATE OR REPLACE VIEW {name} AS {select_sql}")


def smoke_roundtrip(spark: SparkSession, schema: str, location: str) -> DataFrame:
    """The reference's environment smoke test (01_environment_smoke_test):
    create → insert → read → drop, returning the read-back rows."""
    create_schema(spark, schema)
    t = f"{schema}.smoke_roundtrip"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    create_table(spark, t, "id INT, note STRING, created_ts TIMESTAMP",
                 location=f"{location}/smoke_roundtrip")
    spark.sql(f"INSERT INTO {t} VALUES (1, 'hello', current_timestamp())")
    out = spark.sql(f"SELECT id, note FROM {t}").collect()
    spark.sql(f"DROP TABLE {t}")
    return spark.createDataFrame(out, "id int, note string")


def catalog_report(spark: SparkSession, schema: str) -> DataFrame:
    """SHOW-style catalog listing (reference 02_uc_smoke_and_grants)."""
    return spark.sql(f"SHOW TABLES IN {schema}")
