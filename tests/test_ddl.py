"""DDL/catalog surface (SURVEY §2.12): idempotent create, view,
smoke roundtrip, listings."""

from __future__ import annotations

from football_lakehouse_spark.lakehouse.ddl import (
    catalog_report,
    create_or_replace_view,
    create_schema,
    create_table,
    smoke_roundtrip,
)


def test_smoke_roundtrip(spark, tmp_path):
    got = smoke_roundtrip(spark, "fls_smoke", str(tmp_path))
    rows = got.collect()
    assert [(r.id, r.note) for r in rows] == [(1, "hello")]


def test_idempotent_ddl_and_views(spark, tmp_path):
    create_schema(spark, "fls_ddl")
    create_schema(spark, "fls_ddl")  # idempotent
    create_table(
        spark, "fls_ddl.t1", "k INT, d DATE", partitioned_by="d",
        location=str(tmp_path / "t1"),
    )
    create_table(  # idempotent re-create
        spark, "fls_ddl.t1", "k INT, d DATE", partitioned_by="d",
        location=str(tmp_path / "t1"),
    )
    spark.sql("INSERT INTO fls_ddl.t1 VALUES (1, DATE '2024-01-01')")
    create_or_replace_view(spark, "fls_ddl.v1", "SELECT k FROM fls_ddl.t1 WHERE k > 0")
    create_or_replace_view(spark, "fls_ddl.v1", "SELECT k FROM fls_ddl.t1")
    assert spark.sql("SELECT * FROM fls_ddl.v1").count() == 1
    tables = {r.tableName for r in catalog_report(spark, "fls_ddl").collect()}
    assert {"t1", "v1"} <= tables
    spark.sql("DROP VIEW fls_ddl.v1")
    spark.sql("DROP TABLE fls_ddl.t1")


def test_three_level_namespace(spark, tmp_path):
    """UC-style catalog.schema.table (reference resources/uc/objects.sql):
    create/use/show at 3 levels; logical catalogs multiplex onto the
    session catalog bijectively; spark_catalog passes through native."""
    from football_lakehouse_spark.lakehouse.ddl import (
        list_schemas,
        resolve_name,
        resolve_schema,
    )

    assert resolve_name("fpl.bronze.events") == "fpl__bronze.events"
    assert resolve_name("spark_catalog.default.t") == "spark_catalog.default.t"
    assert resolve_name("bronze.events") == "bronze.events"
    assert resolve_schema("fpl.bronze") == "fpl__bronze"

    create_schema(spark, "fpl.bronze")
    create_schema(spark, "fpl.silver")
    create_table(
        spark, "fpl.bronze.events_raw", "k INT, v STRING",
        location=str(tmp_path / "events_raw"),
    )
    spark.sql("INSERT INTO fpl__bronze.events_raw VALUES (1, 'x')")
    # 3-level SELECT via the resolver
    got = spark.sql(f"SELECT * FROM {resolve_name('fpl.bronze.events_raw')}")
    assert got.count() == 1

    # listings project back to plain names per catalog
    schemas = {r[0] for r in list_schemas(spark, "fpl").collect()}
    assert {"bronze", "silver"} <= schemas
    default_schemas = {r[0] for r in list_schemas(spark).collect()}
    assert "default" in default_schemas and not any("__" in s for s in default_schemas)
    tables = {r.tableName for r in catalog_report(spark, "fpl.bronze").collect()}
    assert "events_raw" in tables

    # native spark_catalog 3-level passthrough
    create_table(
        spark, "spark_catalog.default.smoke3", "k INT",
        location=str(tmp_path / "smoke3"),
    )
    assert "smoke3" in {r.tableName for r in catalog_report(spark, "default").collect()}
    spark.sql("DROP TABLE spark_catalog.default.smoke3")
    spark.sql("DROP TABLE fpl__bronze.events_raw")
    spark.sql("DROP DATABASE fpl__bronze")
    spark.sql("DROP DATABASE fpl__silver")
