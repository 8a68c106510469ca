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


def test_smoke_roundtrip_is_idempotent_over_same_location(spark, tmp_path):
    """The smoke table is EXTERNAL (explicit LOCATION): DROP removes
    only metadata, so a rerun over the same path used to read the prior
    run's parquet and report a phantom second row."""
    first = smoke_roundtrip(spark, "fls_smoke2", str(tmp_path)).collect()
    second = smoke_roundtrip(spark, "fls_smoke2", str(tmp_path)).collect()
    assert [(r.id, r.note) for r in first] == [(1, "hello")]
    assert [(r.id, r.note) for r in second] == [(1, "hello")]


def test_create_schema_rejects_reserved_separator(spark):
    """A plain schema named like 'audit__2026' would be mistaken for a
    multiplexed catalog__schema database and vanish from the default
    listing — fail closed instead."""
    import pytest as _pytest

    from football_lakehouse_spark.lakehouse.ddl import create_schema

    with _pytest.raises(ValueError, match="reserved separator"):
        create_schema(spark, "audit__2026")


def test_list_schemas_column_name_is_stable_across_branches(spark):
    """Both branches (default catalog and multiplexed catalog) must
    expose the same 'schema_name' column so callers can select it
    without knowing which branch ran."""
    from football_lakehouse_spark.lakehouse.ddl import create_schema, list_schemas

    create_schema(spark, "fls_colname")
    create_schema(spark, "flscat.colname")
    assert list_schemas(spark).columns == ["schema_name"]
    assert list_schemas(spark, "flscat").columns == ["schema_name"]
    assert "fls_colname" in {r.schema_name for r in list_schemas(spark).collect()}
    assert {r.schema_name for r in list_schemas(spark, "flscat").collect()} == {
        "colname"
    }


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
