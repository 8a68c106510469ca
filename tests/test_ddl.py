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
