"""Fixture dtype contract — pins the exact schemas (including timestamp
flavour) the engine assumes of the driver-generated parquet at
``/root/testdata/sf*``.

Two environment drifts in two rounds broke operators silently (r2:
driver JSON canonicalisation → q47; r3: ``ts`` columns became
TIMESTAMP_NTZ → q28/q64). This test makes the NEXT drift fail loudly in
exactly one place. If it goes red: the testdata changed shape — audit
every call site that touches the changed column (epoch conversions live
in ``functions/scalars.py:epoch_seconds/epoch_micros``), then update the
pinned schema here and the table in FIXTURES.md.

Checked at two layers because they can drift independently:

- **pyarrow (storage)** — the physical parquet types, for every sf dir,
  without spinning up the JVM.
- **Spark (engine view)** — what ``catalog.load_table`` actually hands
  operators after session config (``nanosAsLong``, NTZ inference) and
  normalisation are applied. This is the layer operators program
  against, so it is the contract that matters; TIMESTAMP vs
  TIMESTAMP_NTZ is visible only here.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from football_lakehouse_spark.catalog import TABLES, load_table

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]

#: physical parquet schema per table: (column, pyarrow type string)
ARROW_SCHEMA = {
    "region": [("r_regionkey", "int32"), ("r_name", "string")],
    "nation": [
        ("n_nationkey", "int32"),
        ("n_name", "string"),
        ("n_regionkey", "int32"),
    ],
    "customer": [
        ("c_custkey", "int64"),
        ("c_name", "string"),
        ("c_nationkey", "int32"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "int64"),
        ("s_name", "string"),
        ("s_nationkey", "int32"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "int64"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int32"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "int64"),
        ("o_custkey", "int64"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp[us]"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "int64"),
        ("l_partkey", "int64"),
        ("l_suppkey", "int64"),
        ("l_linenumber", "int32"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp[us]"),
    ],
    "events": [
        ("event_id", "int64"),
        ("ts", "timestamp[us]"),
        ("user_id", "int64"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "int64"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "int64"),
    ],
    "embeddings": [
        ("vec_id", "int64"),
        ("embedding", "list<element: float>"),
        ("label", "int32"),
    ],
}

#: what catalog.load_table hands operators (Spark simpleString dtypes).
#: Timestamps are TIMESTAMP_NTZ as of round 3's testdata — every epoch
#: conversion must go through the NTZ-safe helpers in functions/scalars.
SPARK_SCHEMA = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [
        ("n_nationkey", "int"),
        ("n_name", "string"),
        ("n_regionkey", "int"),
    ],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp_ntz"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp_ntz"),
    ],
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp_ntz"),
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}


def test_contract_covers_all_tables():
    assert set(ARROW_SCHEMA) == set(TABLES)
    assert set(SPARK_SCHEMA) == set(TABLES)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", sorted(ARROW_SCHEMA))
def test_parquet_storage_schema(sf_dir, table):
    schema = pq.read_schema(f"{sf_dir}/{table}.parquet")
    got = [(f.name, str(f.type)) for f in schema]
    assert got == ARROW_SCHEMA[table], (
        f"{table} storage schema drifted in {sf_dir} — audit epoch/typed "
        f"call sites, then re-pin here and in FIXTURES.md"
    )


@pytest.mark.parametrize("table", sorted(SPARK_SCHEMA))
def test_spark_engine_schema(spark, table):
    df = load_table(spark, SF_DIRS[0], table)
    assert df.dtypes == SPARK_SCHEMA[table], (
        f"{table} engine-view schema drifted — catalog.load_table or "
        f"session config changed what operators see; audit epoch helpers "
        f"(functions/scalars.py) and re-pin"
    )


def test_schema_cache_invalidated_on_in_place_regeneration(spark, tmp_path):
    """r15 (ADVICE r14): the per-process schema cache keys on the file
    mtime, so a fixture regenerated IN PLACE (contract violation, but
    nothing enforces it) re-infers instead of serving a stale schema."""
    import os
    import time

    from football_lakehouse_spark.catalog import load_table

    sf = str(tmp_path)
    p = os.path.join(sf, "events.parquet")
    spark.createDataFrame([(1, "x")], "event_id bigint, a string").write.parquet(p)
    assert dict(load_table(spark, sf, "events").dtypes)["a"] == "string"
    time.sleep(1.1)  # mtime granularity
    import shutil

    shutil.rmtree(p)
    spark.createDataFrame([(1, 7)], "event_id bigint, a bigint").write.parquet(p)
    assert dict(load_table(spark, sf, "events").dtypes)["a"] == "bigint"
