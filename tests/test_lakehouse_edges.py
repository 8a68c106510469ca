"""Lakehouse failure-mode edges: clean errors after vacuum beyond the
retention horizon, empty tables, merge into never-written tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from football_lakehouse_spark.catalog import load_table
from football_lakehouse_spark.lakehouse.tables import LakehouseTable
from tests.conftest import SF_SMOKE


def test_time_travel_after_vacuum_fails_cleanly(spark, tmp_path):
    t = LakehouseTable(spark, str(tmp_path), "s", "t")
    ev = load_table(spark, SF_SMOKE, "events")
    t.append(ev.limit(10))
    t.overwrite(ev.limit(5))
    t.vacuum(retain_last=1)
    # current version fine
    assert t.read().count() == 5
    # version 0's files are gone → the read must fail loudly (same
    # trade-off as Delta VACUUM), not silently return partial data
    with pytest.raises(Exception):
        t.read(version=0).count()


def test_read_unwritten_table_raises(spark, tmp_path):
    t = LakehouseTable(spark, str(tmp_path), "s", "empty")
    with pytest.raises(FileNotFoundError):
        t.read()
    assert not t.exists()


def test_merge_into_unwritten_table_creates_it(spark, tmp_path):
    t = LakehouseTable(spark, str(tmp_path), "s", "fresh")
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    t.merge(df, ["k"])
    assert t.read().count() == 1
    assert t.describe_history()[0]["operation"] == "append"


def test_append_if_new_partial_novelty(spark, tmp_path):
    """A batch that is PARTLY new appends only the novel payload rows."""
    t = LakehouseTable(spark, str(tmp_path), "s", "p")
    ev = load_table(spark, SF_SMOKE, "events")
    batch1 = ev.limit(20).select("event_id", F.sha2(F.col("props"), 256).alias("h"))
    t.append_if_new(batch1, "h")
    n1 = t.read().count()
    # batch2 = overlap + genuinely new rows
    batch2 = ev.limit(40).select("event_id", F.sha2(F.col("props"), 256).alias("h"))
    t.append_if_new(batch2, "h")
    n2 = t.read().count()
    assert n2 > n1
    # no hash appears more often than before + once per novel value
    dupes = t.read().groupBy("h", "event_id").count().where("count > 2").count()
    assert dupes == 0
