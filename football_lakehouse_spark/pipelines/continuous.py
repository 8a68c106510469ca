"""Continuous-aggregate maintenance — the incremental counterpart of
plans/lakehouse_plans.q55's rollup cascade: keep an hourly rollup table
up to date as event batches land, WITHOUT rescanning history.

Pattern (hypertable/materialized-view maintenance on a lakehouse):
  1. aggregate the new batch to the rollup grain (micro-unit partials,
     so merging is exact integer addition — see functions/scalars.py),
  2. ADDITIVE-merge into the rollup table: touched keys re-sum
     (old partial + new partial), untouched keys keep their rows.

Cost per batch: one batch aggregation + one join against only the
touched keys — never a scan of raw history. Works because count/sum are
algebraic; for non-algebraic measures keep partial sketches instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from football_lakehouse_spark.lakehouse.tables import LakehouseTable

ROLLUP_KEYS = ("h", "event_type")


def batch_partials(events: DataFrame) -> DataFrame:
    """Aggregate one event batch to hourly-grain integer partials —
    via the SHARED quantiser (functions/scalars.micros), summed as
    DECIMAL(38,0): the previous inline bigint copy reintroduced exactly
    the overflow the shared helper documents away (a rollup key's
    running micro total wraps/ANSI-throws past ~9.2e18, and every merge
    re-truncated it)."""
    from football_lakehouse_spark.functions.scalars import _sum_micros_exact

    return (
        events.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _sum_micros_exact(F.col("value")).alias("v_micros"),
        )
        # partition column: merge's partition-scoped rewrite is what
        # makes maintenance O(touched partitions); a date renders to
        # its exact on-disk dir name (timestamps are fail-closed)
        .withColumn("d", F.to_date("h"))
    )


def merge_additive(table: LakehouseTable, partials: DataFrame) -> int:
    """Merge new partials into the rollup: matched keys ADD, unmatched
    insert. Integer partials merge exactly (no float drift, any order)."""
    if not table.exists():
        return table.append(partials)
    current = table.read()
    # TOUCHED KEYS ONLY: re-sum current+new for the batch's keys and
    # MERGE those rows — untouched keys keep their files. The previous
    # full-table re-aggregate + overwrite rewrote the whole rollup per
    # batch (O(total keys) scan + write), the exact rescan cliff the
    # module contract forbids at hypertable scale.
    keys = list(ROLLUP_KEYS)
    batch_keys = partials.select(*keys).distinct()
    cond = None
    for k in keys:
        cl = current[k].eqNullSafe(batch_keys[k])
        cond = cl if cond is None else cond & cl
    touched_cur = current.join(F.broadcast(batch_keys), cond, "left_semi")
    combined = (
        touched_cur.unionByName(partials)
        .groupBy(*keys)
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("v_micros").cast("decimal(38,0)").alias("v_micros"),
        )
        .withColumn("d", F.to_date("h"))
    )
    return table.merge(combined, keys)


def rollup_view(table: LakehouseTable) -> DataFrame:
    """User-facing view of the maintained rollup (values back in units)."""
    return table.read().select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
        "n",
        # exact `div` on a decimal cast: floor(bigint / lit) promotes to
        # double past 2^53 micros (the q199/q55 class)
        (
            F.expr("cast(v_micros as decimal(38,0)) div 10000").cast("double")
            / 100
        ).alias("total_value"),
    )


def maintain_from_batches(
    spark: SparkSession, batches: list[DataFrame], root: str
) -> LakehouseTable:
    t = LakehouseTable(
        spark, root, "gold", "rollup_hourly", partition_by=["d"]
    )
    for b in batches:
        merge_additive(t, batch_partials(b))
    return t
