"""Plan contracts: assert the scale-critical physical-plan properties
(filter pushdown, column pruning, broadcast dim joins, partial
aggregation, window group-limit) so a regression in plan shape fails CI
even while results stay correct."""

from __future__ import annotations

import pytest

from football_lakehouse_spark.plans import registry
from tests.conftest import SF_SMOKE


def plan_of(spark, name: str) -> str:
    df = registry.REGISTRY[name].builder(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "q05_bounded_multi_agg")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan


def test_column_pruning(spark):
    plan = plan_of(spark, "q23_pricing_summary")
    # lineitem has 11 columns; the scan must read only the 7 used
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "l_orderkey" not in scan and "l_suppkey" not in scan


def test_dim_joins_broadcast(spark):
    plan = plan_of(spark, "q17_multiway_join")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_partial_aggregation(spark):
    plan = plan_of(spark, "q04_conditional_agg")
    assert "partial_" in plan  # map-side combine before the exchange


def test_asof_single_shuffle(spark):
    plan = plan_of(spark, "q49_asof_join")
    # union + window form: exactly one hash exchange (on the join key)
    assert plan.count("Exchange hashpartitioning") == 1


def test_latest_snapshot_uses_window_group_limit(spark):
    plan = plan_of(spark, "q03_latest_snapshot_per_customer")
    assert "WindowGroupLimit" in plan  # top-1-per-group pruned before shuffle


def test_flagship_single_scan_single_shuffle(spark):
    plan = plan_of(spark, "q01_fixture_horizons")
    assert plan.count("FileScan parquet") == 2  # lineitem once + supplier dim
    assert plan.count("Exchange hashpartitioning") <= 1


def test_range_join_is_equi_join(spark):
    plan = plan_of(spark, "q64_range_join")
    # the banded form must plan as an equi-join (hash/sort-merge), never
    # a per-key cross product
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
