"""Rows-only queries (no SQL oracle) must still be deterministic
run-to-run within a session — the weaker driver check records counts,
but nondeterministic values would make the engine unusable as a
pipeline component."""

from __future__ import annotations

import pytest

from football_lakehouse_spark.plans import registry
from tests.conftest import SF_SMOKE

ROWS_ONLY = [s for s in registry.REGISTRY.values() if s.oracle is None]


@pytest.mark.parametrize("spec", ROWS_ONLY, ids=lambda s: s.name)
def test_rows_only_deterministic(spark, spec):
    a = sorted(tuple(str(x) for x in r) for r in spec.builder(spark, SF_SMOKE).collect())
    b = sorted(tuple(str(x) for x in r) for r in spec.builder(spark, SF_SMOKE).collect())
    assert a == b, f"{spec.name} is nondeterministic across runs"
    assert a, f"{spec.name} returned no rows"


def test_ml_pinned_eval_matches_oracle(spark, duck):
    """The pinned GBT regression row (q69) must reproduce exactly at
    sf0.01 — integer cents, fixed seed, deterministic split. GBT was
    verified bit-deterministic across 32/7/200 shuffle partitions and
    repartitioned inputs; this guards the model/seed/split/features."""
    from tests.conftest import SF_ORACLE, compare_with_oracle

    spec = registry.REGISTRY["q69_ml_pinned_eval"]
    compare_with_oracle(spec.builder(spark, SF_ORACLE), spec.oracle, duck[SF_ORACLE])


def test_pagerank_partition_invariant(spark):
    """q124's whole point: fixed-point integer ranks are bit-identical
    under any partitioning. Re-run with a different shuffle-partition
    count and compare exact values."""
    spec = registry.REGISTRY["q124_term_pagerank"]
    base = sorted(
        tuple(str(x) for x in r) for r in spec.builder(spark, SF_SMOKE).collect()
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt = sorted(
            tuple(str(x) for x in r)
            for r in spec.builder(spark, SF_SMOKE).collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == alt
    # damping floor: every rank >= 0.15
    assert all(float(r[1]) >= 0.15 for r in base)
