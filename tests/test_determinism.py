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
