"""Oracle parity: every registered query with a DuckDB oracle must
hash-match it — the local mirror of the driver's CORRECTNESS gate.

Runs at sf0.001 for speed; set SPARK_GRAFT_TEST_FULL=1 to also run at
sf0.01 (the driver's actual gate scale)."""

from __future__ import annotations

import os

import pytest

from football_lakehouse_spark.plans import registry
from tests.conftest import SF_ORACLE, SF_SMOKE, compare_with_oracle

SF_DIRS = [SF_SMOKE] + ([SF_ORACLE] if os.environ.get("SPARK_GRAFT_TEST_FULL") else [])

ORACLE_SPECS = [s for s in registry.REGISTRY.values() if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in registry.REGISTRY.values() if s.oracle is None]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_parity(spark, duck, spec, sf_dir):
    if spec.oracle_sf and os.environ.get("SPARK_GRAFT_FUZZ_SWEEP"):
        # pinned-literal oracles embed values derived from the seed-42
        # driver fixtures (q69 et al.); under fuzzed fixtures they are
        # exempt BY PROCEDURE (scripts/gen_fuzz.py docstring): a real
        # fixture regeneration must re-derive the literals by re-running
        # their builders at the recorded scale.
        pytest.skip(f"{spec.name}: pinned-literal oracle, exempt from fuzz sweep")
    if spec.oracle_sf and not sf_dir.rstrip("/").endswith(spec.oracle_sf):
        # pinned-literal oracle, only meaningful at its recorded scale
        sf_dir = SF_ORACLE if spec.oracle_sf == "sf0.01" else pytest.skip(
            f"{spec.name} oracle pinned at {spec.oracle_sf}"
        )
    df = spec.builder(spark, sf_dir)
    compare_with_oracle(df, spec.oracle, duck[sf_dir])


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=lambda s: s.name)
def test_rows_only_runs(spark, spec):
    df = spec.builder(spark, SF_SMOKE)
    assert df.columns, f"{spec.name}: no columns"
    df.limit(5).collect()  # must execute without error


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns


def test_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert qs, "queries() empty"
    assert set(os_).issubset(set(qs)), "oracle_sql keys must be subset of queries"


def test_registry_completeness_contract():
    """Registry contract (pinned each round-end): every registered query
    is oracle-bearing (no rows-only tail), the driver prefix is
    duplicate-free and covers the full registry, and accidental
    deregistration fails loudly here before the driver sees it."""
    names = registry._driver_ordered()
    assert len(names) == len(set(names))
    assert set(names) == set(registry.REGISTRY)
    assert len(registry.REGISTRY) >= 279
    rows_only = [s.name for s in registry.REGISTRY.values() if s.oracle is None]
    assert rows_only == [], f"rows-only queries crept in: {rows_only}"
