"""Attestation-freshness gate — the rotation policy as a failing check.

VERDICT r11 item 4: staleness must be a machine check, not a judge
observation. This test replays every CORRECTNESS_r*.json against the
live registry (scripts/replay_attestation.py) and fails when

  - any registered query's LATEST driver row is red,
  - any attested query is more than FRESHNESS_HORIZON rounds behind the
    newest artifact, or
  - DRIVER_ORDER_FIRST is not the computed oldest-50 cohort (i.e. the
    prefix was not rotated after the last driver run or after a new
    query registration).

No SparkSession needed — pure JSON replay + registry import.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

_SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "replay_attestation.py",
)


@pytest.fixture(scope="module")
def replayed():
    spec = importlib.util.spec_from_file_location("replay_attestation", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.replay()


def test_no_red_latest_rows(replayed):
    assert replayed["red_latest"] == {}, (
        "registered queries whose most recent driver row is red: "
        f"{replayed['red_latest']} — fix them, don't rotate them"
    )


def test_no_stale_attestations(replayed):
    assert replayed["stale"] == {}, (
        "attestations older than the freshness horizon: "
        f"{replayed['stale']} (vs r{replayed['latest_round']}) — the "
        "driver prefix rotation missed these; lead them in "
        "DRIVER_ORDER_FIRST"
    )


def test_prefix_is_rotated(replayed):
    assert replayed["prefix_rotated"], (
        "DRIVER_ORDER_FIRST != the computed oldest-50 cohort — run "
        "`python scripts/replay_attestation.py` and paste its printed "
        "prefix (required after every driver round AND after "
        "registering a new query, which must lead the prefix)"
    )
