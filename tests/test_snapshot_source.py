"""S1/S2/D2 snapshot-source slice: canonical JSON, hash stability,
single-row lift, idempotent append through the lakehouse layer."""

from __future__ import annotations

from datetime import datetime, timezone

from football_lakehouse_spark.lakehouse.tables import LakehouseTable
from football_lakehouse_spark.sources.snapshot import (
    canonical_json,
    fetch_snapshot,
    snapshot_dataframe,
)

PAYLOAD = {"teams": [{"id": 2, "name": "B"}, {"id": 1, "name": "A"}], "z": 1, "a": 2}
NOW = datetime(2026, 8, 13, 6, 15, 0, tzinfo=timezone.utc)


def fake_fetcher():
    return 200, PAYLOAD


def test_canonical_json_is_sorted_and_compact():
    text = canonical_json(PAYLOAD)
    assert text.startswith('{"a":2,')
    assert " " not in text
    # key order of the INPUT dict must not matter
    assert text == canonical_json({"z": 1, "a": 2, "teams": PAYLOAD["teams"]})


def test_fetch_snapshot_row_and_hash_stability():
    r1 = fetch_snapshot(fake_fetcher, "fake://bootstrap", "run1", now=NOW)
    r2 = fetch_snapshot(fake_fetcher, "fake://bootstrap", "run2", now=NOW)
    assert r1["payload_sha256"] == r2["payload_sha256"]
    assert r1["http_status"] == 200
    assert r1["payload_size_bytes"] == len(r1["payload_json"].encode())
    assert r1["snapshot_date"] == NOW.date()


def test_snapshot_lift_and_idempotent_append(spark, tmp_path):
    row = fetch_snapshot(fake_fetcher, "fake://bootstrap", "run1", now=NOW)
    df = snapshot_dataframe(spark, row)
    assert df.count() == 1
    assert df.schema["payload_sha256"].dataType.simpleString() == "string"

    t = LakehouseTable(spark, str(tmp_path), "bronze", "bootstrap_raw")
    assert t.append_if_new(df, "payload_sha256") is not None
    # same content, new run → skipped (reference 11_ingest:138-151)
    row2 = fetch_snapshot(fake_fetcher, "fake://bootstrap", "run2", now=NOW)
    assert t.append_if_new(snapshot_dataframe(spark, row2), "payload_sha256") is None
    assert t.read().count() == 1
