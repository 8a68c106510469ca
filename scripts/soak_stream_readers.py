"""Backlog-drain soak: partition-planning vs driver-prefetch landing
stream readers (r7: LandingPartitionStreamReader became the default).

Same landing zone — ``files`` JSON files of ``rows`` events each —
drained once by each reader under Trigger.availableNow into a parquet
sink with a fresh checkpoint. The partition reader plans one
InputPartition per file (parses fan out across local[32]); the simple
reader's Spark-4 contract prefetches every batch row through the
driver-side python runner process, single-threaded. Row counts must
match exactly; wall-clock shows the fan-out win and is the proxy for
the real 100 TB difference (the driver-side buffer the simple reader
needs simply does not exist in the partition reader).

Usage: python scripts/soak_stream_readers.py [files] [rows_per_file]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from football_lakehouse_spark.session import get_spark  # noqa: E402
from football_lakehouse_spark.sources.pyds import (  # noqa: E402
    register_landing_source,
)

ROOT = "/tmp/fls-stream-soak"


def gen(files: int, rows: int) -> str:
    land = os.path.join(ROOT, "landing")
    shutil.rmtree(land, ignore_errors=True)
    day = os.path.join(land, "snapshot_date=2026-02-01")
    os.makedirs(day)
    eid = 0
    for f in range(files):
        with open(os.path.join(day, f"part-{f:05d}.json"), "w") as fh:
            for _ in range(rows):
                fh.write(
                    '{"event_id":%d,"ts":"2026-02-01T10:00:00","user_id":%d,'
                    '"event_type":"click","value":1.5,"props":null}\n'
                    % (eid, eid % 97)
                )
                eid += 1
    return land


def drain(spark, land: str, tag: str, opts: dict) -> tuple[float, int]:
    out = os.path.join(ROOT, f"out-{tag}")
    ckpt = os.path.join(ROOT, f"ckpt-{tag}")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    r = spark.readStream.format("landing_events").option("path", land)
    for k, v in opts.items():
        r = r.option(k, v)
    t0 = time.perf_counter()
    q = (
        r.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dt = time.perf_counter() - t0
    return round(dt, 2), spark.read.parquet(out).count()


def main() -> int:
    files = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    spark = get_spark("soak-stream-readers")
    spark.sparkContext.setLogLevel("ERROR")
    register_landing_source(spark)
    land = gen(files, rows)
    failed = False
    for tag, opts in (
        ("partition", {}),
        ("driver_prefetch", {"driverPrefetch": "true"}),
    ):
        sec, n = drain(spark, land, tag, opts)
        ok = n == files * rows
        failed = failed or not ok
        print(
            json.dumps(
                {
                    "reader": tag,
                    "files": files,
                    "rows": n,
                    "sec": sec,
                    "ok": ok,
                }
            ),
            flush=True,
        )
    spark.stop()
    # the docstring's contract is mandatory: a reader that drops or
    # duplicates rows must FAIL the soak (non-zero exit), and the
    # evidence must survive for triage instead of being cleaned up
    if failed:
        print(f"FAIL: row counts diverged — evidence kept in {ROOT}")
        return 1
    shutil.rmtree(ROOT, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
