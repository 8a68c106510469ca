"""Multi-writer concurrency soak — two REAL sessions contending on one
table (r11 verdict #6: the CAS/rebase path at volume, not just the
injected-race unit tests c16/c17).

Two writer subprocesses, each with its own SparkSession and its own
LakehouseTable handle on the SAME table root, run concurrently:

  phase 1: N_APPEND blind appends of ROWS_PER_BATCH disjoint-keyed rows
           each — appends rebase automatically on a lost version CAS
           (Delta blind-append conflict resolution), so contention here
           must cost O(retries) driver time and never a failure;
  phase 2: N_MERGE upserts over the writer's OWN key range (contention
           is on the version CAS, not on rows) — merge reads the table,
           so a lost CAS surfaces ConcurrentWriteError and the writer
           re-runs it (the RUNBOOK §3 procedure), counting retries.

The parent then verifies, in a fresh session, the invariants a lost or
duplicated write would break:

  - exact expected row count (appends) and update count (merges),
  - zero duplicate keys,
  - version numbers 0..n-1 dense and monotone, one per successful
    commit: 2×(N_APPEND + N_MERGE) total,
  - every writer's rows all present (no writer's commit vanished).

Emits one JSON line per writer op (wall seconds + cumulative retries)
and a final verdict line for SCALING.md.

Usage: python scripts/soak_multiwriter.py [rows_per_batch]
       (default 100_000; the writers are invoked internally with
        --writer A|B — don't pass that by hand)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/fls-multiwriter"
N_APPEND = 8
N_MERGE = 4
KEY_STRIDE = 10**9  # writer A keys in [0, ...), writer B in [stride, ...)


def open_table(spark):
    from football_lakehouse_spark.lakehouse.tables import LakehouseTable

    return LakehouseTable(spark, ROOT, "mw", "events", partition_by=["src"])


def writer(tag: str, rows_per_batch: int) -> int:
    from pyspark.sql import functions as F

    from football_lakehouse_spark.lakehouse.tables import ConcurrentWriteError
    from football_lakehouse_spark.session import get_spark

    spark = get_spark(
        f"soak-mw-{tag}", cpus=8, shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = open_table(spark)

    # count append rebases (the automatic CAS-loss recovery) without
    # touching the production path
    rebases = {"n": 0}
    orig = t._rebase_append_schema

    def counting_rebase(*a, **k):
        rebases["n"] += 1
        return orig(*a, **k)

    t._rebase_append_schema = counting_rebase

    base = 0 if tag == "A" else KEY_STRIDE

    def batch(i: int, text: str):
        return (
            spark.range(rows_per_batch)
            .select(
                (F.col("id") + base + i * rows_per_batch).alias("k"),
                (F.col("id") % 4).cast("string").alias("src"),
                F.lit(text).alias("v"),
            )
        )

    for i in range(N_APPEND):
        t0 = time.perf_counter()
        t.append(batch(i, f"{tag}-a{i}"))
        print(json.dumps({
            "writer": tag, "op": f"append{i}",
            "sec": round(time.perf_counter() - t0, 2),
            "rebases": rebases["n"],
        }), flush=True)

    merge_retries = 0
    for i in range(N_MERGE):
        upd = batch(i, f"{tag}-m{i}")  # same keys as append i → pure update
        t0 = time.perf_counter()
        while True:
            try:
                t.merge(upd, ["k"])
                break
            except ConcurrentWriteError:
                merge_retries += 1  # RUNBOOK §3: re-read state, re-run
        print(json.dumps({
            "writer": tag, "op": f"merge{i}",
            "sec": round(time.perf_counter() - t0, 2),
            "merge_retries": merge_retries,
        }), flush=True)
    print(json.dumps({
        "writer": tag, "op": "done",
        "rebases": rebases["n"], "merge_retries": merge_retries,
    }), flush=True)
    spark.stop()
    return 0


def verify(rows_per_batch: int) -> int:
    from pyspark.sql import functions as F

    from football_lakehouse_spark.session import get_spark

    spark = get_spark(
        "soak-mw-verify", cpus=8, shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = open_table(spark)
    df = t.read()
    n = df.count()
    expect = 2 * N_APPEND * rows_per_batch
    dup_keys = df.groupBy("k").count().where(F.col("count") > 1).count()
    # merges rewrote batches 0..N_MERGE-1 per writer: their v must be
    # the merge text; every other row keeps its append text
    bad_v = df.where(
        (
            ((F.col("k") % KEY_STRIDE) < N_MERGE * rows_per_batch)
            & ~F.col("v").rlike("-m[0-9]+$")
        )
        | (
            ((F.col("k") % KEY_STRIDE) >= N_MERGE * rows_per_batch)
            & ~F.col("v").rlike("-a[0-9]+$")
        )
    ).count()
    hist = t.describe_history()
    versions = [h["version"] for h in hist]
    commits_expected = 2 * (N_APPEND + N_MERGE)
    ok = (
        n == expect
        and dup_keys == 0
        and bad_v == 0
        and versions == list(range(commits_expected))
    )
    print(json.dumps({
        "verdict": "PASS" if ok else "FAIL",
        "rows": n, "rows_expected": expect,
        "duplicate_keys": dup_keys, "wrong_payloads": bad_v,
        "versions": len(versions), "versions_expected": commits_expected,
        "versions_dense_monotone": versions == list(range(len(versions))),
    }), flush=True)
    spark.stop()
    return 0 if ok else 1


def main() -> int:
    if "--writer" in sys.argv:
        tag = sys.argv[sys.argv.index("--writer") + 1]
        rows = int(sys.argv[sys.argv.index("--rows") + 1])
        return writer(tag, rows)

    rows_per_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    import shutil

    shutil.rmtree(ROOT, ignore_errors=True)
    t0 = time.perf_counter()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--writer", tag, "--rows", str(rows_per_batch)],
        )
        for tag in ("A", "B")
    ]
    rcs = [p.wait() for p in procs]
    wall = round(time.perf_counter() - t0, 2)
    if any(rcs):
        print(json.dumps({"verdict": "FAIL", "writer_rcs": rcs}))
        return 1
    print(json.dumps({"writers_wall_sec": wall, "rows_per_batch": rows_per_batch,
                      "appends": 2 * N_APPEND, "merges": 2 * N_MERGE}),
          flush=True)
    return verify(rows_per_batch)


if __name__ == "__main__":
    raise SystemExit(main())
