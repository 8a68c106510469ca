"""Benchmark runner — times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully executed via the noop sink (computation without
driver-side collection) after a warm-up of the session and file
listing, so numbers reflect plan execution, not JVM startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

from football_lakehouse_spark.plans import registry
from football_lakehouse_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("fls-bench")

    specs = registry.bench_queries()
    # warm-up: JVM, parquet footers, codegen
    for spec in specs.values():
        spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    # min of 3 timed runs per query: the shared host's load bursts
    # inflate sub-second queries ±5×; the min is the honest plan cost
    timings: dict[str, float] = {}
    for name, spec in specs.items():
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
