"""Per-query phase profile: builder wall (driver-side construction incl.
eager actions) vs noop-sink execution wall, plus job counts.

Usage: python scripts/r14_profile.py [query ...]   (default: bench set)
Prints one line per query: name, build_s, exec_s, total_s, n_jobs.
Runs each query WARMUP unmeasured passes first, then reports the min of
PASSES measured passes (same methodology as bench.py, per guide §1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from football_lakehouse_spark.plans import registry  # noqa: E402
from football_lakehouse_spark.session import get_spark  # noqa: E402

WARMUP = int(os.environ.get("R14_WARMUP", "2"))
PASSES = int(os.environ.get("R14_PASSES", "3"))


def main() -> None:
    names = sys.argv[1:] or sorted(registry.bench_queries())
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("fls-r14-profile")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    print(f"{'query':45s} {'build_s':>8s} {'exec_s':>8s} {'total_s':>8s} {'jobs':>5s}")
    for name in names:
        spec = registry.REGISTRY[name]
        for _ in range(WARMUP):
            spec.builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            spark.catalog.clearCache()
        best = (float("inf"),) * 3 + (0,)
        for _ in range(PASSES):
            jobs0 = len(tracker.getJobIdsForGroup(None) or [])
            sc.setJobDescription(f"r14-profile:{name}")
            t0 = time.perf_counter()
            df = spec.builder(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            sc.setJobDescription(None)
            spark.catalog.clearCache()
            jobs1 = len(tracker.getJobIdsForGroup(None) or [])
            if t2 - t0 < best[2]:
                best = (t1 - t0, t2 - t1, t2 - t0, jobs1 - jobs0)
        print(
            f"{name:45s} {best[0]:8.3f} {best[1]:8.3f} {best[2]:8.3f} {best[3]:5d}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
