"""Idle-gated subset bench for r14 A/B iteration — bench.py methodology
(wait-for-idle, warmups, round-robin min) on a named subset of queries.

Usage: python scripts/r14_ab.py q101_semantic_dedup q294_ivf_index_serving
Env:   R14_AB_WARMUP (default 4), R14_AB_PASSES (default 4)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuse the idle gate)
from football_lakehouse_spark.plans import registry  # noqa: E402
from football_lakehouse_spark.session import get_spark  # noqa: E402

WARMUP = int(os.environ.get("R14_AB_WARMUP", "4"))
PASSES = int(os.environ.get("R14_AB_PASSES", "4"))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_start = bench._wait_for_idle()
    spark = get_spark("fls-r14-ab")
    specs = {n: registry.REGISTRY[n] for n in names}
    for _ in range(WARMUP):
        for spec in specs.values():
            spec.builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            spark.catalog.clearCache()
    timings = {n: float("inf") for n in specs}
    for _ in range(PASSES):
        for name, spec in specs.items():
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name] = min(timings[name], time.perf_counter() - t0)
            spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "queries": {n: round(v, 4) for n, v in timings.items()},
                "loadavg_start": round(load_start, 2),
                "warmup": WARMUP,
                "passes": PASSES,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
