"""sf10 spot-soak of q71 / q73 / q90 (SCALING.md evidence, round-4
verdict #7).

Synthesises sf10 = 100x the sf0.1 documents (500k docs) and events
(10M rows) tables — the only inputs those three queries read — via a
single crossJoin with a replica-index range (NOT 100 unions, which
would make Catalyst plan 100 scan branches). Keys shift by
replica*stride; document text gets a per-replica marker token.

NOTE (measured, kept deliberately): one marker token out of ~100 does
NOT break near-dup similarity — replicas of the same doc keep Jaccard
≈ 0.96, so the corpus contains 5,000 TRUE 100-member near-dup
clusters (C(100,2)·5k ≈ 24.8M real pairs). That makes this soak the
adversarial inflated-cluster workload for q71, not a uniform scale-up
— exactly the case the max_bucket_size star cap exists for. See the
sf10 section of SCALING.md for both measurements.

Then times each query (min over `passes` runs) and prints one JSON
line per query for the SCALING.md table, next to the recorded sf0.1
and sf1 numbers.

Usage: python scripts/soak_sf10.py [out_dir] [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from football_lakehouse_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
FACTOR = 100
QUERIES = ("q71_minhash_neardup_fast", "q73_boilerplate_ngrams", "q90_props_map")


def gen(spark, out):
    os.makedirs(out, exist_ok=True)
    reps = F.broadcast(spark.range(FACTOR).withColumnRenamed("id", "__rep"))
    for table, key, mark_text in (
        ("documents", "doc_id", True),
        ("events", "event_id", False),
    ):
        path = os.path.join(out, f"{table}.parquet")
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            print(table, "exists, skipping")
            continue
        df = spark.read.parquet(os.path.join(SRC, f"{table}.parquet"))
        stride = 10 ** len(str(df.agg(F.max(key)).collect()[0][0]))
        big = df.crossJoin(reps).withColumn(
            key, F.col(key) + F.col("__rep") * F.lit(stride)
        )
        if mark_text:
            big = big.withColumn(
                "text", F.concat(F.col("text"), F.lit(" replicamark"), F.col("__rep"))
            )
        big.drop("__rep").repartition(32).write.mode("overwrite").parquet(path)
        print(table, "written")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fls-sf10"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("soak-sf10")
    gen(spark, out)

    from __spark_entry__ import queries

    qs = queries()
    results = {}
    for name in QUERIES:
        best = None
        for _ in range(passes):
            t0 = time.monotonic()
            n = qs[name](spark, out).count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        results[name] = {"sf10_s": round(best, 2), "rows": n}
        print(json.dumps({name: results[name]}))
    with open("/tmp/soak_sf10.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote /tmp/soak_sf10.json")
    spark.stop()


if __name__ == "__main__":
    main()
