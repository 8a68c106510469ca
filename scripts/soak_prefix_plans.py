"""Soak the three plans rewritten onto `bucketed_prefix` in round 6
(q183 KS statistic, q194 Lorenz curve, q189 decile lift) — the
round-5 verdict's "global (unpartitioned) windows over
data-cardinality inputs" item. Evidence for SCALING.md.

What it does:
- synthesises factor× versions of ONLY the tables these queries read
  (events for q183; orders for q194; orders+customer for q189) via the
  single-crossJoin replica pattern (soak_sf10.py's generator — not N
  unions), dims copied once;
- times each registry query (min over `passes` warm runs) at each
  factor and prints one JSON line per (query, factor);
- for q189, additionally times the DECILE STAGE IN ISOLATION at the
  largest factor over a synthesized scored-holdout table — the GBT
  training upstream is deliberately out of scope here (its scaling is
  the M2 pipeline's story, measured in the round-4 section of
  SCALING.md); the prefix rewrite only touches the rank/decile cut.

Usage: python scripts/soak_prefix_plans.py [factors_csv] [passes]
       (default factors 10,100 → sf1, sf10; sf0.1 timed directly)
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
FACTS = {
    "events": "event_id",
    "orders": "o_orderkey",
    "customer": "c_custkey",
}
DIMS = ("nation", "region")
QUERIES = ("q183_ks_statistic", "q194_lorenz_curve", "q189_decile_lift")


def gen(spark, factor: int, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    reps = F.broadcast(spark.range(factor).withColumnRenamed("id", "__rep"))
    # customer/orders keys shift in LOCKSTEP so o_custkey joins keep
    # factor-invariant selectivity (gen_scale.py's contract)
    strides = {}
    for table, key in FACTS.items():
        df = spark.read.parquet(os.path.join(SRC, f"{table}.parquet"))
        m = df.agg(F.max(key)).collect()[0][0]
        s = 1
        while s <= m:
            s *= 10
        strides[table] = s
    for table, key in FACTS.items():
        path = os.path.join(out, f"{table}.parquet")
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            continue
        df = spark.read.parquet(os.path.join(SRC, f"{table}.parquet"))
        big = df.crossJoin(reps).withColumn(
            key, F.col(key) + F.col("__rep") * F.lit(strides[table])
        )
        if table == "orders":
            big = big.withColumn(
                "o_custkey",
                F.col("o_custkey") + F.col("__rep") * F.lit(strides["customer"]),
            )
        big.drop("__rep").write.mode("overwrite").parquet(path)
    for table in DIMS:
        path = os.path.join(out, f"{table}.parquet")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            spark.read.parquet(
                os.path.join(SRC, f"{table}.parquet")
            ).write.mode("overwrite").parquet(path)


def time_query(spark, name: str, sf_dir: str, passes: int) -> float:
    from football_lakehouse_spark.plans import registry

    b = registry.REGISTRY[name].builder
    best = None
    for _ in range(passes):
        t0 = time.time()
        n = b(spark, sf_dir).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2), n


def decile_stage_only(spark, n_rows: int, passes: int) -> float:
    """q189's rank/decile cut in isolation over a synthesized scored
    holdout of n_rows — the stage the bucketed_prefix rewrite changed."""
    from football_lakehouse_spark.operators.selection import (
    bucketed_prefix,
    ntile_expr,
)

    hold = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("c_custkey"),
            (F.pmod(F.col("id") * 2654435761, 5000000) / 1.0).alias(
                "predicted_value"
            ),
            (F.pmod(F.col("id") * 40503, 5000000) / 1.0).alias(
                "lifetime_value"
            ),
        )
    )
    best = None
    for _ in range(passes):
        t0 = time.time()
        base = hold.withColumn(
            "bucket", F.floor(F.col("predicted_value") / 16384.0).cast("bigint")
        )
        ranked = bucketed_prefix(
            base,
            "bucket",
            [F.col("predicted_value").desc(), F.col("c_custkey").asc()],
            rank="i",
            descending=True,
        )
        tot = hold.agg(F.count(F.lit(1)).alias("n"))
        # the SHARED tile arithmetic, not a copy: this soak claims to
        # time q189's decile cut in isolation, so it must call the
        # same helper the q189 builder calls
        decile = ntile_expr(F.col("i"), F.col("n"), 10)
        out = (
            ranked.crossJoin(F.broadcast(tot))
            .groupBy(decile.alias("decile"))
            .agg(F.count(F.lit(1)).alias("n_rows"))
        )
        assert out.count() == 10
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2)


def main() -> None:
    factors = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "10,100").split(",")]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("soak-prefix")
    spark.sparkContext.setLogLevel("ERROR")

    for q in QUERIES:
        dt, n = time_query(spark, q, SRC, passes)
        print(json.dumps({"query": q, "factor": 1, "sec": dt, "rows": n}))
    for factor in factors:
        out = f"/tmp/fls-prefix-f{factor}"
        gen(spark, factor, out)
        for q in QUERIES:
            if q == "q189_decile_lift" and factor > 10:
                continue  # GBT training dominates past 10×; stage-only below
            dt, n = time_query(spark, q, out, passes)
            print(json.dumps({"query": q, "factor": factor, "sec": dt, "rows": n}))
    n_big = 15_000 * max(factors) * 2  # sf0.1 holdout ≈ 3k of 15k customers
    print(json.dumps({
        "query": "q189_decile_stage_only",
        "factor": max(factors),
        "rows_in": n_big,
        "sec": decile_stage_only(spark, n_big, passes),
    }))


if __name__ == "__main__":
    main()
