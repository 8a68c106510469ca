"""A/B: bucketed_prefix's null-safe arms vs a not-null fast path.

r10 added three null-correctness arms to operators/selection.bucketed_prefix:
  (a) the final prefix rejoin is eqNullSafe (a NULL bucket must rejoin
      its own prefix row),
  (b) the triangular ``better``-bucket predicate carries OR-isNull arms
      (NULL buckets sort where the global window's default null
      ordering puts them),
  (c) each ``sums`` entry carries non-null counts (__bnn/__onn/__pnn +
      a count window) so the running sum is NULL until the first
      non-null contribution — exact global-window semantics.

The r10 driver artifact showed q215 (rank-only caller) at 1.46x vs r9,
inside a uniform machine-drift band. This script separates plan cost
from drift: it times the SHIPPED operator against an inline fast-path
variant that drops all three arms (valid only when bucket and sum
exprs are provably non-null — true for q215's price_micro and q177's
n_chars), same data, same session, interleaved passes.

Usage: python scripts/ab_bucketed_prefix.py [sf_dir] [passes]
Prints one JSON line with per-variant median seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import DataFrame, Window, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from football_lakehouse_spark.catalog import load_table  # noqa: E402
from football_lakehouse_spark.operators.selection import bucketed_prefix  # noqa: E402
from football_lakehouse_spark.session import get_spark  # noqa: E402


def fast_bucketed_prefix(
    df: DataFrame, bucket: str, order, sums=None, rank: str | None = None,
) -> DataFrame:
    """The pre-r10 shape: bare better-predicate, plain equi-join
    rejoin, no non-null bookkeeping. ONLY correct when ``bucket`` and
    every sums expr are non-null — the A/B baseline, not a shipped
    operator."""
    sums = dict(sums or {})
    order = list(order)
    agg = [F.count(F.lit(1)).alias("__bcnt")] + [
        F.sum(expr).alias(f"__btot_{name}") for name, expr in sums.items()
    ]
    bucket_tot = df.groupBy(bucket).agg(*agg)
    other = bucket_tot.select(
        F.col(bucket).alias("__ob"),
        F.col("__bcnt").alias("__ocnt"),
        *[F.col(f"__btot_{name}").alias(f"__otot_{name}") for name in sums],
    )
    bucket_prefix = (
        bucket_tot.join(F.broadcast(other), F.col("__ob") < F.col(bucket), "left")
        .groupBy(bucket)
        .agg(
            F.coalesce(F.sum("__ocnt"), F.lit(0)).alias("__pcnt"),
            *[
                F.coalesce(F.sum(f"__otot_{name}"), F.lit(0)).alias(f"__p_{name}")
                for name in sums
            ],
        )
    )
    w_in = Window.partitionBy(bucket).orderBy(*order)
    w_in_cum = w_in.rowsBetween(Window.unboundedPreceding, 0)
    out = df.join(
        F.broadcast(bucket_prefix.withColumnRenamed(bucket, "__pb")),
        F.col(bucket) == F.col("__pb"),
    ).drop("__pb")
    for name, expr in sums.items():
        out = out.withColumn(name, F.col(f"__p_{name}") + F.sum(expr).over(w_in_cum))
    if rank is not None:
        out = out.withColumn(rank, F.col("__pcnt") + F.row_number().over(w_in))
    return out.drop("__pcnt", *[f"__p_{name}" for name in sums])


def q215_shape(li: DataFrame, impl) -> DataFrame:
    p = li.select(
        F.floor(F.col("l_extendedprice") * 1000000.0 + 0.5)
        .cast("bigint").alias("price_micro"),
        "l_orderkey", "l_linenumber",
    ).withColumn(
        "bucket", F.floor(F.col("price_micro") / F.lit(1000000000)).cast("bigint")
    )
    ranked = impl(
        p, "bucket",
        [F.col("price_micro").asc(), F.col("l_orderkey").asc(),
         F.col("l_linenumber").asc()],
        rank="i",
    )
    tot = p.agg(F.count(F.lit(1)).alias("n"))
    return (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy(F.ceil(F.col("i") * 20.0 / F.col("n")).cast("bigint").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("price_micro").cast("bigint").alias("lo_micro"),
            F.max("price_micro").cast("bigint").alias("hi_micro"),
        )
    )


def q177_shape(docs: DataFrame, width: int, impl) -> DataFrame:
    d = docs.withColumn("bucket", F.floor(F.col("doc_id") / width).cast("bigint"))
    cum = impl(d, "bucket", [F.col("doc_id").asc()], sums={"cum": F.col("w")})
    return cum.agg(F.max("cum").alias("mx"), F.count(F.lit(1)).alias("n"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark("ab-bucketed-prefix")
    li = load_table(spark, sf_dir, "lineitem")
    base = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("bigint").alias("w")
    )
    lo, hi = base.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    width = max((int(hi) - int(lo) + 1) // 512, 1)

    variants = {
        "q215_shipped": lambda: q215_shape(li, bucketed_prefix).collect(),
        "q215_fastpath": lambda: q215_shape(li, fast_bucketed_prefix).collect(),
        "sums_shipped": lambda: q177_shape(base, width, bucketed_prefix).collect(),
        "sums_fastpath": lambda: q177_shape(
            base, width, fast_bucketed_prefix
        ).collect(),
    }
    # two warm-up passes each (the first sf0.1 passes decay ~40% as
    # JIT + page cache warm — a single warm-up left a 1.33x phantom
    # ratio in the first draw of this script), then interleave timed
    # passes in ALTERNATING order so warm-up residue and machine drift
    # hit both arms of each A/B equally
    for _ in range(2):
        for fn in variants.values():
            fn()
    times: dict[str, list[float]] = {k: [] for k in variants}
    keys = list(variants)
    for p in range(passes):
        ordered = keys if p % 2 == 0 else list(reversed(keys))
        for k in ordered:
            t0 = time.perf_counter()
            variants[k]()
            times[k].append(time.perf_counter() - t0)

    def med(xs):
        s = sorted(xs)
        return round(s[len(s) // 2], 4)

    out = {k: med(v) for k, v in times.items()}
    out["q215_ratio_shipped_over_fast"] = round(
        out["q215_shipped"] / out["q215_fastpath"], 3
    )
    out["sums_ratio_shipped_over_fast"] = round(
        out["sums_shipped"] / out["sums_fastpath"], 3
    )
    out["sf_dir"] = sf_dir
    out["passes"] = passes
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
