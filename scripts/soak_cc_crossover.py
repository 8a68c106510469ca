"""Star vs label-propagation connected-components crossover measurement
(r6 verdict #2: price q57's deliberate 1.68x bench regression).

q57's bench path switched in r6 from O(diameter) min-label propagation
(`neardup_clusters`) to the O(log n) large-star/small-star variant
(`neardup_clusters_star`, Kiveris et al.) — the right plan at 100 TB,
but 1.68x slower at sf0.1. This soak measures WHERE each variant wins,
on identical pair inputs, isolating the components stage from the LSH
prefix (which is shared and irrelevant to the comparison):

- real LSH pairs at sf0.1, and the same pair-set replicated 10x/100x
  with shifted doc ids (linear scale-up of the same shallow-component
  structure — more clusters, same diameter);
- adversarial CHAIN components (path graphs) of growing length — the
  diameter-bound workload star exists for.

Both variants produce identical cluster assignments (property-tested in
tests/test_properties.py); only wall-clock differs. Prints one JSON
line per (workload, variant) for the SCALING.md table.

Usage: python scripts/soak_cc_crossover.py [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from football_lakehouse_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_neardups,
    neardup_clusters,
    neardup_clusters_hybrid,
    neardup_clusters_star,
)
from football_lakehouse_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"


def time_variant(fn, pairs, passes):
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        fn(pairs).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark("soak-cc-crossover")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    # one LSH run, checkpointed, reused by every measurement below —
    # the prefix must not pollute the components timing
    base_pairs = (
        minhash_lsh_neardups(docs)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    n_base = base_pairs.count()

    workloads: list[tuple[str, object]] = [("lsh_sf0.1", base_pairs)]
    # linear scale-up: replicate the pair set with shifted ids → k x the
    # clusters, identical per-component shape (what a bigger corpus with
    # the same dup rate looks like)
    stride = 10 ** len(
        str(
            base_pairs.agg(
                F.greatest(F.max("doc_a"), F.max("doc_b"))
            ).collect()[0][0]
        )
    )
    for k in (10, 100):
        reps = F.broadcast(spark.range(k).withColumnRenamed("id", "__rep"))
        scaled = (
            base_pairs.crossJoin(reps)
            .select(
                (F.col("doc_a") + F.col("__rep") * F.lit(stride)).alias("doc_a"),
                (F.col("doc_b") + F.col("__rep") * F.lit(stride)).alias("doc_b"),
            )
            .localCheckpoint(eager=True)
        )
        workloads.append((f"lsh_x{k}", scaled))

    # adversarial chains: 1000 components, each a PATH of `length` nodes
    # — diameter = length, the regime where label-prop's round count
    # explodes and star's O(log n) holds
    for length in (100, 1000):
        chain = (
            spark.range(1000 * length)
            .where((F.col("id") % length) != length - 1)
            .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
            .localCheckpoint(eager=True)
        )
        workloads.append((f"chain_len{length}", chain))

    for name, pairs in workloads:
        n = pairs.count()
        variants = [
            ("label_prop", lambda p: neardup_clusters(p, max_iters=2000)),
            ("star", neardup_clusters_star),
            ("hybrid", neardup_clusters_hybrid),
        ]
        if os.environ.get("SOAK_CC_VARIANTS"):
            keep = set(os.environ["SOAK_CC_VARIANTS"].split(","))
            variants = [v for v in variants if v[0] in keep]
        for variant, fn in variants:
            sec = time_variant(fn, pairs, passes)
            print(
                json.dumps(
                    {
                        "workload": name,
                        "n_pairs": n,
                        "n_base_pairs": n_base,
                        "variant": variant,
                        "sec": sec,
                        "passes": passes,
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
