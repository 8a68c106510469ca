"""IVF index decade soak: build + serve across ×1/×10/×100/×1000 of
the sf0.1 embeddings (2k → 2M vectors, dim 64) at the production
build recipe — n_cells ∝ √corpus (FAISS coarse-quantiser rule),
Lloyd training on the deterministic hash-gated sample, Arrow
assignment kernel above the measured crossover (auto).

This isolates the two stages the composed cold-path rehearsal
(soak_cold_pipeline.py) added, and extends them one more decade than
the document-bound pipeline can afford (×1000 of the documents table
would be a 35 GB text corpus; embeddings are 1 GB at ×1000). Readout
per decade: index build wall (train + full-corpus assignment +
materialise), mining-serve wall (q281 shape: 10 anchors, n_probe=4
from the prebuilt index, label filter before scoring, top-3), and the
exact probed-candidate count — the number that must grow ~√corpus for
the operating-point analysis in SCALING.md to hold.

Usage: python scripts/soak_index_decades.py [factor ...]
       (default: 1 10 100 1000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from football_lakehouse_spark.operators.similarity import (  # noqa: E402
    ann_mining_candidates,
    ann_mining_topk,
    kmeans_cells,
)
from football_lakehouse_spark.session import get_spark  # noqa: E402

EMB_SRC = "/root/testdata/sf0.1/embeddings.parquet"
SCRATCH = "/tmp/fls-decades"
N_PROBE = 4


def build_point(factor: int) -> tuple[int, int]:
    """(n_cells, train_sample_mod) at the √N operating point."""
    n_cells = max(16, round(16 * factor ** 0.5))
    return n_cells, max(1, factor // 10)


def gen_emb(spark, factor: int) -> str:
    if factor == 1:
        return EMB_SRC
    path = os.path.join(SCRATCH, f"emb_x{factor}.parquet")
    # _SUCCESS, not bare existence: a partial dir from a killed run is
    # not a corpus
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    df = spark.read.parquet(EMB_SRC)
    stride = 10 ** len(str(df.agg(F.max("vec_id")).collect()[0][0]))
    reps = F.broadcast(spark.range(factor).withColumnRenamed("id", "__rep"))
    big = (
        df.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * F.lit(stride))
        .drop("__rep")
    )
    big.repartition(32).write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100, 1000]
    spark = get_spark("soak-index-decades")
    spark.sparkContext.setLogLevel("ERROR")
    for factor in factors:
        emb_path = gen_emb(spark, factor)
        emb = spark.read.parquet(emb_path)
        n_cells, mod = build_point(factor)
        idx = os.path.join(SCRATCH, f"idx_x{factor}")

        t0 = time.perf_counter()
        shutil.rmtree(idx, ignore_errors=True)
        assigned, cent = kmeans_cells(
            emb, n_cells=n_cells, iters=2, id_out="match_id",
            train_sample_mod=mod,
        )
        assigned.write.parquet(os.path.join(idx, "assigned"))
        cent.write.parquet(os.path.join(idx, "centroids"))
        build_s = round(time.perf_counter() - t0, 2)
        print(
            json.dumps(
                {
                    "stage": "ivf_build",
                    "factor": factor,
                    "sec": build_s,
                    "n_cells": n_cells,
                    "train_sample_mod": mod,
                }
            ),
            flush=True,
        )

        assigned = spark.read.parquet(os.path.join(idx, "assigned"))
        cent = spark.read.parquet(os.path.join(idx, "centroids"))
        anchors = emb.where(F.col("vec_id") < 10)
        # the SHARED mining serve (operators/similarity) — candidates
        # counted from the same admission rule the timed top-k scores
        n_cand = ann_mining_candidates(
            anchors, emb, assigned, cent, n_probe=N_PROBE
        ).count()
        t0 = time.perf_counter()
        (
            ann_mining_topk(anchors, emb, assigned, cent, k=3, n_probe=N_PROBE)
            .write.format("noop").mode("overwrite").save()
        )
        serve_s = round(time.perf_counter() - t0, 2)
        print(
            json.dumps(
                {
                    "stage": "mining_serve",
                    "factor": factor,
                    "sec": serve_s,
                    "candidates": n_cand,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
