"""Adversarial skewed-centroid soak for IVF ANN (round-5 verdict #8).

Two scenarios over a synthetic 64-dim corpus (hash-derived, Spark-side,
deterministic at any parallelism):

1. STATIC skew: 70% of vectors in a tight cluster (±0.01 around a fixed
   point), 30% uniform, quantiser trained on the full corpus. Expected
   (and measured) NON-finding: the lowest-id Lloyd init draws ~70% of
   seeds from the hot cluster, so cells adapt to density and no hot
   cell forms — density-adaptive init is the first line of defence.

2. DRIFT skew (the real adversary): quantiser trained on the uniform
   vectors only, then the hot cluster arrives through the frozen-
   centroid append path (q128 / assign_cells) — the whole cluster
   lands in its ONE nearest cell. Measures the hot-cell fraction, the
   candidate rows exactly-scored (the only quantity skew inflates:
   candidate joins are broadcast-side on `cell` and the final top-k is
   WindowGroupLimit-bounded), recall@10 and wall time — then runs
   refine_hot_cells (q160) and measures all of it again.

Prints one JSON line per measurement for the SCALING.md table.

Usage: python scripts/soak_ivf_skew.py [n_vectors] [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from football_lakehouse_spark.session import get_spark  # noqa: E402
from football_lakehouse_spark.operators.similarity import (  # noqa: E402
    assign_cells,
    brute_force_topk,
    ivf_probe_cells,
    ivf_search,
    kmeans_cells,
    refine_hot_cells,
)

DIM = 64
K = 10
N_CELLS = 64
N_PROBE = 4


def _u(expr: str) -> str:
    """uniform-ish double in [-1, 1) from a hash — pure SQL."""
    return f"(abs(hash({expr})) % 2000001) / 1000000.0 - 1.0"


def gen(spark, n: int):
    """(vec_id, embedding, is_hot) — 70% hot cluster, 30% uniform."""
    pos = "sequence(0, {})".format(DIM - 1)
    hot_center = f"transform({pos}, p -> cast({_u('999, p')} as double))"
    hot_noise = f"transform({pos}, p -> cast({_u('id, p')} / 100.0 as double))"
    uniform = f"transform({pos}, p -> cast({_u('id, p')} as double))"
    return (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"""cast(CASE WHEN id % 10 < 7
                THEN zip_with({hot_center}, {hot_noise}, (c, e) -> c + e)
                ELSE {uniform} END as array<float>)"""
            ).alias("embedding"),
            F.expr("id % 10 < 7").alias("is_hot"),
        )
        .repartition(32)
        .localCheckpoint(eager=True)  # freeze; exclude gen from timing
    )


def candidate_volume(queries, assigned, cent):
    """Rows the exact-scoring stage touches = Σ over (query, probed
    cell) of cell size — computed from the SAME public probe helper
    ivf_search calls (a hand-rolled copy here would silently diverge
    from what search actually scores if the probe ranking or its
    tie-break ever changes)."""
    probes = ivf_probe_cells(queries, cent, n_probe=N_PROBE)
    sizes = assigned.groupBy("cell").count()
    return probes.join(sizes, "cell").agg(F.sum("count")).collect()[0][0]


def timed(fn, passes):
    best = None
    for _ in range(passes):
        t0 = time.monotonic()
        out = fn()
        out.count()
        best = min(best or 1e9, time.monotonic() - t0)
    return best, out


def recall(bf, ann, queries):
    """Per-query-class exact recall@k AND similarity-quality ratio
    (mean cos_sim of ANN results / mean cos_sim of true top-k). Exact
    recall is a harsh metric inside a degenerate near-dup cluster —
    thousands of candidates are equally similar, so WHICH k come back
    is arbitrary; the quality ratio shows whether the returned
    neighbours are actually worse."""
    cls = queries.select(F.col("vec_id").alias("query_id"), "is_hot")
    out = {}
    for label, flag in (("hot", True), ("uniform", False)):
        b = bf.join(cls.where(F.col("is_hot") == flag), "query_id")
        a = ann.join(cls.where(F.col("is_hot") == flag), "query_id")
        total = b.count()
        if not total:
            continue
        hits = (
            b.select("query_id", "match_id")
            .join(a.select("query_id", "match_id"), ["query_id", "match_id"])
            .count()
        )
        sim_bf = b.agg(F.avg("cos_sim")).collect()[0][0]
        sim_ann = a.agg(F.avg("cos_sim")).collect()[0][0]
        out[f"recall_{label}"] = round(hits / total, 4)
        out[f"simratio_{label}"] = round(sim_ann / sim_bf, 6)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("soak-ivf-skew")
    corpus = gen(spark, n)
    # stride ends in 3 → coprime to the id%10 class split, so the ~100
    # sampled queries mirror the 70/30 hot/uniform corpus mix
    step = n // 100 + (3 - (n // 100) % 10) % 10
    queries = corpus.where(F.col("vec_id") % step == 0).localCheckpoint(
        eager=True
    )
    n_q = queries.count()
    t_bf, bf = timed(lambda: brute_force_topk(queries, corpus, k=K), passes)
    bf = bf.localCheckpoint(eager=True)

    # --- scenario 1: static skew, full-corpus training ---
    assigned, cent = kmeans_cells(corpus, n_cells=N_CELLS, iters=2,
                                  id_out="match_id")
    top = sorted(
        (r["count"] for r in assigned.groupBy("cell").count().collect()),
        reverse=True,
    )
    print(json.dumps({
        "measure": "static_skew", "n": n, "n_cells": N_CELLS,
        "top3_cell_sizes": top[:3], "hot_cell_frac": round(top[0] / n, 4),
    }), flush=True)

    # --- scenario 2: drift — train on uniform slice, append hot ---
    uniform = corpus.where(~F.col("is_hot"))
    _, cent_d = kmeans_cells(uniform, n_cells=N_CELLS, iters=2)
    assigned_d = assign_cells(corpus, cent_d, id_out="match_id").localCheckpoint(
        eager=True
    )
    top_d = sorted(
        (r["count"] for r in assigned_d.groupBy("cell").count().collect()),
        reverse=True,
    )
    cand_d = candidate_volume(queries, assigned_d, cent_d)
    t_d, ivf_d = timed(
        lambda: ivf_search(queries, corpus, assigned_d, cent_d,
                           k=K, n_probe=N_PROBE),
        passes,
    )
    print(json.dumps({
        "measure": "drift_before_refine", "top3_cell_sizes": top_d[:3],
        "hot_cell_frac": round(top_d[0] / n, 4),
        "scored_rows": int(cand_d), "scored_frac": round(cand_d / (n * n_q), 4),
        "ivf_sec": round(t_d, 3), "brute_sec": round(t_bf, 3),
        **recall(bf, ivf_d, queries),
    }), flush=True)

    # --- refine_hot_cells (q160) and re-measure ---
    t0 = time.monotonic()
    assigned_r, cent_r = refine_hot_cells(
        corpus, cent_d, max_cell_frac=0.05, n_split=16, iters=1,
        id_col="vec_id",
    )
    assigned_r = assigned_r.withColumnRenamed("vec_id", "match_id").localCheckpoint(
        eager=True
    )
    cent_r = cent_r.localCheckpoint(eager=True)
    t_refine = time.monotonic() - t0
    top_r = sorted(
        (r["count"] for r in assigned_r.groupBy("cell").count().collect()),
        reverse=True,
    )
    cand_r = candidate_volume(queries, assigned_r, cent_r)
    t_r, ivf_r = timed(
        lambda: ivf_search(queries, corpus, assigned_r, cent_r,
                           k=K, n_probe=N_PROBE),
        passes,
    )
    print(json.dumps({
        "measure": "drift_after_refine", "refine_sec": round(t_refine, 3),
        "top3_cell_sizes": top_r[:3],
        "hot_cell_frac": round(top_r[0] / n, 4),
        "scored_rows": int(cand_r), "scored_frac": round(cand_r / (n * n_q), 4),
        "ivf_sec": round(t_r, 3),
        **recall(bf, ivf_r, queries),
    }), flush=True)


if __name__ == "__main__":
    main()
