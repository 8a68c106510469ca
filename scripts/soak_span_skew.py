"""Span-dedup SKEW soak (r10 verdict #5): the growth soaks cover
uniform ×10/×100/×1000 — this one attacks the hashed-key partition
balance claim directly with the adversarial shape it protects against:

  * ONE source 100× the rest (src0 replicated ×100 with per-token
    replica suffixes — shingle-disjoint replicas, the gen_scale rule),
  * boilerplate CONCENTRATED in the hot source: the same 8-token
    passage prefixed to every hot-source doc and replica, so one
    shingle key occurs ~25k times while the median key occurs once.

Claim under test (operators/dedup.duplicate_spans plan contract):
source-level skew must NOT create a hot shuffle partition, because
the one corpus shuffle keys on xxhash64(shingle) — uniform by
construction — and the island window partitions by doc_id, never by
source. The hot boilerplate KEY concentrates rows, but its partial
countDistinct pre-aggregates map-side and the hits join fans out
across doc-partitioned tasks.

Measured per corpus (balanced control vs skewed, ~equal row count):
per-jobGroup wall, shuffle read/write bytes, and the STRAGGLER RATIO
(max/median task executorRunTime over every completed stage in the
group — the number that exposes a hot partition even when wall time
hides it behind 31 idle cores). Also runs the incremental probe of a
persisted span_key_index with the hot-source batch.

Usage: python scripts/soak_span_skew.py [hot_factor] [out_json]
Defaults: hot_factor=100, prints JSON lines to stdout.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time
import urllib.request

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from football_lakehouse_spark.operators.dedup import (  # noqa: E402
    duplicate_spans,
    incremental_duplicate_spans,
    span_key_index,
)
from football_lakehouse_spark.session import get_spark  # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "gen_scale", os.path.join(os.path.dirname(os.path.abspath(__file__)), "gen_scale.py")
)
_gen_scale = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_gen_scale)

SRC = "/root/testdata/sf0.1/documents.parquet"
OUT = "/tmp/fls-skew"
UI_PORT = 4098
BOILER = " ".join(f"bp{i}" for i in range(8))


def _rest(spark, path: str):
    app = spark.sparkContext.applicationId
    base = spark.sparkContext.uiWebUrl or f"http://localhost:{UI_PORT}"
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/{path}", timeout=30
    ) as r:
        return json.loads(r.read())


def group_stage_metrics(spark, group: str) -> dict:
    """Shuffle bytes + worst straggler ratio across every completed
    stage of ``group``'s jobs (max/median task executorRunTime,
    stages with <4 tasks or <1s of total run time skipped — ratio is
    meaningless there)."""
    jobs = [j for j in _rest(spark, "jobs?status=succeeded")
            if j.get("jobGroup") == group]
    stages = {s["stageId"]: s for s in _rest(spark, "stages?status=COMPLETE")}
    acc = {"shuffle_read_b": 0, "shuffle_write_b": 0, "input_b": 0}
    worst = {"ratio": 0.0, "stage": None, "tasks": 0}
    seen: set[int] = set()
    for j in jobs:
        for sid in j.get("stageIds", []):
            if sid in seen or sid not in stages:
                continue
            seen.add(sid)
            s = stages[sid]
            acc["shuffle_read_b"] += s.get("shuffleReadBytes", 0)
            acc["shuffle_write_b"] += s.get("shuffleWriteBytes", 0)
            acc["input_b"] += s.get("inputBytes", 0)
            n_tasks = s.get("numCompleteTasks", 0)
            if n_tasks < 4 or s.get("executorRunTime", 0) < 1000:
                continue
            try:
                summ = _rest(
                    spark,
                    f"stages/{sid}/{s['attemptId']}/taskSummary"
                    "?quantiles=0.5,1.0",
                )
            except Exception:
                continue
            med, mx = summ["executorRunTime"]
            if med > 0 and mx / med > worst["ratio"]:
                worst = {
                    "ratio": round(mx / med, 2),
                    "stage": s.get("name", "")[:60],
                    "tasks": n_tasks,
                }
    acc["straggler"] = worst
    return acc


def build_corpora(spark, hot_factor: int) -> tuple[str, str]:
    docs = spark.read.parquet(SRC)
    stride = 10 ** len(str(docs.agg(F.max("doc_id")).collect()[0][0]))

    def replicas(base, n):
        parts = []
        for i in range(n):
            p = base.withColumn("doc_id", F.col("doc_id") + F.lit(i * stride))
            if i > 0:
                p = p.withColumn("text", _gen_scale.replica_text_expr(i))
            parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    # skewed: src0 ×hot_factor, every hot doc prefixed with the SAME
    # boilerplate passage (suffix-proof: prepended AFTER the replica
    # suffix pass so the passage is byte-identical across all copies)
    hot = replicas(docs.where(F.col("source") == "src0"), hot_factor)
    hot = hot.withColumn("text", F.concat(F.lit(BOILER + " "), F.col("text")))
    cold = docs.where(F.col("source") != "src0")
    skewed_path = os.path.join(OUT, f"skewed_x{hot_factor}")
    hot.unionByName(cold).write.mode("overwrite").parquet(skewed_path)

    # balanced control at ~the same row count: every source replicated
    # equally (no shared passage beyond what the base corpus carries)
    n_bal = max((hot_factor * 250 + 4750) // 5000, 1)
    balanced_path = os.path.join(OUT, f"balanced_x{n_bal}")
    replicas(docs, n_bal).write.mode("overwrite").parquet(balanced_path)
    return skewed_path, balanced_path


def main() -> None:
    hot_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark(
        "soak-span-skew",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    skewed_path, balanced_path = build_corpora(spark, hot_factor)
    sc = spark.sparkContext
    results = []

    for tag, path in (("balanced", balanced_path), ("skewed", skewed_path)):
        docs = spark.read.parquet(path)
        n_docs = docs.count()

        sc.setJobGroup(f"{tag}_full", f"{tag}_full")
        t0 = time.perf_counter()
        duplicate_spans(docs, n=5, min_docs=2).write.mode("overwrite").parquet(
            os.path.join(OUT, f"spans_{tag}")
        )
        full_s = time.perf_counter() - t0

        # incremental: the LAST hot replica (or last replica overall in
        # the control) arrives as a batch against everything else
        stride = 10 ** (len(str(spark.read.parquet(SRC)
                                .agg(F.max("doc_id")).collect()[0][0])))
        top = docs.agg(F.max(F.expr(f"doc_id div {stride}"))).collect()[0][0]
        batch = docs.where(F.expr(f"doc_id div {stride}") == top)
        corpus = docs.where(F.expr(f"doc_id div {stride}") < top)
        sc.setJobGroup(f"{tag}_index", f"{tag}_index")
        t0 = time.perf_counter()
        idx_path = os.path.join(OUT, f"keys_{tag}")
        span_key_index(corpus, n=5).write.mode("overwrite").parquet(idx_path)
        idx_s = time.perf_counter() - t0
        sc.setJobGroup(f"{tag}_probe", f"{tag}_probe")
        t0 = time.perf_counter()
        incremental_duplicate_spans(
            batch, n=5, corpus_keys=spark.read.parquet(idx_path)
        ).write.mode("overwrite").parquet(os.path.join(OUT, f"inc_{tag}"))
        probe_s = time.perf_counter() - t0
        sc.setJobGroup("_idle", "_idle")

        row = {
            "corpus": tag,
            "n_docs": n_docs,
            "batch_docs": batch.count(),
            "full_sec": round(full_s, 2),
            "index_sec": round(idx_s, 2),
            "probe_sec": round(probe_s, 2),
        }
        for g in ("full", "index", "probe"):
            m = group_stage_metrics(spark, f"{tag}_{g}")
            row[f"{g}_shuffle_write_mb"] = round(m["shuffle_write_b"] / 1e6, 1)
            row[f"{g}_shuffle_read_mb"] = round(m["shuffle_read_b"] / 1e6, 1)
            row[f"{g}_straggler"] = m["straggler"]
        results.append(row)
        print(json.dumps(row), flush=True)

    if out_json:
        with open(out_json, "w") as f:
            json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
