"""Composed cold-path curation rehearsal at 10x / 100x scale
(r6 verdict #6): quality gate -> exact dedup -> LSH near-dup clusters
-> token-budget selection -> sharded split write, each stage timed
with its SHUFFLE BYTES attributed via the Spark UI REST API — the
per-stage cost table a 100 TB user asks for first.

This is the q84 composition widened to the full production shape:
q84 itself fuses quality+dedup+split into one pass (and stays the
oracle-checked correctness witness); here every stage MATERIALIZES to
scratch parquet — the honest cold-start topology, because at 100 TB
each stage is a restartable checkpoint, not a fused expression — so
each stage's wall/shuffle cost is individually visible.

Scaled corpora are documents replicated factor x with every token
suffixed by its replica id: replicas share no shingles, so near-dup
structure (and thus stage-3 pair work) scales LINEARLY like a bigger
real corpus with the same dup rate — the adversarial inflated-cluster
variant is soak_sf10.py's job, not this one.

Shuffle attribution: each stage runs under its own spark job group;
stage metrics come from /api/v1/applications/<id>/stages joined to
/jobs by stage id (the UI is enabled on a local port for this script
only — no external network involved).

Usage: python scripts/soak_cold_pipeline.py [factor ...]
       (default: 1 10 100 — sf0.1, sf1, sf10 equivalents)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from football_lakehouse_spark.functions.text import STOPWORDS, ws_tokens  # noqa: E402
from football_lakehouse_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    minhash_lsh_neardups,
    neardup_clusters_star,
)
from football_lakehouse_spark.operators.selection import token_budget_select  # noqa: E402
from football_lakehouse_spark.session import get_spark  # noqa: E402
from football_lakehouse_spark.plans.llm_plans import (  # noqa: E402
    _GOPHER_ALPHA_MIN,
    _GOPHER_MAX_LEN,
    _GOPHER_MAX_TOKS,
    _GOPHER_MIN_LEN,
    _GOPHER_MIN_STOPS,
    _GOPHER_MIN_TOKS,
)

SRC = "/root/testdata/sf0.1/documents.parquet"
UI_PORT = 4099


def gen_docs(spark, factor: int, out: str) -> str:
    """documents replicated ``factor``x, tokens made replica-unique."""
    if factor == 1:
        return SRC
    path = os.path.join(out, f"documents_x{factor}.parquet")
    if os.path.exists(path):
        return path
    reps = F.broadcast(spark.range(factor).withColumnRenamed("id", "__rep"))
    df = spark.read.parquet(SRC)
    stride = 10 ** len(str(df.agg(F.max("doc_id")).collect()[0][0]))
    big = (
        df.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * F.lit(stride))
        .withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.concat(t, F.lit("r"), F.col("__rep")),
                ),
                " ",
            ),
        )
        .drop("__rep")
    )
    big.repartition(32).write.mode("overwrite").parquet(path)
    return path


def rest(spark, path: str):
    app = spark.sparkContext.applicationId
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app}/{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def group_shuffle_bytes(spark) -> dict[str, dict[str, int]]:
    """jobGroup -> summed shuffle read/write + input bytes."""
    jobs = rest(spark, "jobs?status=succeeded")
    stages = {
        s["stageId"]: s
        for s in rest(spark, "stages?status=COMPLETE")
    }
    seen: set[int] = set()
    out: dict[str, dict[str, int]] = {}
    for j in jobs:
        g = j.get("jobGroup") or "_none"
        acc = out.setdefault(
            g, {"shuffle_read_b": 0, "shuffle_write_b": 0, "input_b": 0}
        )
        for sid in j.get("stageIds", []):
            if sid in seen or sid not in stages:
                continue
            seen.add(sid)
            s = stages[sid]
            acc["shuffle_read_b"] += s.get("shuffleReadBytes", 0)
            acc["shuffle_write_b"] += s.get("shuffleWriteBytes", 0)
            acc["input_b"] += s.get("inputBytes", 0)
    return out


def run_pipeline(spark, docs_path: str, scratch: str) -> list[dict]:
    sc = spark.sparkContext
    results = []

    def stage(name, fn):
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        rows = fn()
        dt = time.perf_counter() - t0
        sc.setJobGroup("_idle", "_idle")
        results.append({"stage": name, "sec": round(dt, 2), "rows_out": rows})
        return rows

    p = lambda n: os.path.join(scratch, n)  # noqa: E731

    def s1_quality():
        docs = spark.read.parquet(docs_path)
        toks = ws_tokens(F.col("text"))
        m = docs.select("doc_id", "source", "text", toks.alias("toks"))
        n = F.size("toks").cast("bigint")
        total_len = F.aggregate(
            "toks", F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        )
        mean_len = F.floor(total_len * 10000 / n).cast("double") / 10000
        # the scaled corpora suffix every token with its replica id, so
        # pure-alpha and exact-stopword tests must strip the suffix the
        # same way a tokenizer would normalise; factor=1 is a no-op
        stop_hits = F.size(
            F.array_distinct(
                F.filter(
                    F.transform("toks", lambda x: F.regexp_replace(x, "r[0-9]+$", "")),
                    lambda x: x.isin(*STOPWORDS),
                )
            )
        )
        alpha_toks = F.size(
            F.filter(
                F.transform("toks", lambda x: F.regexp_replace(x, "r[0-9]+$", "")),
                lambda x: x.rlike("^[a-z]+$"),
            )
        )
        alpha = F.floor(alpha_toks.cast("bigint") * 10000 / n).cast("double") / 10000
        q = m.where(
            n.between(_GOPHER_MIN_TOKS, _GOPHER_MAX_TOKS)
            & mean_len.between(_GOPHER_MIN_LEN, _GOPHER_MAX_LEN)
            & (alpha >= _GOPHER_ALPHA_MIN)
            & (stop_hits >= _GOPHER_MIN_STOPS)
        ).select("doc_id", "source", "text", n.alias("n_tokens"))
        q.write.mode("overwrite").parquet(p("s1"))
        return spark.read.parquet(p("s1")).count()

    def s2_exact():
        q = spark.read.parquet(p("s1"))
        d = exact_dedup(q, F.sha2(F.col("text"), 256))
        d.write.mode("overwrite").parquet(p("s2"))
        return spark.read.parquet(p("s2")).count()

    def s3_lsh():
        d = spark.read.parquet(p("s2"))
        pairs = minhash_lsh_neardups(d, threshold=0.5)
        clusters = neardup_clusters_star(pairs.select("doc_a", "doc_b"))
        losers = clusters.where(~F.col("is_canonical")).select(
            F.col("doc_id").alias("loser_id")
        )
        kept = d.join(
            F.broadcast(losers),
            d["doc_id"] == F.col("loser_id"),
            "left_anti",
        )
        kept.write.mode("overwrite").parquet(p("s3"))
        return spark.read.parquet(p("s3")).count()

    def s4_select():
        d = spark.read.parquet(p("s3"))
        scored = d.withColumn(
            "score",
            F.floor(
                F.size(F.array_distinct(ws_tokens(F.col("text"))))
                .cast("bigint") * 1000000 / F.col("n_tokens")
            ).cast("bigint"),
        )
        budget = int(
            scored.agg(F.sum("n_tokens")).collect()[0][0] * 6 // 10
        )
        sel = token_budget_select(scored, budget).where(F.col("selected"))
        sel.join(d.select("doc_id", "source", "text"), "doc_id").write.mode(
            "overwrite"
        ).parquet(p("s4"))
        return spark.read.parquet(p("s4")).count()

    def s5_shard():
        d = spark.read.parquet(p("s4"))
        bucket = (
            F.conv(
                F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 4),
                16, 10,
            ).cast("bigint") % 20
        )
        split = (
            F.when(bucket < 18, F.lit("train"))
            .when(bucket == 18, F.lit("val"))
            .otherwise(F.lit("test"))
        )
        shuffle_key = F.conv(
            F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 9, 8), 16, 10
        ).cast("bigint")
        (
            d.withColumn("split", split)
            .withColumn("__sk", shuffle_key)
            .repartition("split")
            .sortWithinPartitions("__sk")
            .drop("__sk")
            .write.mode("overwrite")
            .partitionBy("split")
            .parquet(p("s5"))
        )
        return spark.read.parquet(p("s5")).count()

    for name, fn in (
        ("quality", s1_quality),
        ("exact_dedup", s2_exact),
        ("lsh_clusters", s3_lsh),
        ("selection", s4_select),
        ("shard_write", s5_shard),
    ):
        stage(name, fn)
    return results


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    for factor in factors:
        spark = get_spark(
            f"soak-cold-x{factor}",
            extra_conf={
                "spark.ui.enabled": "true",
                "spark.ui.port": str(UI_PORT),
            },
        )
        spark.sparkContext.setLogLevel("ERROR")
        docs = gen_docs(spark, factor, "/tmp/fls-cold")
        scratch = f"/tmp/fls-cold/run_x{factor}"
        results = run_pipeline(spark, docs, scratch)
        shuf = group_shuffle_bytes(spark)
        for r in results:
            r.update(
                {
                    k.replace("_b", "_mb"): round(v / 1e6, 1)
                    for k, v in shuf.get(r["stage"], {}).items()
                }
            )
            print(json.dumps({"factor": factor, **r}), flush=True)
        spark.stop()
        # a fresh session per factor keeps REST metrics per-run


if __name__ == "__main__":
    main()
