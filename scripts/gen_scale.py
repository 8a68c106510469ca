"""Generate a larger-scale fixture set by replicating the sf0.1 tables
with consistent key shifts — used for the SCALING.md soak (the driver
only ships sf0.001/0.01/0.1; this synthesises sf1 = 10× facts locally).

Semantics of the scale-up (mirrors how real warehouses grow):
- FACT tables (orders, lineitem, events, documents, embeddings) are
  replicated ``factor`` times with all join keys shifted consistently
  (customer keys shift in lockstep in customer+orders, order keys in
  orders+lineitem), so every join produces factor× the rows at
  unchanged selectivity.
- DIMENSIONS (region, nation, supplier, part) keep ONE copy — dims
  don't grow 10× when facts do, and this preserves the
  broadcast-ability the plans rely on.
- Document text gets a per-replica marker token appended so the
  near-dup structure scales linearly (factor× the clusters) instead of
  quadratically (every doc suddenly having `factor` exact copies →
  C(factor,2) pairs per doc, which is a different workload, not a
  scale-up of the same one).

Usage: python scripts/gen_scale.py [factor] [out_dir]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from football_lakehouse_spark.catalog import TABLES, load_table  # noqa: E402
from football_lakehouse_spark.session import get_spark  # noqa: E402

DIMS = {"region", "nation", "supplier", "part"}
SRC = "/root/testdata/sf0.1"


def replica_text_expr(i):
    """Per-token replica suffix for document text (replica ``i`` > 0).
    ``i`` is an int replica id, or a Column of replica ids for
    generators that build every replica in one crossJoin pass (the
    cold-pipeline soak) — ONE rule, wherever replicas are made.

    Suffix EVERY token by the replica id (the soak_cold_pipeline.gen_docs
    rule), not just append one marker token: a single appended token
    leaves replicas sharing (T-4)/(T-2) of their shingles — mutual
    near-dups at Jaccard ~0.98, so pair work grew QUADRATICALLY in
    factor and dedup collapsed the scaled corpus back to ~1/factor (the
    q274 superlinear-pairs symptom in SCALING). Per-token suffixes keep
    replicas shingle-disjoint: near-dup structure scales linearly.

    Empty split elements (leading/trailing whitespace, whitespace-only
    docs) stay empty — suffixing them would mint phantom "r{i}" tokens
    that the base corpus never had, changing the empty-doc /
    adversarial-whitespace shapes the corpus deliberately carries.
    Known normalization: replicas collapse whitespace RUNS to single
    spaces (array_join). Tokenization uses the same [ \\t\\n\\r\\f]+
    class, so token streams — what the dedup/text soaks measure — are
    unaffected; SCALING.md notes this."""
    from pyspark.sql import Column

    suffix = (
        F.concat(F.lit("r"), i.cast("string"))
        if isinstance(i, Column)
        else F.lit(f"r{i}")
    )
    return F.array_join(
        F.transform(
            F.split(F.col("text"), "[ \t\n\r\f]+"),
            lambda t: F.when(t != "", F.concat(t, suffix)).otherwise(t),
        ),
        " ",
    )


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fls-sf1"
    spark = get_spark("gen-scale")
    src = {t: load_table(spark, SRC, t) for t in TABLES}

    # key strides: next power of 10 above the max key keeps shifted ids readable
    def stride(df, col):
        m = df.agg(F.max(col)).collect()[0][0]
        s = 1
        while s <= m:
            s *= 10
        return s

    ck = stride(src["customer"], "c_custkey")
    ok = stride(src["orders"], "o_orderkey")
    ev = stride(src["events"], "event_id")
    uv = stride(src["events"], "user_id")
    dc = stride(src["documents"], "doc_id")
    vc = stride(src["embeddings"], "vec_id")

    def replicate(name, df, shifts):
        parts = []
        for i in range(factor):
            p = df
            for col, s in shifts.items():
                p = p.withColumn(col, F.col(col) + F.lit(i * s))
            if name == "documents" and i > 0:
                p = p.withColumn("text", replica_text_expr(i))
            parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        df = src[t]
        if t not in DIMS:
            shifts = {
                "customer": {"c_custkey": ck},
                "orders": {"o_orderkey": ok, "o_custkey": ck},
                "lineitem": {"l_orderkey": ok},
                # shift user_id too: replicas with IDENTICAL (user_id,
                # ts) rows multiply per-user event density by factor —
                # user_id self-joins (as-of) grow pairs quadratically
                # and user-partitioned windows see duplicate-ts ties,
                # i.e. the soak measures a different workload than
                # "factor× facts at unchanged selectivity"
                "events": {"event_id": ev, "user_id": uv},
                "documents": {"doc_id": dc},
                "embeddings": {"vec_id": vc},
            }[t]
            df = replicate(t, df, shifts)
        # single parquet file per table to mirror the driver fixtures
        df.coalesce(max(1, 4 if t not in DIMS else 1)).write.mode("overwrite").parquet(
            os.path.join(out, f"_{t}")
        )
        # driver fixtures are bare files `<table>.parquet`; keep that shape
        import glob
        import shutil

        files = sorted(glob.glob(os.path.join(out, f"_{t}", "*.parquet")))
        if len(files) == 1:
            shutil.move(files[0], os.path.join(out, f"{t}.parquet"))
            shutil.rmtree(os.path.join(out, f"_{t}"))
        else:
            # multi-file tables stay as a directory named <table>.parquet
            target = os.path.join(out, f"{t}.parquet")
            shutil.rmtree(target, ignore_errors=True)
            os.rename(os.path.join(out, f"_{t}"), target)
        print(t, "done")
    spark.stop()


if __name__ == "__main__":
    main()
