"""Quickstart — the reference user's workflow on this engine.

Runs the full medallion slice (bronze ingest → silver conform → gold
facts), the flagship horizon query, a MERGE + time travel, and an LLM-
data pass (near-dup + ANN) against the sf0.001 fixtures.

    python examples/quickstart.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from football_lakehouse_spark.catalog import load_table  # noqa: E402
from football_lakehouse_spark.lakehouse.tables import LakehouseTable  # noqa: E402
from football_lakehouse_spark.operators.dedup import minhash_lsh_neardups  # noqa: E402
from football_lakehouse_spark.operators.similarity import brute_force_topk  # noqa: E402
from football_lakehouse_spark.pipelines.medallion import run_pipeline  # noqa: E402
from football_lakehouse_spark.plans import registry  # noqa: E402
from football_lakehouse_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("quickstart", cpus=8)
    root = tempfile.mkdtemp(prefix="fls-quickstart-")

    print("== medallion slice (bronze → silver → gold, rerun-safe)")
    events = load_table(spark, SF, "events")
    versions = run_pipeline(spark, events, root)
    print("   committed versions:", versions)
    rerun = run_pipeline(spark, events, root)
    print("   rerun (bronze skipped):", rerun["bronze"] is None)

    print("== flagship horizon query (reference 42_build_fixture_horizons)")
    registry.REGISTRY["q01_fixture_horizons"].builder(spark, SF).show(5, truncate=False)

    print("== MERGE + time travel")
    t = LakehouseTable(spark, root, "silver", "demo")
    t.append(events.limit(100).select("event_id", "event_type", "value"))
    late = (
        events.limit(10)
        .select("event_id", F.lit("corrected").alias("event_type"), F.col("value"))
    )
    t.merge(late, ["event_id"])
    print("   v0 rows:", t.read(version=0).count(), "| current corrected:",
          t.read().where("event_type = 'corrected'").count())
    print("   history:", [(h["version"], h["operation"]) for h in t.describe_history()])

    print("== ALTER TABLE family (all metadata-only) + constraints + DVs")
    t.add_constraint("nonneg_value", "value >= 0")
    try:
        t.append(t.read().limit(1).withColumn("value", F.lit(-1.0)))
    except Exception as ex:
        print("   violating append rejected:", type(ex).__name__)
    t.drop_constraint("nonneg_value")  # it references the old name
    t.rename_column("value", "points")
    t.add_constraint("nonneg_points", "points >= 0")
    t.delete(F.col("points") > 300, deletion_vectors=True)
    print("   after rename + DV delete:", t.read().columns,
          "rows:", t.read().count())
    t.restore(0)
    print("   restored to v0:", t.read().columns, t.read().count())

    print("== LLM-data: near-duplicates + similarity search")
    docs = load_table(spark, SF, "documents")
    pairs = minhash_lsh_neardups(docs, threshold=0.5)
    print("   near-dup pairs (jaccard ≥ 0.5):", pairs.count())
    emb = load_table(spark, SF, "embeddings")
    topk = brute_force_topk(emb.where("vec_id < 3"), emb, k=3)
    topk.show(9, truncate=False)

    print("== LLM-data: passage-level span dedup (Lee et al. granularity)")
    from football_lakehouse_spark.operators.dedup import (  # noqa: E402
        duplicate_spans,
        trim_duplicate_spans,
    )

    spans = duplicate_spans(docs, n=5, min_docs=2)
    trimmed = trim_duplicate_spans(docs, spans, keep_canonical=True)
    removed = trimmed.agg(F.sum("n_tokens_removed")).collect()[0][0]
    print("   duplicate spans:", spans.count(),
          "| tokens trimmed (keep-one-canonical):", removed)

    print("== ANN index lifecycle: build offline, persist, serve from artifacts")
    from football_lakehouse_spark.operators.similarity import (  # noqa: E402
        ivf_search,
        kmeans_cells,
    )

    assigned, cent = kmeans_cells(emb, n_cells=8, iters=2, id_out="match_id")
    vec_t = LakehouseTable(spark, root, "gold", "ann_vectors")
    asg_t = LakehouseTable(spark, root, "gold", "ann_assignments")
    cen_t = LakehouseTable(spark, root, "gold", "ann_centroids")
    vec_t.append(emb.select("vec_id", "embedding"))
    asg_t.append(assigned)
    cen_t.append(cent)
    # the serving process only ever sees the stored tables (q294's shape)
    vecs = vec_t.read()
    served = ivf_search(
        vecs.where("vec_id < 3"), vecs, asg_t.read(), cen_t.read(),
        k=3, n_probe=2,
    )
    served.show(9, truncate=False)

    spark.stop()
    print("done.")


if __name__ == "__main__":
    main()
