"""Registry-wide physical-plan lint — the scale disciplines as code.

Walks every registered query, builds its DataFrame at the smoke scale,
and greps the EXECUTED plan for the anti-patterns this engine bans:

- ``BatchEvalPython``  — row-at-a-time Python UDF. Banned everywhere
  (Arrow-batched ``ArrowEvalPython``/``MapInPandas`` are the only
  sanctioned Python surfaces).
- ``CartesianProduct`` — a non-broadcast cross join. Banned everywhere
  (intentional cross joins are 1-row/tiny broadcasts →
  ``BroadcastNestedLoopJoin``).
- unpartitioned ``Window`` — single-task global sort. Allowed ONLY for
  queries in WINDOW_ALLOW, each of which windows over a BOUNDED
  intermediate (a top-k limit, a bucket table, a day/band/decile
  aggregate — cardinality fixed by the value domain, not the data).
- ``Expand`` — the COUNT-DISTINCT/grouping-sets row multiplier.
  Allowed ONLY for EXPAND_ALLOW: genuine cube/rollup/grouping-sets
  semantics (where Expand IS the operator) — never as an accidental
  count-distinct plan (the q164 lesson: rewrite two-phase).

Builders that themselves execute jobs (lakehouse writers, iterative
algorithms) run for real here, so the full sweep costs minutes — it is
a script + env-gated test, not a default-suite test. Exit code 1 on
any violation outside the pinned allowlists; the allowlists are part
of the contract and reviewed like code.

Usage: python scripts/plan_lint.py [--names q01_x,q02_y]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"

#: queries whose unpartitioned Window runs over a bounded intermediate
#: (each entry names the bound in a trailing comment — auditable)
WINDOW_ALLOW = {
    "q07_topk_customers",           # top-k limit (≤10 rows)
    "q19_anchor_fallback",          # per-anchor candidate set (≤ sources)
    "q56_corpus_split",             # split × source grid (≤ 60 rows)
    "q61_vocab_df",                 # vocabulary (31-token domain)
    "q63_cube",                     # cube cells (status × priority grid)
    "q73_boilerplate_ngrams",       # capped n-gram shortlist (top 20)
    "q77_source_top_terms",         # source × vocab grid
    "q82_source_overlap",           # source-pair grid (≤ 400 rows)
    "q88_length_quantiles",         # 11 quantile marks
    "q110_inverted_index",          # df≥5 term table (vocab domain)
    "q112_bm25_topk",               # query-term posting union (bounded)
    "q115_collocation_lift",        # min-support bigram shortlist
    "q124_term_pagerank",           # vocab-domain graph (31 nodes)
    "q148_neardup_triangles",       # verified near-dup edge set
    "q158_rolling_distinct",        # day-grid distinct (date domain)
    "q161_volume_shipping",         # ship-mode × band grid
    "q170_market_basket",           # support≥2 part-pair shortlist
    "q175_exact_percentiles",       # 11 quantile marks
    "q184_percentile_normalize",    # source × decile grid
    "q189_decile_lift",             # decile table (10 rows)
    "q194_lorenz_curve",            # percentile grid (≤ 100 rows)
    "q199_cohort_ltv_curve",        # cohort × month grid
    "q203_trending_parts",          # top-k shortlists
    "q204_revenue_bridge",          # period-pair bridge rows (4)
    "q205_abc_classification",      # part-class cumulative (value domain)
    "q209_cusum_changepoint",       # daily series (date domain)
    "q213_journey_transitions",     # event-type² grid (≤ 36)
    "q214_index_serving_bm25",      # 5-term query set / top-20
    "q215_equidepth_histogram",     # bucket-edge table
    "q216_tfidf_topk",              # vocab-domain idf + top-k
    "q217_rfm_segments",            # quintile grids
    "q220_seasonal_anomaly",        # day-of-week × week grid
    "q221_curriculum_order",        # band table (4 rows)
    "q225_zipf_head_share",         # vocab-domain rank (31 tokens)
    "q229_source_length_drift",     # source × band grid
    "q230_sequence_transition_audit",  # type² transition grid
    "q231_repeat_purchase_curve",   # order-index grid (≤ 40)
    "q232_value_window_family",     # bounded demo slice (windows parity)
    "q233_max_drawdown",            # daily series (date domain)
    "q234_histogram_2d",            # 2-D band grid
    "q235_ordered_listagg",         # per-group caps (priority domain)
    "q239_weighted_median",         # priority-group grid
    "q240_benford_audit",           # 9 leading digits
    "q241_interarrival_burstiness", # user-level gaps → band grid
    "q242_top_user_paths",          # 3-step path shortlist (top 15)
    "q243_basket_size_value_curve", # basket-size grid
    "q244_discount_band_effectiveness",  # discount bands (11)
    "q245_centroid_separation",     # label² centroid grid
    "q251_pca_power_iteration",     # d² gram cells (256)
    "q255_bfs_distance",            # frontier rounds (hop-capped)
    "q256_chi_square_ab",           # 4-cell table
    "q257_logged_cdf_ivm",          # changed-version feed (bounded)
    "q261_hybrid_rrf_fusion",       # rank inside top-20 limits
}

#: queries where Expand IS the semantics (cube/rollup/grouping sets)
EXPAND_ALLOW = {
    "q21_rollup",
    "q22_pivot",
    "q63_cube",
    "q201_hierarchy_rollup",
    "q232_value_window_family",     # pivot-style stack demo
}


def _plan_nodes(plan_json) -> list[dict]:
    """Flatten the executedPlan().toJSON() tree into its operator dicts."""
    out: list[dict] = []
    stack = [plan_json]
    while stack:
        n = stack.pop()
        if isinstance(n, dict):
            if "class" in n:
                out.append(n)
            stack.extend(n.values())
        elif isinstance(n, list):
            stack.extend(n)
    return out


def lint(plan_json, name: str) -> list[str]:
    errs = []
    for n in _plan_nodes(plan_json):
        cls = n["class"].rsplit(".", 1)[-1]
        if cls == "BatchEvalPythonExec":
            errs.append("row-at-a-time Python UDF (BatchEvalPythonExec)")
        if cls == "BatchEvalPythonUDTFExec":
            errs.append("row-eval Python UDTF (use useArrow=True)")
        if cls == "CartesianProductExec":
            errs.append("non-broadcast cartesian product")
        if cls == "ExpandExec" and name not in EXPAND_ALLOW:
            errs.append("Expand outside cube/rollup allowlist")
        if (
            cls in ("WindowExec", "WindowInPandasExec")
            and not n.get("partitionSpec")
            and name not in WINDOW_ALLOW
        ):
            errs.append("unpartitioned Window outside allowlist")
    return sorted(set(errs))


def main() -> int:
    from pyspark.sql import SparkSession

    from football_lakehouse_spark.plans.registry import REGISTRY

    names = None
    for a in sys.argv[1:]:
        if a.startswith("--names"):
            names = a.split("=", 1)[1].split(",")
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-lint")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for name, spec in REGISTRY.items():
        if names and name not in names:
            continue
        try:
            import json

            df = spec.builder(spark, SF_SMOKE)
            plan_json = json.loads(
                df._jdf.queryExecution().executedPlan().toJSON()
            )
        except Exception as ex:  # builder executing real jobs can fail loudly
            print(f"{name}: BUILD ERROR {ex!r}"[:200], flush=True)
            bad += 1
            continue
        errs = lint(plan_json, name)
        for e in errs:
            print(f"{name}: {e}", flush=True)
        bad += len(errs)
    print(f"plan-lint: {bad} violation(s) across "
          f"{len(names or REGISTRY)} queries", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
