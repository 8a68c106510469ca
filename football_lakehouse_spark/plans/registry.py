"""Central query registry — the single source of truth for the engine's
verified operator surface.

Every operator from SURVEY.md §2 (plus the LLM-data north-star ops) is
registered here as a named query with, where SQL-expressible, a DuckDB
oracle twin. ``__spark_entry__.py``, the pytest suite, and ``bench.py``
all consume this registry, so a query is "done" exactly when it appears
here and its oracle matches.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL over the same fixture views; None → rows-only check
    doc: str = ""
    bench: bool = False  # include in bench.py's headline set
    tags: tuple[str, ...] = field(default_factory=tuple)
    #: scale the oracle is valid at (e.g. "sf0.01" for pinned-literal
    #: regression oracles); None → valid at every scale factor
    oracle_sf: str | None = None


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
    oracle_sf: str | None = None,
) -> Callable[[Builder], Builder]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name, fn, oracle, doc or (fn.__doc__ or ""), bench, tags, oracle_sf
        )
        return fn

    return deco


#: Driver-facing ordering. The driver records CORRECTNESS rows for exactly
#: the first 50 registry entries per round, so the per-round report is a
#: 50-query prefix of this order.
#:
#: Attestation policy — OLDEST-FIRST ROTATION. Every registered query
#: has a driver-green CORRECTNESS row as of r8 (replay CORRECTNESS_r01–r08
#: against this registry to verify: 281/281 green, zero red rows). From
#: r9 on, each round's 50-row prefix is simply the 50 registered queries
#: whose latest driver-green row is OLDEST, ties broken by registration
#: order — so freshness is self-maintaining and no query's attestation
#: ever ages more than ceil(281/50) = 6 rounds. The cohort below was
#: computed by replaying CORRECTNESS_r01–r08 (last-attested histogram at
#: the time: r3:34, r4:49, r5:48, r6:50, r7:50, r8:50); it is the 34
#: r3-stale queries plus the 16 oldest r4 rows; the five r9 additions
#: (q283–q287, never attested = round-0 = oldest of all) lead it, and
#: the five youngest r4 rows they displace (q154, q157, q158, q30,
#: q72) rotate into r10's prefix. After r9 lands green, nothing is
#: older than r4. To rotate for r10, run
#: `python scripts/replay_attestation.py` and replace this tuple with
#: the printed oldest-50 (the script also flags any registered query
#: whose LATEST driver row is red — fix those, don't rotate them).
#:
#: Everything past the 50-row prefix is attested by the pytest oracle
#: suite at sf0.001 AND sf0.01 (tests/test_oracle.py with
#: SPARK_GRAFT_TEST_FULL=1, ledger in SCALING.md). The r7 freeze clause
#: ("frozen until the attestation sweep completes") was satisfied in r8;
#: the registry may grow again, and new queries join the rotation as
#: round-0 (never attested → oldest → front of the next prefix).
DRIVER_ORDER_FIRST: tuple[str, ...] = (
    # --- r9 prefix: the five never-attested r9 additions lead ---
    "q283_duplicate_spans",
    "q284_source_quota_select",
    "q285_incremental_spans",
    "q286_span_trimmed_corpus",
    "q287_contamination_spans",
    # --- then oldest-first rotation: the 34 r3-stale queries ---
    "q13_date_funcs",
    "q14_content_hash_groups",
    "q15_dedup_keep_first",
    "q16_exists_probe",
    "q17_multiway_join",
    "q18_anti_semi_join",
    "q19_anchor_fallback",
    "q20_unpivot_metrics",
    "q21_rollup",
    "q22_pivot",
    "q23_pricing_summary",
    "q24_revenue_by_nation",
    "q63_cube",
    "q68_set_ops",
    "q03_latest_snapshot_per_customer",
    "q25_rolling_form",
    "q26_value_delta",
    "q27_live_state",
    "q29_merge_upsert",
    "q55_rollup_cascade",
    "q70_schema_evolution",
    "q33_windowed_counts",
    "q66_sliding_window",
    "q67_session_window",
    "q34_feature_pipeline",
    "q36_transfer_optimizer",
    "q37_token_stats",
    "q38_lang_quality",
    "q39_doc_fingerprint",
    "q40_dedup_exact",
    "q41_minhash_neardup",
    "q45_ann_lsh",
    "q85_incremental_neardup",
    "q50_approx_stats",
    # --- then the 16 oldest r4-attested rows ---
    "q136_referential_integrity_audit",
    "q145_rank_family",
    "q146_relational_division",
    "q147_grouping_sets",
    "q155_mode_per_group",
    "q156_value_histogram",
    "q28_sessionize",
    "q132_funnel_conversion",
    "q149_activity_gaps",
    "q150_ewma",
    "q152_cohort_retention",
    # (q154_distribution_drift, q157_cumulative_distinct,
    # q158_rolling_distinct, q30_time_travel and q72_delete_rows — the
    # next-oldest r4 rows — were displaced by the five r9 additions
    # above; they lead r10's rotation instead)
)


def _driver_ordered() -> list[str]:
    front = list(dict.fromkeys(n for n in DRIVER_ORDER_FIRST if n in REGISTRY))
    rest = [n for n in REGISTRY if n not in set(front)]
    return front + rest


def all_queries() -> dict[str, Builder]:
    return {n: REGISTRY[n].builder for n in _driver_ordered()}


def all_oracles() -> dict[str, str]:
    return {
        n: REGISTRY[n].oracle
        for n in _driver_ordered()
        if REGISTRY[n].oracle is not None
    }


def bench_queries() -> dict[str, QuerySpec]:
    return {n: s for n, s in REGISTRY.items() if s.bench}
