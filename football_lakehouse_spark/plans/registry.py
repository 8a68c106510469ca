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
#: has a driver-green CORRECTNESS row (replay CORRECTNESS_r01–r09
#: against this registry to verify: 286/286 green, zero red rows, and
#: after r9 nothing older than r4). Each round's 50-row prefix is the
#: 50 registered queries whose latest driver-green row is OLDEST, ties
#: broken by registration order — freshness is self-maintaining and no
#: query's attestation ever ages more than ceil(n/50) rounds. This r10
#: cohort is `python scripts/replay_attestation.py`'s printed oldest-50:
#: the six never-attested r10 additions (q288–q293) lead, then the
#: five r4 rows the r9 additions displaced (q154, q157, q158, q30,
#: q72) and the rest of the r4/r5 cohort; the six rows the r10
#: additions displace (q162–q165, q170, q180) lead r11's rotation. To
#: rotate for r11, run the replay script and replace this tuple with
#: its printed oldest-50 (the script also flags any registered query
#: whose LATEST driver row is red — fix those, don't rotate them).
#:
#: Everything past the 50-row prefix is attested by the pytest oracle
#: suite at sf0.001 AND sf0.01 (tests/test_oracle.py with
#: SPARK_GRAFT_TEST_FULL=1, ledger in SCALING.md).
DRIVER_ORDER_FIRST: tuple[str, ...] = (
    "q288_span_trim_keep_canonical",
    "q289_span_index_lifecycle",
    "q290_source_quota_bucketed",
    "q291_streaming_span_dedup",
    "q292_span_dedup_funnel",
    "q293_decontaminated_corpus",
    "q154_distribution_drift",
    "q157_cumulative_distinct",
    "q158_rolling_distinct",
    "q30_time_travel",
    "q72_delete_rows",
    "q125_table_restore",
    "q31_idempotent_ingest",
    "q134_check_constraint_gate",
    "q135_shallow_clone",
    "q137_table_schema_evolution",
    "q138_rename_column",
    "q139_drop_column",
    "q140_deletion_vectors",
    "q141_update_rows",
    "q142_scd2_history",
    "q144_expectations_quarantine",
    "q106_streaming_dedup",
    "q143_exactly_once_capture",
    "q53_publish_gold_dim",
    "q71_minhash_neardup_fast",
    "q57_neardup_clusters",
    "q102_cluster_canonical",
    "q51_ann_ivf",
    "q101_semantic_dedup",
    "q103_token_budget_select",
    "q104_global_shuffle",
    "q105_length_bucket_batches",
    "q47_multimodal_features",
    "q126_leakage_safe_split",
    "q127_dsir_weights",
    "q128_ivf_append",
    "q129_oov_rate",
    "q131_split_leakage_audit",
    "q148_neardup_triangles",
    "q133_asof_tolerance",
    "q64_range_join",
    "q130_salted_join",
    "q153_pit_join",
    "q116_small_qty_revenue",
    "q117_cheapest_supplier_per_part",
    "q118_order_count_distribution",
    "q119_idle_rich_customers",
    "q120_top_revenue_suppliers",
    "q161_volume_shipping",
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
