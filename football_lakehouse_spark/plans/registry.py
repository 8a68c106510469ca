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
#: has a driver-green CORRECTNESS row (replay CORRECTNESS_r01–r10
#: against this registry to verify: 292/292 green, zero red rows, and
#: after r11 nothing older than r6). Each round's 50-row prefix is the
#: 50 registered queries whose latest driver-green row is OLDEST, ties
#: broken by registration order — freshness is self-maintaining and no
#: query's attestation ever ages more than ceil(n/50) rounds. This r13
#: cohort is `python scripts/replay_attestation.py`'s printed oldest-50:
#: the 43 queries last attested in r7 lead (q269, q232, q233, ...),
#: then the first 7 of the r8 cohort (q01, q02, q04, q05, q06, q07,
#: q08 ... by registration order). To rotate for r14, run the
#: replay script and replace this tuple with its printed oldest-50
#: (the script also flags any registered query whose LATEST driver
#: row is red — fix those, don't rotate them; it also exits 1 when
#: any attestation is older than the freshness horizon).
#:
#: Everything past the 50-row prefix is attested by the pytest oracle
#: suite at sf0.001 AND sf0.01 (tests/test_oracle.py with
#: SPARK_GRAFT_TEST_FULL=1, ledger in SCALING.md).
DRIVER_ORDER_FIRST: tuple[str, ...] = (
    "q269_recursive_purchase_chains",
    "q232_value_window_family",
    "q233_max_drawdown",
    "q236_python_datasource_roundtrip",
    "q247_anti_entropy_repair",
    "q248_subject_erasure",
    "q249_consistent_snapshot_join",
    "q250_incremental_view_maintenance",
    "q252_compaction_plan",
    "q257_logged_cdf_ivm",
    "q260_zonemap_skip_audit",
    "q275_shuffle_sizing_advisor",
    "q276_broadcast_advisor",
    "q246_rate_limited_drain",
    "q262_disorder_lateness_audit",
    "q229_source_length_drift",
    "q238_udtf_chunk_expand",
    "q245_centroid_separation",
    "q251_pca_power_iteration",
    "q255_bfs_distance",
    "q258_exact_heavy_hitters",
    "q259_systematic_weighted_sample",
    "q261_hybrid_rrf_fusion",
    "q265_dim_truncation_recall",
    "q266_sample_estimate_audit",
    "q268_lsh_funnel_audit",
    "q270_dataset_card",
    "q271_pq_adc_recall",
    "q272_incremental_curation",
    "q273_ivfpq_recall",
    "q274_minhash_estimator_audit",
    "q277_frame_sample",
    "q278_hard_negative_mining",
    "q230_sequence_transition_audit",
    "q231_repeat_purchase_curve",
    "q241_interarrival_burstiness",
    "q242_top_user_paths",
    "q253_k_anonymity",
    "q254_bloom_pruned_join",
    "q256_chi_square_ab",
    "q263_encoding_advisor",
    "q264_observed_metrics",
    "q267_time_weighted_value",
    "q01_fixture_horizons",
    "q02_horizon_assembly_joins",
    "q04_conditional_agg",
    "q05_bounded_multi_agg",
    "q06_duplicate_key_detection",
    "q07_topk_customers",
    "q08_union_all_counts",
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
