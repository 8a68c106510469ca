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
#: query's attestation ever ages more than ceil(n/50) rounds. This r12
#: cohort is `python scripts/replay_attestation.py`'s printed oldest-50:
#: the 43 queries last attested in r6 lead (q205, q206, q208, ...),
#: then the first 7 of the r7 cohort (q182, q183, q191, q193, q196,
#: q200, q220 ... by registration order). To rotate for r13, run the
#: replay script and replace this tuple with its printed oldest-50
#: (the script also flags any registered query whose LATEST driver
#: row is red — fix those, don't rotate them; it also exits 1 when
#: any attestation is older than the freshness horizon).
#:
#: Everything past the 50-row prefix is attested by the pytest oracle
#: suite at sf0.001 AND sf0.01 (tests/test_oracle.py with
#: SPARK_GRAFT_TEST_FULL=1, ledger in SCALING.md).
DRIVER_ORDER_FIRST: tuple[str, ...] = (
    "q205_abc_classification",
    "q206_simpson_diversity",
    "q208_ship_latency_sla",
    "q215_equidepth_histogram",
    "q217_rfm_segments",
    "q224_revenue_concentrated_parts",
    "q226_winsorized_stats",
    "q181_mad_outliers",
    "q184_percentile_normalize",
    "q187_rolling_regression",
    "q188_capped_balance",
    "q198_purchase_gap_hazard",
    "q199_cohort_ltv_curve",
    "q209_cusum_changepoint",
    "q213_journey_transitions",
    "q186_table_diff_merkle",
    "q189_decile_lift",
    "q218_calibration_bins",
    "q110_inverted_index",
    "q123_incremental_index",
    "q192_negative_sampling",
    "q197_bloom_export",
    "q202_filter_agreement",
    "q207_dedup_savings",
    "q210_temporal_split",
    "q211_tail_expectation",
    "q212_keyness_odds_ratio",
    "q214_index_serving_bm25",
    "q216_tfidf_topk",
    "q219_neardup_degree_profile",
    "q223_ann_recall_eval",
    "q221_curriculum_order",
    "q225_zipf_head_share",
    "q227_join_explosion_audit",
    "q228_preference_pairs",
    "q182_group_trend",
    "q183_ks_statistic",
    "q191_linear_attribution",
    "q193_multi_window_touches",
    "q196_spearman",
    "q200_asof_nearest",
    "q220_seasonal_anomaly",
    "q222_debounce_events",
    "q234_histogram_2d",
    "q235_ordered_listagg",
    "q237_variant_props",
    "q239_weighted_median",
    "q240_benford_audit",
    "q243_basket_size_value_curve",
    "q244_discount_band_effectiveness",
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
