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
#: after r10 nothing older than r5). Each round's 50-row prefix is the
#: 50 registered queries whose latest driver-green row is OLDEST, ties
#: broken by registration order — freshness is self-maintaining and no
#: query's attestation ever ages more than ceil(n/50) rounds. This r11
#: cohort is `python scripts/replay_attestation.py`'s printed oldest-50:
#: the never-attested r11 addition (q294) leads, then the six r5 rows
#: the r10 additions displaced (q162–q165, q170, q180) and the rest of
#: the r5 cohort (q97, q173, q174, q175, q98, q121, ...; q205 rotates
#: to r12). To rotate for r12, run the replay script and replace
#: this tuple with its printed oldest-50 (the script also flags any
#: registered query whose LATEST driver row is red — fix those, don't
#: rotate them).
#:
#: Everything past the 50-row prefix is attested by the pytest oracle
#: suite at sf0.001 AND sf0.01 (tests/test_oracle.py with
#: SPARK_GRAFT_TEST_FULL=1, ledger in SCALING.md).
DRIVER_ORDER_FIRST: tuple[str, ...] = (
    "q294_ivf_index_serving",
    "q162_market_share",
    "q163_promo_revenue_share",
    "q164_sole_late_supplier",
    "q165_priority_late_orders",
    "q170_market_basket",
    "q180_frequent_triples",
    "q97_resample_ffill",
    "q173_resample_interp",
    "q174_range_frame_sum",
    "q175_exact_percentiles",
    "q98_cdc_feed",
    "q121_partition_pruned_join",
    "q122_zorder_locality",
    "q171_data_skipping",
    "q94_stream_stream_join",
    "q172_stream_static_enrich",
    "q179_streaming_windowed_agg",
    "q159_training_run_log",
    "q93_capped_neardup",
    "q95_fuzzy_decontamination",
    "q99_dup_span_coverage",
    "q109_dup_span_removal",
    "q100_dedup_report",
    "q96_quantized_ann",
    "q107_context_windows",
    "q108_mixture_apply",
    "q111_bpe_merges",
    "q113_bpe_encode",
    "q92_multimodal_decode",
    "q112_bm25_topk",
    "q114_lm_transition_score",
    "q115_collocation_lift",
    "q124_term_pagerank",
    "q166_ivf_budget_probe",
    "q160_ivf_rebalance",
    "q151_gram_matrix",
    "q168_setsim_prefix_join",
    "q176_symspell_fuzzy_join",
    "q177_weighted_sample",
    "q167_distinct_sketch",
    "q169_max_concurrency",
    "q178_countmin_heavy_hitters",
    "q185_gini_concentration",
    "q190_copurchase_recs",
    "q194_lorenz_curve",
    "q195_skyline",
    "q201_hierarchy_rollup",
    "q203_trending_parts",
    "q204_revenue_bridge",
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
