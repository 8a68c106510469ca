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
#: 50-query prefix of this order. End-of-round-4 priority: (1) r3's two
#: red rows (q28/q64 — NTZ epoch fix), (2) the 26 queries added late in
#: round 4 (q125–q150), (3) queries whose PLAN or read path changed this
#: round (Lloyd refactor, CC lineage truncation, log-schema/column-
#: mapping/DV read hooks), (4) the earlier round-4 additions. With 149
#: registered queries, everything past the 50-row prefix is attested by
#: the pytest oracle suite at sf0.001 AND sf0.01 this round (see
#: tests/test_oracle.py with SPARK_GRAFT_TEST_FULL=1) and rolls into the
#: round-5 driver prefix: q115–q124 and q92–q100 first.
DRIVER_ORDER_FIRST: tuple[str, ...] = (
    # --- r3's two red rows, fixed early in round 4 → re-attest FIRST ---
    "q28_sessionize",
    "q64_range_join",
    # --- added late round 4 (never driver-attested) ---
    "q125_table_restore",
    "q126_leakage_safe_split",
    "q127_dsir_weights",
    "q128_ivf_append",
    "q129_oov_rate",
    "q130_salted_join",
    "q131_split_leakage_audit",
    "q132_funnel_conversion",
    "q133_asof_tolerance",
    "q134_check_constraint_gate",
    "q135_shallow_clone",
    "q136_referential_integrity_audit",
    "q137_table_schema_evolution",
    "q138_rename_column",
    "q139_drop_column",
    "q140_deletion_vectors",
    "q141_update_rows",
    "q142_scd2_history",
    "q143_exactly_once_capture",
    "q144_expectations_quarantine",
    "q145_rank_family",
    "q146_relational_division",
    "q147_grouping_sets",
    "q148_neardup_triangles",
    "q149_activity_gaps",
    "q150_ewma",
    "q151_gram_matrix",
    "q152_cohort_retention",
    "q153_pit_join",
    "q154_distribution_drift",
    "q155_mode_per_group",
    "q156_value_histogram",
    "q157_cumulative_distinct",
    "q158_rolling_distinct",
    # --- plans changed in round 4 → re-attest (Lloyd refactor: q51;
    #     CC lineage truncation: q57; codec wiring: q47; NTZ: q71) ---
    "q51_ann_ivf",
    "q57_neardup_clusters",
    "q47_multimodal_features",
    "q71_minhash_neardup_fast",
    # --- read-path changed (log schema / column mapping / DV hooks) →
    #     re-attest the r3-green lakehouse readers ---
    "q30_time_travel",
    "q31_idempotent_ingest",
    "q72_delete_rows",
    "q53_publish_gold_dim",
    # --- added earlier in round 4 (never driver-attested; entries past
    #     the 50-row prefix roll to round 5) ---
    "q101_semantic_dedup",
    "q102_cluster_canonical",
    "q103_token_budget_select",
    "q104_global_shuffle",
    "q105_length_bucket_batches",
    "q106_streaming_dedup",
    "q107_context_windows",
    "q108_mixture_apply",
    "q109_dup_span_removal",
    "q110_inverted_index",
    "q111_bpe_merges",
    "q112_bm25_topk",
    "q113_bpe_encode",
    "q114_lm_transition_score",
    "q115_collocation_lift",
    "q116_small_qty_revenue",
    "q117_cheapest_supplier_per_part",
    "q118_order_count_distribution",
    "q119_idle_rich_customers",
    "q120_top_revenue_suppliers",
    "q121_partition_pruned_join",
    "q122_zorder_locality",
    "q123_incremental_index",
    "q124_term_pagerank",
    "q92_multimodal_decode",
    "q93_capped_neardup",
    "q94_stream_stream_join",
    "q95_fuzzy_decontamination",
    "q96_quantized_ann",
    "q97_resample_ffill",
    "q98_cdc_feed",
    "q99_dup_span_coverage",
    "q100_dedup_report",
    # --- no round-3 driver row → fresh rows wanted ---
    "q02_horizon_assembly_joins",
    "q04_conditional_agg",
    "q60_continuous_rollup",
    "q54_format_roundtrip",
    "q32_streaming_ingest",
    "q91_stateful_state",
    "q69_ml_pinned_eval",
    "q42_simhash",
    "q43_ngram_jaccard",
    "q58_repetition_ratio",
    "q59_decontamination",
    "q61_vocab_df",
    "q62_mixture_weights",
    "q65_stratified_sample",
    "q56_corpus_split",
    "q44_ann_bruteforce",
    "q52_embedding_neardup",
    "q48_embedding_stats",
    "q46_multimodal_meta",
    "q73_boilerplate_ngrams",
    "q74_text_normalize",
    "q75_pii_redaction",
    "q76_gopher_quality",
    "q77_source_top_terms",
    "q78_sequence_packing",
    "q81_doc_chunking",
    "q82_source_overlap",
    "q83_source_upsample",
    "q84_curation_pipeline",
    "q87_embedding_outliers",
    "q88_length_quantiles",
    "q49_asof_join",
    "q79_salted_hot_key_agg",
    "q80_bucketed_join",
    "q86_table_profile",
    "q89_full_outer_reconcile",
    "q90_props_map",
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
