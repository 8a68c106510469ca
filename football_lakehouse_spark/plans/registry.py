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


#: Driver-facing ordering. The round-1 driver recorded CORRECTNESS rows for
#: exactly the first 50 registry entries, so the per-round report is a
#: 50-query prefix of this order. Queries that did NOT get a row in round 1
#: (registry positions 50-67 back then) are promoted to the front so the
#: union of per-round reports covers the whole surface; new queries added
#: this round join the front group for the same reason.
DRIVER_ORDER_FIRST: tuple[str, ...] = (
    "q43_ngram_jaccard",
    "q58_repetition_ratio",
    "q59_decontamination",
    "q61_vocab_df",
    "q62_mixture_weights",
    "q65_stratified_sample",
    "q56_corpus_split",
    "q57_neardup_clusters",
    "q44_ann_bruteforce",
    "q45_ann_lsh",
    "q51_ann_ivf",
    "q52_embedding_neardup",
    "q48_embedding_stats",
    "q46_multimodal_meta",
    "q47_multimodal_features",
    "q49_asof_join",
    "q50_approx_stats",
    "q64_range_join",
    # changed in round 2 (new oracle / de-collect-ed wrapper / widened hash)
    # → need fresh rows even though round 1 covered them
    "q69_ml_pinned_eval",
    "q70_schema_evolution",
    "q71_minhash_neardup_fast",
    "q72_delete_rows",
    "q73_boilerplate_ngrams",
    "q74_text_normalize",
    "q75_pii_redaction",
    "q76_gopher_quality",
    "q77_source_top_terms",
    "q78_sequence_packing",
    "q79_salted_hot_key_agg",
    "q80_bucketed_join",
    "q81_doc_chunking",
    "q82_source_overlap",
    "q83_source_upsample",
    "q84_curation_pipeline",
    "q85_incremental_neardup",
    "q86_table_profile",
    "q87_embedding_outliers",
    "q88_length_quantiles",
    "q89_full_outer_reconcile",
    "q91_stateful_state",
    "q90_props_map",
    "q35_train_score_gbt",
    "q42_simhash",
    "q32_streaming_ingest",
    "q30_time_travel",
    "q54_format_roundtrip",
    "q60_continuous_rollup",
)


def _driver_ordered() -> list[str]:
    front = [n for n in DRIVER_ORDER_FIRST if n in REGISTRY]
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
