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
#: Attestation ledger — which driver round last attested each query
#: green (derived from CORRECTNESS_r0{1..5}.json; checkable by replaying
#: those files):
#:
#:   round | driver-green rows recorded that round
#:   ------+-----------------------------------------------------------
#:   r1    | q01–q34, q36–q42, q53–q55, q60, q63, q66–q68 (the original
#:         | §2 surface + first LLM ops)
#:   r2    | q42–q52 tail, q54, q56–q62, q64–q65, q69–q91 (wide LLM
#:         | surface), refreshes of q01/q02/q04/q30/q32/q60
#:   r3    | q01–q41 refresh sweep, q45, q47, q50–q51, q53, q55,
#:         | q63–q68, q70, q72, q85
#:   r4    | q101–q106, q125–q158 (all r4 additions), q28, q47, q51,
#:         | q57, q64, q71, q72, q151 (red→fixed in r5)
#:   r5    | q151 re-attest, q92–q100, q107–q124 (q110/q123 err — the
#:         | array<bigint> postings column broke the driver hasher;
#:         | serialized to STRING in r6), q159–q180
#:   r6    | q110+q123 re-attest, q181–q228 — the full 50-row prefix
#:         | came back green (CORRECTNESS_r06: 50/50, first perfect
#:         | round)
#:   r7    | q229–q278 — the full 50-row prefix came back green
#:         | (CORRECTNESS_r07: 50/50, second consecutive perfect round)
#:   r8    | (this prefix) q279–q282 — the last four queries without a
#:         | driver-green row (q279/q280 squeezed out of r7's window,
#:         | q281/q282 added in r7) — then the 37 r1/r2-stale refreshes
#:         | and 9 natural-order r3-stale refreshes (q01, q05–q12).
#:         | After r8 lands green, every one of the 281 registered
#:         | queries has a driver-green row and nothing is older than r3.
#:
#: Everything past the 50-row prefix is attested by the pytest oracle
#: suite at sf0.001 AND sf0.01 (tests/test_oracle.py with
#: SPARK_GRAFT_TEST_FULL=1, ledger in SCALING.md). The registry is
#: FROZEN at 281 entries until the attestation sweep completes.
DRIVER_ORDER_FIRST: tuple[str, ...] = (
    # --- r8 prefix: the last 4 never-attested queries, oldest first ---
    "q279_knn_label_noise",
    "q280_source_quality_funnel",
    "q281_hard_negative_mining_ann",
    "q282_knn_label_noise_ann",
    # --- stale: last driver-attested in r1/r2 → refresh (oldest first);
    #     rows 42–50 fall through to natural order (q01, q05–q12, all
    #     r3-stale refreshes) ---
    "q02_horizon_assembly_joins",
    "q04_conditional_agg",
    "q32_streaming_ingest",
    "q42_simhash",
    "q43_ngram_jaccard",
    "q44_ann_bruteforce",
    "q46_multimodal_meta",
    "q48_embedding_stats",
    "q49_asof_join",
    "q52_embedding_neardup",
    "q54_format_roundtrip",
    "q56_corpus_split",
    "q58_repetition_ratio",
    "q59_decontamination",
    "q60_continuous_rollup",
    "q61_vocab_df",
    "q62_mixture_weights",
    "q65_stratified_sample",
    "q69_ml_pinned_eval",
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
    "q86_table_profile",
    "q87_embedding_outliers",
    "q88_length_quantiles",
    "q89_full_outer_reconcile",
    "q90_props_map",
    "q91_stateful_state",
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
