"""Candidate-volume preflight for blocking joins.

Every blocking-based candidate generator in the engine (LSH band
buckets, prefix-filter postings, SymSpell deletion variants) funnels a
self-join through a posting table: rows sharing a key become candidate
pairs, so the join emits sum_k C(n_k, 2) rows for posting sizes n_k.
On well-behaved data the postings are near-unique and that sum is
~linear in the corpus; on degenerate data (tiny vocabularies for
prefix filtering, dense sequential keyspaces for SymSpell — both
measured in SCALING.md rounds 5–6) it goes quadratic and the join is
hopeless at scale no matter how it is partitioned.

The LSH path already bounds this structurally (the star cap in
``dedup.candidate_pairs``). Prefix filtering and SymSpell cannot cap
without losing completeness — a hot posting really does make all its
members mutual candidates — so the honest 100 TB defence is to PRICE
the join before paying for it: one cheap aggregation over the posting
table computes the exact candidate volume the self-join would emit,
and the plan refuses (loud, actionable error) instead of launching a
quadratic shuffle. The preflight scan is O(postings) — negligible
beside the O(sum n_k^2) join it gates.

Reference analogue: the reference validates inputs before publishing
(`notebooks/03_silver/31_build_silver_dims.py:296-306` — DQ counts
abort the job before any write); this is the same write-after-validate
ordering applied to join cost instead of row quality.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from football_lakehouse_spark.functions.guards import bounded_collect

#: refuse a blocking self-join whose exact candidate output exceeds
#: this many pairs. Default prices ~minutes of single-node verify work;
#: a cluster deployment raises it deliberately via the env var, which
#: keeps the knob out of every call site.
DEFAULT_MAX_CANDIDATE_PAIRS = 5_000_000


def _max_pairs_cap() -> int:
    """Resolve the cap from the env at CALL time, not import time — a
    long-lived driver or notebook that exports the knob after this
    module is imported must still see it, and a malformed value must
    fail at the guarded call with the knob named, not at import."""
    raw = os.environ.get("SPARK_GRAFT_MAX_CANDIDATE_PAIRS")
    if raw is None:
        return DEFAULT_MAX_CANDIDATE_PAIRS
    try:
        return int(raw)
    except ValueError as exc:
        raise ValueError(
            f"SPARK_GRAFT_MAX_CANDIDATE_PAIRS={raw!r} is not an integer"
        ) from exc


class CandidateVolumeError(RuntimeError):
    """A blocking join would emit more candidate pairs than the cap."""


#: collision-proof alias for the per-key posting count — callers pass
#: arbitrary public key columns, so the internal count must not shadow
#: any plausible user name (an 'n' key column would otherwise make the
#: downstream aggregate ambiguous).
_N = "__posting_n"

#: the exact-pair aggregate over per-key posting counts (decimal):
#: doubled per-key count summed in decimal(38,0), halved exactly via
#: ``* 0.5`` (consecutive-integer products are even; decimal(38,1)
#: holds the doubled sum to ~1e37 pairs). Module-level so the overflow
#: regression test pins THIS string, not a copy that could drift.
_EST_PAIRS_SQL = (
    f"CAST(SUM(CAST({_N} * ({_N} - 1) AS DECIMAL(38,0))) * 0.5"
    " AS DECIMAL(38,0))"
)


def candidate_volume(postings: DataFrame, key_cols: list[str]) -> DataFrame:
    """One-row profile of the self-join a posting table implies.

    ``est_pairs`` is exact, not an estimate of the estimator: the
    self-join on ``key_cols`` emits exactly sum_k n_k*(n_k-1)/2 rows
    (before any distinct across keys, so it upper-bounds the distinct
    pair count). Exact arithmetic throughout, in ``decimal(38,0)``: a
    hot posting past ~3e9 rows makes ``n*(n-1)`` overflow BIGINT —
    under ANSI mode that would CRASH the preflight, and with ANSI off
    it would wrap negative and silently wave the degenerate join
    through, precisely the regime the guard exists to refuse. (``div``
    is no help: Spark's integral divide returns LONG even on decimal
    inputs.) The doubled per-key count sums in decimal and halves via
    an exact ``* 0.5`` (the product of consecutive integers is even;
    decimal(38,1) holds it exactly to ~1e37 pairs — 10⁹× past the
    100 TB envelope). Same defence as the ``_star_components``
    fingerprint sum (operators/dedup.py).
    """
    # price what the gated join actually emits: an equi-self-join
    # produces ZERO pairs for NULL keys (NULL never equals NULL), so a
    # giant NULL posting must not be priced as C(n,2) — that spuriously
    # refused joins whose real output was far under the cap (r12
    # review). NULL-keyed rows are dropped from the pricing, matching
    # the join's own semantics.
    non_null = postings
    for c in key_cols:
        non_null = non_null.where(F.col(c).isNotNull())
    per_key = non_null.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias(_N)
    )
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(_N).cast("bigint").alias("n_postings"),
        F.max(_N).cast("bigint").alias("max_posting"),
        F.expr(_EST_PAIRS_SQL).alias("est_pairs"),
    )


def assert_candidate_volume(
    postings: DataFrame,
    key_cols: list[str],
    max_pairs: int | None = None,
    context: str = "blocking join",
) -> dict:
    """Refuse a blocking self-join priced above ``max_pairs``.

    Returns the volume profile (control-plane scalars — the one
    ``collect`` is a 1-row aggregate, the same class of action as the
    convergence fingerprints in ``dedup``). Raises
    ``CandidateVolumeError`` with the measured numbers and the knob to
    turn when the data is in the operator's degenerate regime.
    """
    cap = _max_pairs_cap() if max_pairs is None else max_pairs
    row = bounded_collect(
        candidate_volume(postings, key_cols), 1, "assert_candidate_volume"
    )[0]
    if row["est_pairs"] is None and (row["n_keys"] or 0) > 0:
        # fail CLOSED: a non-empty posting table with a NULL price means
        # the decimal(38,0) sum itself overflowed (non-ANSI nulls it) —
        # a volume so far past any cap that refusal is the only answer;
        # `or 0` here would silently wave the join through
        raise CandidateVolumeError(
            f"{context}: candidate-volume aggregate overflowed "
            "decimal(38,0) — the posting table is catastrophically "
            "degenerate; refusing without a price."
        )
    stats = {
        "n_keys": row["n_keys"] or 0,
        "n_postings": row["n_postings"] or 0,
        "max_posting": row["max_posting"] or 0,
        # decimal → int: exact (scale 0), and keeps callers integer-typed
        "est_pairs": int(row["est_pairs"] or 0),
    }
    if stats["est_pairs"] > cap:
        raise CandidateVolumeError(
            f"{context}: posting table on {key_cols} would emit "
            f"{stats['est_pairs']:,} candidate pairs "
            f"(cap {cap:,}; {stats['n_keys']:,} keys, hottest posting "
            f"{stats['max_posting']:,}). The input is in this blocker's "
            "degenerate regime (see SCALING.md: prefix filtering needs a "
            "Zipfian vocabulary, SymSpell a sparse keyspace) — use the "
            "MinHash/LSH generator or exact-match semantics instead, or "
            "raise SPARK_GRAFT_MAX_CANDIDATE_PAIRS deliberately."
        )
    return stats
