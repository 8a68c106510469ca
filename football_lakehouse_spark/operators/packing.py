"""Greedy sequence packing — batching documents into fixed token
budgets for training (the "sequence packing" step of an LLM data
pipeline; reference has no analogue, north-star surface).

Semantics: within each shard (partition key), documents are visited in
``order_col`` order and appended to the current pack while the pack's
token total stays within ``capacity``; a document that would overflow
starts a new pack, and a document larger than ``capacity`` occupies a
pack alone. Packing quality only needs LOCAL order, so the shard count
scales with the cluster, not the corpus — the standard trick that makes
an inherently sequential fold embarrassingly parallel.

Implemented as ``applyInPandas`` (Arrow-batched); the closure is fully
self-contained (pandas + builtins only) so it serialises to executors
that cannot import this package (see the driver contract).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def greedy_pack(
    df: DataFrame,
    shard_cols: Sequence[str],
    order_col: str,
    tokens_col: str,
    capacity: int,
) -> DataFrame:
    """Assign ``pack_id`` (0-based per shard) by the greedy fold above.

    ``order_col`` must be unique within each shard — ties would make
    the visit order (and so the pack assignment) depend on Arrow batch
    arrival order; the fold raises ValueError on a tie (fail closed)
    rather than emit run-dependent pack_ids.

    Output schema: the input columns plus ``pack_id bigint``.
    """
    cap = int(capacity)
    oc, tc = str(order_col), str(tokens_col)
    out_cols = [str(c) for c in df.columns] + ["pack_id"]
    schema_str = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["pack_id bigint"]
    )

    def pack(pdf):
        pdf = pdf.sort_values(oc, kind="stable").reset_index(drop=True)
        # fail closed on ties: with a duplicated order key the fold's
        # visit order (and so pack_id) would depend on Arrow arrival
        # order — run-to-run nondeterminism the oracle gate cannot see.
        # Same discipline as MergeSourceDuplicateError in lakehouse.
        if pdf[oc].duplicated().any():
            dup = pdf[oc][pdf[oc].duplicated()].iloc[0]
            raise ValueError(
                f"greedy_pack: order_col {oc!r} has ties within a shard "
                f"(e.g. {dup!r}); pack_id assignment would be "
                "nondeterministic. Pass a unique (composite) order column."
            )
        pack_ids, pid, fill, first = [], 0, 0, True
        for n in pdf[tc]:
            if first:
                pid, fill, first = 0, int(n), False
            elif fill + int(n) > cap:
                pid, fill = pid + 1, int(n)
            else:
                fill += int(n)
            pack_ids.append(pid)
        pdf["pack_id"] = pack_ids
        return pdf[out_cols]

    return df.groupBy(*[str(c) for c in shard_cols]).applyInPandas(pack, schema=schema_str)
