"""MERGE (upsert join) — reference SURVEY.md §2 JN4: ``MERGE INTO
silver.live_event`` keyed on a deterministic event key, rerun-safe for
late/duplicate events (spec: docs/backlog.md:49-51,75-77; stub
``notebooks/03_silver/32_merge_silver_live_event.sql``).

delta-spark is not available in this image, so MERGE is expressed as
its relational decomposition — WHEN MATCHED UPDATE ∪ WHEN NOT MATCHED
INSERT ≡ ``updates ∪ (base ⟕anti updates)`` — which Catalyst executes
as one shuffle (or broadcast) join plus a union. The lakehouse layer
(lakehouse/tables.py) wraps this with copy-on-write versioned commits.

Scale note: at 100 TB the base side is large and the updates batch
small; the anti join broadcasts the update keys, so the merge costs one
base scan + rewrite of touched partitions (the table layer restricts
the rewrite to partitions present in ``updates`` when partitioned).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from football_lakehouse_spark.operators.rolling import latest_per_key


def dedupe_updates(
    updates: DataFrame, keys: Sequence[str], order_desc: Sequence[str]
) -> DataFrame:
    """Collapse a late/duplicate update batch to one row per key
    (latest wins by ``order_desc``) — the pre-step the reference's
    rerun-safe MERGE requires. Composite keys partition the window on
    the columns THEMSELVES: the previous concat_ws('§', ...) composite
    collided for NULL key parts (concat_ws SKIPS NULLs, so ('a', NULL)
    and (NULL, 'a') shared one group) and for values containing the
    separator — silently discarding a legitimate update."""
    return latest_per_key(updates, list(keys), list(order_desc))


def merge_upsert(
    base: DataFrame, updates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """WHEN MATCHED UPDATE (full-row) / WHEN NOT MATCHED INSERT.

    ``updates`` must be unique on ``keys`` (use :func:`dedupe_updates`
    first); columns must be union-compatible by name.

    The anti join is NULL-SAFE on every key: a plain equi-join never
    matches NULL keys, so replaying a batch with a NULL-key row would
    add another copy on every rerun — monotonic growth that breaks the
    module's rerun-safety contract. ``eqNullSafe`` is still a hash-join
    key for Catalyst, so the broadcast shape is unchanged.
    """
    b = base.alias("__mb")
    u = F.broadcast(updates.select(*keys).alias("__mu"))
    cond = None
    for k in keys:
        c = F.col(f"__mb.{k}").eqNullSafe(F.col(f"__mu.{k}"))
        cond = c if cond is None else (cond & c)
    keep = b.join(u, cond, "left_anti")
    return updates.select(*base.columns).unionByName(keep)
