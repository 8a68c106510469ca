"""Change data capture over versioned lakehouse tables — the open
analogue of Delta's Change Data Feed (`table_changes`), derived by
DIFFING two committed versions instead of reading a persisted feed.

The reference declares its Silver layer as MERGE-maintained
(docs/backlog.md:77); downstream incremental consumers need the row
delta between two table versions, which this provides for ANY pair of
versions of the manifest-log table layer (lakehouse/tables.py) without
requiring the writer to have logged changes at commit time.

Plan shape: ONE full-outer join on the key (single shuffle), then each
joined row emits 0-2 change entries through an exploded literal array —
insert / delete / update_preimage / update_postimage — so the diff is
one pass with no re-scan per change type. At 100 TB the join is
key-partitioned and AQE-handled like any fact-fact join; the alternative
(four separate anti/semi-joins) would scan both versions four times.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def change_feed(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    validate_unique: bool = True,
) -> DataFrame:
    """Row-level changes that turn ``old`` into ``new``, keyed by
    ``keys``: ``insert`` rows (key only in new), ``delete`` rows (key
    only in old), and ``update_preimage``/``update_postimage`` pairs
    (key in both, any non-key column differing null-safely). Payload
    columns carry the new image for insert/update_postimage and the old
    image for delete/update_preimage — Delta CDF semantics.

    The key join is NULL-SAFE (a NULL business key is one key value,
    the same contract merge_upsert keeps): with a plain equi-join a
    NULL-keyed row never matched itself across versions, so every diff
    fabricated a delete+insert pair for untouched NULL-key rows —
    phantom churn in every incremental consumer.

    ``validate_unique`` (default True) FAILS CLOSED when either side
    carries a duplicate key tuple — the full-outer join would multiply
    such rows into duplicated/mispaired change entries that silently
    corrupt downstream MERGE consumers (same contract as
    require_unique_merge_keys on the merge path; appends can create
    duplicates the merge path never would). Since r14 both sides are
    validated in ONE eager map-side-combined aggregation (side-tagged
    union) instead of one job per side — same fail-closed contract and
    error type, half the plan-build actions and one combined pass over
    the two versions instead of two separate ones. (An in-plan
    ``raise_error`` window guard was tried first and rejected: the
    null-safe join partitions on ``(coalesce(k, 0), isnull(k))`` while
    a per-key window partitions on ``k``, so the "free" guard actually
    added a full extra exchange per side — worse than the scan at any
    scale.) Pass False only when the caller has already validated both
    versions."""
    if validate_unique:
        from football_lakehouse_spark.functions.guards import bounded_collect
        from football_lakehouse_spark.lakehouse.tables import (
            MergeSourceDuplicateError,
        )

        tagged = old.select(
            *[F.col(k).alias(f"__k_{k}") for k in keys],
            F.lit("change_feed(old)").alias("__side"),
        ).unionByName(
            new.select(
                *[F.col(k).alias(f"__k_{k}") for k in keys],
                F.lit("change_feed(new)").alias("__side"),
            )
        )
        dups = bounded_collect(
            tagged.groupBy("__side", *[f"__k_{k}" for k in keys])
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > 1)
            .limit(3),
            3,
            "change_feed unique-key check",
        )
        if dups:
            sample = [
                (r["__side"], tuple(r[f"__k_{k}"] for k in keys)) for r in dups
            ]
            raise MergeSourceDuplicateError(
                f"change_feed: duplicate source key(s) for {list(keys)} — "
                f"e.g. {sample}; change_feed requires key-unique versions "
                "(duplicates multiply through the full-outer diff into "
                "mispaired change entries). Pre-dedupe with an explicit "
                "ordering, e.g. dedupe_updates(batch, keys, order_desc)."
            )
    # value columns = the UNION of both sides' non-key columns: diffing
    # across an additive schema change (merge_schema append between the
    # two versions) must not crash on the old side's missing column —
    # and a column dropped between versions must still ride delete /
    # preimage payloads. A side missing a column contributes NULL for
    # it (exactly what the evolved table reads back for old rows).
    new_types = {f.name: f.dataType for f in new.schema.fields}
    old_types = {f.name: f.dataType for f in old.schema.fields}
    val_cols = [c for c in new.columns if c not in keys] + [
        c for c in old.columns if c not in keys and c not in new_types
    ]
    # a KEY-ONLY table (e.g. span_key_index's single column) has no
    # value columns: the payload struct still needs a field, and the
    # changed-predicate fold needs an initial value (reduce() over an
    # empty list raises TypeError) — such rows can only insert/delete
    def payload(side_types: dict) -> Column:
        if not val_cols:
            return F.struct(F.lit(None).alias("__no_vals"))
        return F.struct(
            *[
                F.col(c).alias(c) if c in side_types
                else F.lit(None)
                .cast(new_types.get(c) or old_types[c])
                .alias(c)
                for c in val_cols
            ]
        )

    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        payload(old_types).alias("__old"),
        F.lit(1).alias("__ino"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        payload(new_types).alias("__new"),
        F.lit(1).alias("__inn"),
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"__ko_{k}").eqNullSafe(F.col(f"__kn_{k}")) for k in keys],
    )
    j = o.join(n, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"__ko_{k}"), F.col(f"__kn_{k}")).alias(k)
            for k in keys
        ],
        "__old", "__ino", "__new", "__inn",
    )

    changed: Column = reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"__old.{c}").eqNullSafe(F.col(f"__new.{c}"))
            for c in val_cols
        ],
        F.lit(False),
    )
    both = F.col("__ino").isNotNull() & F.col("__inn").isNotNull()

    def entry(change_type: str, payload: Column) -> Column:
        return F.struct(
            F.lit(change_type).alias("change_type"), payload.alias("payload")
        )

    entries = F.array(
        F.when(F.col("__ino").isNull(), entry("insert", F.col("__new"))),
        F.when(F.col("__inn").isNull(), entry("delete", F.col("__old"))),
        F.when(both & changed, entry("update_preimage", F.col("__old"))),
        F.when(both & changed, entry("update_postimage", F.col("__new"))),
    )
    ex = j.select(
        *keys,
        F.explode(F.filter(entries, lambda e: e.isNotNull())).alias("__e"),
    )
    return ex.select(
        F.col("__e.change_type").alias("change_type"),
        *keys,
        *[F.col(f"__e.payload.{c}").alias(c) for c in val_cols],
    )


def change_feed_chain(
    versions: Sequence[DataFrame], keys: Sequence[str]
) -> DataFrame:
    """Concatenated :func:`change_feed` over CONSECUTIVE version pairs
    (v0→v1, v1→v2, …) — the composed-delta input of incremental view
    maintenance (q250). Each version is validated key-unique exactly
    ONCE in one side-tagged aggregation: the naive pairwise loop prices
    every interior version twice (it is the ``new`` side of one diff
    and the ``old`` side of the next), so a k-version chain paid
    2(k-1) validation scans where k suffice (r14)."""
    if len(versions) < 2:
        raise ValueError("change_feed_chain needs at least two versions")
    from football_lakehouse_spark.functions.guards import bounded_collect
    from football_lakehouse_spark.lakehouse.tables import (
        MergeSourceDuplicateError,
    )

    tagged = reduce(
        lambda a, b: a.unionByName(b),
        [
            v.select(
                *[F.col(k).alias(f"__k_{k}") for k in keys],
                F.lit(i).alias("__v"),
            )
            for i, v in enumerate(versions)
        ],
    )
    dups = bounded_collect(
        tagged.groupBy("__v", *[f"__k_{k}" for k in keys])
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1)
        .limit(3),
        3,
        "change_feed_chain unique-key check",
    )
    if dups:
        sample = [
            (f"version#{r['__v']}", tuple(r[f"__k_{k}"] for k in keys))
            for r in dups
        ]
        raise MergeSourceDuplicateError(
            f"change_feed_chain: duplicate key(s) for {list(keys)} — e.g. "
            f"{sample}; change feeds require key-unique versions. "
            "Pre-dedupe with an explicit ordering, e.g. "
            "dedupe_updates(batch, keys, order_desc)."
        )
    feeds = [
        change_feed(a, b, keys, validate_unique=False)
        for a, b in zip(versions, versions[1:])
    ]
    # allowMissingColumns: change_feed itself supports an additively
    # evolved schema between two versions (val_cols = union of both
    # sides), so consecutive pair feeds can legitimately differ in
    # payload columns — a plain unionByName then raised
    # AnalysisException on exactly the chains change_feed promises to
    # handle. A feed missing a column contributes NULL for it, the
    # same value per-pair change_feed emits for a side that lacks it
    # (ADVICE r14, r15).
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), feeds
    )
