"""Data-quality assertion operators (reference SURVEY.md §2.8, Q1–Q5).

The reference treats fail-fast DQ gates as first-class pipeline
operators (``notebooks/03_silver/31_build_silver_dims.py:281-306``,
``notebooks/04_gold/41_publish_gold_dims.py:152-161``). Re-expressed
here with the limit-1 short-circuit idiom so a failing check never
scans more than it must.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from football_lakehouse_spark.functions.guards import bounded_collect


class DataQualityError(AssertionError):
    """Raised when a DQ gate fails; pipelines abort before any write."""


def has_null_keys(df: DataFrame, *keys: str) -> bool:
    cond = None
    for k in keys:
        c = F.col(k).isNull()
        cond = c if cond is None else (cond | c)
    return not df.where(cond).limit(1).isEmpty()


def has_duplicate_keys(df: DataFrame, *keys: str) -> bool:
    dupes = df.groupBy(*keys).count().where(F.col("count") > 1)
    return not dupes.limit(1).isEmpty()


def assert_no_null_keys(df: DataFrame, *keys: str, name: str = "df") -> None:
    if has_null_keys(df, *keys):
        raise DataQualityError(f"{name}: null primary-key values in {keys}")


def assert_no_duplicate_keys(df: DataFrame, *keys: str, name: str = "df") -> None:
    if has_duplicate_keys(df, *keys):
        raise DataQualityError(f"{name}: duplicate primary-key values in {keys}")


def assert_pk(df: DataFrame, *keys: str, name: str = "df") -> None:
    """Combined null + duplicate PK gate (reference Q3)."""
    assert_no_null_keys(df, *keys, name=name)
    assert_no_duplicate_keys(df, *keys, name=name)


def assert_not_empty(df: DataFrame, name: str = "df") -> None:
    """Empty-input guard (reference Q5) — limit-1 probe, not a count."""
    if df.limit(1).isEmpty():
        raise DataQualityError(f"{name}: expected at least one row")


def failed_expectations(expectations: dict[str, str]):
    """Column: array of expectation names the row VIOLATES (predicate
    false or NULL — the enforcement semantics of table CHECK
    constraints). Empty array = row passes everything."""
    return F.filter(
        F.array(
            *[
                F.when(~F.expr(pred).eqNullSafe(F.lit(True)), F.lit(name))
                for name, pred in sorted(expectations.items())
            ]
        ),
        lambda x: x.isNotNull(),
    )


def append_with_expectations(
    table,
    quarantine,
    df: DataFrame,
    expectations: dict[str, str],
    txn: tuple[str, int] | None = None,
) -> dict[str, int]:
    """DLT-style ``expect_or_quarantine``: rows passing EVERY
    expectation append to ``table``; violating rows land in
    ``quarantine`` with a ``failed_expectations`` array naming what
    they broke — the triage queue of a production pipeline (vs the
    CHECK-constraint gate, which rejects the whole batch). Returns
    ``{"valid": n, "quarantined": n}``.

    ``txn=(app_id, version)`` makes BOTH sinks transactionally
    idempotent (``append_txn`` with (app_id, version) for the valid
    sink and (app_id + "-quarantine", version) for the quarantine
    sink): a caller that crashes BETWEEN the two appends and retries
    the whole call converges — the already-committed sink skips the
    replay, the missing one commits — instead of double-appending
    valid rows. This is the right form inside ``foreachBatch`` (pass
    the epoch id) or any retried batch job. Without ``txn`` the plain
    at-most-once appends are kept (cheapest; fine when the caller
    never retries). Distinct app-ids per sink are required because the
    two sinks are DIFFERENT tables with independent commit logs —
    sharing one id would be fine today but would break if both ever
    pointed at one log.

    Scale: the expectation array is a pure map-side expression. The
    marked batch is PERSISTED and counted in one aggregation up front,
    so (a) the source is evaluated once, not once per probe + write +
    count, and (b) the returned stats describe exactly the rows the
    sinks received — recomputing counts after the writes from a lazy
    plan over a non-deterministic source (a landing dir gaining files
    mid-batch) could disagree with what was actually appended."""
    marked = df.withColumn("__failed", failed_expectations(expectations))
    marked.persist()
    try:
        counts = bounded_collect(
            marked.agg(
                F.sum(F.when(F.size("__failed") == 0, 1).otherwise(0))
                .cast("bigint")
                .alias("valid"),
                F.sum(F.when(F.size("__failed") > 0, 1).otherwise(0))
                .cast("bigint")
                .alias("quarantined"),
            ),
            1,
            "append_with_expectations metrics",
        )[0]
        stats = {
            "valid": int(counts["valid"] or 0),
            "quarantined": int(counts["quarantined"] or 0),
        }
        if stats["valid"]:
            valid_rows = marked.where(F.size("__failed") == 0).drop("__failed")
            if txn is not None:
                table.append_txn(valid_rows, app_id=txn[0], txn_version=int(txn[1]))
            else:
                table.append(valid_rows)
        if stats["quarantined"]:
            bad_rows = (
                marked.where(F.size("__failed") > 0)
                .withColumn(
                    "failed_expectations", F.concat_ws(",", F.col("__failed"))
                )
                .drop("__failed")
            )
            if txn is not None:
                quarantine.append_txn(
                    bad_rows, app_id=f"{txn[0]}-quarantine", txn_version=int(txn[1])
                )
            else:
                quarantine.append(bad_rows)
        return stats
    finally:
        marked.unpersist()
