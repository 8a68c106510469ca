"""Data-quality assertion operators (reference SURVEY.md §2.8, Q1–Q5).

The reference treats fail-fast DQ gates as first-class pipeline
operators (``notebooks/03_silver/31_build_silver_dims.py:281-306``,
``notebooks/04_gold/41_publish_gold_dims.py:152-161``). Re-expressed
here with the limit-1 short-circuit idiom so a failing check never
scans more than it must.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


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
