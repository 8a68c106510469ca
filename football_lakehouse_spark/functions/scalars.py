"""Scalar column helpers — Python functions composing Column
expressions (never UDFs; SURVEY.md §2.10: the reference surface has
zero UDFs and the engine preserves that on all hot paths).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: sentinel strings the upstream feed uses for "no value"
NULLISH = ("", "null", "None")


def to_double_or_null(c: Column) -> Column:
    """Null-safe string→double cast (reference
    ``31_build_silver_dims.py:156-158``): treat '', 'null', 'None'
    (trimmed) as NULL, otherwise cast."""
    return (
        F.when(F.trim(c).isin(*NULLISH), F.lit(None).cast("double"))
        .otherwise(c.cast("double"))
    )


def content_sha256(c: Column) -> Column:
    """Distributed content hash (reference computes sha256 driver-side,
    ``11_ingest_fpl_bootstrap.py:68-72``; the engine's form is
    ``sha2(col, 256)`` executed JVM-side per row)."""
    return F.sha2(c, 256)


def bucket_hash(c: Column, n_buckets: int, seed: str = "") -> Column:
    """Deterministic, cross-engine-portable bucket assignment: first 8
    hex chars of sha256 → int → mod. Used for salting and LSH banding
    where reproducibility across engines matters more than speed."""
    return (
        F.conv(F.substring(F.sha2(F.concat(F.lit(seed), c), 256), 1, 8), 16, 10)
        .cast("bigint")
        % n_buckets
    )
