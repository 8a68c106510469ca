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


def micros(c: Column) -> Column:
    """Per-row quantisation to integer micro-units that is BIT-IDENTICAL
    across engines: ``floor(x·10⁶ + 0.5)`` uses only IEEE multiply/add/
    floor on the same input double. (A double→DECIMAL cast is NOT
    portable: Spark rounds the shortest decimal repr, DuckDB rounds the
    binary value — the per-row ±1e-6 drift accumulates across millions
    of rows and flips any fixed-point result.) Summed as DECIMAL(38,0)
    so 100 TB-scale totals cannot overflow."""
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)).cast("decimal(38,0)")


def money_sum(c: Column, scale: int = 2) -> Column:
    """Cross-engine-exact sum for money-magnitude doubles: quantise each
    row to micro-units (portable, see :func:`micros`), sum exactly,
    floor at ``scale``. No round() anywhere — floor on exact integers
    has no tie-breaking semantics to disagree on."""
    shift = 10 ** (6 - scale)
    unit = 10 ** scale
    return F.floor(F.sum(micros(c)) / F.lit(shift)).cast("double") / unit


def money_avg(c: Column, scale: int = 4) -> Column:
    """Cross-engine-exact average: floor(sum_micros / (count·10^(6-s)))
    / 10^s. Residual risk: Spark's decimal division rounds at scale 6
    before the floor (DuckDB floors exactly); they diverge only when the
    true quotient is within 5e-7 of an integer — ~1e-6 per group."""
    shift = 10 ** (6 - scale)
    unit = 10 ** scale
    denom = F.count(F.lit(1)) * F.lit(shift)
    return F.floor(F.sum(micros(c)) / denom).cast("double") / unit


def sql_money_sum(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`money_sum` (// = integer floor division)."""
    shift = 10 ** (6 - scale)
    unit = 10 ** scale
    return (
        f"CAST(sum(CAST(floor({expr} * 1000000.0 + 0.5) AS HUGEINT)) "
        f"// {shift} AS DOUBLE) / {unit}"
    )


def sql_money_avg(expr: str, scale: int = 4) -> str:
    """DuckDB twin of :func:`money_avg`."""
    shift = 10 ** (6 - scale)
    unit = 10 ** scale
    return (
        f"CAST(sum(CAST(floor({expr} * 1000000.0 + 0.5) AS HUGEINT)) "
        f"// (count(*) * {shift}) AS DOUBLE) / {unit}"
    )


def epoch_seconds(c: Column) -> Column:
    """NTZ-safe epoch seconds. The driver's parquet fixtures drifted from
    TIMESTAMP (LTZ) to TIMESTAMP_NTZ between rounds; ``cast("long")`` and
    ``unix_micros`` both reject NTZ input, so every epoch conversion in
    the engine routes through here. Casting NTZ→LTZ reinterprets the wall
    clock in the session zone — forced to UTC by :mod:`..session` — which
    is exactly how the DuckDB oracle (no TZ concept on naive timestamps)
    reads the same files. For LTZ/TIMESTAMP input the extra cast is an
    identity, so this is safe for either fixture flavour."""
    return c.cast("timestamp_ltz").cast("long")


def epoch_micros(c: Column) -> Column:
    """NTZ-safe epoch microseconds — see :func:`epoch_seconds`."""
    return F.unix_micros(c.cast("timestamp_ltz"))
