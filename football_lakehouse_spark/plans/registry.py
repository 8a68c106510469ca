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


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), bench, tags)
        return fn

    return deco


def all_queries() -> dict[str, Builder]:
    return {n: s.builder for n, s in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}


def bench_queries() -> dict[str, QuerySpec]:
    return {n: s for n, s in REGISTRY.items() if s.bench}
