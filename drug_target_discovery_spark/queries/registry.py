"""Driver-facing query registry.

Every operator from SURVEY.md §2 lands here as a named ``Query``:
a PySpark implementation ``fn(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) the equivalent ANSI SQL DuckDB runs as the correctness
oracle. The driver hash-matches the two at sf=0.01, sorting columns by name —
so every computed column is aliased identically on both sides, and floating
aggregates are rounded identically on both sides to absorb summation-order
differences between engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import every query module (side-effect registration) and return all."""
    # Local import to avoid circulars; each module registers on import.
    from drug_target_discovery_spark.queries import (  # noqa: F401
        curation,
        dedup,
        events,
        graphq,
        graphx,
        mllibq,
        multimodal,
        percentiles,
        pipelineq,
        relational,
        setops,
        similarity,
        stats,
        text,
        windows,
    )

    return REGISTRY
