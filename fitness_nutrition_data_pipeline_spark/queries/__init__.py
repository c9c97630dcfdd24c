"""Query registry: every operator the engine claims, as a (Spark builder,
DuckDB oracle SQL) pair runnable on the synthetic testdata tables.

Each spec's builder takes ``(spark, sf_dir)`` and returns a DataFrame; the
oracle is ANSI SQL DuckDB can run over the same parquet (views
pre-registered by the driver). Column names/aliases are kept identical on
both sides because the correctness compare sorts columns by name before
hashing. Specs without an oracle (non-SQL-expressible ops) set
``oracle=None`` and get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a query builder to the global registry."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def all_specs() -> dict[str, QuerySpec]:
    # Import side-effect modules once, on first use.
    from fitness_nutrition_data_pipeline_spark.queries import (  # noqa: F401
        llm_ops,
        profiling,
        relational,
        relational2,
        relational3,
        sampling,
        sketch_ops,
        text_ops,
        tpch_like,
        tpch_like2,
    )

    return dict(_REGISTRY)
