"""Query registry: the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers a QuerySpec here (via
the domain modules in operators/, functions/, sources/, lakehouse/,
streaming/). __spark_entry__.queries() / oracle_sql() are thin views over
this registry.

A QuerySpec pairs a Spark-first builder ``(spark, sf_dir) -> DataFrame`` with
an equivalent ANSI-SQL oracle string for DuckDB (or None for ops that are
not SQL-expressible — the driver then records a rows-only check).
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
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Decorator: register a query builder under ``name``."""

    def wrap(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return wrap


def all_queries() -> dict[str, QuerySpec]:
    """Import every domain module (side effect: registration) and return the
    full registry."""
    # Imports are deferred so `import tutorial_iceberg_spark` stays cheap.
    from tutorial_iceberg_spark.operators import dedup  # noqa: F401
    from tutorial_iceberg_spark.operators import graph  # noqa: F401
    from tutorial_iceberg_spark.operators import relational  # noqa: F401
    from tutorial_iceberg_spark.operators import temporal  # noqa: F401
    from tutorial_iceberg_spark.operators import tpch_extra  # noqa: F401
    from tutorial_iceberg_spark.operators import pipeline  # noqa: F401
    from tutorial_iceberg_spark.functions import json_fns  # noqa: F401
    from tutorial_iceberg_spark.functions import text  # noqa: F401
    from tutorial_iceberg_spark.functions import vector  # noqa: F401
    from tutorial_iceberg_spark.sources import bucketing  # noqa: F401
    from tutorial_iceberg_spark.sources import sinks  # noqa: F401
    from tutorial_iceberg_spark.sources import generator  # noqa: F401
    from tutorial_iceberg_spark.sources import jdbc  # noqa: F401
    from tutorial_iceberg_spark.sources import parquet_meta  # noqa: F401
    from tutorial_iceberg_spark.lakehouse import queries as lake_queries  # noqa: F401
    from tutorial_iceberg_spark.streaming import events_stream  # noqa: F401
    from tutorial_iceberg_spark.operators import multimodal  # noqa: F401
    from tutorial_iceberg_spark.plans import explain  # noqa: F401

    return dict(_REGISTRY)
