"""Query suite — the driver-facing registry.

Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
extensions) registers here as a named query: a Spark callable
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, a DuckDB
oracle string computing the same result on the same parquet tables.
Column names/aliases match exactly between both sides (the driver's
compare sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, SparkQuery] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle) to the suite."""

    def deco(fn: SparkQuery) -> SparkQuery:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, SparkQuery]:
    _load()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)


_LOADED = False


def _load() -> None:
    """Import all query modules (registration side effects)."""
    global _LOADED
    if _LOADED:
        return
    from mapreduce511_spark.queries import (  # noqa: F401
        dedup,
        events,
        logs,
        multimodal,
        relational,
        similarity,
        sqlapi,
        text,
    )

    _LOADED = True
