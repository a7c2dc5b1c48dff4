"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship WordCount pipeline at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full suite from
``mapreduce511_spark.queries`` (one entry per implemented operator
from SURVEY.md §2 plus the LLM-pipeline extensions). Queries whose
inputs are raw log files (not the parquet views DuckDB sees) have no
oracle entry and get the driver's rows-only check; their golden parity
is asserted in tests/ instead.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from mapreduce511_spark import queries as _suite  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _suite.all_queries()["wordcount"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _suite.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted → rows-only)."""
    return _suite.all_oracles()
