"""SQL entry point: the engine's tables as temp views + `spark.sql`.

A reference user who prefers SQL over the DataFrame API gets the
identical table names the DuckDB oracles use (``region nation customer
supplier part orders lineitem events documents embeddings``), so
ANSI-dialect queries run verbatim on BOTH engines — the
``sql_*`` passthrough queries in the registry prove it by executing
the literal oracle string through ``spark.sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce511_spark.sources.tables import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Create/replace one temp view per engine table over ``sf_dir``."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)
