"""JSONL (newline-delimited JSON) corpus source/sink.

JSONL shards are the interchange format of LLM training corpora
(one JSON object per line, gzip-friendly, streamable).  The reference
has no JSON surface at all (its inputs are raw text logs,
`/root/reference/analyze/common_utils.py`); this is extension-tier
I/O so a corpus cleaned here can leave for a trainer, and an external
corpus can enter, without a parquet detour.

Scale posture:

- **Write**: shard count is explicit (`num_shards`) via `repartition`
  — a deliberate full shuffle so shard sizes are uniform regardless of
  upstream partitioning (the alternative, coalesce, inherits skew).
  At 100 TB you pick shards ~ a few hundred MB each.
- **Read**: Spark's JSON datasource is splittable per-file for
  uncompressed JSONL, so parallelism = shards.  The schema is ALWAYS
  explicit — schema inference on JSON triggers a full extra pass over
  the data and silently widens types; both are unacceptable at scale.
  `mode=FAILFAST` makes malformed lines loud, matching the engine's
  fail-loud schema contract (`sources/tables.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce511_spark.sources.tables import TABLES


def write_jsonl(df: DataFrame, path: str, num_shards: int = 8) -> None:
    """Write a DataFrame as `num_shards` JSONL part files (overwrite)."""
    df.repartition(num_shards).write.mode("overwrite").json(path)


def read_jsonl(
    spark: SparkSession, path: str, table: str = "documents"
) -> DataFrame:
    """Read JSONL written for one of the declared table schemas.

    Explicit schema (no inference pass) + FAILFAST (corrupt lines
    raise instead of becoming silent nulls).
    """
    return (
        spark.read.schema(TABLES[table])
        .option("mode", "FAILFAST")
        .json(path)
    )
