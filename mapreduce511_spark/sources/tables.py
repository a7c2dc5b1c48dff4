"""Loaders for the engine's tabular inputs (parquet).

Explicit schemas for every table (SURVEY.md §1.3: the reference infers
schema from regexes; we declare them). Parquet already carries its
schema, so the StructTypes here serve as a contract we assert against —
a scan whose schema drifted should fail loudly, not produce garbage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table; lazy, column-pruned and filter-pushed by Catalyst.

    The scan's resolved schema is asserted against the declared
    StructType above so drift fails loudly at load time — this also
    compensates for the session-wide ``nanosAsLong`` flag the events
    loader needs (see ``_load_events``): any table whose int64-nanos
    column would otherwise silently arrive as a long trips the
    assertion instead.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TABLES)}")
    if name == "events":
        df = _load_events(spark, sf_dir)
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # NTZ vs LTZ timestamps are interchangeable here (session tz is
    # pinned UTC); everything else must match the declared contract.
    def _norm(dt: T.DataType) -> str:
        s = dt.simpleString()
        return "timestamp" if s == "timestamp_ntz" else s

    expected = {f.name: _norm(f.dataType) for f in TABLES[name].fields}
    actual = {f.name: _norm(f.dataType) for f in df.schema.fields}
    if actual != expected:
        raise TypeError(
            f"schema drift reading {name!r}: expected {expected}, got {actual}"
        )
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts has shipped as both parquet TIMESTAMP(NANOS) (which
    vanilla Spark refuses to read) and plain TIMESTAMP(MICROS)
    depending on the generator run, so peek the footer and adapt:

    - micros/millis: plain read, no session conf touched;
    - nanos: read as epoch-nanos (``nanosAsLong``) and truncate to
      microseconds — the same ns→µs truncation DuckDB applies when it
      loads the file, so downstream comparisons agree exactly. That
      conf cannot be restored after the read (parquet scans consult it
      again at action time), so it stays set session-wide;
      ``load_table``'s schema assertion keeps other nanos columns
      fail-loud regardless."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    path = f"{sf_dir}/events.parquet"
    ts_type = str(pq.read_schema(path).field("ts").type)
    if not ts_type.startswith("timestamp[ns"):
        # cast NTZ -> LTZ (session tz is pinned UTC, so values are
        # unchanged) to keep the loader's historical column contract:
        # downstream code casts ts to double for epoch arithmetic,
        # which TIMESTAMP_NTZ disallows
        raw = spark.read.parquet(path)
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(path)
    return raw.select(
        "event_id",
        F.timestamp_micros(F.expr("ts div 1000")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names or TABLES}


def spread_scan(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition an UNDER-PARALLEL scan so CPU-heavy
    per-row map work (tokenize + n-gram explode, media decode, vector
    folds) uses the whole machine (r13, guide §2.2/§6).

    Why it exists: the testdata tables are single-file / single-
    row-group parquet, so every scan plans as ONE task regardless of
    core count — ``maxPartitionBytes``/``minPartitionNum`` cannot
    split a lone row group, and the expensive map stage of every
    corpus query ran serially (measured: the tf-idf bigram count
    build 4.19 s -> 0.87 s at 32 cores from this one change).

    Scale-adaptive by construction: when the scan already carries at
    least ``min_parts`` partitions (any realistically-sized input —
    at 100 TB the file layout provides thousands of splits) the
    DataFrame is returned UNCHANGED, so no production plan ever pays
    a full-payload exchange for this. The exchange this helper adds
    on small inputs is a round-robin of the raw scan rows ahead of
    the first aggregation; results do not depend on placement
    (every consumer here is oracle-pinned placement-invariant), and
    Spark's sort-before-repartition keeps the assignment
    deterministic under task retries (SPARK-23207).
    """
    sc = df.sparkSession.sparkContext
    n = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def read_parquet_checked(spark: SparkSession, path: str) -> DataFrame:
    """Ad-hoc parquet reader with the same fail-loud nanos protection
    ``load_table`` gives declared tables.

    ``_load_events`` sets ``spark.sql.legacy.parquet.nanosAsLong``
    session-wide (it cannot be restored — parquet scans consult it at
    action time), so a direct ``spark.read.parquet`` on a file with a
    TIMESTAMP(NANOS) column would silently yield a long column.
    Declared tables are covered by the schema assertion; engine-written
    artifacts (IVF index, committed-sink output, compaction output)
    have no declared schema, so this helper peeks one parquet footer
    per leaf with pyarrow and raises on any nanos-typed column.
    Footer listing is driver-local (os.walk) — fine for the local
    paths these artifacts use; an object-store deployment would list
    via the Hadoop FileSystem API instead."""
    assert_no_nanos_columns(path)
    return spark.read.parquet(path)


def assert_no_nanos_columns(path: str) -> None:
    """Raise if any parquet footer under ``path`` declares an INT64
    TIMESTAMP(NANOS) column (one footer checked per leaf directory —
    schemas within a Spark write are uniform).

    The check reads the PARQUET schema, not the Arrow one: pyarrow
    maps legacy INT96 timestamps (Spark's default writer output) to
    ``timestamp[ns]`` too, and those read back fine — only genuine
    INT64-nanos columns are affected by the ``nanosAsLong`` flag."""
    import os

    import pyarrow.parquet as pq

    if os.path.isfile(path):
        footers = [path]
    else:
        footers = []
        seen_dirs: set[str] = set()
        for root, _dirs, files in sorted(os.walk(path)):
            for f in sorted(files):
                if f.endswith(".parquet") and root not in seen_dirs:
                    seen_dirs.add(root)
                    footers.append(os.path.join(root, f))
    for fp in footers:
        schema = pq.read_metadata(fp).schema
        for i in range(len(schema)):
            col = schema.column(i)
            if (
                col.physical_type == "INT64"
                and "isAdjustedToUTC" in str(col.logical_type)
                and "nanos" in str(col.logical_type).lower()
            ):
                raise TypeError(
                    f"{fp}: column {col.name!r} is INT64 "
                    f"{col.logical_type} — with nanosAsLong set "
                    "session-wide this would silently read as long; "
                    "truncate to micros at write time instead"
                )
