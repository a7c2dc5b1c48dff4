"""Distributed total-order primitives: global row numbers and dense
ranks WITHOUT a single-partition sort.

The recipe (the standard one every distributed engine uses for
ranking): repartitionByRange on the sort key (range partitions are
contiguous in key order), count rows per partition, turn the counts
into cumulative offsets (a <=P-row driver collect), then add the
offset to a WITHIN-partition row_number. One materialization pins the
partition ids against recomputation and serves both passes.

``global_row_number`` requires the sort key to be a total order
(include a unique tiebreaker column); ``dense_rank_global`` tolerates
ties and gives equal keys equal ranks, numbered densely from 0 —
the primitive iterative algorithms like suffix-array prefix doubling
re-rank with each round.

Reference basis: extension tier — distributed-ordering support for
the storage-layout and text families (SURVEY.md §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_row_number(
    df: DataFrame,
    sort_cols: list[str],
    out_col: str = "rn",
    num_partitions: int = 16,
) -> DataFrame:
    """Append 1-based global row numbers under ``sort_cols`` (must be
    a total order) via the two-pass range-partition recipe. The
    returned DataFrame is materialized (localCheckpoint) so the
    numbering is stable for every downstream consumer."""
    spark = df.sparkSession
    d = (
        df.repartitionByRange(num_partitions, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        # one materialization feeds the offset pass and the row-number
        # pass (and pins _pid against recomputation)
        .localCheckpoint(eager=True)
    )
    counts = sorted(
        d.groupBy("_pid").count().collect(), key=lambda r: r["_pid"]
    )
    offs, acc = [], 0
    for r in counts:
        offs.append((r["_pid"], acc))
        acc += r["count"]
    off_df = spark.createDataFrame(offs, "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(*sort_cols)
    return (
        d.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, F.row_number().over(w) + F.col("_off"))
        .drop("_pid", "_off")
    )


def dense_rank_global(
    df: DataFrame,
    key_cols: list[str],
    out_col: str = "rank",
    num_partitions: int = 16,
) -> DataFrame:
    """Append dense global ranks (equal keys -> equal rank, ranks
    numbered 0..n_distinct-1 in key order) without a global sort:
    rank the DISTINCT keys with ``global_row_number`` (a far smaller
    relation), then hash-join the ranks back onto the rows."""
    keys = df.select(*key_cols).distinct()
    ranked = global_row_number(
        keys, key_cols, out_col="_krn", num_partitions=num_partitions
    ).withColumn(out_col, F.col("_krn") - 1).drop("_krn")
    return df.join(ranked, key_cols)
