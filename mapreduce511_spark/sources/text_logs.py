"""Ordered text-log reading (SURVEY.md §4.3).

The reference's monitor parser is line-order-dependent (a running
count of ``----`` separator lines assigns each sample its cycle index:
``/root/reference/analyze/common_utils.py:19-44``). ``spark.read.text``
does not expose a line number and parallel reads do not promise order,
so we attach a per-file line number explicitly:

- ``monotonically_increasing_id()`` is strictly ascending *within* a
  partition, and the text source emits each file split's lines in file
  order — so ordering by it inside a per-file window reconstructs line
  numbers exactly **while each file is a single split**.
- Log files here are KB-sized; we still enforce the single-split
  assumption by reading with a ``maxPartitionBytes`` large enough that
  no log file is split, and tests cover multi-file globs.

This is the only place the engine needs order-sensitive input; all
downstream operators consume the explicit ``line_no`` column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 1 GiB: far above any log file in the experiment tree, so each file is
# one split and intra-file order is preserved. For truly huge ordered
# files, switch to a byte-offset-aware source instead of raising this.
_ONE_SPLIT_BYTES = str(1024 * 1024 * 1024)


def read_text_ordered(
    spark: SparkSession,
    path: str | list[str],
    recursive: bool = False,
) -> DataFrame:
    """Read text file(s) → ``[file: string, line_no: long, value: string]``.

    ``line_no`` is 0-based within each file, reconstructing the
    sequential read the reference performs single-threaded. Scales to
    many files (one task per file), not to one giant file — the
    experiment tree is many small logs (SURVEY.md §4.3 option 1).
    """
    reader = spark.read.option("maxPartitionBytes", _ONE_SPLIT_BYTES)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.text(path)
    w = Window.partitionBy("file").orderBy("seq")
    return (
        df.select(
            F.input_file_name().alias("file"),
            F.monotonically_increasing_id().alias("seq"),
            F.col("value"),
        )
        .withColumn("line_no", F.row_number().over(w) - F.lit(1))
        .drop("seq")
        .select("file", "line_no", "value")
    )
