"""Job-counter block parsing (SURVEY.md §1.1 / FIXTURES.md F4).

The 55-counter block at job end (``job_output.log:70-131``) is
``group → name=value`` with one-tab group headers and two-tab counter
lines (group headers may carry trailing spaces, names may contain
':' / spaces, e.g. ``Shuffled Maps =100``). Group attribution is
order-dependent: forward-fill the last seen header per file — a
per-file window over the ordered read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_GROUP_PATTERN = r"^\t([^\t].*?)\s*$"
_COUNTER_PATTERN = r"^\t\t(.+?)\s*=\s*(-?\d+)\s*$"

_KEY_COLS = ("dataset", "slowstart", "run_id")


def parse_counter_lines(lines: DataFrame) -> DataFrame:
    """``[file, (keys...), group, counter, value: long]`` long table.

    Invariants downstream tests rely on (FIXTURES.md F4):
    Combine input == Map output records; Reduce input == Combine
    output; Reduce output == Reduce input groups.
    """
    keys = [c for c in _KEY_COLS if c in lines.columns]

    group = F.regexp_extract("value", _GROUP_PATTERN, 1)
    counter = F.regexp_extract("value", _COUNTER_PATTERN, 1)
    cval = F.regexp_extract("value", _COUNTER_PATTERN, 2)

    ffill = Window.partitionBy("file").orderBy("line_no").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        lines.withColumn("grp_here", F.when(group != "", group))
        .withColumn("group", F.last("grp_here", ignorenulls=True).over(ffill))
        .filter((counter != "") & F.col("group").isNotNull())
        .select(
            "file",
            *keys,
            "group",
            counter.alias("counter"),
            cval.cast("long").alias("value"),
        )
    )
