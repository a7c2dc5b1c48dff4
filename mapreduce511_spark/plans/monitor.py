"""Monitor-log parsing (SURVEY.md §2: S2, P1–P3, W1, F1, F7).

Reference semantics (``/root/reference/analyze/common_utils.py:8-48``),
reproduced over an ordered-lines DataFrame:

- banner lines ('Real Performance Monitor Started') and blanks are
  dropped (P1);
- a line containing ``----`` is a cycle separator: the running count
  of separators assigns each sample its ``time_step`` (W1);
- samples match ``[node-name] CPU: x.xx% | MEM: y%`` (P2/F1) — NB the
  collector writes integer ``CPU: 0%`` on non-positive diffs
  (``monitor_real.sh:50-53``), which does NOT match and is silently
  dropped, faithfully;
- quirk replicated exactly: if no separator occurs in the first 20
  lines and a sample precedes the first separator, the step counter is
  seeded to 0 at the first sample instead of -1
  (``common_utils.py:32-33``), which shifts all subsequent steps +1
  relative to the normal path; steps are floored at 0.

The running count is a per-file window over ``line_no`` — the ordered
read contract from ``sources.text_logs`` (SURVEY.md §4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SAMPLE_PATTERN = r"\[(\w+-\w+)\] CPU: (\d+\.\d+)% \| MEM: (\d+)%"

# Columns carried through from the experiment-tree scan, if present.
_KEY_COLS = ("dataset", "slowstart", "run_id")


def parse_monitor_lines(lines: DataFrame, normalize_steps: bool = True) -> DataFrame:
    """``[file, (keys...), time_step, node, cpu, mem]`` from ordered
    lines ``[file, line_no, value, ...]``.

    ``normalize_steps`` applies the per-run ``time_step -= min`` (W2,
    ``common_utils.py:213-214``) the reference performs at scan time.
    """
    keys = [c for c in _KEY_COLS if c in lines.columns]

    banner = F.col("value").contains("Real Performance Monitor Started") | (
        F.trim(F.col("value")) == ""
    )
    is_sep = (~banner) & F.col("value").contains("----")
    node = F.regexp_extract("value", SAMPLE_PATTERN, 1)
    is_sample = (~banner) & (~is_sep) & (node != "")

    per_file = Window.partitionBy("file")
    ordered = per_file.orderBy("line_no")
    running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    # Running separator count k: samples after k separators sit at
    # step k-1 (the counter starts at -1), unless the seed quirk fired.
    k = F.sum(is_sep.cast("int")).over(running)
    early_sep = F.max((is_sep & (F.col("line_no") < 20)).cast("int")).over(per_file)
    first_sep = F.min(F.when(is_sep, F.col("line_no"))).over(per_file)
    first_sample = F.min(F.when(is_sample, F.col("line_no"))).over(per_file)
    seed_fired = (
        (early_sep == 0)
        & first_sample.isNotNull()
        & (first_sep.isNull() | (first_sample < first_sep))
    )
    offset = F.when(seed_fired, F.lit(1)).otherwise(F.lit(0))
    step = F.greatest(F.lit(0), k - 1 + offset)

    samples = (
        lines.withColumn("time_step", step)
        .filter(is_sample)
        .select(
            "file",
            *keys,
            "time_step",
            F.regexp_extract("value", SAMPLE_PATTERN, 1).alias("node"),
            F.regexp_extract("value", SAMPLE_PATTERN, 2).cast("double").alias("cpu"),
            F.regexp_extract("value", SAMPLE_PATTERN, 3).cast("int").alias("mem"),
        )
    )

    if normalize_steps:
        samples = samples.withColumn(
            "time_step",
            F.col("time_step") - F.min("time_step").over(Window.partitionBy("file")),
        )
    return samples
