"""Log-analytics queries (the reference's core analysis surface).

These run the engine's monitor/progress/stage/report pipelines
(``mapreduce511_spark.plans``) over the reference's real experiment
logs when present, else over synthetic fixture logs generated per
FIXTURES.md. Their inputs are raw text logs, not the parquet views the
DuckDB oracle can see, so they register as rows-only checks; golden
parity against ``Analysis_Results/result_raw.csv`` is asserted in
``tests/test_golden_replay.py`` instead.

Populated alongside milestones M2–M4.
"""

from __future__ import annotations
