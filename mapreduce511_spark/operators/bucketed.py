"""Bucketed (pre-partitioned) tables: the shuffle-free co-located
join primitive.

A join between two large fact tables normally shuffles BOTH sides on
the join key every time it runs. Writing the tables bucketed on that
key (``bucketBy`` — Spark's hash-bucketed parquet layout, recorded in
the table catalog) moves the shuffle to WRITE TIME, once: every
subsequent join on the bucket key reads both sides already
co-partitioned, and the sort-merge join plans with no Exchange on
either input. At 100 TB this is the difference between re-shuffling
the fact table per query and never shuffling it again — the standard
warehouse layout for repeated fact-to-fact joins (the in-query twin
is ``repartition`` on the key; the broadcast path only exists for
dimension-sized sides).

``sortBy`` on the same key additionally makes each bucket file
internally ordered, so the merge join's per-task sort is a cheap
verification pass.

Reference basis: extension tier — storage-layout operator family
(with ``zorder_cell_census`` and ``ivf_write_partitioned``); no
analog in /root/reference (its engine re-reads flat CSV per query).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int) -> None:
    """Materialize ``df`` as a hash-bucketed, per-bucket-sorted
    catalog table (parquet). Overwrites any previous version — the
    write IS the one-time shuffle the layout amortizes away.

    The drop + location sweep first handles the orphaned-directory
    case: a managed-table location left on disk by a previous session
    whose (in-memory or rebuilt) catalog no longer lists the table
    makes a plain overwrite fail with LOCATION_ALREADY_EXISTS."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for prefix in ("file://", "file:"):
        if warehouse.startswith(prefix):
            warehouse = warehouse[len(prefix):]
            break
    shutil.rmtree(Path(warehouse) / table.lower(), ignore_errors=True)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )
