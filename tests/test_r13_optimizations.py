"""Focused pins for the round-13 optimizations: each test pins the
SEMANTICS an optimization must preserve (or the structural property it
claims), so a later refactor can't silently regress it."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_spread_scan_widens_only_narrow_scans(spark):
    """spread_scan repartitions a single-split scan to the machine's
    parallelism, returns an already-wide frame unchanged, and never
    changes the rows (placement only)."""
    from mapreduce511_spark.sources.tables import load_table, spread_scan

    docs = load_table(spark, SF_SMOKE, "documents")
    assert docs.rdd.getNumPartitions() == 1  # single-row-group testdata
    wide = spread_scan(docs)
    assert (
        wide.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # same multiset of rows
    assert wide.count() == docs.count()
    h = F.sum(F.xxhash64("doc_id", "lang", "text").cast("decimal(38,0)"))
    assert wide.agg(h).collect() == docs.agg(h).collect()
    # a frame at/above the target width is returned as-is
    already = docs.repartition(spark.sparkContext.defaultParallelism + 1)
    assert spread_scan(already) is already
