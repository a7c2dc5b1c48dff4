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


def test_heldout_hist_memo_hit_and_stability(spark):
    """Both heldout queries share one session-memoized count table
    (VERDICT r12 item 4); repeated invocations serve the same frame
    and the query results are invocation-stable."""
    from mapreduce511_spark.queries import text as t

    t._HELDOUT_HIST_MEMO.clear()
    h1 = t._heldout_hist(spark, SF_SMOKE)
    h2 = t._heldout_hist(spark, SF_SMOKE)
    assert h1 is h2  # memo hit
    assert len(t._HELDOUT_HIST_MEMO) == 1
    r1 = sorted(map(tuple, t.heldout_bigram_ppl(spark, SF_SMOKE).collect()))
    r2 = sorted(map(tuple, t.heldout_bigram_ppl(spark, SF_SMOKE).collect()))
    assert r1 == r2
    k1 = sorted(map(tuple, t.heldout_kneser_ney_ppl(spark, SF_SMOKE).collect()))
    k2 = sorted(map(tuple, t.heldout_kneser_ney_ppl(spark, SF_SMOKE).collect()))
    assert k1 == k2
    # a cleared memo (fresh-process analog) reproduces identical rows
    t._HELDOUT_HIST_MEMO.clear()
    assert sorted(
        map(tuple, t.heldout_bigram_ppl(spark, SF_SMOKE).collect())
    ) == r1
