"""Small-file compaction: fewer files, identical data."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from mapreduce511_spark.operators.maintenance import compact_parquet, dataset_bytes
from mapreduce511_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _pq_files(path: str) -> list[str]:
    return glob.glob(path + "/**/*.parquet", recursive=True)


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    frag = str(tmp_path / "fragmented")
    docs = load_table(spark, SF_SMOKE, "documents")
    docs.repartition(40).write.parquet(frag)  # simulate micro-batch litter
    assert len(_pq_files(frag)) == 40

    out = str(tmp_path / "compacted")
    n = compact_parquet(spark, frag, out, target_file_bytes=dataset_bytes(frag))
    assert n == 1
    assert len(_pq_files(out)) == 1
    a = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    b = sorted(tuple(r) for r in docs.collect())
    assert a == b


def test_compaction_preserves_hive_partitioning(spark, tmp_path):
    frag = str(tmp_path / "by_lang_frag")
    docs = load_table(spark, SF_SMOKE, "documents")
    docs.repartition(20).write.partitionBy("lang").parquet(frag)
    before = len(_pq_files(frag))

    out = str(tmp_path / "by_lang")
    compact_parquet(
        spark, frag, out,
        target_file_bytes=dataset_bytes(frag),
        partition_by=["lang"],
    )
    langs = {p.split("lang=")[1].split("/")[0] for p in _pq_files(out)}
    assert langs == {
        r.lang for r in docs.select("lang").distinct().collect()
    }
    assert len(_pq_files(out)) < before
    # partition pruning still works on the compacted layout
    pruned = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert pruned.count() == docs.filter(F.col("lang") == "en").count()
