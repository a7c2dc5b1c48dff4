"""Salted-join equivalence and the WordCount text-sink round trip
(SURVEY.md §2.1 S5/S6, §2.6 O5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce511_spark.operators.skew import salted_join
from mapreduce511_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    events = load_table(spark, SF_SMOKE, "events")
    dim = (
        events.groupBy("event_type")
        .agg(F.count("*").alias("type_total"))
    )
    plain = events.join(dim, "event_type").select("event_id", "type_total")
    salted = salted_join(
        events, dim, on="event_type", salt_cols=["event_id"], n_salts=8
    ).select("event_id", "type_total")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_left_join_keeps_unmatched(spark):
    events = load_table(spark, SF_SMOKE, "events")
    dim = (
        events.groupBy("event_type")
        .agg(F.count("*").alias("type_total"))
        .filter(F.col("type_total") > 1e12)  # empty dim
    )
    out = salted_join(
        events, dim, on="event_type", salt_cols=["event_id"], how="left"
    )
    assert out.count() == events.count()
    assert out.filter(F.col("type_total").isNotNull()).count() == 0


def test_wordcount_sorted_tsv_sink_roundtrip(spark, tmp_path):
    """S5 (word\\tcount TSV, key-sorted) + S6 (overwrite) + O5: the
    reference reducer's TextOutputFormat contract."""
    from mapreduce511_spark.operators.wordcount import word_count

    docs = load_table(spark, SF_SMOKE, "documents")
    counts = word_count(docs)
    out = str(tmp_path / "wc_out")
    # tiny final result -> single sorted partition, like the 1-reducer
    # reference output; at scale: keep N output files, sorted within.
    (
        counts.orderBy("word")
        .coalesce(1)
        .write.mode("overwrite")
        .option("sep", "\t")
        .csv(out)
    )
    back = (
        spark.read.option("sep", "\t")
        .schema("word STRING, cnt LONG")
        .csv(out)
    )
    assert back.count() == counts.count()
    assert back.agg(F.sum("cnt")).first()[0] == counts.agg(F.sum("cnt")).first()[0]
    # overwrite protocol: second write must succeed and replace
    counts.limit(5).orderBy("word").coalesce(1).write.mode("overwrite").option(
        "sep", "\t"
    ).csv(out)
    assert spark.read.option("sep", "\t").csv(out).count() == 5


def test_report_csv_sink_roundtrip(spark, tmp_path):
    """S7: wide report -> single-file CSV with header, re-readable."""
    from mapreduce511_spark.plans.report import write_report_csv

    import pyspark.sql.functions as F

    rep = spark.createDataFrame(
        [("100MB", 1.0, 2.0), ("1G", 3.0, 4.0)], ["dataset", "0.2", "0.5"]
    )
    out = str(tmp_path / "report")
    write_report_csv(rep, out)
    import glob

    files = glob.glob(out + "/part-*.csv")
    assert len(files) == 1  # coalesce(1): one report file
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == 2
    assert set(back.columns) == {"dataset", "0.2", "0.5"}


def test_aqe_splits_skewed_join_partition(spark):
    """The engine's configured AQE must actually split a skewed
    shuffle-join partition (isSkew=true in the adaptive plan): this is
    Spark's runtime answer to the reference's hot-reducer finding, for
    the join case (aggregation skew is handled by map-side combine,
    asserted in test_plan_quality)."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
        )
    }
    try:
        # force a sort-merge join and make the skew thresholds small
        # enough that test-scale data triggers the optimizer
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")
        n = 200_000
        big = spark.range(n).select(
            # 90% of rows share key 0 — one hot shuffle partition
            F.when(F.col("id") % 10 == 0, F.col("id")).otherwise(F.lit(0)).alias("k"),
            F.concat(F.lit("v" * 64), F.col("id")).alias("payload"),
        )
        right = spark.range(5_000).select(
            F.col("id").alias("k"), F.lit("r").alias("tag")
        )
        joined = big.join(right, "k")
        # execute THIS DataFrame's QueryExecution (count() would build
        # a separate one whose adaptive plan we can't inspect)
        assert len(joined.collect()) > 0
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan or "isSkew=true" in final_plan, (
            final_plan[:3000]
        )
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_jsonl_round_trip_documents(spark, tmp_path):
    """documents -> JSONL shards -> read-back is lossless (schema and
    values), shard count is as requested, and corrupt lines fail loudly."""
    from pyspark.sql import functions as F

    from mapreduce511_spark.sources.jsonl import read_jsonl, write_jsonl
    from mapreduce511_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "corpus_jsonl")
    write_jsonl(docs, out, num_shards=4)

    import glob

    shards = glob.glob(out + "/part-*")
    assert len(shards) == 4

    back = read_jsonl(spark, out, "documents")
    assert back.schema == docs.schema
    orig = {r["doc_id"]: r for r in docs.collect()}
    got = {r["doc_id"]: r for r in back.collect()}
    assert got == orig

    # corrupt line -> loud failure, not silent nulls
    import pytest

    bad = str(tmp_path / "bad_jsonl")
    write_jsonl(docs.limit(5), bad, num_shards=1)
    shard = glob.glob(bad + "/part-*")[0]
    with open(shard, "a") as f:
        f.write('{"doc_id": "not-a-number", "text": 12\n')
    with pytest.raises(Exception, match="Malformed|FAILFAST|FAILED_READ_FILE"):
        read_jsonl(spark, bad, "documents").collect()
