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
