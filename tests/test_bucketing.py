"""Bucketed co-located joins: the 100 TB strategy for repeated big-big
joins (SURVEY §4: 'co-locate joins via bucketing'). Writing both sides
bucketed by the join key lets Spark plan a SortMergeJoin with ZERO
Exchange — no shuffle at query time."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce511_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    (
        li.write.mode("overwrite")
        .option("path", str(wh / "lineitem_b"))  # external table in tmp
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )
    (
        orders.withColumnRenamed("o_orderkey", "l_orderkey")
        .write.mode("overwrite")
        .option("path", str(wh / "orders_b"))
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("orders_b")
    )
    yield "lineitem_b", "orders_b"
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    li = spark.table(li_t)
    orders = spark.table(o_t)
    # disable broadcast so the join strategy question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, "l_orderkey").groupBy("o_orderstatus").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not shuffle either side: the only
        # Exchange allowed is the one feeding the final groupBy.
        join_part = plan.split("SortMergeJoin")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_part, join_part[:2000]
        # and results are right
        expect = (
            load_table(spark, SF_SMOKE, "lineitem")
            .join(
                load_table(spark, SF_SMOKE, "orders").withColumnRenamed(
                    "o_orderkey", "l_orderkey"
                ),
                "l_orderkey",
            )
            .groupBy("o_orderstatus")
            .count()
        )
        got = {r["o_orderstatus"]: r["count"] for r in joined.collect()}
        want = {r["o_orderstatus"]: r["count"] for r in expect.collect()}
        assert got == want
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_unbucketed_join_does_shuffle(spark):
    """Control: the same join over plain parquet must Exchange both
    sides (proves the bucketed plan's shuffle elimination is real)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, SF_SMOKE, "lineitem")
        orders = load_table(spark, SF_SMOKE, "orders").withColumnRenamed(
            "o_orderkey", "l_orderkey"
        )
        plan = (
            li.join(orders, "l_orderkey")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") >= 2, plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitioning (the experiment-tree analog, SURVEY
    §1.1): writing documents partitioned by lang lets a lang filter
    prune directories at planning time — PartitionFilters, zero data
    read from other partitions."""
    docs = load_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "docs_by_lang")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    back = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "lang" in pf, pf
    en = docs.filter(F.col("lang") == "en").count()
    assert back.count() == en


def test_bucketed_fingerprint_index_anti_join_no_corpus_shuffle(
    spark, tmp_path_factory
):
    """The incremental-dedup docstrings promise: 'at 100 TB the
    fingerprint index is a bucketed table so arriving batches join
    with zero corpus-side shuffle'. Prove it: write the corpus
    fingerprint index bucketed by the digest, anti-join an arriving
    batch against it, and assert the index side feeds the join with
    NO Exchange (only the small batch side may shuffle to align
    bucketing)."""
    from pyspark.sql import functions as F

    from mapreduce511_spark.functions.text import normalize_text

    wh = tmp_path_factory.mktemp("fp_wh")
    docs = load_table(spark, SF_SMOKE, "documents")
    fp = docs.select("doc_id", F.md5(normalize_text("text")).alias("f"))
    corpus = fp.filter(F.col("doc_id") % 10 != 0).select("f").distinct()
    (
        corpus.write.mode("overwrite")
        .option("path", str(wh / "fp_index"))
        .bucketBy(8, "f")
        .sortBy("f")
        .saveAsTable("fp_index_b")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        index = spark.table("fp_index_b")
        batch = fp.filter(F.col("doc_id") % 10 == 0)
        admitted = batch.join(index, "f", "left_anti")
        plan = admitted._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin LeftAnti" in plan or "LeftAnti" in plan, plan[:500]
        # the index scan must be bucketed, and the ONLY Exchange in
        # the whole plan is the batch side aligning to the bucketing —
        # the corpus/index side reads straight into the join
        assert "Bucketed: true" in plan, plan[:2000]
        assert plan.count("Exchange") == 1, plan[:2000]
        # and correctness vs the plain (unbucketed) anti-join
        expect = batch.join(corpus, "f", "left_anti").count()
        assert admitted.count() == expect
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS fp_index_b")
