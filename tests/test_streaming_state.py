"""Streaming state observability (r4 VERDICT item 8): the census
reports real per-batch state metrics, and peak state is bounded by
DISTINCT KEYS, not input volume — proven with a 2x replay."""

from __future__ import annotations

import pyspark.sql.functions as F

from mapreduce511_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_state_metrics_census_shape_and_monotonicity(spark):
    from mapreduce511_spark.queries.streaming_queries import (
        stream_state_metrics_census,
    )

    rows = stream_state_metrics_census(spark, SF_SMOKE).collect()
    assert rows, "expected at least one stateful micro-batch"
    n_keys = (
        load_table(spark, SF_SMOKE, "events")
        .select(F.date_trunc("hour", "ts").alias("w"), "event_type")
        .distinct()
        .count()
    )
    for r in rows:
        assert r.num_rows_total >= 0
        assert r.num_rows_updated >= 0
        # state rows can never exceed the distinct (window, type) keys
        assert r.num_rows_total <= n_keys
    # the drain must end having seen every key at least once
    assert max(r.num_rows_total for r in rows) > 0


def test_state_bounded_under_2x_replay(spark, tmp_path):
    """At-least-once redelivery doubles input volume; a keyed
    aggregation's state must NOT double — it tracks distinct keys.
    This is the invariant the census exists to alarm on."""
    from mapreduce511_spark.streaming import stream_events, tumbling_counts

    ev = load_table(spark, SF_SMOKE, "events")

    def peak_state(src: str, ckpt: str) -> int:
        q = (
            tumbling_counts(stream_events(spark, src, max_files_per_trigger=2))
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return max(
            op["numRowsTotal"]
            for p in q.recentProgress
            for op in (p["stateOperators"] or [])
        )

    one = str(tmp_path / "one")
    two = str(tmp_path / "two")
    ev.repartition(4).write.parquet(one)
    ev.repartition(4).write.parquet(two)
    ev.repartition(4).write.mode("append").parquet(two)

    p1 = peak_state(one, str(tmp_path / "c1"))
    p2 = peak_state(two, str(tmp_path / "c2"))
    assert p2 <= p1 * 1.1 + 1, (p1, p2)
