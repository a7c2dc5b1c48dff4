"""Distributed chart prep (O4+P6) and the monitor/phase range join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce511_spark.plans.charts import compute_x_limit, truncated_series


@pytest.fixture()
def series(spark):
    rows = [
        # dataset A: one long outlier series (max 300 > 1.1 * 100)
        *[("A", 0.2, t, 50.0) for t in range(0, 101, 10)],
        *[("A", 0.5, t, 60.0) for t in range(0, 301, 10)],
        # dataset B: balanced series (200 <= 1.1 * 190)
        *[("B", 0.2, t, 40.0) for t in range(0, 191, 10)],
        *[("B", 0.5, t, 45.0) for t in range(0, 201, 10)],
    ]
    return spark.createDataFrame(
        rows, ["dataset", "slowstart", "time_step", "avg_cpu"]
    )


def test_truncated_series_matches_driver_rule(series):
    out = truncated_series(series, "cpu")
    limits = {
        r["dataset"]: r["x_limit"]
        for r in out.select("dataset", "x_limit").distinct().collect()
    }
    assert limits == {
        "A": compute_x_limit([100, 300]),  # outlier clamped to 100
        "B": compute_x_limit([190, 200]),  # kept at 200
    }
    assert out.filter(
        (F.col("dataset") == "A") & (F.col("time_step") > 100)
    ).count() == 0


def test_phase_windows_partition_total_time(spark):
    """map/shuffle/reduce windows cover [t0, t_end] with shuffle
    overlapping map by construction."""
    from mapreduce511_spark.plans.progress import parse_progress_lines, phase_windows
    from mapreduce511_spark.plans.runs import experiment_lines

    import os

    tree = "/root/reference/MapReduceLog"
    if not os.path.isdir(tree):
        pytest.skip("reference tree not available")
    prog = parse_progress_lines(experiment_lines(spark, tree, "job_output.log"))
    ph = phase_windows(prog)
    assert ph.filter(F.col("end_s") < F.col("start_s")).count() == 0
    # every run has a map and a reduce window
    per_run = ph.groupBy("file").agg(F.collect_set("phase").alias("ps"))
    missing = per_run.filter(
        ~F.array_contains("ps", "map") | ~F.array_contains("ps", "reduce")
    ).count()
    assert missing == 0


def test_log_phase_cpu_sane(spark):
    from mapreduce511_spark.queries.logs import log_phase_cpu

    df = log_phase_cpu(spark, "unused").cache()
    assert df.filter((F.col("avg_cpu") < 0) | (F.col("avg_cpu") > 100)).count() == 0
    phases = {r["phase"] for r in df.select("phase").distinct().collect()}
    assert phases <= {"map", "shuffle", "reduce"}
    assert "map" in phases


def test_smooth_series_distributed(spark, series):
    from mapreduce511_spark.plans.charts import smooth_series_distributed

    out = smooth_series_distributed(series, "cpu").cache()
    # every (dataset, slowstart) series survives; values clipped
    assert out.select("dataset", "slowstart").distinct().count() == 4
    assert out.filter((F.col("y") < 0) | (F.col("y") > 100)).count() == 0
    # moving average preserves endpoints
    first = out.filter((F.col("dataset") == "A") & (F.col("slowstart") == 0.2)) \
        .orderBy("x").first()
    assert first["y"] == 50.0
