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


def test_figure_spec_contract(spark):
    """S8: the figure spec carries every visual element the reference
    chart has — title/labels/ylim, one series per slowstart with the
    fixed palette, truncation applied, 300-pt smoothing when >10 pts."""
    from mapreduce511_spark.plans.charts import (
        SERIES_COLORS,
        figure_spec,
        prepare_chart_series,
    )
    from mapreduce511_spark.plans.report import averaged_series
    from mapreduce511_spark.plans.monitor import parse_monitor_lines
    from mapreduce511_spark.plans.runs import experiment_lines

    import os

    tree = "/root/reference/MapReduceLog"
    if not os.path.isdir(tree):
        pytest.skip("reference tree not available")
    avg = averaged_series(
        parse_monitor_lines(experiment_lines(spark, tree, "monitor.log")), "cpu"
    )
    prepared = prepare_chart_series(avg, "cpu")
    specs = figure_spec(prepared, "cpu")
    assert specs  # at least one dataset
    for ds, spec in specs.items():
        assert spec["title"] == f"{ds} cluster CPU (multi-run average)"
        assert spec["ylabel"] == "avg CPU (%)"
        assert spec["ylim"] == (0.0, 105.0)
        assert len(spec["series"]) >= 1
        for i, s in enumerate(spec["series"]):
            assert s["color"] == SERIES_COLORS[i % len(SERIES_COLORS)]
            assert s["label"].startswith("slowstart=")
            if s["smoothed"]:
                assert len(s["x"]) == 300
                assert min(s["y"]) >= 0.0 and max(s["y"]) <= 100.0
            # truncation: no x beyond the series max (O4-limited upstream)
            assert s["x"] == sorted(s["x"])


def test_svg_sink_renders_spec(tmp_path, spark, series):
    """The SVG sink produces well-formed, byte-deterministic files with
    one polyline + one fill polygon per series and the legend/axis
    text from the spec."""
    import os
    import xml.etree.ElementTree as ET

    from mapreduce511_spark.plans.charts import (
        prepare_chart_series,
        render_charts_svg,
    )

    prepared = prepare_chart_series(series, "cpu")
    out1 = render_charts_svg(prepared, str(tmp_path / "a"), "cpu")
    out2 = render_charts_svg(prepared, str(tmp_path / "b"), "cpu")
    assert {os.path.basename(p) for p in out1} == {
        "averaged_cpu_A.svg",
        "averaged_cpu_B.svg",
    }
    for p1, p2 in zip(sorted(out1), sorted(out2)):
        b1, b2 = open(p1, "rb").read(), open(p2, "rb").read()
        assert b1 == b2  # deterministic render
    ns = "{http://www.w3.org/2000/svg}"
    for path in out1:
        root = ET.parse(path).getroot()  # well-formed XML
        ds = os.path.basename(path).split("_")[-1].split(".")[0]
        n_series = len(prepared[ds])
        assert len(root.findall(f"{ns}polyline")) == n_series
        assert len(root.findall(f"{ns}polygon")) == n_series
        texts = [t.text for t in root.iter(f"{ns}text")]
        assert f"{ds} cluster CPU (multi-run average)" in texts
        assert "cycle index" in texts
        labels = {t for t in texts if t and t.startswith("slowstart=")}
        assert len(labels) == n_series


def test_render_charts_falls_back_to_svg(tmp_path, series):
    """Without matplotlib in the env, render_charts still writes one
    chart file per dataset (the SVG proof path)."""
    import os

    from mapreduce511_spark.plans.charts import prepare_chart_series, render_charts

    prepared = prepare_chart_series(series, "cpu")
    written = render_charts(prepared, str(tmp_path), "cpu")
    assert len(written) == len(prepared)
    for p in written:
        assert os.path.exists(p) and os.path.getsize(p) > 0
