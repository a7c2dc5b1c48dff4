"""Golden-replay tests (SURVEY.md §5.2): run the engine's log plans
over the *real* reference logs (read-only) and assert the outputs
match the committed ``Analysis_Results/result_*.csv`` golden files.

The reference's report generator excluded the 5G configs (README:
unanalyzed); our scan includes them, so comparisons join on the
(dataset, slowstart) keys present in the golden CSVs.

Known reference-internal inconsistency (documented in SURVEY.md §0 as
"two analysis generations"): the committed 1G@1.0 logs span 1253 s of
progress lines while the golden CSV row says 927 s — the CSV row came
from a run whose log is not in the repo (verifiable from the raw
first/last progress timestamps). That one cell is excluded everywhere,
and Best_SlowStart is only asserted where the excluded cell cannot
change the winner (100MB/500MB rows).
"""

from __future__ import annotations

import csv
import os

import pytest

# the (Dataset, SlowStart) cell whose source log is absent from the repo
INCONSISTENT = {("1G", "1.00"), ("1G", "1.0")}

from mapreduce511_spark.plans import (
    averaged_series,
    config_metric_mean,
    parse_counter_lines,
    parse_monitor_lines,
    parse_progress_lines,
    stage_metrics,
    stage_summary,
    wide_report,
)
from mapreduce511_spark.plans.runs import experiment_lines

TREE = "/root/reference/MapReduceLog"
GOLDEN = "/root/reference/Analysis_Results"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TREE), reason="reference tree not available"
)


def _golden(name: str) -> list[dict]:
    with open(os.path.join(GOLDEN, name)) as fh:
        return list(csv.DictReader(fh))


@pytest.fixture(scope="module")
def stage_sum(spark):
    lines = experiment_lines(spark, TREE, "job_output.log")
    return stage_summary(stage_metrics(parse_progress_lines(lines))).collect()


@pytest.fixture(scope="module")
def cpu_means(spark):
    lines = experiment_lines(spark, TREE, "monitor.log")
    series = averaged_series(parse_monitor_lines(lines), "cpu")
    return config_metric_mean(series, "cpu").collect()


def test_result_raw_stage_metrics(stage_sum):
    got = {
        (r["dataset"], f"{r['slowstart']:.2f}"): r for r in stage_sum
    }
    for row in _golden("result_raw.csv"):
        key = (row["Dataset"], row["SlowStart"])
        if key in INCONSISTENT:
            continue
        assert key in got, f"missing config {key}"
        r = got[key]
        assert abs(r["total_s"] - float(row["Total_Time(s)"])) < 0.01, key
        assert abs(r["map_s"] - float(row["Map_Time(s)"])) < 0.01, key
        assert abs(r["shuffle_s"] - float(row["Shuffle_Time(s)"])) < 0.01, key
        assert abs(r["reduce_s"] - float(row["Reduce_Time(s)"])) < 0.01, key
        assert abs(r["overlap_pct"] - float(row["Overlap_Ratio(%)"])) < 0.01, key


def test_result_raw_avg_cpu(cpu_means):
    got = {(r["dataset"], f"{r['slowstart']:.2f}"): r["avg_cpu"] for r in cpu_means}
    for row in _golden("result_raw.csv"):
        key = (row["Dataset"], row["SlowStart"])
        if key in INCONSISTENT:
            continue
        assert key in got, f"missing config {key}"
        assert abs(got[key] - float(row["Avg_CPU(%)"])) < 0.01, key


@pytest.mark.parametrize(
    "csv_name,metric,direction",
    [
        ("result_time.csv", "total_s", "min"),
        ("result_map.csv", "map_s", "min"),
        ("result_shuffle.csv", "shuffle_s", "min"),
        ("result_reduce.csv", "reduce_s", "min"),
        ("result_overlap.csv", "overlap_pct", "max"),
    ],
)
def test_wide_reports(spark, csv_name, metric, direction):
    lines = experiment_lines(spark, TREE, "job_output.log")
    summ = stage_summary(stage_metrics(parse_progress_lines(lines)))
    wide = {
        r["dataset"]: r
        for r in wide_report(summ, metric, direction).collect()
    }
    for row in _golden(csv_name):
        ds = row["Dataset"]
        assert ds in wide, ds
        for ss in ("0.2", "0.5", "0.8", "1.0"):
            if (ds, ss) in INCONSISTENT:
                continue
            assert abs(wide[ds][ss] - float(row[ss])) < 0.01, (ds, ss)
        if ds != "1G":
            assert wide[ds]["best_slowstart"] == row["Best_SlowStart"], ds


def test_wide_report_cpu(spark, cpu_means):
    import pandas as pd

    summ = spark.createDataFrame(pd.DataFrame([r.asDict() for r in cpu_means]))
    wide = {r["dataset"]: r for r in wide_report(summ, "avg_cpu", "max").collect()}
    for row in _golden("result_cpu.csv"):
        ds = row["Dataset"]
        for ss in ("0.2", "0.5", "0.8", "1.0"):
            if (ds, ss) in INCONSISTENT:
                continue
            assert abs(wide[ds][ss] - float(row[ss])) < 0.01, (ds, ss)
        if ds != "1G":
            assert wide[ds]["best_slowstart"] == row["Best_SlowStart"], ds


def test_counter_invariants(spark):
    """FIXTURES.md F4 invariants on the real 100MB@0.5 counters."""
    import pyspark.sql.functions as F

    lines = experiment_lines(spark, TREE, "job_output.log")
    one_run = parse_counter_lines(lines).filter(
        F.col("file").contains("_100mb_slowstart_0.5/20251128_192422")
    )
    vals = {
        r["counter"]: r["value"]
        for r in one_run.filter(
            F.col("group") == "Map-Reduce Framework"
        ).collect()
    }
    assert vals["Combine input records"] == vals["Map output records"] == 16208667
    assert vals["Reduce input records"] == vals["Combine output records"] == 3055995
    assert vals["Reduce output records"] == vals["Reduce input groups"] == 781397
    assert vals["Reduce shuffle bytes"] == 45810576
    assert vals["Spilled Records"] == 6111990
