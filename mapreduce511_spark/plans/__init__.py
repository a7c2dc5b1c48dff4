from mapreduce511_spark.plans.counters import parse_counter_lines
from mapreduce511_spark.plans.monitor import parse_monitor_lines
from mapreduce511_spark.plans.progress import parse_progress_lines, stage_metrics
from mapreduce511_spark.plans.report import (
    averaged_series,
    config_metric_mean,
    dataset_sort_key,
    result_raw,
    stage_summary,
    wide_report,
)
from mapreduce511_spark.plans.runs import experiment_files, experiment_lines

__all__ = [
    "averaged_series",
    "config_metric_mean",
    "dataset_sort_key",
    "experiment_files",
    "experiment_lines",
    "parse_counter_lines",
    "parse_monitor_lines",
    "parse_progress_lines",
    "result_raw",
    "stage_metrics",
    "stage_summary",
    "wide_report",
]
