"""Chart preparation + rendering (SURVEY.md §2: O4, P6, P7, S8;
milestone M5). Reference: ``analyze_cpu_slowstart.py:22-38,41-121``
(MEM twin ``analyze_mem_slowstart.py``).

Everything distributed happens upstream (the averaged series is a few
thousand rows); this module is deliberately driver-side on the
collected aggregate, exactly like the reference (SURVEY.md §2.10).
scipy/matplotlib are optional — prep degrades to raw points without
scipy, rendering is skipped without matplotlib.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame


def compute_x_limit(max_steps: list[float]) -> int:
    """O4 outlier-aware axis rule (``analyze_cpu_slowstart.py:22-38``):
    if the longest series exceeds 1.1× the second-longest, clamp to
    the second-longest. Input must be sorted ascending."""
    if len(max_steps) < 2:
        return int(max_steps[-1]) if max_steps else 100
    max_val, second = max_steps[-1], max_steps[-2]
    return int(second) if max_val > second * 1.1 else int(max_val)


@dataclass
class Series:
    dataset: str
    slowstart: float
    x: list[float]
    y: list[float]
    smoothed: bool


def prepare_chart_series(series_df: DataFrame, metric: str = "cpu") -> dict[str, list[Series]]:
    """Collect the (tiny) averaged series and apply the reference's
    chart prep per dataset: x-limit rule (O4), truncation (P6), cubic
    spline to 300 points + clip to [0,100] (P7) when >10 points."""
    rows = series_df.collect()
    by_ds: dict[str, dict[float, list[tuple[float, float]]]] = {}
    for r in rows:
        by_ds.setdefault(r["dataset"], {}).setdefault(r["slowstart"], []).append(
            (r["time_step"], r[f"avg_{metric}"])
        )

    out: dict[str, list[Series]] = {}
    for ds, ss_map in by_ds.items():
        max_steps = sorted(max(x for x, _ in pts) for pts in ss_map.values())
        x_limit = compute_x_limit(max_steps)
        out[ds] = []
        for ss in sorted(ss_map):
            pts = sorted(p for p in ss_map[ss] if p[0] <= x_limit)
            if not pts:
                continue
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            out[ds].append(_smooth(ds, ss, xs, ys))
    return out


def _smooth(ds: str, ss: float, xs: list[float], ys: list[float]) -> Series:
    if len(xs) > 10:
        try:
            import numpy as np
            from scipy.interpolate import make_interp_spline

            x_smooth = np.linspace(min(xs), max(xs), 300)
            spline = make_interp_spline(np.array(xs), np.array(ys), k=3)
            y_smooth = np.clip(spline(x_smooth), 0, 100)
            return Series(ds, ss, x_smooth.tolist(), y_smooth.tolist(), True)
        except Exception:
            pass
    return Series(ds, ss, xs, ys, False)


def render_charts(
    prepared: dict[str, list[Series]],
    output_dir: str,
    metric: str = "cpu",
) -> list[str]:
    """PNG per dataset (S8). Shape parity with the reference's
    ``Averaged_*_Charts`` (300 dpi, per-ss lines); pixel parity is a
    non-goal (SURVEY.md §7)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return []

    os.makedirs(output_dir, exist_ok=True)
    colors = ["#4C72B0", "#DD8452", "#55A868", "#C44E52"]
    written = []
    for ds, series_list in prepared.items():
        plt.figure(figsize=(12, 7), dpi=150)
        for i, s in enumerate(series_list):
            plt.plot(
                s.x, s.y, label=f"slowstart={s.slowstart}", color=colors[i % 4]
            )
            plt.fill_between(s.x, s.y, alpha=0.12, color=colors[i % 4])
        plt.title(f"{ds} cluster {metric.upper()} (multi-run average)")
        plt.xlabel("cycle index")
        plt.ylabel(f"avg {metric.upper()} (%)")
        plt.legend()
        plt.ylim(0, 105)
        path = os.path.join(output_dir, f"averaged_{metric}_{ds}.png")
        plt.savefig(path, bbox_inches="tight")
        plt.close()
        written.append(path)
    return written


def truncated_series(series_df: DataFrame, metric: str = "cpu") -> DataFrame:
    """Distributed twin of the O4+P6 chart prep: per-dataset x-axis
    limit via the outlier-aware second-max rule, then truncation —
    as DataFrame ops (the driver-side ``prepare_chart_series`` stays
    for spline rendering; this feeds sinks/joins at scale).

    Shape: per-series maxes (tiny) aggregate per dataset into the
    limit, broadcast back onto the series rows."""
    from pyspark.sql import functions as F

    maxes = series_df.groupBy("dataset", "slowstart").agg(
        F.max("time_step").alias("mx")
    )
    arr = F.reverse(F.array_sort(F.collect_list("mx")))
    limits = maxes.groupBy("dataset").agg(
        F.when(
            (F.size(arr) > 1) & (arr[0] > arr[1] * 1.1), arr[1]
        )
        .otherwise(arr[0])
        .cast("int")
        .alias("x_limit")
    )
    return series_df.join(F.broadcast(limits), "dataset").filter(
        F.col("time_step") <= F.col("x_limit")
    )


SMOOTH_SCHEMA = (
    "dataset string, slowstart double, x double, y double, smoothed boolean"
)


def smooth_series_distributed(series_df: DataFrame, metric: str = "cpu") -> DataFrame:
    """Distributed smoothing fallback (SURVEY §2.10): one grouped-map
    ``applyInPandas`` per (dataset, slowstart) series. Uses the same
    cubic spline as the driver path when scipy exists, else a centered
    3-point moving average — deterministic either way. Each group is
    one chart series (<= a few thousand points), so group memory is
    trivial; the win over the driver path is N series smoothed in
    parallel with no collect."""
    import pandas as pd

    value_col = f"avg_{metric}"

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("time_step")
        xs = pdf["time_step"].to_numpy(dtype=float)
        ys = pdf[value_col].to_numpy(dtype=float)
        ds = pdf["dataset"].iloc[0]
        ss = float(pdf["slowstart"].iloc[0])
        if len(xs) > 10:
            try:
                import numpy as np
                from scipy.interpolate import make_interp_spline

                x_s = np.linspace(xs.min(), xs.max(), 300)
                y_s = np.clip(make_interp_spline(xs, ys, k=3)(x_s), 0, 100)
                return pd.DataFrame(
                    {"dataset": ds, "slowstart": ss, "x": x_s, "y": y_s,
                     "smoothed": True}
                )
            except Exception:
                pass
        if len(ys) >= 3:
            import numpy as np

            kernel = np.array([0.25, 0.5, 0.25])
            mid = np.convolve(ys, kernel, mode="valid")
            ys = np.concatenate([[ys[0]], mid, [ys[-1]]])
            ys = np.clip(ys, 0, 100)
            return pd.DataFrame(
                {"dataset": ds, "slowstart": ss, "x": xs, "y": ys,
                 "smoothed": True}
            )
        return pd.DataFrame(
            {"dataset": ds, "slowstart": ss, "x": xs, "y": ys, "smoothed": False}
        )

    return series_df.groupBy("dataset", "slowstart").applyInPandas(
        smooth, schema=SMOOTH_SCHEMA
    )
