"""Synthetic experiment-tree fixtures (FIXTURES.md F2/F3/F5).

Deterministic generator for monitor.log / job_output.log trees in the
reference's two layouts, including every parser edge case the spec
calls out: missing header, no leading separator (seed quirk),
truncated final block, integer ``CPU: 0`` lines (regex-dropped),
SS=1.0 zero-overlap runs, runs where map never reaches 100
(None-abort), single-record files, and a non-matching folder name
(must be skipped). Used by tests and as the fallback input for the
log queries when the reference tree is absent.
"""

from __future__ import annotations

import os

NODES = ("worker1-aa", "worker2-bb", "worker3-cc")


def _monitor_text(
    n_steps: int,
    base_cpu: float,
    header: bool = True,
    leading_sep: bool = True,
    truncate_last: bool = False,
    cpu_zero_step: int | None = None,
) -> str:
    lines: list[str] = []
    if header:
        lines.append("===== Real Performance Monitor Started at somedate =====")
    for step in range(n_steps):
        if leading_sep or step > 0:
            lines.append("----")
        nodes = NODES[:2] if truncate_last and step == n_steps - 1 else NODES
        for i, node in enumerate(nodes):
            if cpu_zero_step is not None and step == cpu_zero_step and i == 0:
                # collector writes bare 0 on non-positive diff
                # (monitor_real.sh:50-53) — must be dropped by parsing
                lines.append(f"[{node}] CPU: 0% | MEM: 20%")
            else:
                cpu = min(99.0, base_cpu + step * 1.0 + i)
                lines.append(f"[{node}] CPU: {cpu:.2f}% | MEM: {20 + step % 30}%")
    lines.append("===== Job Finished =====")
    lines.append("===== Total Duration: 100s =====")
    return "\n".join(lines) + "\n"


def _job_text(
    t0: str = "2025-11-28 19:24:41",
    map_minutes: int = 2,
    slowstart: float = 0.5,
    map_reaches_100: bool = True,
    single_record: bool = False,
) -> str:
    """Progress lines with a plausible map/reduce trajectory, plus a
    minimal counter block."""
    import datetime

    base = datetime.datetime.strptime(t0, "%Y-%m-%d %H:%M:%S")
    fmt = "%Y-%m-%d %H:%M:%S"

    def line(offset: int, m: int, r: int) -> str:
        ts = (base + datetime.timedelta(seconds=offset)).strftime(fmt)
        return f"{ts},123 INFO mapreduce.Job:  map {m}% reduce {r}%"

    lines = ["===== Running MapReduce Job ====="]
    if single_record:
        lines.append(line(0, 100, 100))
    else:
        total_map = map_minutes * 60
        for i in range(0, 11):
            m = i * 10
            if not map_reaches_100 and m == 100:
                m = 99
            # reduce starts copying once map fraction passes slowstart
            r = max(0, int((i / 10 - slowstart) / max(1 - slowstart, 0.01) * 30))
            lines.append(line(int(total_map * i / 10), m, r))
        if map_reaches_100:
            lines.append(line(total_map + 10, 100, 95))
            lines.append(line(total_map + 20, 100, 100))
    lines += [
        "\tFile System Counters",
        "\t\tHDFS: Number of bytes read=1000",
        "\tMap-Reduce Framework",
        "\t\tMap input records=10",
        "\t\tMap output records=50",
        "\t\tCombine input records=50",
        "\t\tCombine output records=20",
        "\t\tReduce input records=20",
        "\t\tReduce input groups=15",
        "\t\tReduce output records=15",
        "\t\tShuffled Maps =4",
    ]
    return "\n".join(lines) + "\n"


def build_fixture_tree(base_dir: str) -> str:
    """Materialize a two-layout experiment tree under ``base_dir``;
    returns the tree root. Deterministic: same content every call."""
    root = os.path.join(base_dir, "MapReduceLog")

    def write(path: str, text: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            fh.write(text)

    # nested layout: 2 configs × 2 runs
    for ss in (0.5, 1.0):
        for run_idx, run_id in enumerate(("20250101_000000", "20250101_010000")):
            d = os.path.join(root, f"_100mb_slowstart_{ss}", run_id)
            write(
                os.path.join(d, "monitor.log"),
                _monitor_text(12 + run_idx, 30.0 + 5 * run_idx,
                              cpu_zero_step=3 if run_idx == 0 else None),
            )
            write(
                os.path.join(d, "job_output.log"),
                _job_text(map_minutes=2 + run_idx, slowstart=ss),
            )

    # flat layout: one run, no leading separator + no header (seed quirk)
    flat = os.path.join(root, "_1G_slowstart_0.5")
    write(
        os.path.join(flat, "monitor.log"),
        _monitor_text(15, 60.0, header=False, leading_sep=False, truncate_last=True),
    )
    write(os.path.join(flat, "job_output.log"), _job_text(map_minutes=4))

    # seed-quirk file: >20 sample lines before the first separator →
    # the reference seeds the step counter to 0 at the first sample,
    # shifting post-separator steps +1 (common_utils.py:32-33)
    late = os.path.join(root, "_2G_slowstart_0.5")
    late_lines = []
    for i in range(21):
        late_lines.append(f"[{NODES[i % 3]}] CPU: {30 + i:.2f}% | MEM: 25%")
    late_lines.append("----")
    for i in range(3):
        late_lines.append(f"[{NODES[i]}] CPU: 55.00% | MEM: 26%")
    write(os.path.join(late, "monitor.log"), "\n".join(late_lines) + "\n")
    write(os.path.join(late, "job_output.log"), _job_text(map_minutes=5))

    # pathological runs
    bad = os.path.join(root, "_500mb_slowstart_0.2", "20250101_000000")
    write(os.path.join(bad, "monitor.log"), _monitor_text(3, 10.0))
    write(os.path.join(bad, "job_output.log"), _job_text(map_reaches_100=False))
    single = os.path.join(root, "_500mb_slowstart_0.8", "20250101_000000")
    write(os.path.join(single, "monitor.log"), _monitor_text(2, 10.0))
    write(os.path.join(single, "job_output.log"), _job_text(single_record=True))

    # non-standard folder: must be skipped by the key filter (P5)
    write(os.path.join(root, "notes", "monitor.log"), "junk\n")

    return root
