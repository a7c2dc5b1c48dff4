"""Ad-hoc per-query timing harness for optimization work.

Usage:
    python tools/qtime.py q1 q2 ...        # min-of-3 each, one session
    python tools/qtime.py --runs 5 q1      # min-of-5
    python tools/qtime.py --explain q1     # also dump .explain("formatted")
    python tools/qtime.py --conf k=v ... q1

Times fn(spark, sf_dir).count() exactly like bench.py (same timed
action, same session factory) so numbers are comparable; prints one
line per query plus a total. Not part of the driver contract.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--conf", action="append", default=[])
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from mapreduce511_spark import queries as suite
    from mapreduce511_spark.session import get_spark

    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark("qtime", extra_conf=extra or None)
    spark.sparkContext.setLogLevel("ERROR")
    registry = suite.all_queries()

    # same warmup as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from mapreduce511_spark.sources.tables import load_table

    load_table(spark, sf_dir, "documents").count()

    total = 0.0
    for name in args.names:
        fn = registry[name]
        if args.explain:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
            if args.explain_dir:
                Path(args.explain_dir).mkdir(parents=True, exist_ok=True)
                Path(args.explain_dir, f"{name}.txt").write_text(text)
            else:
                print(text)
        runs = []
        for _ in range(args.runs):
            start = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - start)
        best = min(runs)
        total += best
        print(
            f"{name:45s} min {best:7.3f}s  runs "
            + " ".join(f"{r:.3f}" for r in runs)
        )
    print(f"{'TOTAL (min-of-N sums)':45s} {total:10.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
