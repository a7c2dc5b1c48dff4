"""Dump .explain('formatted') for named queries to a directory.

Usage: python tools/dump_plans.py OUTDIR SUFFIX q1 q2 ...
Writes OUTDIR/<query>_<SUFFIX>.txt
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from mapreduce511_spark import queries as suite
    from mapreduce511_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = suite.all_queries()
    Path(outdir).mkdir(parents=True, exist_ok=True)
    for name in names:
        df = registry[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        Path(outdir, f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print("wrote", name)
    spark.stop()


if __name__ == "__main__":
    main()
