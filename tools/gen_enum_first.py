"""Rebuild the `_ENUMERATE_FIRST` 50-name driver window in
mapreduce511_spark/queries/__init__.py from the cumulative
CORRECTNESS_r*.json ledger.

Policy (r7 VERDICT items 3/5/10):
 1. every registered query with NO driver row in ANY prior round
    (new/renamed this round) — debut-round checking is mandatory;
 2. oldest-first staleness rotation over the rest (alphabetical
    within a round);
 3. exactly 50 names.

Run: python tools/gen_enum_first.py   (prints the window; paste into
queries/__init__.py)
"""

from __future__ import annotations

import glob
import json
import re
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def compute_window(size: int = 50) -> list[tuple[str, str]]:
    from mapreduce511_spark.queries import all_queries

    newest: dict[str, int] = {}
    for f in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r0*(\d+)", Path(f).name).group(1))
        for k in json.load(open(f)):
            newest[k] = max(newest.get(k, 0), rnd)
    registered = list(all_queries())
    never = [n for n in registered if n not in newest]
    rest = sorted(
        (n for n in registered if n in newest), key=lambda n: (newest[n], n)
    )
    window = (never + rest)[:size]
    return [(n, f"r{newest[n]:02d}" if n in newest else "new") for n in window]


def main() -> None:
    for name, tag in compute_window():
        print(f'    "{name}",  # {tag}')


if __name__ == "__main__":
    main()
