"""Rebuild the `_ENUMERATE_FIRST` 50-name driver window in
mapreduce511_spark/queries/__init__.py from the cumulative
CORRECTNESS_r*.json ledger.

Policy (r7 VERDICT items 3/5/10):
 1. every registered query with NO driver row in ANY prior round
    (new/renamed this round) — debut-round checking is mandatory;
 2. oldest-first staleness rotation over the rest (alphabetical
    within a round);
 3. exactly 50 names.

Ledger horizon (r9, VERDICT r8 item 1): the window is generated from
ledger files up to `_WINDOW_LEDGER_MAX` (stamped beside the window in
queries/__init__.py).  The driver drops CORRECTNESS_r{N}.json AFTER
the builder's session, so recomputation must ignore files newer than
the stamp or the guard flips red after every driver run.  When
regenerating for a new round, pass --restamp (or ledger_max=None) to
use everything on disk, then update BOTH the window and the stamp.

Run: python tools/gen_enum_first.py [--restamp]   (prints the window;
paste into queries/__init__.py)
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

# sentinel: "use the stamped horizon from queries/__init__.py"
_STAMPED = object()


def ledger_rounds() -> list[tuple[int, str]]:
    out = []
    for f in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r0*(\d+)", Path(f).name).group(1))
        out.append((rnd, f))
    return out


def compute_window(
    size: int = 50, ledger_max=_STAMPED
) -> list[tuple[str, str]]:
    from mapreduce511_spark.queries import _WINDOW_LEDGER_MAX, all_queries

    if ledger_max is _STAMPED:
        ledger_max = _WINDOW_LEDGER_MAX

    newest: dict[str, int] = {}
    for rnd, f in ledger_rounds():
        if ledger_max is not None and rnd > ledger_max:
            continue
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
    restamp = "--restamp" in sys.argv[1:]
    ledger_max = None if restamp else _STAMPED
    for name, tag in compute_window(ledger_max=ledger_max):
        print(f'    "{name}",  # {tag}')
    if restamp:
        horizon = max(rnd for rnd, _ in ledger_rounds())
        print(f"\n# also set: _WINDOW_LEDGER_MAX = {horizon}")


if __name__ == "__main__":
    main()
