"""KLL-sampler merge stress: the mergeability claim, measured at 100x.

``kll_quantile_census`` (queries/sketches.py) sells its
hash-derandomized KLL sampler as MERGEABLE over an unbounded domain —
sketch state is a 49-int level histogram plus the survivor rows at
the chosen height, shards merge by summing histograms, re-picking the
height from the summed counts, and re-filtering the union of survivor
sets. This tool proves that on a 100x-scaled corpus (the KLL analog
of the histogram sketch's r5-item-9 stress):

- scale the sf0.1 events to 100x rows with DISTINCT ids
  (id*100+rep) — a genuinely larger corpus whose value multiset is
  the base's repeated 100x (heavy duplication, the skew a
  known-domain histogram needs its pre-scan for; the KLL sampler
  needs nothing);
- build 64 INDEPENDENT shard sketches (shard = hash of the id, an
  arbitrary repartitioning a cluster would produce);
- merge them (sum histograms -> re-pick H -> re-filter survivors) and
  assert the merged sketch is BIT-IDENTICAL to the single-pass sketch
  over the same 100x corpus: same height, same survivor (v, id) set;
- read p50/p90/p99 out of the merged sketch and assert each
  estimate's EXACT rank error against the full 10M rows is inside
  the k=256 sampling bound.

Run: python tools/stress_kll_merge.py
(appends/refreshes a section in SCALING.md; the generated-table part
of SCALING.md is untouched — gen_scaling.py preserves ## epilogues,
and tests/test_ledgers.py asserts the sections stay present.)
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REPLICAS = 100
SHARDS = 64
BASE_SF = "/root/testdata/sf0.1"
SECTION = "## KLL-sampler merge stress"


def _pick_height(hist: dict[int, int], k: int) -> int:
    for lvl in range(0, 49):
        if sum(c for t, c in hist.items() if t >= lvl) <= k:
            return lvl
    return 49


def main() -> None:
    from pyspark.sql import functions as F

    from mapreduce511_spark.queries.sketches import (
        _KLL_K,
        _KLL_PHIS,
        _hex_long,
    )
    from mapreduce511_spark.session import get_spark
    from mapreduce511_spark.sources.tables import load_table

    spark = get_spark("stress-kll-merge")
    spark.sparkContext.setLogLevel("ERROR")

    ev = (
        load_table(spark, BASE_SF, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", "value")
    )
    reps = F.explode(F.array(*[F.lit(i) for i in range(REPLICAS)])).alias(
        "rep"
    )
    big = (
        ev.select("event_id", "value", reps)
        .select(
            (F.col("event_id") * REPLICAS + F.col("rep")).alias("id"),
            F.round(F.col("value") * 1000).cast("long").alias("v"),
        )
        .select(
            "id",
            "v",
            _hex_long(
                F.md5(F.col("id").cast("string")), 1, 12
            ).alias("h"),
        )
        .select(
            "id",
            "v",
            F.expr("least(bit_count((h & -h) - 1), 48)")
            .cast("int")
            .alias("tz"),
            F.pmod(F.xxhash64(F.col("id")), F.lit(SHARDS)).alias("shard"),
        )
        .localCheckpoint(eager=True)
    )
    n_big = big.count()

    # --- 64 shard sketches: per-shard level histograms in ONE pass,
    # heights on the driver (64 x 49 ints), survivors via one filter
    # joined to the tiny shard->height table.
    t0 = time.time()
    shard_hist_rows = (
        big.groupBy("shard", "tz").agg(F.count("*").alias("c")).collect()
    )
    shard_hists: dict[int, dict[int, int]] = {}
    for r in shard_hist_rows:
        shard_hists.setdefault(r.shard, {})[r.tz] = r.c
    shard_h = {s: _pick_height(h, _KLL_K) for s, h in shard_hists.items()}
    h_tbl = spark.createDataFrame(
        [(s, h) for s, h in shard_h.items()], ["shard", "hlev"]
    )
    shard_survivors = (
        big.join(F.broadcast(h_tbl), "shard")
        .filter(F.col("tz") >= F.col("hlev"))
        .select("v", "id", "tz")
        .collect()
    )
    # merge: sum histograms, re-pick H, re-filter the survivor union
    m_hist: dict[int, int] = {}
    for h in shard_hists.values():
        for t, c in h.items():
            m_hist[t] = m_hist.get(t, 0) + c
    m_h = _pick_height(m_hist, _KLL_K)
    merged_kept = {(r.v, r.id) for r in shard_survivors if r.tz >= m_h}
    t_merge = time.time() - t0

    # --- single-pass sketch over the same 100x corpus
    t0 = time.time()
    g_hist = {
        r.tz: r.c
        for r in big.groupBy("tz").agg(F.count("*").alias("c")).collect()
    }
    g_h = _pick_height(g_hist, _KLL_K)
    g_kept = {
        (r.v, r.id)
        for r in big.filter(F.col("tz") >= g_h).select("v", "id").collect()
    }
    t_single = time.time() - t0

    assert m_hist == g_hist, "summed shard histograms != single-pass"
    assert m_h == g_h, f"merged height {m_h} != single-pass {g_h}"
    assert all(m_h >= h for h in shard_h.values()), "H must not decrease"
    assert merged_kept == g_kept, "merged survivor set != single-pass"
    assert 0 < len(g_kept) <= _KLL_K

    # --- quantile readout from the merged sketch, exact rank check
    ordered = sorted(merged_kept)
    m = len(ordered)
    errs = {}
    bound_bp = int(
        10000 * math.sqrt(math.log(2 / 0.01) / (2 * _KLL_K))
    )  # Hoeffding/DKW-style k=256 bound at 99% confidence (~10%)
    for phi in _KLL_PHIS:
        est = ordered[(phi * m + 9999) // 10000 - 1][0]
        est_rank = big.filter(F.col("v") <= est).count()
        target = (phi * n_big + 9999) // 10000
        err_bp = abs(est_rank - target) * 10000 // n_big
        errs[phi] = err_bp
        assert err_bp <= bound_bp, (phi, err_bp, bound_bp)

    print(
        f"OK: {len(shard_hists)} shard sketches over {n_big:,} rows merge "
        f"to the single-pass sketch (H={g_h}, {m} survivors); rank errors "
        f"{errs} bp (bound {bound_bp})"
    )

    lines = [
        SECTION
        + f" — {REPLICAS}x-scaled sf0.1 events, {len(shard_hists)} shard sketches",
        "",
        "Generated by `python tools/stress_kll_merge.py`. The",
        "hash-derandomized KLL sampler behind `kll_quantile_census`",
        f"is merge-exact: {SHARDS} shard sketches built on an arbitrary",
        f"hash partitioning of a {REPLICAS}x-scaled corpus",
        f"({n_big:,} rows, every base value duplicated {REPLICAS}x —",
        "the skewed/duplicated domain a known-range histogram needs a",
        "pre-scan for) merge by histogram summation + height re-pick +",
        "survivor re-filter into the BIT-IDENTICAL single-pass sketch",
        "(same height, same survivor set — asserted), and the merged",
        "sketch's p50/p90/p99 estimates sit inside the k=256 sampling",
        "bound against the exact ranks of all rows. At 100 TB the",
        "sketch is what crosses the wire: 49 longs + <=256 survivor",
        "rows per shard, one tiny shuffle to merge.",
        "",
        "| step | seconds | result |",
        "|---|---|---|",
        f"| shard sketches + merge | {t_merge:.2f} | "
        f"{len(shard_hists)} shards == single-pass, H={g_h}, "
        f"{m} survivors |",
        f"| single-pass sketch over {REPLICAS}x corpus | {t_single:.2f} | "
        f"bit-identical |",
        "| rank error of merged readout | — | "
        + ", ".join(f"p{p // 100}={e} bp" for p, e in errs.items())
        + f" (bound {bound_bp} bp) |",
        "",
    ]

    out_path = Path(REPO, "SCALING.md")
    text = out_path.read_text()
    if SECTION in text:
        head, _, rest = text.partition(SECTION)
        nxt = rest.find("\n## ")
        tail = rest[nxt + 1 :] if nxt != -1 else ""
        text = head + tail
    if not text.endswith("\n"):
        text += "\n"
    out_path.write_text(text + "\n".join(lines))
    print("appended section to SCALING.md")
    spark.stop()


if __name__ == "__main__":
    main()
