"""Storage-layout family: Hilbert curve properties and the zone-map
skipping census's layout trade.

The Hilbert xy->d recurrence is shared (by design) between the Spark
query and its oracle CTEs, so oracle parity alone can't catch a bug in
the recurrence itself. These tests pin the two properties that DEFINE
a Hilbert curve and that any implementation error breaks: d is a
bijection onto 0..n^2-1, and consecutive curve positions are
edge-adjacent cells (unit Manhattan steps — the locality Z-order
lacks).
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _hilbert_d(x: int, y: int) -> int:
    # same recurrence the query builds as Column expressions
    d = 0
    for s in (8, 4, 2, 1):
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
    return d


def test_hilbert_bijective_and_unit_steps():
    pos = {}
    for x in range(16):
        for y in range(16):
            pos[_hilbert_d(x, y)] = (x, y)
    assert sorted(pos) == list(range(256))  # bijection onto 0..255
    for d in range(255):
        (x1, y1), (x2, y2) = pos[d], pos[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1  # unit Manhattan step


def test_morton_tears_where_hilbert_does_not():
    """The claim in the docstring: Morton has >1-step jumps, Hilbert
    never. (Morton cell 15 -> 16 at 16x16 teleports (7,1) -> (0,2).)"""

    def morton_xy(z: int) -> tuple[int, int]:
        x = y = 0
        for b in range(4):
            x |= ((z >> (2 * b)) & 1) << b
            y |= ((z >> (2 * b + 1)) & 1) << b
        return x, y

    jumps = 0
    for z in range(255):
        (x1, y1), (x2, y2) = morton_xy(z), morton_xy(z + 1)
        if abs(x1 - x2) + abs(y1 - y2) > 1:
            jumps += 1
    assert jumps > 0


def test_hilbert_census_matches_pure_python(spark):
    """Spark's Column-expression recurrence == the pure-Python one on
    the real table (cell ids, not just aggregate parity)."""
    from mapreduce511_spark import queries as suite
    from mapreduce511_spark.sources.tables import load_table

    orders = load_table(spark, SF_SMOKE, "orders")
    rows = orders.select("o_custkey", "o_totalprice").collect()
    klo = min(r.o_custkey for r in rows)
    khi = max(r.o_custkey for r in rows)
    plo = min(r.o_totalprice for r in rows)
    phi = max(r.o_totalprice for r in rows)
    import math

    expected = set()
    for r in rows:
        cx = min(15, math.floor((r.o_custkey - klo) * 16.0 / (khi - klo + 1)))
        cy = min(15, math.floor((r.o_totalprice - plo) * 16.0 / (phi - plo)))
        expected.add(_hilbert_d(int(cx), int(cy)))
    got = {
        r.hcell
        for r in suite.all_queries()["hilbert_cell_census"](
            spark, SF_SMOKE
        ).collect()
    }
    assert got == expected


def test_zonemap_layout_trade(spark):
    """The storage story the census exists to show: each layout skips
    a strict majority of zones for its own dimension's predicates and
    is strictly worse on the other dimension; scanned >= matching
    rows always (zone pruning never drops a matching row)."""
    from mapreduce511_spark import queries as suite

    rows = suite.all_queries()["zonemap_skipping_census"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    by = {(r.layout, r.pred): r for r in rows}
    for r in rows:
        assert r.rows_scanned >= r.rows_match
    for pred in (p for (_, p) in by if p.startswith("ship_")):
        assert by[("shipdate", pred)].n_skipped > by[("insertion", pred)].n_skipped
    for pred in (p for (_, p) in by if p.startswith("okey_")):
        assert by[("insertion", pred)].n_skipped > by[("shipdate", pred)].n_skipped
