"""Property-based tests (hypothesis) for the pure-Python kernels:
codec round-trips and spline invariants hold for ARBITRARY inputs,
not just the fixtures the example-based suites use."""

from __future__ import annotations

import numpy as np
import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from mapreduce511_spark.functions.spline import notaknot_moments, spline_eval
from mapreduce511_spark.multimodal import codecs


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=21),
    h=st.integers(min_value=1, max_value=17),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_round_trip_any_shape(w, h, seed):
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    w2, h2, out = codecs.decode_bmp(codecs.encode_bmp(px))
    assert (w2, h2) == (w, h)
    assert np.array_equal(out, px)


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=5000),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_round_trip_any_samples(n, rate, seed):
    rng = np.random.RandomState(seed)
    s = rng.randint(-32768, 32768, size=n).astype(np.int16)
    rate2, ch, out = codecs.decode_wav(codecs.encode_wav(s, sample_rate=rate))
    assert (rate2, ch) == (rate, 1)
    assert np.array_equal(out, s)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(min_value=4, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_spline_interpolates_and_stays_c2(n, seed):
    rng = np.random.RandomState(seed)
    x = np.cumsum(rng.uniform(0.1, 3.0, n))
    y = rng.uniform(-100.0, 100.0, n)
    M = notaknot_moments(x, y)
    # knot interpolation (relative tolerance scaled to data magnitude)
    vals = spline_eval(x, y, x, M)
    np.testing.assert_allclose(vals, y, rtol=1e-7, atol=1e-7 * np.abs(y).max())
    # third-derivative continuity at the not-a-knot joints
    h = np.diff(x)
    d3 = np.diff(M) / h
    scale = max(1.0, np.abs(d3).max())
    assert abs(d3[0] - d3[1]) < 1e-6 * scale
    assert abs(d3[-1] - d3[-2]) < 1e-6 * scale


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    c3=st.floats(min_value=-5, max_value=5, allow_nan=False),
    c2=st.floats(min_value=-5, max_value=5, allow_nan=False),
)
def test_spline_reproduces_random_cubics(seed, c3, c2):
    """Cubic-polynomial reproduction for random cubics — the property
    that uniquely pins not-a-knot (scipy-default) behavior."""
    rng = np.random.RandomState(seed)
    x = np.cumsum(rng.uniform(0.2, 1.5, 12))

    def p(t):
        return c3 * t**3 + c2 * t**2 - 3.0 * t + 1.0

    t = np.linspace(x.min(), x.max(), 100)
    expect = p(t)
    got = spline_eval(x, p(x), t)
    tol = 1e-8 * max(1.0, np.abs(expect).max())
    np.testing.assert_allclose(got, expect, atol=tol)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(edges):
    """connected_components agrees with a driver-side union-find on
    arbitrary small graphs (self-loops and duplicate edges included)."""
    from mapreduce511_spark.operators.graph import connected_components
    from mapreduce511_spark.session import get_spark

    spark = get_spark()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    expected = {}
    nodes = {n for e in edges for n in e}
    roots: dict[int, int] = {}
    for n in sorted(nodes):
        r = find(n)
        roots.setdefault(r, n)  # min member per root, by sorted order
        expected[n] = roots[r]

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, max_iter=40).collect()
    }
    assert got == expected


@settings(max_examples=120, deadline=None)
@given(
    data=st.one_of(
        st.binary(max_size=2000),
        # low-entropy alphabets force long matches and deep trees
        st.builds(
            bytes,
            st.lists(st.sampled_from(list(b"abc\x00")), max_size=3000),
        ),
        # periodic data forces overlapping matches (dist < len)
        st.builds(
            lambda unit, reps, cut: (bytes(unit) * reps)[:cut],
            st.lists(st.integers(0, 255), min_size=1, max_size=8),
            st.integers(1, 400),
            st.integers(0, 2500),
        ),
    ),
    mode=st.sampled_from(["fixed", "dynamic", "stored"]),
)
def test_deflate_round_trips_against_independent_inflater(data, mode):
    """Any byte string, any block type: the native DEFLATE encoder's
    output must inflate back exactly under stdlib zlib (an independent
    implementation — a self-consistent encoder bug cannot pass)."""
    import zlib

    from mapreduce511_spark.multimodal.deflate import (
        deflate_dynamic,
        deflate_fixed,
        deflate_stored,
    )

    fn = {
        "fixed": deflate_fixed,
        "dynamic": deflate_dynamic,
        "stored": deflate_stored,
    }[mode]
    d = zlib.decompressobj(-15)
    assert d.decompress(fn(data)) + d.flush() == data


# --- FFD packing: cross-engine fold agreement + invariants (r10) ----


def _ffd_python(sizes: list[int], cap: int = 256) -> list[int]:
    """The engine's greedy fold (mirrors queries/text.py pack())."""
    fills: list[int] = []
    for n in sizes:
        for i, f in enumerate(fills):
            if f + n <= cap:
                fills[i] = f + n
                break
        else:
            fills.append(n)
    return fills


def _ffd_duckdb(sizes: list[int], cap: int = 256) -> int:
    """The oracle's recursive-CTE restatement, on one group."""
    import duckdb

    rows = ", ".join(f"({i}, {n})" for i, n in enumerate(sizes))
    q = f"""
    WITH RECURSIVE ordered AS (
        SELECT n, row_number() OVER (ORDER BY rk) AS rk,
               count(*) OVER () AS cnt
        FROM (SELECT * FROM (VALUES {rows}) t(rk, n))
    ), ffd AS (
        SELECT 0 AS step, CAST([] AS BIGINT[]) AS fills,
               (SELECT cnt FROM ordered LIMIT 1) AS cnt
        UNION ALL
        SELECT f.step + 1,
               CASE WHEN idx.i IS NULL THEN list_append(f.fills, o.n)
                    ELSE list_transform(range(len(f.fills)),
                           j -> CASE WHEN j = idx.i - 1
                                     THEN f.fills[j+1] + o.n
                                     ELSE f.fills[j+1] END)
               END,
               f.cnt
        FROM ffd f
        JOIN ordered o ON o.rk = f.step + 1
        LEFT JOIN LATERAL (
            SELECT min(j) AS i
            FROM (SELECT unnest(range(1, len(f.fills) + 1)) AS j)
            WHERE f.fills[j] + o.n <= {cap}
        ) idx ON TRUE
        WHERE f.step < f.cnt
    )
    SELECT len(fills) FROM ffd WHERE step = cnt
    """
    return duckdb.sql(q).fetchone()[0]


@given(
    st.lists(st.integers(min_value=1, max_value=300), min_size=1, max_size=40)
)
@settings(max_examples=40, deadline=None)
def test_ffd_fold_matches_recursive_cte_oracle(sizes):
    """The Python greedy fold and the DuckDB recursive-CTE
    restatement place every item identically on ARBITRARY size lists
    (not just the two fixture scale factors) — including oversize
    items that never fit an existing bin. Input is pre-sorted the way
    both engines sort (size DESC, stable) so the property isolates
    the FOLD, not the ordering."""
    ordered = sorted(sizes, reverse=True)
    fills = _ffd_python(ordered)
    assert _ffd_duckdb(ordered) == len(fills)
    # invariants: every non-singleton-oversize bin within capacity;
    # the volume lower bound holds whenever no item is oversize (an
    # oversize item occupies ONE bin while contributing > cap volume,
    # so the ceil bound doesn't apply to it)
    for f in fills:
        assert f <= 256 or f in ordered
    if ordered[0] <= 256:
        assert len(fills) >= -(-sum(ordered) // 256)
