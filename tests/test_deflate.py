"""Native DEFLATE encoder (multimodal/deflate.py) vs stdlib zlib's
INDEPENDENT inflater — the cross-implementation check that makes the
encode side verifiable (a self-consistent wrong bitstream cannot
pass, unlike a same-module round trip).
"""

from __future__ import annotations

import random
import zlib

import pytest

from mapreduce511_spark.multimodal.deflate import (
    _code_lengths,
    _lz77,
    _rle_code_lengths,
    adler32,
    deflate_dynamic,
    deflate_fixed,
    deflate_stored,
    zlib_compress_native,
)


def _inflate_raw(b: bytes) -> bytes:
    d = zlib.decompressobj(-15)
    return d.decompress(b) + d.flush()


_EDGES = [
    b"",
    b"a",
    b"ab",
    b"abc",
    b"a" * 300,  # overlapping distance-1 match, length > 258
    b"abcabcabc" * 100,  # periodic matches
    bytes(range(256)),  # every literal
    bytes(range(256)) * 300,  # > 64 KiB (stored multi-block)
]


@pytest.mark.parametrize("mode", ["fixed", "dynamic", "stored"])
def test_edge_cases_round_trip(mode):
    fn = {
        "fixed": deflate_fixed,
        "dynamic": deflate_dynamic,
        "stored": deflate_stored,
    }[mode]
    for data in _EDGES:
        assert _inflate_raw(fn(data)) == data


@pytest.mark.parametrize("mode", ["fixed", "dynamic", "stored"])
def test_fuzz_round_trip(mode):
    fn = {
        "fixed": deflate_fixed,
        "dynamic": deflate_dynamic,
        "stored": deflate_stored,
    }[mode]
    rng = random.Random(20260815)
    for _ in range(120):
        n = rng.randrange(0, 3000)
        kind = rng.random()
        if kind < 0.25:
            data = rng.randbytes(n)
        elif kind < 0.5:
            data = bytes(rng.choice(b"ab") for _ in range(n))
        elif kind < 0.75:
            unit = rng.randbytes(rng.randrange(1, 20))
            data = (unit * (n // len(unit) + 1))[:n]
        else:  # skewed alphabet -> deep Huffman trees
            pop = b"e" * 500 + b"t" * 200 + b"a" * 80 + b"o" * 30 + b"nshrdlu"
            data = bytes(rng.choice(pop) for _ in range(n))
        assert _inflate_raw(fn(data)) == data


def test_zlib_wrapper_and_native_adler32():
    rng = random.Random(7)
    for n in (0, 1, 100, 5551, 5552, 5553, 20000):
        data = rng.randbytes(n)
        assert adler32(data) == zlib.adler32(data)
        for mode in ("fixed", "dynamic", "stored"):
            assert zlib.decompress(zlib_compress_native(data, mode)) == data


def test_length_limiting_is_kraft_complete():
    """Fibonacci-ish frequencies force raw Huffman depths past the cap;
    the limited code must be exactly complete (Kraft sum == 1) at every
    cap DEFLATE uses (7 for the code-length alphabet, 15 for the main
    ones) — an oversubscribed or incomplete set is rejected by inflate
    ('invalid code lengths set', the bug this test pins)."""
    fib = [1, 1]
    while len(fib) < 40:
        fib.append(fib[-1] + fib[-2])
    freqs = dict(enumerate(fib))
    for cap in (7, 15):
        lens = _code_lengths(freqs, cap)
        assert set(lens) == set(freqs)
        assert max(lens.values()) <= cap
        assert sum(2.0 ** -v for v in lens.values()) == 1.0
    # end to end: data realizing those skewed freqs
    data = b"".join(bytes([i]) * min(f, 4000) for i, f in enumerate(fib))
    assert _inflate_raw(deflate_dynamic(data)) == data


def test_rle_code_lengths_reconstructs():
    """The 16/17/18 RLE must expand back to the input length vector."""
    rng = random.Random(3)
    for _ in range(200):
        lens = []
        while len(lens) < rng.randrange(1, 300):
            v = rng.choice([0, 0, 0, rng.randrange(1, 16)])
            lens.extend([v] * rng.randrange(1, 150))
        out = []
        prev = None
        for sym, _, val in _rle_code_lengths(lens):
            if sym == 18:
                out.extend([0] * (val + 11))
            elif sym == 17:
                out.extend([0] * (val + 3))
            elif sym == 16:
                out.extend([prev] * (val + 3))
            else:
                out.append(sym)
                prev = sym
        assert out == lens


def test_lz77_tokens_reconstruct_with_overlap():
    rng = random.Random(11)
    for _ in range(100):
        unit = rng.randbytes(rng.randrange(1, 6))
        data = (unit * 200)[: rng.randrange(0, 800)] + rng.randbytes(50)
        out = bytearray()
        for t in _lz77(data):
            if t[0] == "lit":
                out.append(t[1])
            else:
                _, ln, dist = t
                for _k in range(ln):
                    out.append(out[-dist])
        assert bytes(out) == data


def test_block_type_headers():
    """First three bits: BFINAL=1 then BTYPE (01 fixed, 10 dynamic,
    00 stored) — LSB-first packing."""
    assert deflate_fixed(b"x")[0] & 0b111 == 0b011  # final=1, type=01
    assert deflate_dynamic(b"x")[0] & 0b111 == 0b101  # final=1, type=10
    assert deflate_stored(b"x")[0] & 0b111 == 0b001  # final=1, type=00


def test_dynamic_beats_fixed_on_skewed_text():
    data = b"the quick brown fox jumps over the lazy dog " * 300
    dyn = len(deflate_dynamic(data))
    fix = len(deflate_fixed(data))
    assert dyn < fix < len(data) // 10


def test_compression_ratio_separates_repetitive_text(spark):
    """The quality signal must actually discriminate: a templated
    (100x-repeated) document compresses far below a diverse one, and
    the column is deterministic across partitionings."""
    from mapreduce511_spark.operators.dedup import compression_ratio

    rows = [
        (0, "spam spam spam " * 100),
        (1, " ".join(f"w{i}x{i * 7 % 97}" for i in range(300))),
        (2, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in compression_ratio(docs).collect()}
    assert out[0].ratio_milli < 100  # templated: >10x compressible
    assert out[1].ratio_milli > 300  # diverse: compresses poorly
    assert out[2].ratio_milli == 1000 and out[2].raw_bytes == 0
    out2 = {
        r.doc_id: r
        for r in compression_ratio(docs.repartition(7)).collect()
    }
    assert {k: (v.comp_bytes, v.ratio_milli) for k, v in out.items()} == {
        k: (v.comp_bytes, v.ratio_milli) for k, v in out2.items()
    }


def test_compression_quality_census_pins_exact_values(spark):
    """r9: the registered census is rows-only for the driver (DuckDB
    cannot restate a DEFLATE bitstream length), so pin it here — a
    driver-side pure-Python recompute with the SAME encoder must
    reproduce every per-language aggregate exactly."""
    from mapreduce511_spark import queries as suite
    from mapreduce511_spark.multimodal.deflate import deflate_dynamic
    from mapreduce511_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    got = {
        r.lang: r.asDict()
        for r in suite.all_queries()["compression_quality_census"](
            spark, SF_SMOKE
        ).collect()
    }
    agg: dict[str, dict] = {}
    for r in (
        load_table(spark, SF_SMOKE, "documents")
        .select("lang", "text")
        .collect()
    ):
        raw = str(r.text).encode("utf-8")
        comp = len(deflate_dynamic(raw))
        ratio = 1000 if not raw else 1000 * comp // len(raw)
        a = agg.setdefault(
            r.lang,
            {"n": 0, "raw": 0, "comp": 0, "low": 0, "ratios": []},
        )
        a["n"] += 1
        a["raw"] += len(raw)
        a["comp"] += comp
        a["low"] += ratio < 500
        a["ratios"].append(ratio)
    assert set(got) == set(agg)
    for lang, a in agg.items():
        g = got[lang]
        assert g["n_docs"] == a["n"]
        assert g["total_raw_bytes"] == a["raw"]
        assert g["total_comp_bytes"] == a["comp"]
        assert g["n_low_entropy"] == a["low"]
        assert g["min_ratio_milli"] == min(a["ratios"])
        assert g["max_ratio_milli"] == max(a["ratios"])
        assert g["corpus_ratio_milli"] == 1000 * a["comp"] // a["raw"]
