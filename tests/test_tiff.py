"""Unit tests for the native baseline TIFF codec (multimodal/tiff.py):
PackBits grammar edges, the full (endianness x photometric x
compression x strip-geometry) round-trip matrix, spec-conformance
error paths, and fixture non-degeneracy (the synth corpus must
actually exercise both PackBits packet kinds, both byte orders, and
partial last strips — the r10 FLAC lesson: a fixture that only hits
one branch lets a shared-closed-form oracle pass while testing
nothing)."""

from __future__ import annotations

import itertools
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduce511_spark.multimodal.tiff import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
)


# --- PackBits grammar ---------------------------------------------------


@pytest.mark.parametrize(
    "row",
    [
        b"",
        b"a",
        b"ab",
        b"aaa",
        b"a" * 128,
        b"a" * 129,
        b"a" * 300,
        bytes(range(256)),
        (b"ab" * 200)[:300],
        b"xxyyzz",  # 2-byte runs stay literal
        b"ab" + b"c" * 3 + b"de",
    ],
)
def test_packbits_round_trip(row):
    assert packbits_decode(packbits_encode(row), len(row)) == row


def _control_bytes(enc: bytes):
    """Walk the packet stream and yield every control byte."""
    pos = 0
    while pos < len(enc):
        c = enc[pos]
        yield c
        pos += 2 if c > 128 else c + 2


def test_packbits_encoder_never_emits_noop():
    """-128 (0x80) is a reserved no-op the spec says encoders should
    not produce; a literal stretch overshooting 128 bytes via a
    2-byte step is the trap (control byte 128 == 129-byte literal
    claim that decodes as a skip)."""
    # alternating pairs never form a >=3 run, so the literal
    # accumulator crosses the 128 cap in 2-byte steps
    row = (b"aabb" * 100)[:301]
    enc = packbits_encode(row)
    assert 128 not in set(_control_bytes(enc))
    assert packbits_decode(enc, len(row)) == row


def test_packbits_decoder_honors_noop_and_padding():
    # hand-built stream: no-op, 3-repeat of 'x', literal 'yz', pad
    stream = bytes([128, 254, ord("x"), 1, ord("y"), ord("z"), 0xEE])
    assert packbits_decode(stream, 5) == b"xxxyz"


def test_packbits_underrun_and_overrun_raise():
    with pytest.raises(ValueError, match="underrun"):
        packbits_decode(b"", 1)
    with pytest.raises(ValueError, match="overrun"):
        # 3-repeat when only 2 bytes are expected
        packbits_decode(bytes([254, ord("x")]), 2)
    with pytest.raises(ValueError, match="literal overruns"):
        packbits_decode(bytes([5, ord("a")]), 6)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=600))
def test_packbits_round_trip_property(row):
    enc = packbits_encode(row)
    assert packbits_decode(enc, len(row)) == row
    assert 128 not in set(_control_bytes(enc))


def test_packbits_compresses_runs():
    assert len(packbits_encode(b"a" * 300)) == 6  # 3 repeat packets


# --- encode/decode round-trip matrix ------------------------------------


@pytest.mark.parametrize(
    "byte_order,compression,rows_per_strip,spp",
    list(itertools.product("<>", [1, 32773], [1, 3, 100], [1, 3])),
)
def test_round_trip_matrix(byte_order, compression, rows_per_strip, spp):
    # r11 ADVICE: hash() of str-bearing tuples is randomized per
    # process (PYTHONHASHSEED) — derive the seed arithmetically so a
    # failing pixel fixture reproduces across runs.
    rng = np.random.default_rng(
        (ord(byte_order) * 1_000_003 + compression * 101
         + rows_per_strip * 7 + spp) & 0xFFFF
    )
    shape = (7, 13) if spp == 1 else (7, 13, 3)
    px = rng.integers(0, 256, shape, dtype=np.uint8)
    px[:, :5] = 9  # guarantee some runs for PackBits repeat packets
    payload = encode_tiff(
        px,
        compression=compression,
        byte_order=byte_order,
        rows_per_strip=rows_per_strip,
    )
    w, h, out = decode_tiff(payload)
    assert (w, h) == (13, 7)
    assert np.array_equal(out, px)


def test_big_endian_header_and_inline_values():
    """MM files carry every multi-byte integer big-endian, including
    SHORT values left-justified in the 4-byte IFD value field."""
    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    payload = encode_tiff(px, byte_order=">")
    assert payload[:2] == b"MM"
    assert struct.unpack(">H", payload[2:4])[0] == 42
    w, h, out = decode_tiff(payload)
    assert (w, h) == (4, 3) and np.array_equal(out, px)


def test_partial_last_strip():
    """h not divisible by rows_per_strip: the final strip holds the
    remainder rows and StripByteCounts reflects the short strip."""
    px = np.arange(5 * 4, dtype=np.uint8).reshape(5, 4)
    payload = encode_tiff(px, rows_per_strip=2)  # strips of 2,2,1 rows
    w, h, out = decode_tiff(payload)
    assert np.array_equal(out, px)


def test_one_by_one_image():
    for spp_shape in [(1, 1), (1, 1, 3)]:
        px = np.full(spp_shape, 200, dtype=np.uint8)
        w, h, out = decode_tiff(encode_tiff(px, compression=32773))
        assert (w, h) == (1, 1) and np.array_equal(out, px)


# --- spec-conformance error paths ---------------------------------------


def test_bad_byte_order_mark_raises():
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX\x2a\x00" + b"\x00" * 8)


def test_bad_magic_raises():
    with pytest.raises(ValueError, match="magic"):
        decode_tiff(b"II\x2b\x00" + b"\x00" * 8)


def test_truncated_file_raises():
    payload = encode_tiff(np.zeros((3, 3), np.uint8))
    with pytest.raises(ValueError):
        decode_tiff(payload[:10])


def test_unsupported_compression_raises():
    payload = bytearray(encode_tiff(np.zeros((2, 2), np.uint8)))
    # patch the Compression entry's value to 5 (LZW) in place
    (ifd_off,) = struct.unpack_from("<I", payload, 4)
    (n,) = struct.unpack_from("<H", payload, ifd_off)
    for k in range(n):
        base = ifd_off + 2 + 12 * k
        tag = struct.unpack_from("<H", payload, base)[0]
        if tag == 259:
            struct.pack_into("<HHII", payload, base, 259, 3, 1, 5)
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(payload))


def test_unsupported_bit_depth_raises():
    payload = bytearray(encode_tiff(np.zeros((2, 2), np.uint8)))
    (ifd_off,) = struct.unpack_from("<I", payload, 4)
    (n,) = struct.unpack_from("<H", payload, ifd_off)
    for k in range(n):
        base = ifd_off + 2 + 12 * k
        if struct.unpack_from("<H", payload, base)[0] == 258:
            struct.pack_into("<HHII", payload, base, 258, 3, 1, 16)
    with pytest.raises(ValueError, match="8-bit"):
        decode_tiff(bytes(payload))


def test_encoder_rejects_bad_inputs():
    with pytest.raises(ValueError, match="byte_order"):
        encode_tiff(np.zeros((2, 2), np.uint8), byte_order="|")
    with pytest.raises(ValueError, match="compression"):
        encode_tiff(np.zeros((2, 2), np.uint8), compression=5)
    with pytest.raises(ValueError, match="expected"):
        encode_tiff(np.zeros((2, 2, 4), np.uint8))


# --- fixture non-degeneracy ----------------------------------------------


def test_fixture_sweeps_every_baseline_cell():
    """The synth corpus, regenerated here from its shared constants,
    must hit gray AND rgb, both byte orders, both compressions, and
    at least one multi-strip partial-last-strip asset — and the
    PackBits variants must contain BOTH packet kinds."""
    from mapreduce511_spark.multimodal import (
        TIFF_H_BASE,
        TIFF_H_MOD,
        TIFF_PX_A,
        TIFF_PX_RUN,
        TIFF_PX_STEP,
        TIFF_W_BASE,
        TIFF_W_MOD,
    )

    seen = set()
    saw_repeat = saw_literal = saw_partial_strip = False
    for d in range(30):
        w = TIFF_W_BASE + d % TIFF_W_MOD
        h = TIFF_H_BASE + (d * 5) % TIFF_H_MOD
        spp = 1 if d % 2 == 0 else 3
        vals = (
            d * TIFF_PX_A
            + (np.arange(w * h * spp, dtype=np.int64) // TIFF_PX_RUN)
            * TIFF_PX_STEP
        ) % 256
        px = vals.astype(np.uint8).reshape((h, w) if spp == 1 else (h, w, 3))
        comp = 1 if d % 3 == 0 else 32773
        rps = 1 + d % 4
        payload = encode_tiff(
            px,
            compression=comp,
            byte_order=">" if d % 5 == 0 else "<",
            rows_per_strip=rps,
        )
        seen.add((spp, comp, payload[:2]))
        if h % rps:
            saw_partial_strip = True
        if comp == 32773:
            for r in px.reshape(h, w * spp):
                for c in _control_bytes(packbits_encode(r.tobytes())):
                    if c > 128:
                        saw_repeat = True
                    elif c < 128:
                        saw_literal = True
        got_w, got_h, out = decode_tiff(payload)
        assert (got_w, got_h) == (w, h) and np.array_equal(out, px)
    assert {s for s, _, _ in seen} == {1, 3}
    # height must sweep multiple values WITHIN each photometric class
    # (the *3-stride-mod-6 formula collapsed to one height per parity)
    heights = {}
    for d in range(30):
        heights.setdefault(1 if d % 2 == 0 else 3, set()).add(
            TIFF_H_BASE + (d * 5) % TIFF_H_MOD
        )
    assert len(heights[1]) >= 4 and len(heights[3]) >= 4
    assert {c for _, c, _ in seen} == {1, 32773}
    assert {o for _, _, o in seen} == {b"II", b"MM"}
    assert saw_repeat and saw_literal and saw_partial_strip


def test_decode_real_dispatches_tiff():
    from mapreduce511_spark.multimodal import codecs

    px = np.arange(6, dtype=np.uint8).reshape(2, 3)
    w, h, out = codecs.decode_real(encode_tiff(px), "image/tiff")
    assert (w, h) == (3, 2) and np.array_equal(out, px)


def test_truncated_ifd_entry_table_raises_valueerror():
    """A file cut mid-IFD (entry count intact, entry table truncated)
    must raise the documented ValueError, not struct.error."""
    payload = encode_tiff(np.arange(9, dtype=np.uint8).reshape(3, 3))
    (ifd_off,) = struct.unpack_from("<I", payload, 4)
    with pytest.raises(ValueError, match="entry table"):
        decode_tiff(payload[: ifd_off + 7])


def _retag(payload: bytearray, old_tag: int, new_tag: int, value: int):
    (ifd_off,) = struct.unpack_from("<I", payload, 4)
    (n,) = struct.unpack_from("<H", payload, ifd_off)
    for k in range(n):
        base = ifd_off + 2 + 12 * k
        if struct.unpack_from("<H", payload, base)[0] == old_tag:
            struct.pack_into("<HHII", payload, base, new_tag, 3, 1, value)
            return
    raise AssertionError(f"tag {old_tag} not found")


def test_planar_configuration_two_raises():
    """PlanarConfiguration=2 stores channel planes separately; decoding
    it as chunky mis-interleaves every pixel — must raise (r11 ADVICE).
    RowsPerStrip (defaulted) donates its IFD slot for the patch."""
    payload = bytearray(encode_tiff(np.zeros((2, 2), np.uint8)))
    _retag(payload, 278, 284, 2)
    with pytest.raises(ValueError, match="PlanarConfiguration"):
        decode_tiff(bytes(payload))


def test_non_default_orientation_raises():
    payload = bytearray(encode_tiff(np.zeros((2, 2), np.uint8)))
    _retag(payload, 278, 274, 6)
    with pytest.raises(ValueError, match="Orientation"):
        decode_tiff(bytes(payload))


def test_explicit_default_planar_and_orientation_decode():
    payload = bytearray(encode_tiff(np.zeros((2, 2), np.uint8)))
    _retag(payload, 278, 284, 1)
    w, h, out = decode_tiff(bytes(payload))
    assert (w, h) == (2, 2) and np.array_equal(out, np.zeros((2, 2)))
