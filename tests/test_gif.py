"""GIF/LZW codec: lossless round-trip and structure tests.

Like FLAC, GIF is table-free (the LZW dictionary is rebuilt from the
stream, the palette rides in the file), so correctness is provable
from this environment: exact round trips over every coding feature —
variable code widths, dictionary resets at 4096, the KwKwK case,
interlacing, sub-block packing, extension skipping."""

from __future__ import annotations

import random

import numpy as np
import pytest

from mapreduce511_spark.multimodal.gif import (
    _interlace_rows,
    decode_gif,
    encode_gif,
)


def _pal(n):
    return [((c * 37) % 256, (c * 59) % 256, (c * 83) % 256) for c in range(n)]


def _roundtrip(rows, palette, interlace=False):
    enc = encode_gif(rows, palette, interlace=interlace)
    w, h, rgb = decode_gif(enc)
    want = np.array([[palette[v] for v in r] for r in rows], dtype=np.uint8)
    assert (w, h) == (len(rows[0]), len(rows))
    assert rgb.shape == (h, w, 3)
    assert (rgb == want).all()
    return enc


@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_formula_image(interlace):
    rows = [[((3 * 31 + (y * 13 + x) * 7) % 16) for x in range(13)] for y in range(11)]
    _roundtrip(rows, _pal(16), interlace)


def test_roundtrip_2_color_and_256_color():
    _roundtrip([[(x ^ y) & 1 for x in range(9)] for y in range(9)], _pal(2))
    rng = random.Random(9)
    _roundtrip(
        [[rng.randrange(256) for _ in range(40)] for _ in range(35)], _pal(256)
    )


def test_kwkwk_case_constant_run():
    """A constant run makes the encoder emit a code the decoder has
    not yet added (code == next_code) — the LZW KwKwK special case."""
    _roundtrip([[0] * 50], _pal(4))
    _roundtrip([[3] * 200 + [1] * 200], _pal(4))


def test_dictionary_reset_and_multi_subblocks():
    """A large image fills the 4096-code dictionary (forcing the
    encoder's explicit CLEAR + decoder reset) and exceeds one 255-byte
    sub-block."""
    rows = [
        [((x * 7 + y * 13 + (x * y) % 31) % 64) for x in range(200)]
        for y in range(160)
    ]
    enc = _roundtrip(rows, _pal(64))
    assert len(enc) > 3 * 255  # definitely multiple sub-blocks


def test_interlace_rows_cover_exactly_once():
    for h in (1, 2, 7, 8, 9, 17, 64):
        order = _interlace_rows(h)
        assert sorted(order) == list(range(h)), h


def test_interlaced_stream_differs_but_decodes_identically():
    rows = [[((y * 5 + x) % 16) for x in range(16)] for y in range(17)]
    plain = encode_gif(rows, _pal(16), interlace=False)
    inter = encode_gif(rows, _pal(16), interlace=True)
    assert plain != inter
    assert (decode_gif(plain)[2] == decode_gif(inter)[2]).all()


def test_extension_blocks_skipped():
    rows = [[1, 2], [3, 0]]
    enc = bytearray(encode_gif(rows, _pal(4)))
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control extension
    at = 13 + 3 * 4  # after header + global table
    spliced = bytes(enc[:at]) + gce + bytes(enc[at:])
    assert (decode_gif(spliced)[2] == decode_gif(bytes(enc))[2]).all()


def test_rejections_are_loud():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")
    with pytest.raises(ValueError):
        encode_gif([[0, 1], [2]], _pal(4))  # ragged
    with pytest.raises(ValueError):
        encode_gif([[7]], _pal(4))  # index outside palette
    # truncated local color table: loud, not garbage pixels
    enc = bytearray(encode_gif([[1, 0], [0, 1]], _pal(4)))
    at = 13 + 3 * 4  # image descriptor starts here
    assert enc[at] == 0x2C
    bad = bytearray(enc)
    bad[at + 9] |= 0x87  # claim a 256-entry local table that is not there
    with pytest.raises(ValueError, match="local color table"):
        decode_gif(bytes(bad))


def test_local_color_table_round_trips():
    """r9 gate lift: a GIF whose palette rides in the image
    descriptor's LOCAL color table (no global table at all) decodes
    to the same pixels as its global-table twin, interlaced or not;
    a local table also OVERRIDES a present global table (GIF89a
    §21)."""
    rows = [[((y * 13 + x) * 7) % 16 for x in range(13)] for y in range(11)]
    pal = _pal(16)
    want = decode_gif(encode_gif(rows, pal))[2]
    for interlace in (False, True):
        enc = encode_gif(rows, pal, interlace=interlace, local_table=True)
        w, h, rgb = decode_gif(enc)
        assert (w, h) == (13, 11) and (rgb == want).all()
    # override: splice a WRONG global table in front of a local-table
    # image; the local table must win
    local = bytearray(encode_gif(rows, pal, local_table=True))
    assert local[10] & 0x80 == 0  # no global table flag
    wrong = [(255 - r, 255 - g, 255 - b) for r, g, b in pal]
    gt = b"".join(bytes(c) for c in wrong)
    spliced = bytes(local[:10]) + bytes([local[10] | 0x80 | 0x03]) + bytes(
        local[11:13]
    ) + gt + bytes(local[13:])
    w, h, rgb = decode_gif(spliced)
    assert (rgb == want).all()


def test_truncated_lzw_fails():
    enc = bytearray(encode_gif([[i % 8 for i in range(30)]] * 20, _pal(8)))
    with pytest.raises(ValueError):
        decode_gif(bytes(enc[: len(enc) // 2]))


def test_roundtrip_hypothesis():
    """Property test: any small indexed image round-trips exactly,
    interlaced or not."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 12),
        nc=st.sampled_from([2, 4, 16, 64]),
        interlace=st.booleans(),
        seed=st.integers(0, 2**31),
    )
    def check(w, h, nc, interlace, seed):
        rng = random.Random(seed)
        rows = [[rng.randrange(nc) for _ in range(w)] for _ in range(h)]
        _roundtrip(rows, _pal(nc), interlace)

    check()


def test_lzw_eoi_width_boundary():
    """Regression: when the decoder's post-final-code dictionary entry
    lands exactly on a power of two, it grows the code width BEFORE
    reading EOI — the encoder must emit EOI at that grown width.  This
    exact sequence used to desync ('GIF LZW stream truncated')."""
    from mapreduce511_spark.multimodal.gif import _lzw_decode, _lzw_encode

    seq = [2, 0, 1, 2, 1, 0, 3, 0, 1, 2, 0, 2, 0, 0, 3]
    assert _lzw_decode(_lzw_encode(seq, 2), 2, len(seq)) == seq


def test_lzw_raw_fuzz():
    """Raw LZW round-trip fuzz across min-code-sizes and lengths,
    including streams long enough to cross clear-code boundaries."""
    from mapreduce511_spark.multimodal.gif import _lzw_decode, _lzw_encode

    rng = random.Random(511)
    for trial in range(400):
        mcs = rng.choice([2, 3, 4, 8])
        n = 20000 if trial % 80 == 0 else rng.choice([5, 17, 100, 800])
        seq = [rng.randrange(1 << mcs) for _ in range(n)]
        assert _lzw_decode(_lzw_encode(seq, mcs), mcs, n) == seq


def _anim_reference(screen, palette, frames):
    """Pure-python composition oracle: paint each patch (skipping
    transparent-index pixels when a t_idx rides along), snapshot,
    then apply disposal — 2 restores the rect to background, 3 (r11)
    restores it to its pre-frame content."""
    w, h = screen
    bg = np.array(palette[0], dtype=np.uint8)
    canvas = np.broadcast_to(bg, (h, w, 3)).copy()
    out = []
    for frame in frames:
        left, top, rows, disposal, *rest = frame
        t_idx = rest[0] if rest else None
        ih, iw = len(rows), len(rows[0])
        saved = canvas[top : top + ih, left : left + iw].copy()
        for y in range(ih):
            for x in range(iw):
                if t_idx is None or rows[y][x] != t_idx:
                    canvas[top + y, left + x] = palette[rows[y][x]]
        out.append(canvas.copy())
        if disposal == 2:
            canvas[top : top + ih, left : left + iw] = bg
        elif disposal == 3:
            canvas[top : top + ih, left : left + iw] = saved
    return out


def test_animation_roundtrip_composes_and_disposes():
    """r10 gate lift: multi-frame sub-rectangle animation round-trips
    — overlapping patches compose in document order, disposal 1 leaves
    pixels for later frames, disposal 2 restores its rect to the
    background color after the snapshot."""
    from mapreduce511_spark.multimodal.gif import (
        decode_gif_frames,
        encode_gif_animation,
    )

    pal = _pal(16)
    frames = [
        (0, 0, [[1, 2, 3], [4, 5, 6], [7, 8, 9]], 1),
        (2, 1, [[10, 11], [12, 13]], 2),   # overlaps frame 0; erased after
        (1, 2, [[14, 15, 1], [2, 3, 4]], 1),
    ]
    enc = encode_gif_animation(7, 6, pal, frames)
    w, h, got = decode_gif_frames(enc)
    assert (w, h) == (7, 6) and len(got) == 3
    want = _anim_reference((7, 6), pal, frames)
    for g, x in zip(got, want):
        assert (g == x).all()
    # frame 2 must NOT contain frame 1's pixels outside its own patch
    # (disposal 2 erased them) but MUST keep frame 0's disposal-1 ones
    assert (got[2][0, 0] == np.array(pal[1])).all()
    assert (got[2][1, 2] == np.array(pal[0])).all()  # bg-restored
    # decode_gif == first composed frame (sub-rect onto background)
    _, _, first = decode_gif(enc)
    assert (first == want[0]).all()


def test_animation_encoder_rejects_bad_frames():
    """The encoder still refuses reserved disposal methods,
    off-screen frames and out-of-palette transparent indices."""
    from mapreduce511_spark.multimodal.gif import encode_gif_animation

    pal = _pal(4)
    with pytest.raises(ValueError, match="disposal"):
        encode_gif_animation(4, 4, pal, [(0, 0, [[1]], 4)])
    with pytest.raises(ValueError, match="exceeds"):
        encode_gif_animation(4, 4, pal, [(3, 3, [[1, 1], [1, 1]], 1)])
    with pytest.raises(ValueError, match="transparent index"):
        encode_gif_animation(4, 4, pal, [(0, 0, [[1]], 1, 9)])


def test_transparency_composition_shows_canvas_through():
    """r11 gate lift: pixels carrying the GCE transparent index are
    NOT painted — the prior canvas (background or an earlier frame's
    pixels) shows through, and opaque pixels of the same frame still
    paint. Cycles transparency on/off across frames."""
    from mapreduce511_spark.multimodal.gif import (
        decode_gif_frames,
        encode_gif_animation,
    )

    pal = _pal(8)
    frames = [
        (0, 0, [[1, 2, 3], [4, 5, 6], [7, 1, 2]], 1),        # opaque base
        (0, 0, [[3, 3, 3], [3, 6, 3], [3, 3, 3]], 1, 3),     # 3=transparent
        (1, 1, [[2, 2], [2, 7]], 0, 2),                      # 2=transparent
    ]
    enc = encode_gif_animation(5, 4, pal, frames)
    w, h, got = decode_gif_frames(enc)
    assert (w, h) == (5, 4) and len(got) == 3
    want = _anim_reference((5, 4), pal, frames)
    for g, x in zip(got, want):
        assert (g == x).all()
    # frame 1's transparent ring leaves frame 0's pixels in place...
    assert (got[1][0, 0] == np.array(pal[1])).all()
    # ...while its single opaque pixel (index 6 at center) paints
    assert (got[1][1, 1] == np.array(pal[6])).all()
    # frame 2's transparent 2s leave frame 1 showing; its 7 paints
    assert (got[2][2, 2] == np.array(pal[7])).all()
    assert (got[2][1, 1] == np.array(pal[6])).all()


def test_disposal_3_restores_previous_content():
    """r11 gate lift: disposal 3 snapshots the frame, then puts the
    rect back to what was there BEFORE the frame painted — an earlier
    frame's pixels, not the background."""
    from mapreduce511_spark.multimodal.gif import (
        decode_gif_frames,
        encode_gif_animation,
    )

    pal = _pal(8)
    frames = [
        (0, 0, [[1, 1, 1], [1, 1, 1], [1, 1, 1]], 1),  # paint all 1s
        (0, 0, [[2, 2], [2, 2]], 3),                   # flash 2s, restore
        (2, 2, [[3]], 1),                              # tiny corner paint
    ]
    enc = encode_gif_animation(3, 3, pal, frames)
    _, _, got = decode_gif_frames(enc)
    want = _anim_reference((3, 3), pal, frames)
    for g, x in zip(got, want):
        assert (g == x).all()
    # the flash is visible in ITS snapshot...
    assert (got[1][0, 0] == np.array(pal[2])).all()
    # ...but frame 2 sees frame 0's pixels restored, NOT background
    assert (got[2][0, 0] == np.array(pal[1])).all()
    assert (got[2][2, 2] == np.array(pal[3])).all()


def test_disposal_3_with_transparency_composes_both():
    """Disposal 3 + transparency in one frame: transparent pixels
    never paint, opaque ones flash and restore."""
    from mapreduce511_spark.multimodal.gif import (
        decode_gif_frames,
        encode_gif_animation,
    )

    pal = _pal(4)
    frames = [
        (0, 0, [[1, 2], [2, 1]], 1),
        (0, 0, [[3, 0], [0, 3]], 3, 0),  # 0=transparent, flash 3s
    ]
    enc = encode_gif_animation(2, 2, pal, frames)
    _, _, got = decode_gif_frames(enc)
    want = _anim_reference((2, 2), pal, frames)
    for g, x in zip(got, want):
        assert (g == x).all()
    assert (got[1][0, 1] == np.array(pal[2])).all()  # transparent: kept
    assert (got[1][0, 0] == np.array(pal[3])).all()  # opaque: flashed


def test_animation_single_full_frame_matches_single_image_decode():
    """A one-frame full-screen animation decodes to exactly the same
    pixels as the plain single-image encoding of the same grid."""
    from mapreduce511_spark.multimodal.gif import (
        decode_gif_frames,
        encode_gif_animation,
    )

    pal = _pal(8)
    rows = [[(x + y) % 8 for x in range(9)] for y in range(5)]
    plain = decode_gif(encode_gif(rows, pal))[2]
    _, _, frames = decode_gif_frames(
        encode_gif_animation(9, 5, pal, [(0, 0, rows, 1)])
    )
    assert len(frames) == 1 and (frames[0] == plain).all()


def test_truncation_after_extension_introducer_is_valueerror():
    """A payload ending right after 0x21 must raise ValueError like
    every other truncation, not IndexError (r10 review)."""
    from mapreduce511_spark.multimodal.gif import (
        decode_gif_frames,
        encode_gif_animation,
    )

    patch = [[(x + y) % 4 for x in range(5)] for y in range(4)]
    enc = encode_gif_animation(5, 4, _pal(4), [(0, 0, patch, 1)])
    assert enc.endswith(b"\x3b")
    bad = enc[:-1] + b"\x21"  # trailer replaced by a bare introducer
    with pytest.raises(ValueError, match="truncated"):
        decode_gif_frames(bad)


def test_reserved_disposal_methods_rejected():
    """GIF89a §23 reserves disposal 4-7: the decoder must reject them
    loudly, never compose a spec-undefined guess (r10 review)."""
    from mapreduce511_spark.multimodal.gif import (
        decode_gif_frames,
        encode_gif_animation,
    )

    patch = [[(x + y) % 8 for x in range(4)] for y in range(3)]
    enc = encode_gif_animation(
        6, 5, _pal(8), [(0, 0, patch, 1), (1, 1, patch, 1)]
    )
    i = enc.index(b"\x21\xf9\x04")
    packed = enc[i + 3]
    bad = (
        enc[: i + 3]
        + bytes([(packed & ~0x1C) | (5 << 2)])
        + enc[i + 4 :]
    )
    with pytest.raises(ValueError, match="reserved GIF disposal"):
        decode_gif_frames(bad)
