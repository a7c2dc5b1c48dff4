"""Baseline JPEG codec (multimodal/jpeg.py): the entropy layer must
be EXACTLY lossless (coefficient-for-coefficient), the lossy DCT
layer bounded, the honest gates loud."""

from __future__ import annotations

import numpy as np
import pytest

from mapreduce511_spark.multimodal import jpeg as J


def test_entropy_layer_exact_grayscale():
    """Huffman encode->decode must reproduce the quantized
    coefficients bit-for-bit — entropy coding is lossless even though
    the codec is not. Random pixels maximize AC activity (all the
    run/size categories, ZRL, EOB paths)."""
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (24, 40)).astype(np.uint8)
    payload = J.encode_jpeg(px)
    w, h, coeffs, qs = J.decode_jpeg_coeffs(payload)
    assert (w, h) == (40, 24)
    want = J.block_coefficients(px.astype(np.float64))
    assert np.array_equal(coeffs[0], want)
    assert np.array_equal(qs[0], J.QTABLE_LUM)


def test_entropy_layer_exact_rgb():
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    w, h, coeffs, _ = J.decode_jpeg_coeffs(J.encode_jpeg(px))
    assert len(coeffs) == 3 and (w, h) == (16, 16)


def test_smooth_image_decode_error_bounded():
    """Quantization error on smooth content stays small (Q50 DC=16:
    a linear gradient reconstructs within a few levels)."""
    x = np.linspace(0, 255, 32)
    px = np.tile(x, (32, 1)).astype(np.uint8)
    _, _, dec = J.decode_jpeg(J.encode_jpeg(px))
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 12


def test_constant_blocks_match_closed_form():
    """The oracle formula for DC-only blocks: p = clamp(2*floor((v-128)/2
    + 0.5) + 128). Every block value must decode to exactly that."""
    for v in (0, 1, 77, 127, 128, 129, 254, 255):
        px = np.full((8, 16), v, np.uint8)
        _, _, dec = J.decode_jpeg(J.encode_jpeg(px))
        q = int(np.floor((v - 128) / 2 + 0.5))
        p = min(255, max(0, 2 * q + 128))
        assert (dec == p).all(), (v, p, dec[0, 0])


def test_dc_prediction_across_blocks():
    """Varying per-block values force non-zero DC differences in both
    signs — the decoder's prediction chain must track exactly."""
    px = np.zeros((8, 32), np.uint8)
    for bx, v in enumerate((200, 10, 250, 100)):
        px[:, bx * 8:(bx + 1) * 8] = v
    _, _, dec = J.decode_jpeg(J.encode_jpeg(px))
    for bx, v in enumerate((200, 10, 250, 100)):
        q = int(np.floor((v - 128) / 2 + 0.5))
        p = min(255, max(0, 2 * q + 128))
        assert (dec[:, bx * 8:(bx + 1) * 8] == p).all()


def test_byte_stuffing_round_trip():
    """Payloads whose entropy stream contains 0xFF bytes must decode
    (stuffed 0xFF00 path). Hunt one by scanning fixtures."""
    rng = np.random.RandomState(3)
    hit = False
    for _ in range(40):
        px = rng.randint(0, 256, (8, 8)).astype(np.uint8)
        payload = J.encode_jpeg(px)
        body = payload[2:-2]
        if b"\xff\x00" in body:
            hit = True
            J.decode_jpeg(payload)  # must not raise
    assert hit, "no fixture produced a stuffed byte; widen the scan"


def test_unsupported_features_fail_loudly():
    px = np.zeros((8, 8), np.uint8)
    payload = bytearray(J.encode_jpeg(px))
    # flip SOF0 -> SOF3 (lossless — progressive SOF2 is supported now)
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC3
    with pytest.raises(ValueError, match="SOF"):
        J.decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        J.encode_jpeg(np.zeros((10, 8), np.uint8))  # non-multiple-of-8
    with pytest.raises(ValueError):
        J.decode_jpeg(b"\x00\x01not a jpeg")


def test_decode_real_dispatch():
    from mapreduce511_spark.multimodal import codecs

    px = np.full((8, 8), 42, np.uint8)
    w, h, dec = codecs.decode_real(J.encode_jpeg(px), "image/jpeg")
    assert (w, h) == (8, 8)
    with pytest.raises(NotImplementedError):
        codecs.decode_real(b"xx", "audio/mp3")


# --- 4:2:0 chroma subsampling (r6, r5 VERDICT item 6) ----------------


def test_420_entropy_layer_exact():
    """The interleaved 4-Y+Cb+Cr MCU walk must reproduce every
    component's quantized coefficients bit-for-bit — luma at the full
    block grid, chroma at the 2x2-downsampled grid. Random pixels
    maximize AC activity through the subsampled path too."""
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, (32, 16, 3)).astype(np.uint8)
    payload = J.encode_jpeg(px, subsampling="420")
    w, h, coeffs, qs = J.decode_jpeg_coeffs(payload)
    assert (w, h) == (16, 32)
    assert coeffs[0].shape[:2] == (4, 2)  # luma: full grid
    assert coeffs[1].shape[:2] == (2, 1)  # chroma: quarter grid
    # rebuild expected coefficients from the encoder's own channel
    # pipeline (BT.601 + snap/half-up + 2x2 box downsample)
    rgb = px.astype(np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = np.clip(J._round_half_up(J._snap(0.299 * r + 0.587 * g + 0.114 * b)), 0, 255)
    cb = np.clip(
        J._round_half_up(J._snap(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0)),
        0,
        255,
    )
    cr = np.clip(
        J._round_half_up(J._snap(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0)),
        0,
        255,
    )
    for ci, ch in enumerate([y, J._downsample2(cb), J._downsample2(cr)]):
        assert np.array_equal(coeffs[ci], J.block_coefficients(ch)), ci
    assert all(np.array_equal(q, J.QTABLE_LUM) for q in qs)


def test_420_constant_mcus_match_closed_form():
    """Constant gray 16x16 MCUs: Y = v and Cb = Cr = 128 exactly, so
    every decoded RGB channel must equal the grayscale DC closed form
    p = clamp(2*floor((v-128)/2 + 0.5) + 128) — the invariant the
    multimodal_jpeg420_stats oracle states. Varying MCU values force
    non-zero per-component DC prediction chains through the
    interleave."""
    px = np.zeros((32, 48, 3), dtype=np.uint8)
    vals = {}
    for by in range(2):
        for bx in range(3):
            v = (9 * 31 + bx * 7 + by * 13) % 256
            vals[(by, bx)] = v
            px[by * 16:(by + 1) * 16, bx * 16:(bx + 1) * 16, :] = v
    w, h, dec = J.decode_jpeg(J.encode_jpeg(px, subsampling="420"))
    assert (w, h) == (48, 32) and dec.shape == (32, 48, 3)
    for (by, bx), v in vals.items():
        q = int(np.floor((v - 128) / 2 + 0.5))
        p = min(255, max(0, 2 * q + 128))
        got = dec[by * 16:(by + 1) * 16, bx * 16:(bx + 1) * 16, :]
        assert (got == p).all(), (v, p, np.unique(got))


def test_420_smooth_image_decode_error_bounded():
    """Smooth chroma survives subsampling: a horizontal luma gradient
    with constant color reconstructs within a few levels per channel."""
    x = np.linspace(40, 215, 32)
    px = np.stack([np.tile(x, (32, 1))] * 3, axis=-1).astype(np.uint8)
    _, _, dec = J.decode_jpeg(J.encode_jpeg(px, subsampling="420"))
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 12


def test_420_gates_fail_loudly():
    with pytest.raises(ValueError, match="multiple of 16"):
        J.encode_jpeg(np.zeros((8, 8, 3), np.uint8), subsampling="420")
    with pytest.raises(ValueError, match="chroma"):
        J.encode_jpeg(np.zeros((16, 16), np.uint8), subsampling="420")
    with pytest.raises(ValueError, match="unsupported subsampling"):
        J.encode_jpeg(np.zeros((16, 16, 3), np.uint8), subsampling="411")
    # sampling factors > 2 in the header must be rejected
    payload = bytearray(J.encode_jpeg(np.zeros((16, 16, 3), np.uint8),
                                      subsampling="420"))
    i = payload.find(b"\xff\xc0")
    payload[i + 11] = 0x33  # comp 1 sampling 3x3
    with pytest.raises(ValueError, match="sampling factors"):
        J.decode_jpeg(bytes(payload))


# --- progressive SOF2 (r6: spectral selection + succ. approx.) -------


from mapreduce511_spark.multimodal.jpeg_progressive import (  # noqa: E402
    encode_jpeg_progressive,
)


def _coeffs_equal(a_list, b_list):
    return all(np.array_equal(a, b) for a, b in zip(a_list, b_list))


def test_progressive_entropy_layer_exact_grayscale():
    """The full scan script reconstructs every coefficient EXACTLY —
    progressive changes the entropy layer only."""
    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, (16, 24), np.int64).astype(np.uint8)
    _, _, coeffs, _ = J.decode_jpeg_coeffs(encode_jpeg_progressive(px))
    assert np.array_equal(coeffs[0], J.block_coefficients(px.astype(float)))


def test_progressive_matches_baseline_pixels():
    """Same quantization, same coefficients => byte-identical decoded
    pixels vs the baseline encoder, for gray / RGB 4:4:4 / RGB 4:2:0."""
    rng = np.random.default_rng(7)
    cases = [
        (rng.integers(0, 256, (16, 24), np.int64).astype(np.uint8), "444"),
        (rng.integers(0, 256, (32, 32, 3), np.int64).astype(np.uint8), "444"),
        (rng.integers(0, 256, (32, 48, 3), np.int64).astype(np.uint8), "420"),
    ]
    for px, sub in cases:
        _, _, base = J.decode_jpeg(J.encode_jpeg(px, subsampling=sub))
        _, _, prog = J.decode_jpeg(
            encode_jpeg_progressive(px, subsampling=sub)
        )
        assert np.array_equal(base, prog), (px.shape, sub)


def test_progressive_sparse_content_eob_runs():
    """Mostly-empty spectra drive image-wide EOB runs (EOBn symbols
    with extra bits) in both first and refinement AC scans; smooth
    gradients drive ZRL paths. All must stay coefficient-exact."""
    fixtures = [
        np.full((128, 128), 130, np.uint8),  # EOBn runs >> 1
        np.tile(np.linspace(0, 255, 64), (40, 1)).astype(np.uint8),
        np.tile(np.linspace(0, 255, 64), (40, 1)).T.copy().astype(np.uint8),
    ]
    fixtures[0][0:8, 0:8] = 135  # one nonzero block amid the run
    hot = np.full((32, 32), 128, np.uint8)
    hot[7::8, 7::8] = 255  # isolated high-frequency -> ZRL
    fixtures.append(hot)
    rng = np.random.default_rng(3)
    for s in range(6):  # low-amplitude noise: heavy refinement traffic
        fixtures.append(
            (128 + rng.normal(0, 3 + s, (48, 48))).clip(0, 255)
            .astype(np.uint8)
        )
    for px in fixtures:
        _, _, coeffs, _ = J.decode_jpeg_coeffs(encode_jpeg_progressive(px))
        assert np.array_equal(
            coeffs[0], J.block_coefficients(px.astype(float))
        )


def test_progressive_custom_script_spectral_only():
    """Spectral selection without successive approximation (all Al=0)
    is also valid progressive — and exact in one pass per band."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (24, 24), np.int64).astype(np.uint8)
    scans = [((0,), 0, 0, 0, 0), ((0,), 1, 9, 0, 0), ((0,), 10, 63, 0, 0)]
    _, _, coeffs, _ = J.decode_jpeg_coeffs(
        encode_jpeg_progressive(px, scans=scans)
    )
    assert np.array_equal(coeffs[0], J.block_coefficients(px.astype(float)))


def test_progressive_constant_mcus_match_closed_form():
    """The fixture-corpus shape: constant 4:2:0 MCUs decode to the DC
    closed form p = clamp(2*floor((v-128)/2 + 0.5) + 128) on every
    RGB channel — the invariant the SQL oracle states."""
    for v in (0, 3, 127, 128, 129, 254, 255):
        px = np.full((16, 16, 3), v, np.uint8)
        _, _, dec = J.decode_jpeg(
            encode_jpeg_progressive(px, subsampling="420")
        )
        p = min(255, max(0, 2 * int(np.floor((v - 128) / 2 + 0.5)) + 128))
        assert (dec == p).all(), (v, p, np.unique(dec))


def test_progressive_gates_fail_loudly():
    with pytest.raises(ValueError, match="single-component"):
        encode_jpeg_progressive(
            np.zeros((16, 16, 3), np.uint8),
            scans=[((0, 1), 1, 63, 0, 0)],
        )
    with pytest.raises(ValueError, match="Se = 0"):
        encode_jpeg_progressive(
            np.zeros((16, 16), np.uint8), scans=[((0,), 0, 5, 0, 0)]
        )


def test_progressive_decode_real_dispatch():
    from mapreduce511_spark.multimodal import codecs

    px = np.full((8, 8), 42, np.uint8)
    w, h, dec = codecs.decode_real(
        encode_jpeg_progressive(px), "image/jpeg"
    )
    assert (w, h) == (8, 8)
    base = codecs.decode_real(J.encode_jpeg(px), "image/jpeg")[2]
    assert np.array_equal(dec, base)


# --- restart markers (DRI/RSTn — r6: camera-JPEG error resilience) ---


def test_restart_markers_round_trip_baseline():
    """DRI + RSTn every N MCUs: byte realign, DC prediction reset,
    modulo-8 marker sequence — decoded output must be byte-identical
    to the no-restart encode, and the markers must actually be there."""
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (24, 40), np.int64).astype(np.uint8)
    ref = J.decode_jpeg(J.encode_jpeg(px))[2]
    for ri in (1, 2, 3, 7):
        enc = J.encode_jpeg(px, restart_interval=ri)
        n_rst = sum(
            1
            for i in range(len(enc) - 1)
            if enc[i] == 0xFF and 0xD0 <= enc[i + 1] <= 0xD7
        )
        n_mcu = (24 // 8) * (40 // 8)
        assert n_rst == (n_mcu - 1) // ri, (ri, n_rst)
        assert np.array_equal(J.decode_jpeg(enc)[2], ref)
    rgb = rng.integers(0, 256, (32, 48, 3), np.int64).astype(np.uint8)
    ref = J.decode_jpeg(J.encode_jpeg(rgb, subsampling="420"))[2]
    got = J.decode_jpeg(
        J.encode_jpeg(rgb, subsampling="420", restart_interval=2)
    )[2]
    assert np.array_equal(got, ref)


def test_restart_markers_round_trip_progressive():
    """Restarts inside progressive scans: EOB runs (and buffered
    refinement correction bits) must flush BEFORE each marker — the
    smooth/sparse fixtures force image-wide runs that the interval
    chops repeatedly."""
    fixtures = [
        np.tile(np.linspace(0, 255, 64), (40, 1)).astype(np.uint8),
        np.full((128, 128), 130, np.uint8),
    ]
    fixtures[1][0:8, 0:8] = 135
    rng = np.random.default_rng(9)
    fixtures.append(
        rng.integers(0, 256, (24, 40), np.int64).astype(np.uint8)
    )
    for px in fixtures:
        ref = J.decode_jpeg(J.encode_jpeg(px))[2]
        for ri in (2, 5):
            got = J.decode_jpeg(
                encode_jpeg_progressive(px, restart_interval=ri)
            )[2]
            assert np.array_equal(got, ref), (px.shape, ri)


def test_restart_marker_sequence_enforced():
    """A swapped RSTn must be rejected — the modulo-8 sequence is the
    corruption detector restart markers exist for."""
    px = np.zeros((8, 32), np.uint8)
    for bx, v in enumerate((200, 10, 250, 100)):
        px[:, bx * 8:(bx + 1) * 8] = v
    enc = bytearray(J.encode_jpeg(px, restart_interval=1))
    idx = [
        i
        for i in range(len(enc) - 1)
        if enc[i] == 0xFF and 0xD0 <= enc[i + 1] <= 0xD7
    ]
    assert len(idx) == 3
    enc[idx[0] + 1] = 0xD5  # out-of-sequence RST5 where RST0 belongs
    with pytest.raises(ValueError, match="out of sequence"):
        J.decode_jpeg(bytes(enc))


# --- 4:2:2 (r6: encoder closes the decode-only honesty gap) ----------


def test_422_entropy_layer_exact_both_modes():
    """4:2:2 (2x1 luma MCUs, horizontally-downsampled chroma) must be
    coefficient-exact through both entropy layers — before r6 the
    4:2:2 decode path existed with no encoder to exercise it."""
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, (24, 32, 3), np.int64).astype(np.uint8)
    rgb = px.astype(np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = np.clip(J._round_half_up(J._snap(0.299 * r + 0.587 * g + 0.114 * b)), 0, 255)
    cb = np.clip(
        J._round_half_up(J._snap(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0)),
        0, 255,
    )
    cr = np.clip(
        J._round_half_up(J._snap(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0)),
        0, 255,
    )
    chans = [y, J._downsample2h(cb), J._downsample2h(cr)]
    for enc in (
        J.encode_jpeg(px, subsampling="422"),
        encode_jpeg_progressive(px, subsampling="422"),
    ):
        _, _, coeffs, _ = J.decode_jpeg_coeffs(enc)
        assert coeffs[0].shape[:2] == (3, 4)  # luma full grid
        assert coeffs[1].shape[:2] == (3, 2)  # chroma half width
        for ci in range(3):
            assert np.array_equal(
                coeffs[ci], J.block_coefficients(chans[ci])
            ), ci


def test_422_constant_mcus_match_closed_form():
    """Constant gray 8x16 MCUs keep the DC closed form on every RGB
    channel through the 2x1 interleave + horizontal upsampling."""
    for v in (0, 77, 128, 129, 255):
        px = np.full((8, 16, 3), v, np.uint8)
        _, _, dec = J.decode_jpeg(J.encode_jpeg(px, subsampling="422"))
        p = min(255, max(0, 2 * int(np.floor((v - 128) / 2 + 0.5)) + 128))
        assert (dec == p).all(), (v, p, np.unique(dec))
