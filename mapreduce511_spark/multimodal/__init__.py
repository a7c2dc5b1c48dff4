"""Multimodal column convention + Arrow-batched processing plumbing.

Media assets ride through the engine as opaque ``binary`` columns with
a typed metadata struct (north-star extension; nothing in the
reference — ``/root/reference`` is text-only — but required for a
100 TB training-data pipeline).

Convention
----------
``content: binary`` + ``media: struct<kind, fmt, width, height,
n_frames>``. Decode / feature-extraction runs in ``mapInPandas``
(Arrow batches, never per-row Python). The decode step is REAL for
uncompressed BMP and 16-bit PCM WAV (``multimodal/codecs.py`` —
dependency-free struct parsing, oracle-verified round-trips via
``extract_decoded_features``) and for non-interlaced 8-bit RGB PNG
(stdlib zlib inflate + all five row unfilters); the remaining
compressed formats (JPEG/MP3/H.264/…) stay behind an honest
``NotImplementedError`` gate until codec libraries exist here, with
the deterministic fake byte-histogram decoder exercising the same
schema / partitioning / batch shape.

Scale notes: binary payloads dominate row size — keep
``spark.sql.files.maxPartitionBytes`` small enough that a batch of
payloads fits executor memory, project metadata-only early when a
query doesn't touch bytes (column pruning drops ``content`` at the
Parquet scan), and never shuffle the binary column for joins that only
need the key (semi-join first, fetch bytes after).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_HIST_BINS = 16

MEDIA_META = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("histogram", T.ArrayType(T.LongType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

_FRAME_BYTES = 64  # fake codec: fixed-size 'frames' inside the payload


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Deterministically synthesize the multimodal columns from the
    ``documents`` table: payload = UTF-8 bytes of the text (stand-in
    for an encoded image), metadata derived from doc fields. Pure
    Column expressions — the payload never leaves the JVM here."""
    return docs.select(
        "doc_id",
        "source",
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("fake/raw").alias("fmt"),
            (F.lit(16) + (F.col("doc_id") % 64)).cast("int").alias("width"),
            (F.lit(16) + ((F.col("doc_id") * 7) % 64)).cast("int").alias("height"),
            F.greatest(
                (F.length(F.encode("text", "UTF-8")) / _FRAME_BYTES).cast("int"),
                F.lit(1),
            ).alias("n_frames"),
        ).alias("media"),
    )


def decode_real(payload: bytes, fmt: str) -> object:
    """The real codec hook: uncompressed BMP, PCM WAV, and RGB8 PNG
    decode natively (``multimodal.codecs``, dependency-free struct
    parsing + stdlib zlib); the remaining compressed formats raise
    until codec libraries exist."""
    from mapreduce511_spark.multimodal import codecs

    return codecs.decode_real(payload, fmt)


# -- deterministic synthetic media with REAL encodings -----------------
#
# Payload contents are closed-form functions of doc_id, so an external
# oracle can compute the decoded statistics analytically while the
# Spark path actually round-trips real BMP/WAV bytes — any parsing bug
# (row padding, bottom-up order, chunk walk) breaks the match.

SYNTH_DOC_LIMIT = 400  # docs 0..399: even -> BMP image, odd -> WAV audio

# JPEG fixture geometry/pixel formula — single definition shared by
# synth_jpeg_media AND the multimodal_jpeg_stats oracle f-string (r5
# ADVICE: a hardcoded copy in the oracle desynchronizes silently and
# surfaces only as an opaque hash mismatch):
#   wb = 1 + d % JPEG_GRID_WB_MOD,  hb = 1 + (d*5) % JPEG_GRID_HB_MOD
#   block value v = (d*JPEG_PX_A + bx*JPEG_PX_BX + by*JPEG_PX_BY) % 256
JPEG_GRID_WB_MOD = 4
JPEG_GRID_HB_MOD = 3
JPEG_PX_A = 31
JPEG_PX_BX = 7
JPEG_PX_BY = 13

# FLAC fixture geometry/sample formula — single definition shared by
# synth_flac_media AND the multimodal_flac_stats oracle f-string:
#   n = FLAC_N_BASE + (d % FLAC_N_MOD) * FLAC_N_STEP
#   s(i) = ((d*FLAC_PX_A + i*FLAC_PX_B) % 4096) - 2048
FLAC_N_BASE = 700
FLAC_N_MOD = 7
FLAC_N_STEP = 211
FLAC_PX_A = 31
FLAC_PX_B = 7
FLAC_BLOCK = 256  # 3-8 frames per asset, partial last frame common
# stereo right-channel formula: r(i) = ((d*FLAC_PX_A2 + i*FLAC_PX_B2)
# % 4096) - 2048 (left reuses the mono formula)
FLAC_PX_A2 = 17
FLAC_PX_B2 = 11
# bit-depth fixture (r10, gate lift): depth cycles with doc_id % 5;
# samples wrap the FULL range of each depth —
#   bits = FLAC_DEPTHS[d % 5]
#   step = (1 << bits) // FLAC_DEPTH_STEP_DIV
#   s(i) = ((d*FLAC_PX_A + i*step) % (1 << bits)) - (1 << (bits-1))
# The divisor must stay BELOW 2^min(FLAC_DEPTHS) or the smallest
# depth's step floors to 0 and its signal degenerates to a constant
# (the original 353 did exactly that at 8-bit: 256 // 353 == 0 — the
# oracle shared the closed form, so parity passed while the 8-bit
# decode path saw only CONSTANT subframes).
FLAC_DEPTHS = (8, 12, 16, 20, 24)
FLAC_DEPTH_STEP_DIV = 199
assert (1 << min(FLAC_DEPTHS)) // FLAC_DEPTH_STEP_DIV >= 1

# TIFF fixture geometry/pixel formula — single definition shared by
# synth_tiff_media AND the multimodal_tiff_stats oracle f-string:
#   w = TIFF_W_BASE + d % TIFF_W_MOD,  h = TIFF_H_BASE + (d*5) % TIFF_H_MOD
#   spp = 1 (gray) when d even else 3 (RGB)
#   v(i) = (d*TIFF_PX_A + (i // TIFF_PX_RUN)*TIFF_PX_STEP) % 256
# The height multiplier (5) is coprime to TIFF_H_MOD (7) so height
# sweeps all seven values INDEPENDENTLY of the even/odd gray-vs-RGB
# axis (a *3 stride against mod 6 collapsed to two heights perfectly
# correlated with parity — a height-dependent strip bug confounded
# with photometric would have gone unseen; the PNG fixture's (d*5)%7
# precedent).  The i//TIFF_PX_RUN quotient makes the pixel stream
# piecewise-constant in runs of TIFF_PX_RUN bytes, so the
# PackBits-compressed variants exercise BOTH repeat packets (inside
# runs) and literal packets (run fragments at row/strip boundaries,
# where compression restarts per spec §9).
TIFF_W_BASE = 5
TIFF_W_MOD = 9
TIFF_H_BASE = 4
TIFF_H_MOD = 7
TIFF_PX_A = 13
TIFF_PX_RUN = 7
TIFF_PX_STEP = 29


def _synth_payload(doc_id: int) -> tuple[bytes, str, int, int]:
    """(payload, fmt, width, height) for one doc. Image channel bytes
    are v(i) = (doc_id*31 + i*7) % 256 over w*h*3 positions; audio
    samples are s(i) = ((doc_id*13 + i*5) % 4096) - 2048 over
    256 + doc_id%64 positions."""
    import numpy as np

    from mapreduce511_spark.multimodal import codecs

    if doc_id % 2 == 0:
        w = 8 + doc_id % 9
        h = 8 + (doc_id * 3) % 9
        vals = (doc_id * 31 + np.arange(w * h * 3, dtype=np.int64) * 7) % 256
        payload = codecs.encode_bmp(vals.astype(np.uint8).reshape(h, w, 3))
        return payload, codecs.BMP_FMT, w, h
    n = 256 + doc_id % 64
    s = ((doc_id * 13 + np.arange(n, dtype=np.int64) * 5) % 4096) - 2048
    payload = codecs.encode_wav(s.astype(np.int16))
    return payload, codecs.WAV_FMT, 0, 0


def synth_codec_media(docs: DataFrame) -> DataFrame:
    """(doc_id, content, fmt) with real BMP/WAV payloads for doc_id <
    SYNTH_DOC_LIMIT — built in mapInPandas (encode runs where the data
    lives, same as a production transcode step)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                (int(d), *(_synth_payload(int(d))[:2]))
                for d in pdf["doc_id"]
                if int(d) < SYNTH_DOC_LIMIT
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "content", "fmt"])

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, content binary, fmt string"
    )


def synth_png_media(docs: DataFrame) -> DataFrame:
    """(doc_id, content, fmt) with real PNG payloads for doc_id <
    SYNTH_DOC_LIMIT. Pixel bytes are the closed form v(i) =
    (doc_id*17 + i*11) % 256 over w*h*3 positions with w = 6 +
    doc_id%11, h = 6 + (doc_id*5)%7; each row r is written with
    filter type (doc_id + r) % 5, so decoding the corpus exercises
    every PNG unfilter path (None/Sub/Up/Average/Paeth) under the
    oracle gate — the analytic oracle knows only the pixel formula,
    so any filter/inflate/CRC bug breaks the hash match."""
    import numpy as np

    from mapreduce511_spark.multimodal import codecs

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for d in pdf["doc_id"]:
                d = int(d)
                if d >= SYNTH_DOC_LIMIT:
                    continue
                w = 6 + d % 11
                h = 6 + (d * 5) % 7
                vals = (d * 17 + np.arange(w * h * 3, dtype=np.int64) * 11) % 256
                payload = codecs.encode_png(
                    vals.astype(np.uint8).reshape(h, w, 3),
                    row_filter=lambda r, d=d: (d + r) % 5,
                )
                rows.append((d, payload, codecs.PNG_FMT))
        yield pd.DataFrame(rows, columns=["doc_id", "content", "fmt"])

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, content binary, fmt string"
    )


def synth_tiff_media(docs: DataFrame) -> DataFrame:
    """(doc_id, content, fmt) with real baseline TIFF payloads for
    doc_id < SYNTH_DOC_LIMIT, sweeping the whole baseline matrix as a
    function of doc_id: grayscale (even d) vs RGB (odd d), PackBits
    (default) vs uncompressed (d % 3 == 0), little-endian ``II``
    (default) vs big-endian ``MM`` (d % 5 == 0), and a multi-strip
    layout (rows_per_strip = 1 + d % 4, so most assets split into
    several strips and the last strip is usually partial).  Pixel
    bytes follow the shared closed form (see the TIFF_* constants),
    piecewise-constant in runs so PackBits emits both packet kinds.
    The analytic oracle knows only the pixel formula — any IFD walk,
    strip-geometry, byte-order or PackBits bug breaks the match."""
    import numpy as np

    from mapreduce511_spark.multimodal import tiff

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for d in pdf["doc_id"]:
                d = int(d)
                if d >= SYNTH_DOC_LIMIT:
                    continue
                w = TIFF_W_BASE + d % TIFF_W_MOD
                h = TIFF_H_BASE + (d * 5) % TIFF_H_MOD
                spp = 1 if d % 2 == 0 else 3
                vals = (
                    d * TIFF_PX_A
                    + (np.arange(w * h * spp, dtype=np.int64) // TIFF_PX_RUN)
                    * TIFF_PX_STEP
                ) % 256
                px = vals.astype(np.uint8).reshape(
                    (h, w) if spp == 1 else (h, w, 3)
                )
                payload = tiff.encode_tiff(
                    px,
                    compression=1 if d % 3 == 0 else 32773,
                    byte_order=">" if d % 5 == 0 else "<",
                    rows_per_strip=1 + d % 4,
                )
                rows.append((d, payload, tiff.TIFF_FMT))
        yield pd.DataFrame(rows, columns=["doc_id", "content", "fmt"])

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, content binary, fmt string"
    )


def synth_jpeg_media(docs: DataFrame) -> DataFrame:
    """(doc_id, content, fmt) with real baseline JPEG payloads for
    doc_id < SYNTH_DOC_LIMIT. Each image is a grid of CONSTANT 8x8
    blocks — wb = 1 + d%4 by hb = 1 + (d*5)%3 blocks, block (bx, by)
    filled with v = (d*31 + bx*7 + by*13) % 256 — because a constant
    block's decode is analytically predictable through the lossy
    quantization round-trip (DC-only: p = clamp(2*floor((v-128)/2 +
    0.5) + 128)), which is what puts a REAL Huffman-coded JPEG corpus
    under the exact DuckDB oracle gate. The varying block values
    drive the DC-difference Huffman categories; the AC layer's
    exactness is proven coefficient-for-coefficient in
    tests/test_jpeg.py."""
    import numpy as np

    from mapreduce511_spark.multimodal import jpeg

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for d in pdf["doc_id"]:
                d = int(d)
                if d >= SYNTH_DOC_LIMIT:
                    continue
                wb = 1 + d % JPEG_GRID_WB_MOD
                hb = 1 + (d * 5) % JPEG_GRID_HB_MOD
                px = np.zeros((hb * 8, wb * 8), dtype=np.uint8)
                for by in range(hb):
                    for bx in range(wb):
                        v = (d * JPEG_PX_A + bx * JPEG_PX_BX + by * JPEG_PX_BY) % 256
                        px[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = v
                rows.append((d, jpeg.encode_jpeg(px), jpeg.JPEG_FMT))
        yield pd.DataFrame(rows, columns=["doc_id", "content", "fmt"])

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, content binary, fmt string"
    )


def synth_jpeg_arith_media(docs: DataFrame) -> DataFrame:
    """(doc_id, content, fmt) with real ARITHMETIC-CODED (SOF9) JPEG
    payloads for doc_id < SYNTH_DOC_LIMIT — the same constant-block
    grid fixture and closed-form DC round-trip as the Huffman twin
    (``synth_jpeg_media``), so the identical DuckDB oracle verifies
    the QM coder + DC/AC statistical models end to end: any
    arithmetic-decode defect changes the decoded pixels and the
    oracle's integer sums catch it.

    r9 (VERDICT r8 item 9): docs cycle through FOUR conditioning
    variants — the T.81 default (L=0,U=1,Kx=5) plus three non-default
    DAC settings — so the oracle also proves the parametrized L/U
    classification and Kx context split (decoded pixels are
    conditioning-invariant; a classification bug desyncs the QM
    decoder and the integer sums catch it)."""
    import numpy as np

    from mapreduce511_spark.multimodal import jpeg_arith

    conds = ((0, 1, 5), (1, 3, 12), (0, 0, 1), (2, 8, 63))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for d in pdf["doc_id"]:
                d = int(d)
                if d >= SYNTH_DOC_LIMIT:
                    continue
                wb = 1 + d % JPEG_GRID_WB_MOD
                hb = 1 + (d * 5) % JPEG_GRID_HB_MOD
                px = np.zeros((hb * 8, wb * 8), dtype=np.uint8)
                for by in range(hb):
                    for bx in range(wb):
                        v = (d * JPEG_PX_A + bx * JPEG_PX_BX + by * JPEG_PX_BY) % 256
                        px[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = v
                dc_l, dc_u, ac_kx = conds[d % 4]
                rows.append(
                    (
                        d,
                        jpeg_arith.encode_jpeg_arith(
                            px, dc_l=dc_l, dc_u=dc_u, ac_kx=ac_kx
                        ),
                        "image/jpeg",
                    )
                )
        yield pd.DataFrame(rows, columns=["doc_id", "content", "fmt"])

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, content binary, fmt string"
    )


def synth_jpeg420_media(docs: DataFrame) -> DataFrame:
    """(doc_id, content, fmt) with real 4:2:0 chroma-subsampled
    baseline JPEGs for doc_id < SYNTH_DOC_LIMIT. Each image is a grid
    of CONSTANT 16x16 MCUs (wb x hb MCUs, same grid/pixel constants
    as the 4:4:4 twin), all three RGB channels equal to v — so Y = v
    exactly and Cb = Cr = 128 exactly (the BT.601 coefficients sum to
    1 / 0 and the encoder snaps), the downsampled chroma stays
    constant, and the decoded pixel has the SAME closed form as the
    grayscale DC chain: p = clamp(2*floor((v-128)/2 + 0.5) + 128) on
    every RGB channel. That puts the whole 4:2:0 machinery — 2x2 luma
    MCU interleave, chroma downsample, per-component DC prediction,
    replication upsampling, YCbCr round trip — under the exact DuckDB
    oracle gate while the oracle knows only the per-MCU formula."""
    import numpy as np

    from mapreduce511_spark.multimodal import jpeg

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for d in pdf["doc_id"]:
                d = int(d)
                if d >= SYNTH_DOC_LIMIT:
                    continue
                wb = 1 + d % JPEG_GRID_WB_MOD
                hb = 1 + (d * 5) % JPEG_GRID_HB_MOD
                px = np.zeros((hb * 16, wb * 16, 3), dtype=np.uint8)
                for by in range(hb):
                    for bx in range(wb):
                        v = (d * JPEG_PX_A + bx * JPEG_PX_BX + by * JPEG_PX_BY) % 256
                        px[by * 16:(by + 1) * 16, bx * 16:(bx + 1) * 16, :] = v
                rows.append(
                    (d, jpeg.encode_jpeg(px, subsampling="420"), jpeg.JPEG_FMT)
                )
        yield pd.DataFrame(rows, columns=["doc_id", "content", "fmt"])

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, content binary, fmt string"
    )


def synth_jpeg_progressive_media(docs: DataFrame) -> DataFrame:
    """(doc_id, content, fmt) with real PROGRESSIVE (SOF2) 4:2:0
    JPEGs for doc_id < SYNTH_DOC_LIMIT — same constant-MCU fixture
    grid as ``synth_jpeg420_media``, encoded through the full
    spectral-selection + successive-approximation scan script
    (``jpeg_progressive.py``), with a restart interval of 2 MCUs.
    Constant MCUs make every AC scan an image-wide EOB run and split
    the DC value across a first scan at Al=1 plus a refinement bit,
    so a correct decode must get EOBn runs (chopped at each RSTn —
    runs never cross a restart), per-scan DC prediction with
    per-restart resets, the point transforms and the multi-SOS
    segment walk right to land on the SAME closed form as the
    baseline twin; general content is proven coefficient-exact in
    tests/test_jpeg.py."""
    import numpy as np

    from mapreduce511_spark.multimodal import jpeg
    from mapreduce511_spark.multimodal.jpeg_progressive import (
        encode_jpeg_progressive,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for d in pdf["doc_id"]:
                d = int(d)
                if d >= SYNTH_DOC_LIMIT:
                    continue
                wb = 1 + d % JPEG_GRID_WB_MOD
                hb = 1 + (d * 5) % JPEG_GRID_HB_MOD
                px = np.zeros((hb * 16, wb * 16, 3), dtype=np.uint8)
                for by in range(hb):
                    for bx in range(wb):
                        v = (d * JPEG_PX_A + bx * JPEG_PX_BX + by * JPEG_PX_BY) % 256
                        px[by * 16:(by + 1) * 16, bx * 16:(bx + 1) * 16, :] = v
                rows.append(
                    (
                        d,
                        encode_jpeg_progressive(
                            px, subsampling="420", restart_interval=2
                        ),
                        jpeg.JPEG_FMT,
                    )
                )
        yield pd.DataFrame(rows, columns=["doc_id", "content", "fmt"])

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, content binary, fmt string"
    )


DECODED_SCHEMA = (
    "doc_id long, kind string, width int, height int, n_vals long, "
    "sum_val long, min_val long, max_val long, hist_sum long"
)


def synth_flac_media(docs: DataFrame) -> DataFrame:
    """(doc_id, content, fmt) with real FLAC payloads for doc_id <
    SYNTH_DOC_LIMIT. Samples are the closed form
    s(i) = ((d*31 + i*7) % 4096) - 2048 over n = 700 + (d%7)*211
    positions, encoded at block size 256 with every second frame an
    explicit LPC subframe — so the oracled corpus exercises frame
    sync, UTF-8 numbering, CRC-8/CRC-16, CONSTANT/FIXED/LPC decode,
    Rice coding and the MD5 integrity check on every asset. FLAC is
    lossless, so the oracle's closed form IS the decoded output —
    bit-exact, no quantization argument needed (contrast the JPEG
    fixtures' DC round-trip formula)."""
    from mapreduce511_spark.multimodal import flac

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for d in pdf["doc_id"]:
                d = int(d)
                if d >= SYNTH_DOC_LIMIT:
                    continue
                n = FLAC_N_BASE + (d % FLAC_N_MOD) * FLAC_N_STEP
                pcm = [
                    ((d * FLAC_PX_A + i * FLAC_PX_B) % 4096) - 2048
                    for i in range(n)
                ]
                payload = flac.encode_flac(
                    pcm, sample_rate=8000, block_size=FLAC_BLOCK
                )
                rows.append((d, payload, flac.FLAC_FMT))
        yield pd.DataFrame(rows, columns=["doc_id", "content", "fmt"])

    # the source parquet is 1-2 files; without a repartition the
    # pure-Python codec runs on 1-2 cores — spread the 400 assets
    return (
        docs.select("doc_id")
        .filter(F.col("doc_id") < SYNTH_DOC_LIMIT)
        .repartition(32)
        .mapInPandas(batches, schema="doc_id long, content binary, fmt string")
    )


def synth_flac_stereo_media(docs: DataFrame) -> DataFrame:
    """(doc_id, content, fmt) with real STEREO FLAC payloads for
    doc_id < SYNTH_DOC_LIMIT. Channels are the closed forms
    l(i) = ((d*31 + i*7) % 4096) - 2048 and
    r(i) = ((d*17 + i*11) % 4096) - 2048 over the same n as the mono
    fixture; the encoder cycles the channel assignment
    LR -> left/side -> right/side -> mid/side per frame, so every
    stereo decorrelation mode the spec defines sits under the exact
    oracle (lossless: the closed forms ARE the decoded output)."""
    from mapreduce511_spark.multimodal import flac

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for d in pdf["doc_id"]:
                d = int(d)
                if d >= SYNTH_DOC_LIMIT:
                    continue
                n = FLAC_N_BASE + (d % FLAC_N_MOD) * FLAC_N_STEP
                left = [
                    ((d * FLAC_PX_A + i * FLAC_PX_B) % 4096) - 2048
                    for i in range(n)
                ]
                right = [
                    ((d * FLAC_PX_A2 + i * FLAC_PX_B2) % 4096) - 2048
                    for i in range(n)
                ]
                payload = flac.encode_flac_stereo(
                    left, right, sample_rate=8000, block_size=FLAC_BLOCK
                )
                rows.append((d, payload, flac.FLAC_FMT))
        yield pd.DataFrame(rows, columns=["doc_id", "content", "fmt"])

    # see synth_flac_media: spread the pure-Python codec across cores
    return (
        docs.select("doc_id")
        .filter(F.col("doc_id") < SYNTH_DOC_LIMIT)
        .repartition(32)
        .mapInPandas(batches, schema="doc_id long, content binary, fmt string")
    )


def synth_flac_depth_media(docs: DataFrame) -> DataFrame:
    """(doc_id, content, fmt) with mono FLAC payloads cycling the
    sample depth 8/12/16/20/24 bits with doc_id % 5 (r10: the
    16-bit-only gate lift under the exact-oracle discipline).
    Samples wrap the FULL range of each depth —
    s(i) = ((d*FLAC_PX_A + i*step) % 2^bits) - 2^(bits-1) with
    step = 2^bits // FLAC_DEPTH_STEP_DIV — so every depth exercises
    its real dynamic range (min/max near the rails), the frame
    header's explicit sample-size code, the width-parametric
    subframe reader, and the MD5 signature's ceil(bps/8)-byte
    little-endian packing. Lossless: the closed form IS the decoded
    output, bit-exact at every depth."""
    from mapreduce511_spark.multimodal import flac

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for d in pdf["doc_id"]:
                d = int(d)
                if d >= SYNTH_DOC_LIMIT:
                    continue
                bits = FLAC_DEPTHS[d % len(FLAC_DEPTHS)]
                step = (1 << bits) // FLAC_DEPTH_STEP_DIV
                half = 1 << (bits - 1)
                n = FLAC_N_BASE + (d % FLAC_N_MOD) * FLAC_N_STEP
                pcm = [
                    ((d * FLAC_PX_A + i * step) % (1 << bits)) - half
                    for i in range(n)
                ]
                payload = flac.encode_flac(
                    pcm,
                    sample_rate=8000,
                    block_size=FLAC_BLOCK,
                    bps=bits,
                )
                rows.append((d, payload, flac.FLAC_FMT))
        yield pd.DataFrame(rows, columns=["doc_id", "content", "fmt"])

    # see synth_flac_media: spread the pure-Python codec across cores
    return (
        docs.select("doc_id")
        .filter(F.col("doc_id") < SYNTH_DOC_LIMIT)
        .repartition(32)
        .mapInPandas(batches, schema="doc_id long, content binary, fmt string")
    )


def fingerprint_bands(hashes: DataFrame, keep_hash: bool = False) -> DataFrame:
    """4 x 16-bit band explode of a (doc_id, h_lo, h_hi) fingerprint
    frame — the banded-equi-join candidate discipline every
    fingerprint near-dup query and streaming admission gate shares
    (pigeonhole-EXACT recall at Hamming <= 3: 4 bands, <= 3 differing
    bits => some band untouched). The 64-bit hash rides as two signed
    32-bit halves so band extraction never touches a sign bit.
    ``keep_hash=True`` carries h_lo/h_hi through for gates that verify
    Hamming against the banded index directly (one definition, r10
    review: this block existed in five query bodies)."""
    out_cols = (
        ["doc_id", "h_lo", "h_hi", "b.band", "b.val"]
        if keep_hash
        else ["doc_id", "b.band", "b.val"]
    )
    return hashes.select(
        "doc_id",
        "h_lo",
        "h_hi",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band"),
                         F.col("h_lo").bitwiseAND(65535).alias("val")),
                F.struct(F.lit(1).alias("band"),
                         F.shiftright("h_lo", 16).alias("val")),
                F.struct(F.lit(2).alias("band"),
                         F.col("h_hi").bitwiseAND(65535).alias("val")),
                F.struct(F.lit(3).alias("band"),
                         F.shiftright("h_hi", 16).alias("val")),
            )
        ).alias("b"),
    ).select(*out_cols)


def extract_decoded_features(media_df: DataFrame) -> DataFrame:
    """REAL decode + per-asset statistics via mapInPandas: BMP payloads
    are parsed to pixel channel bytes (padding stripped, row order
    normalized), WAV payloads to int16 samples; stats are integers so
    external oracles compare exactly. Histogram is folded to a single
    checksum (sum of 1-based 16-level bin ids) to stay scalar.

    Input needs (doc_id, content, fmt). Per-payload decode is a loop
    over the Arrow batch — the parse itself is numpy-vectorized, which
    is the same batch shape a real codec binding uses."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from mapreduce511_spark.multimodal import codecs

        for pdf in it:
            out = []
            for doc_id, payload, fmt in zip(
                pdf["doc_id"], pdf["content"], pdf["fmt"]
            ):
                if fmt == codecs.BMP_FMT:
                    w, h, px = codecs.decode_bmp(bytes(payload))
                    vals = px.reshape(-1).astype(np.int64)
                    kind, bins = "image", vals >> 4
                elif fmt == codecs.PNG_FMT:
                    w, h, px = codecs.decode_png(bytes(payload))
                    vals = px.reshape(-1).astype(np.int64)
                    kind, bins = "image", vals >> 4
                elif fmt == "image/jpeg":
                    from mapreduce511_spark.multimodal import jpeg, jpeg_arith

                    pb = bytes(payload)
                    if jpeg_arith.is_arith_jpeg(pb):
                        w, h, px = jpeg_arith.decode_jpeg_arith(pb)
                    else:
                        w, h, px = jpeg.decode_jpeg(pb)
                    vals = px.reshape(-1).astype(np.int64)
                    kind, bins = "image", vals >> 4
                elif fmt == "image/tiff":
                    from mapreduce511_spark.multimodal import tiff

                    w, h, px = tiff.decode_tiff(bytes(payload))
                    vals = px.reshape(-1).astype(np.int64)
                    kind, bins = "image", vals >> 4
                elif fmt == codecs.WAV_FMT:
                    _rate, _ch, samples = codecs.decode_wav(bytes(payload))
                    vals = samples.astype(np.int64)
                    w = h = 0
                    kind, bins = "audio", (vals + 2048) >> 8
                elif fmt == "audio/flac":
                    from mapreduce511_spark.multimodal import flac

                    _rate, _ch, samples = flac.decode_flac(bytes(payload))
                    vals = np.asarray(samples, dtype=np.int64)
                    w = h = 0
                    kind, bins = "audio", (vals + 2048) >> 8
                else:
                    raise NotImplementedError(f"no decoder for {fmt!r}")
                out.append(
                    (
                        int(doc_id),
                        kind,
                        int(w),
                        int(h),
                        int(vals.size),
                        int(vals.sum()),
                        int(vals.min()),
                        int(vals.max()),
                        int((bins + 1).sum()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "kind",
                    "width",
                    "height",
                    "n_vals",
                    "sum_val",
                    "min_val",
                    "max_val",
                    "hist_sum",
                ],
            )

    return media_df.select("doc_id", "content", "fmt").mapInPandas(
        batches, schema=DECODED_SCHEMA
    )


def extract_features(
    media_df: DataFrame, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """Per-asset features via ``mapInPandas``: byte count, mean byte
    value, 16-bin byte histogram. This is the plumbing the real
    decoder drops into — Arrow batches in, vectorized numpy per batch,
    Arrow batches out; no driver collect, no per-row Python.

    ``passthrough`` columns ride along through the Arrow batch so
    downstream grouping doesn't need a join back to the media table
    (which would re-shuffle the binary payloads' lineage)."""
    out_schema = T.StructType(
        [media_df.schema[c] for c in passthrough] + list(FEATURE_SCHEMA.fields)
    )
    cols = ["doc_id", "n_bytes", "mean_byte", "histogram"]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            payloads = list(pdf["content"])
            n = len(payloads)
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
            # one pass over the concatenated bytes of the whole Arrow
            # batch: per-row histograms via a single bincount on
            # (row_index * N_BINS + high_nibble), per-row means via
            # reduceat — no per-row Python.
            cat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            row_idx = np.repeat(np.arange(n), lens)
            hist = np.bincount(
                row_idx * N_HIST_BINS + (cat >> 4), minlength=n * N_HIST_BINS
            ).reshape(n, N_HIST_BINS)
            if n and lens.min() > 0:
                offsets = np.zeros(n, dtype=np.int64)
                np.cumsum(lens[:-1], out=offsets[1:])
                sums = np.add.reduceat(cat.astype(np.int64), offsets)
            else:  # reduceat can't express empty segments — rare path
                sums = np.fromiter(
                    (np.frombuffer(p, dtype=np.uint8).sum() for p in payloads),
                    dtype=np.int64,
                    count=n,
                )
            means = np.where(lens > 0, sums / np.maximum(lens, 1), 0.0)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": lens,
                    "mean_byte": means,
                    "histogram": list(hist.astype("int64")),
                }
            )
            for c in reversed(passthrough):
                out.insert(0, c, list(pdf[c]))
            yield out

    return media_df.select(*passthrough, "doc_id", "content").mapInPandas(
        batches, schema=out_schema
    )


def sample_frames(media_df: DataFrame, every_n: int = 4) -> DataFrame:
    """Video-style frame sampling over the fake codec: split the
    payload into fixed 64-byte 'frames', keep every ``every_n``-th.
    Same mapInPandas shape a real demuxer would use."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[tuple[int, int, bytes]] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                n = max(len(payload) // _FRAME_BYTES, 1)
                for idx in range(0, n, every_n):
                    out.append(
                        (
                            int(doc_id),
                            idx,
                            bytes(
                                payload[
                                    idx * _FRAME_BYTES : (idx + 1) * _FRAME_BYTES
                                ]
                            ),
                        )
                    )
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame"])

    return media_df.select("doc_id", "content").mapInPandas(
        batches, schema=FRAME_SCHEMA
    )


def resize_assets(media_df: DataFrame, factor: int = 2) -> DataFrame:
    """Image-resize slot of the pipeline. BMP payloads get a REAL
    nearest-neighbor resize (decode → every factor-th pixel →
    re-encode, ``codecs.resize_bmp``) with metadata updated from the
    actual output dims; PNG payloads likewise resize through the
    real codec (inflate → unfilter → downsample → re-encode); other
    formats keep the deterministic byte-downsample fake with the same
    mapInPandas shape a PIL/cv2 resampler drops into."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("media", MEDIA_META),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mapreduce511_spark.multimodal import codecs

        for pdf in it:
            rows = []
            for doc_id, payload, media in zip(
                pdf["doc_id"], pdf["content"], pdf["media"]
            ):
                meta = dict(media)
                if meta.get("fmt") == codecs.BMP_FMT:
                    out = codecs.resize_bmp(bytes(payload), factor)
                    w2, h2, _px = codecs.decode_bmp(out)
                    meta["width"], meta["height"] = w2, h2
                    rows.append((int(doc_id), out, meta))
                    continue
                if meta.get("fmt") == codecs.PNG_FMT:
                    out = codecs.resize_png(bytes(payload), factor)
                    w2, h2, _px = codecs.decode_png(out)
                    meta["width"], meta["height"] = w2, h2
                    rows.append((int(doc_id), out, meta))
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)[::factor]
                meta["width"] = max(int(meta["width"]) // factor, 1)
                meta["height"] = max(int(meta["height"]) // factor, 1)
                rows.append((int(doc_id), arr.tobytes(), meta))
            yield pd.DataFrame(rows, columns=["doc_id", "content", "media"])

    return media_df.select("doc_id", "content", "media").mapInPandas(
        batches, schema=out_schema
    )


# GIF fixture geometry/pixel formula — single definition shared by
# synth_gif_media AND the multimodal_gif_stats oracle f-string:
#   w = 6 + d % 9, h = 6 + (d*5) % 7, palette of GIF_NCOLORS entries
#   index p(i) = (d*GIF_PX_A + i*GIF_PX_B) % GIF_NCOLORS over w*h
#   channel bytes: r = (p*37)%256, g = (p*59)%256, b = (p*83)%256
#   every 4th asset ((d % 4) == 1) is INTERLACED
GIF_NCOLORS = 16
GIF_PX_A = 11
GIF_PX_B = 7


def synth_gif_media(docs: DataFrame) -> DataFrame:
    """(doc_id, content, fmt) with real single-image GIF payloads for
    doc_id < SYNTH_DOC_LIMIT — real LZW (variable code width, clear
    codes, sub-block packing), every 4th asset interlaced so the
    4-pass row order decodes under the oracle gate (the census's
    position-weighted checksum makes row order load-bearing), and
    every other asset stores its palette as a LOCAL color table (r9
    gate lift) so both table placements sit under the same oracle
    (decoded pixels are placement-invariant)."""
    from mapreduce511_spark.multimodal import gif

    palette = [
        ((c * 37) % 256, (c * 59) % 256, (c * 83) % 256)
        for c in range(GIF_NCOLORS)
    ]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for d in pdf["doc_id"]:
                d = int(d)
                if d >= SYNTH_DOC_LIMIT:
                    continue
                w = 6 + d % 9
                h = 6 + (d * 5) % 7
                grid = [
                    [
                        (d * GIF_PX_A + (y * w + x) * GIF_PX_B) % GIF_NCOLORS
                        for x in range(w)
                    ]
                    for y in range(h)
                ]
                payload = gif.encode_gif(
                    grid,
                    palette,
                    interlace=(d % 4 == 1),
                    local_table=(d % 2 == 1),
                )
                rows.append((d, payload, gif.GIF_FMT))
        yield pd.DataFrame(rows, columns=["doc_id", "content", "fmt"])

    return (
        docs.select("doc_id")
        .filter(F.col("doc_id") < SYNTH_DOC_LIMIT)
        .repartition(32)
        .mapInPandas(batches, schema="doc_id long, content binary, fmt string")
    )


# Animated-GIF fixture geometry — single definition shared by
# synth_gif_anim_media AND the gif_animation_census oracle f-string
# (r10 gate lift: sub-rectangle frames + disposal; r11: transparency
# + disposal 3):
#   screen ws = 6 + d % 5, hs = 6 + (d*3) % 5; nf = 2 + d % 3 frames
#   frame f: 3x3 patch at (lf, tp) = (f % (ws-3), (f*2) % (hs-3))
#   patch index p(x, y, f) = (d*GIF_PX_A + f*GIF_ANIM_FR_MIX
#                             + (y*3 + x)*GIF_PX_B) % GIF_NCOLORS
#     (the nine cell values are pairwise distinct: GIF_PX_B=7 is a
#     unit mod GIF_NCOLORS=16)
#   disposal(f) = (d + f) % 4 — cycles all four defined methods
#   transparency ON when (d + 2*f) % 3 == 0, transparent index =
#     p at cell i_t = (d + f) % 9, so exactly that one cell skips
#   background = palette[0] = (0, 0, 0)
GIF_ANIM_FR_MIX = 31


def synth_gif_anim_media(docs: DataFrame) -> DataFrame:
    """(doc_id, content, fmt) with real ANIMATED GIF payloads for
    doc_id < SYNTH_DOC_LIMIT: 2-4 sub-rectangle frames per asset,
    overlapping patches, ALL FOUR disposal methods and per-frame
    transparency cycling on/off — so the composed canvases exercise
    graphic-control parsing, sub-rect placement, background restores,
    restore-to-previous AND transparent-pixel skip under the exact
    oracle."""
    from mapreduce511_spark.multimodal import gif

    palette = [
        ((c * 37) % 256, (c * 59) % 256, (c * 83) % 256)
        for c in range(GIF_NCOLORS)
    ]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for d in pdf["doc_id"]:
                d = int(d)
                if d >= SYNTH_DOC_LIMIT:
                    continue
                ws = 6 + d % 5
                hs = 6 + (d * 3) % 5
                frames = []
                for f in range(2 + d % 3):
                    patch = [
                        [
                            (
                                d * GIF_PX_A
                                + f * GIF_ANIM_FR_MIX
                                + (y * 3 + x) * GIF_PX_B
                            )
                            % GIF_NCOLORS
                            for x in range(3)
                        ]
                        for y in range(3)
                    ]
                    t_idx = None
                    if (d + 2 * f) % 3 == 0:
                        i_t = (d + f) % 9
                        t_idx = patch[i_t // 3][i_t % 3]
                    frames.append(
                        (
                            f % (ws - 3),
                            (f * 2) % (hs - 3),
                            patch,
                            (d + f) % 4,
                            t_idx,
                        )
                    )
                payload = gif.encode_gif_animation(ws, hs, palette, frames)
                rows.append((d, payload, gif.GIF_FMT))
        yield pd.DataFrame(rows, columns=["doc_id", "content", "fmt"])

    return (
        docs.select("doc_id")
        .filter(F.col("doc_id") < SYNTH_DOC_LIMIT)
        .repartition(32)
        .mapInPandas(batches, schema="doc_id long, content binary, fmt string")
    )


# dHash fixture geometry — single definition shared by
# synth_dhash_media AND the image_dhash_near_dup oracle f-string:
# 36x16 grayscale BMPs built from a 9x8 grid of 4x2-pixel constant
# boxes, so the integer box average recovers the cell value EXACTLY.
#   base = d // DHASH_CLASS, v = d % DHASH_CLASS
#   cell(cx, cy) = ((base+1)*(cx + 9*cy + 1)*DHASH_MIX
#                   + base*(cx*cx + 3*cy*cy)) % 256
#   variant v > 0 perturbs cells (cx == v, cy < v) by +128 mod 256,
# giving intra-class Hamming distances spread over 0..8 (the t=3
# threshold genuinely discriminates) and ZERO cross-class pairs at
# t<=3 on the 400-doc corpus (measured).
DHASH_CLASS = 4
DHASH_MIX = 2654435761  # Knuth multiplicative constant
DHASH_T = 3  # Hamming radius; 4 bands x 16 bits => exact by pigeonhole


def _dhash_cells(doc_id: int):
    """9x8 int cell grid for one fixture (numpy, closed form above)."""
    import numpy as np

    base, v = doc_id // DHASH_CLASS, doc_id % DHASH_CLASS
    cx = np.arange(9, dtype=np.int64)[None, :]
    cy = np.arange(8, dtype=np.int64)[:, None]
    c = ((base + 1) * (cx + 9 * cy + 1) * DHASH_MIX
         + base * (cx * cx + 3 * cy * cy)) % 256
    if v > 0:
        c[:v, v] = (c[:v, v] + 128) % 256
    return c  # shape (8 rows, 9 cols)


def synth_dhash_media(docs: DataFrame) -> DataFrame:
    """(doc_id, content, fmt) with real 36x16 BMP payloads for doc_id <
    SYNTH_DOC_LIMIT; each 4x2-pixel box holds one constant grayscale
    cell value (all three channels equal), so decode + integer box
    averaging is lossless and the dHash bits have a closed form."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from mapreduce511_spark.multimodal import codecs

        rows = []
        for pdf in it:
            for d in pdf["doc_id"]:
                d = int(d)
                if d >= SYNTH_DOC_LIMIT:
                    continue
                cells = _dhash_cells(d)  # (8, 9)
                px = np.repeat(np.repeat(cells, 2, axis=0), 4, axis=1)
                img = np.stack([px, px, px], axis=2).astype(np.uint8)
                rows.append((d, codecs.encode_bmp(img), codecs.BMP_FMT))
        yield pd.DataFrame(rows, columns=["doc_id", "content", "fmt"])

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, content binary, fmt string"
    )


def extract_dhash(media_df: DataFrame) -> DataFrame:
    """Difference-hash (dHash) per image asset via mapInPandas: decode,
    integer 4x2 box-average down to the 9x8 cell grid (exact for the
    fixtures; floor division in general), then 64 bits of
    cell[y][x+1] > cell[y][x], packed as two NON-NEGATIVE 32-bit
    halves (h_lo rows 0-3, h_hi rows 4-7) so band extraction never
    touches a sign bit in either engine."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from mapreduce511_spark.multimodal import codecs

        for pdf in it:
            out = []
            for doc_id, payload, fmt in zip(
                pdf["doc_id"], pdf["content"], pdf["fmt"]
            ):
                if fmt != codecs.BMP_FMT:
                    raise NotImplementedError(f"dhash expects BMP, got {fmt!r}")
                w, h, px = codecs.decode_bmp(bytes(payload))
                gray = px[:, :, 0].astype(np.int64)  # channels equal
                cells = (
                    gray.reshape(h // 2, 2, w // 4, 4).sum(axis=(1, 3)) // 8
                )
                bits = (cells[:, 1:9] > cells[:, 0:8]).astype(np.int64)
                weights = 1 << np.arange(32, dtype=np.int64)
                lo = int((bits[:4].reshape(-1) * weights).sum())
                hi = int((bits[4:].reshape(-1) * weights).sum())
                out.append((int(doc_id), lo, hi))
            yield pd.DataFrame(out, columns=["doc_id", "h_lo", "h_hi"])

    return media_df.select("doc_id", "content", "fmt").mapInPandas(
        batches, schema="doc_id long, h_lo long, h_hi long"
    )


def synth_png_native_deflate_media(docs: DataFrame) -> DataFrame:
    """(doc_id, content, fmt) with PNG payloads whose IDAT stream is
    the NATIVE DEFLATE encoder (multimodal/deflate.py), not stdlib
    zlib: doc_id % 3 picks the block type (0 -> dynamic-Huffman,
    1 -> fixed-Huffman, 2 -> stored), and rows cycle all five PNG
    filters as in synth_png_media; pixel closed form is the same
    v(i) = (d*17 + i*11) % 256 with w = 6 + d%11, h = 6 + (d*5)%7.
    Decoding goes through stdlib zlib's INDEPENDENT inflater, so a
    green oracle row proves the native bitstream against a second
    implementation — a self-consistent encoder bug cannot pass."""
    import numpy as np

    from mapreduce511_spark.multimodal import codecs
    from mapreduce511_spark.multimodal.deflate import zlib_compress_native

    modes = ("dynamic", "fixed", "stored")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for d in pdf["doc_id"]:
                d = int(d)
                if d >= SYNTH_DOC_LIMIT:
                    continue
                w = 6 + d % 11
                h = 6 + (d * 5) % 7
                vals = (d * 17 + np.arange(w * h * 3, dtype=np.int64) * 11) % 256
                mode = modes[d % 3]
                payload = codecs.encode_png(
                    vals.astype(np.uint8).reshape(h, w, 3),
                    row_filter=lambda r, d=d: (d + r) % 5,
                    compress=lambda b, m=mode: zlib_compress_native(b, m),
                )
                rows.append((d, payload, codecs.PNG_FMT))
        yield pd.DataFrame(rows, columns=["doc_id", "content", "fmt"])

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, content binary, fmt string"
    )


# ---------------------------------------------------------------------------
# Audio fingerprint (gain-invariant energy dHash) — r9
# ---------------------------------------------------------------------------

AFP_CLASS = 4  # docs per planted variant class
AFP_MIX = 2654435761  # Knuth multiplicative constant (as DHASH_MIX)
AFP_T = 3  # Hamming radius; 4 bands x 16 bits => exact by pigeonhole
AFP_WINDOWS = 65  # 65 window energies -> 64 adjacent comparisons
AFP_WIN_LEN = 16  # samples per window

# variant plan per class (v = doc_id % AFP_CLASS):
#   v=0 base; v=1 pure gain 3x (fingerprint-identical by design);
#   v=2 two perturbed windows, gain 1; v=3 three perturbed, gain 2
AFP_GAIN = (1, 3, 1, 2)
AFP_PERTURB = ((), (), (2, 19), (3, 20, 37))


def _afp_amplitudes(doc_id: int):
    """Per-window oscillation amplitudes for one fixture (closed
    form): A(w) = ((base+1)*(w+1)*AFP_MIX + base*w*w) % 256, with the
    variant's perturbed windows shifted +128 mod 256. The GAIN is
    applied to samples only — the fingerprint must cancel it."""
    import numpy as np

    base, v = doc_id // AFP_CLASS, doc_id % AFP_CLASS
    w = np.arange(AFP_WINDOWS, dtype=np.int64)
    a = ((base + 1) * (w + 1) * AFP_MIX + base * w * w) % 256
    for pw in AFP_PERTURB[v]:
        a[pw] = (a[pw] + 128) % 256
    return a, AFP_GAIN[v]


def synth_audio_fp_media(docs: DataFrame) -> DataFrame:
    """(doc_id, content, fmt) with real PCM WAV payloads for doc_id <
    SYNTH_DOC_LIMIT. Each asset is AFP_WINDOWS windows of AFP_WIN_LEN
    samples; window w oscillates 0, g*A(w), 0, g*A(w), ... so the
    window's first-difference energy is g*A(w)*(AFP_WIN_LEN-1) — a
    closed form the DuckDB oracle restates. Variant classes of
    AFP_CLASS docs plant a pure volume change (v=1) and small spectral
    edits (v=2/3) around each base recording."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from mapreduce511_spark.multimodal import codecs

        rows = []
        for pdf in it:
            for d in pdf["doc_id"]:
                d = int(d)
                if d >= SYNTH_DOC_LIMIT:
                    continue
                amps, gain = _afp_amplitudes(d)
                tick = np.tile(
                    np.arange(AFP_WIN_LEN, dtype=np.int64) % 2, AFP_WINDOWS
                )
                samples = tick * np.repeat(amps * gain, AFP_WIN_LEN)
                rows.append(
                    (d, codecs.encode_wav(samples.astype("<i2")), codecs.WAV_FMT)
                )
        yield pd.DataFrame(rows, columns=["doc_id", "content", "fmt"])

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, content binary, fmt string"
    )


def extract_audio_fingerprint(media_df: DataFrame) -> DataFrame:
    """Gain-invariant 64-bit audio fingerprint via mapInPandas: decode
    the WAV where the bytes live, split into AFP_WINDOWS fixed
    windows, take each window's first-difference energy
    E_w = sum |s[i]-s[i-1]| (within-window diffs only — an FFT-free
    high-band energy), then 64 bits of E_{w+1} > E_w. Comparing
    ADJACENT energies cancels any uniform gain (|g*ds| = g*|ds|), the
    audio analog of dHash comparing neighboring cells instead of
    absolutes. Packed as two non-negative 32-bit halves like
    ``extract_dhash`` so banding never touches a sign bit."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from mapreduce511_spark.multimodal import codecs

        for pdf in it:
            out = []
            for doc_id, payload, fmt in zip(
                pdf["doc_id"], pdf["content"], pdf["fmt"]
            ):
                if fmt != codecs.WAV_FMT:
                    raise NotImplementedError(
                        f"audio fingerprint expects WAV, got {fmt!r}"
                    )
                _, _, samples = codecs.decode_wav(bytes(payload))
                s = samples.astype(np.int64)
                n = AFP_WINDOWS * AFP_WIN_LEN
                if s.size != n:
                    raise ValueError(
                        f"fixture expects {n} samples, got {s.size}"
                    )
                d = np.abs(np.diff(s.reshape(AFP_WINDOWS, AFP_WIN_LEN)))
                e = d.sum(axis=1)  # within-window energy, cross-window excluded
                bits = (e[1:] > e[:-1]).astype(np.int64)
                weights = 1 << np.arange(32, dtype=np.int64)
                lo = int((bits[:32] * weights).sum())
                hi = int((bits[32:] * weights).sum())
                out.append((int(doc_id), lo, hi))
            yield pd.DataFrame(out, columns=["doc_id", "h_lo", "h_hi"])

    return media_df.select("doc_id", "content", "fmt").mapInPandas(
        batches, schema="doc_id long, h_lo long, h_hi long"
    )


# ---------------------------------------------------------------------------
# Video frame-hash fixtures (concatenated-BMP container) — r9
# ---------------------------------------------------------------------------

VID_CLASS = 4  # docs per planted variant class
VID_FRAMES = 6  # frames in a base video
VID_KEY_STRIDE = 8  # frame-key namespace per class (6 base + 1 foreign < 8)
VID_FOREIGN = 7  # v=3's appended foreign frame key offset
# the cell closed form is mod 256, so only key % 256 distinguishes
# frame CONTENT — the key space must stay under 256 or classes 256
# keys apart would carry pixel-identical frames (found when the first
# cut used 400 docs x stride 31: key 1024 wrapped onto key 0 and
# cross-class videos genuinely shared frames). 32 classes x stride 8
# = 256 keys exactly fills the space with no wrap.
VID_DOC_LIMIT = 128  # 32 classes x VID_CLASS docs

# variant plan (v = doc_id % VID_CLASS): v=0 base (frames 0..5);
# v=1 re-encode (same frames, fresh container); v=2 trim (1..5);
# v=3 trim + append one foreign frame (1..5, FOREIGN)


def _vid_frame_keys(doc_id: int) -> list[int]:
    base, v = doc_id // VID_CLASS, doc_id % VID_CLASS
    offs = {
        0: range(VID_FRAMES),
        1: range(VID_FRAMES),
        2: range(1, VID_FRAMES),
        3: [*range(1, VID_FRAMES), VID_FOREIGN],
    }[v]
    return [base * VID_KEY_STRIDE + o for o in offs]


def _vid_cells(key: int):
    """9x8 cell grid for one FRAME, keyed by the frame key (the same
    closed form family as _dhash_cells, so the oracle can re-derive
    every frame's dHash from the key alone)."""
    import numpy as np

    cx = np.arange(9, dtype=np.int64)[None, :]
    cy = np.arange(8, dtype=np.int64)[:, None]
    return ((key + 1) * (cx + 9 * cy + 1) * DHASH_MIX
            + key * (cx * cx + 3 * cy * cy)) % 256


def synth_video_media(docs: DataFrame) -> DataFrame:
    """(doc_id, content, fmt) where content is a VIDEO: a container of
    concatenated real 36x16 BMP frames (each frame individually
    decodable; the reader walks BMP file-size fields). Classes of
    VID_CLASS docs plant a re-encode twin, a trimmed cut, and a
    trim+splice variant around each base video."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from mapreduce511_spark.multimodal import codecs

        rows = []
        for pdf in it:
            for d in pdf["doc_id"]:
                d = int(d)
                if d >= VID_DOC_LIMIT:
                    continue
                frames = []
                for key in _vid_frame_keys(d):
                    cells = _vid_cells(key)
                    px = np.repeat(np.repeat(cells, 2, axis=0), 4, axis=1)
                    img = np.stack([px, px, px], axis=2).astype(np.uint8)
                    frames.append(codecs.encode_bmp(img))
                rows.append((d, b"".join(frames), "video/bmpseq"))
        yield pd.DataFrame(rows, columns=["doc_id", "content", "fmt"])

    return docs.select("doc_id").mapInPandas(
        batches, schema="doc_id long, content binary, fmt string"
    )


def extract_video_frame_hashes(media_df: DataFrame) -> DataFrame:
    """Per-video frame dHashes via mapInPandas: walk the concatenated
    BMP container by each frame's file-size field, decode, box-average
    to the 9x8 grid, dHash each frame (same gradient-sign hash as
    ``extract_dhash``). One output row per (doc_id, frame_idx) with
    the packed 32-bit halves — the video near-dup query builds its
    per-video signature (frame-hash set) from these."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from mapreduce511_spark.multimodal import codecs

        for pdf in it:
            out = []
            for doc_id, payload, fmt in zip(
                pdf["doc_id"], pdf["content"], pdf["fmt"]
            ):
                if fmt != "video/bmpseq":
                    raise NotImplementedError(
                        f"frame hasher expects video/bmpseq, got {fmt!r}"
                    )
                buf = bytes(payload)
                pos = fidx = 0
                while pos < len(buf):
                    if buf[pos : pos + 2] != b"BM":
                        raise ValueError("frame boundary desync")
                    size = int.from_bytes(buf[pos + 2 : pos + 6], "little")
                    w, h, px = codecs.decode_bmp(buf[pos : pos + size])
                    gray = px[:, :, 0].astype(np.int64)
                    cells = (
                        gray.reshape(h // 2, 2, w // 4, 4).sum(axis=(1, 3))
                        // 8
                    )
                    bits = (cells[:, 1:9] > cells[:, 0:8]).astype(np.int64)
                    weights = 1 << np.arange(32, dtype=np.int64)
                    lo = int((bits[:4].reshape(-1) * weights).sum())
                    hi = int((bits[4:].reshape(-1) * weights).sum())
                    out.append((int(doc_id), fidx, lo, hi))
                    pos += size
                    fidx += 1
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "h_lo", "h_hi"]
            )

    return media_df.select("doc_id", "content", "fmt").mapInPandas(
        batches, schema="doc_id long, frame_idx int, h_lo long, h_hi long"
    )
