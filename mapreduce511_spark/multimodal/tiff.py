"""Native baseline TIFF codec (TIFF 6.0, Adobe 1992 — public spec).

Scope: single-image baseline TIFF — 8-bit grayscale (Photometric
BlackIsZero) and 8-bit RGB, BOTH byte orders (``II`` little-endian and
``MM`` big-endian, spec §2), multi-strip layout (§3: StripOffsets /
StripByteCounts / RowsPerStrip), and Compression 1 (none) or 32773
(PackBits, §9).  Everything a baseline reader must honor per spec
section "Required Fields for {Bilevel,Grayscale,RGB} Images" is
parsed; anything outside baseline (tiling, LZW, planar configuration
2, predictors, sub-IFDs) raises loudly rather than mis-decoding.

Liftability note (the FLAC/GIF argument): every parameter a TIFF
decode needs — byte order, tag layout, strip geometry, the PackBits
control-byte grammar — travels in the file or is stated in-document
in the public spec; there are no out-of-band entropy tables (the
MP3/H.264 gate class).  PackBits itself is one paragraph of spec §9:
control byte n in [0,127] copies the next n+1 literal bytes; n in
[-127,-1] (two's complement) repeats the next byte 1-n times; -128
is a no-op.  The spec further requires the encoded data for each ROW
to begin on a fresh control byte ("the compression algorithm is
applied to each row separately"), which this encoder honors; decoding
a whole strip as one stream is then equivalent, since PackBits is
byte-aligned everywhere.

Reference basis: extension tier — multimodal decode family (no analog
in /root/reference, which is text-only).
"""

from __future__ import annotations

import struct

import numpy as np

TIFF_FMT = "image/tiff"

# IFD entry field types (spec §2, "Types")
_TYPE_SHORT = 3  # 16-bit unsigned
_TYPE_LONG = 4  # 32-bit unsigned
_TYPE_SIZES = {_TYPE_SHORT: 2, _TYPE_LONG: 4}

# Baseline tags (spec §3/§4/§6)
_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_ORIENTATION = 274
_TAG_PLANAR = 284

_COMP_NONE = 1
_COMP_PACKBITS = 32773

_PHOTO_GRAY = 1  # BlackIsZero
_PHOTO_RGB = 2


def packbits_encode(row: bytes) -> bytes:
    """PackBits-compress one row (spec §9 grammar).

    Runs of >= 3 identical bytes become a repeat packet (up to 128
    per packet); everything else accumulates into literal packets (up
    to 128 per packet).  A 2-byte run inside literals stays literal —
    the spec-recommended tie-break ("do not break a literal run to
    save one byte"), and any compliant decoder accepts either."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # measure the run starting at i
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        if j - i >= 3:
            out.append(257 - (j - i))  # two's complement of 1-(j-i)
            out.append(row[i])
            i = j
            continue
        # literal stretch: until the next >=3 run (or 128 bytes); a
        # 2-byte step may overshoot the cap, so clamp to lit+128 (a
        # pair split across two literal packets is still just bytes)
        lit = i
        while i < n and i - lit < 128:
            j = i + 1
            while j < n and j - i < 128 and row[j] == row[i]:
                j += 1
            if j - i >= 3:
                break
            i = min(j, lit + 128)
        out.append(i - lit - 1)
        out.extend(row[lit:i])
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Decompress a PackBits stream to exactly ``expected`` bytes.

    Trailing padding after the expected count is tolerated (writers
    may pad strips to word boundaries); producing MORE than expected
    mid-packet, or running out of input first, raises."""
    out = bytearray()
    pos, n = 0, len(data)
    while len(out) < expected:
        if pos >= n:
            raise ValueError(
                f"PackBits underrun: {len(out)} of {expected} bytes"
            )
        ctrl = data[pos]
        pos += 1
        if ctrl == 128:  # -128: no-op (spec: skip)
            continue
        if ctrl < 128:  # literal: next ctrl+1 bytes
            end = pos + ctrl + 1
            if end > n:
                raise ValueError("PackBits literal overruns input")
            out.extend(data[pos:end])
            pos = end
        else:  # repeat: next byte, 257-ctrl times
            if pos >= n:
                raise ValueError("PackBits repeat missing fill byte")
            out.extend(data[pos : pos + 1] * (257 - ctrl))
            pos += 1
    if len(out) > expected:
        raise ValueError(
            f"PackBits overrun: {len(out)} > expected {expected}"
        )
    return bytes(out)


def encode_tiff(
    pixels: np.ndarray,
    compression: int = _COMP_NONE,
    byte_order: str = "<",
    rows_per_strip: int | None = None,
) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline TIFF in the given byte order, split into strips of
    ``rows_per_strip`` rows (default: whole image in one strip).

    Layout: 8-byte header, strip data, external value arrays
    (BitsPerSample for RGB, strip offset/count arrays when more than
    one strip), then the IFD.  Offsets stay word-aligned (spec §2
    recommends even offsets)."""
    if byte_order not in ("<", ">"):
        raise ValueError("byte_order must be '<' (II) or '>' (MM)")
    if compression not in (_COMP_NONE, _COMP_PACKBITS):
        raise ValueError(f"unsupported compression {compression}")
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        h, w = px.shape
        spp, photo = 1, _PHOTO_GRAY
    elif px.ndim == 3 and px.shape[2] == 3:
        h, w, _ = px.shape
        spp, photo = 3, _PHOTO_RGB
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {px.shape}")
    if rows_per_strip is None or rows_per_strip > h:
        rows_per_strip = h
    flat = px.reshape(h, w * spp)

    # strip payloads (PackBits restarts at every ROW per spec §9)
    strips: list[bytes] = []
    for s0 in range(0, h, rows_per_strip):
        rows = flat[s0 : s0 + rows_per_strip]
        if compression == _COMP_NONE:
            strips.append(rows.tobytes())
        else:
            strips.append(
                b"".join(packbits_encode(r.tobytes()) for r in rows)
            )

    e = byte_order
    buf = bytearray()
    buf += (b"II" if e == "<" else b"MM") + struct.pack(e + "H", 42)
    buf += struct.pack(e + "I", 0)  # IFD offset patched at the end

    offsets: list[int] = []
    for s in strips:
        offsets.append(len(buf))
        buf += s
        if len(buf) & 1:
            buf += b"\x00"  # keep following offsets even

    def _external(fmt_char: str, values: list[int]) -> int:
        off = len(buf)
        for v in values:
            buf.extend(struct.pack(e + fmt_char, v))
        if len(buf) & 1:
            buf.extend(b"\x00")
        return off

    entries: list[tuple[int, int, int, int]] = []  # tag, type, count, value

    def _entry_arr(tag: int, ftype: int, fmt_char: str, values: list[int]):
        size = _TYPE_SIZES[ftype] * len(values)
        if size <= 4:
            raw = b"".join(struct.pack(e + fmt_char, v) for v in values)
            raw = raw.ljust(4, b"\x00")
            # left-justified in the 4-byte value field regardless of
            # byte order (spec §2, "Value Offset")
            entries.append(
                (tag, ftype, len(values), struct.unpack(e + "I", raw)[0])
            )
        else:
            entries.append(
                (tag, ftype, len(values), _external(fmt_char, values))
            )

    _entry_arr(_TAG_WIDTH, _TYPE_LONG, "I", [w])
    _entry_arr(_TAG_LENGTH, _TYPE_LONG, "I", [h])
    _entry_arr(_TAG_BITS, _TYPE_SHORT, "H", [8] * spp)
    _entry_arr(_TAG_COMPRESSION, _TYPE_SHORT, "H", [compression])
    _entry_arr(_TAG_PHOTOMETRIC, _TYPE_SHORT, "H", [photo])
    _entry_arr(_TAG_STRIP_OFFSETS, _TYPE_LONG, "I", offsets)
    _entry_arr(_TAG_SPP, _TYPE_SHORT, "H", [spp])
    _entry_arr(_TAG_ROWS_PER_STRIP, _TYPE_LONG, "I", [rows_per_strip])
    _entry_arr(_TAG_STRIP_COUNTS, _TYPE_LONG, "I", [len(s) for s in strips])

    ifd_off = len(buf)
    buf += struct.pack(e + "H", len(entries))
    for tag, ftype, count, value in sorted(entries):  # spec: ascending tag
        buf += struct.pack(e + "HHII", tag, ftype, count, value)
    buf += struct.pack(e + "I", 0)  # no next IFD
    buf[4:8] = struct.pack(e + "I", ifd_off)
    return bytes(buf)


def _read_values(payload: bytes, e: str, ftype: int, count: int, raw: int):
    """An IFD entry's value list: inline in the 4-byte field when it
    fits, else at the offset the field holds (spec §2)."""
    if ftype not in _TYPE_SIZES:
        raise ValueError(f"unsupported IFD field type {ftype}")
    size = _TYPE_SIZES[ftype] * count
    fmt_char = "H" if ftype == _TYPE_SHORT else "I"
    if size <= 4:
        blob = struct.pack(e + "I", raw)[:size]
        off = 0
    else:
        blob, off = payload, raw
        if off + size > len(payload):
            raise ValueError("IFD value offset past end of file")
    return list(struct.unpack_from(e + fmt_char * count, blob, off))


def decode_tiff(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a baseline TIFF to (width, height, pixels) with pixels
    (h, w) uint8 for grayscale or (h, w, 3) uint8 for RGB.  Handles
    both byte orders, inline and offset IFD values, SHORT or LONG
    spellings of the geometry tags, multi-strip images, and PackBits.
    Non-baseline features raise ``ValueError`` (never mis-decode)."""
    if len(payload) < 8:
        raise ValueError("TIFF shorter than its header")
    order = payload[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError(f"bad TIFF byte-order mark {order!r}")
    (magic,) = struct.unpack_from(e + "H", payload, 2)
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic} (want 42)")
    (ifd_off,) = struct.unpack_from(e + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise ValueError("IFD offset past end of file")
    (n_entries,) = struct.unpack_from(e + "H", payload, ifd_off)
    if ifd_off + 2 + 12 * n_entries > len(payload):
        raise ValueError(
            f"IFD entry table ({n_entries} entries) past end of file"
        )
    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        tag, ftype, count, raw = struct.unpack_from(
            e + "HHII", payload, ifd_off + 2 + 12 * k
        )
        if tag in (
            _TAG_WIDTH,
            _TAG_LENGTH,
            _TAG_BITS,
            _TAG_COMPRESSION,
            _TAG_PHOTOMETRIC,
            _TAG_STRIP_OFFSETS,
            _TAG_SPP,
            _TAG_ROWS_PER_STRIP,
            _TAG_STRIP_COUNTS,
            _TAG_ORIENTATION,
            _TAG_PLANAR,
        ):
            tags[tag] = _read_values(payload, e, ftype, count, raw)

    def _one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default

    w = _one(_TAG_WIDTH)
    h = _one(_TAG_LENGTH)
    spp = _one(_TAG_SPP, default=1)
    comp = _one(_TAG_COMPRESSION, default=_COMP_NONE)
    photo = _one(_TAG_PHOTOMETRIC)
    bits = tags.get(_TAG_BITS, [8] * spp)
    if spp not in (1, 3) or any(b != 8 for b in bits) or len(bits) != spp:
        raise ValueError(
            f"only 8-bit gray/RGB supported (spp={spp}, bits={bits})"
        )
    if (spp == 1) != (photo == _PHOTO_GRAY) or (spp == 3) != (
        photo == _PHOTO_RGB
    ):
        raise ValueError(
            f"photometric {photo} inconsistent with {spp} samples/pixel"
        )
    if comp not in (_COMP_NONE, _COMP_PACKBITS):
        raise ValueError(f"unsupported compression {comp}")
    # r11 ADVICE: a planar (PlanarConfiguration=2) RGB file stores
    # channel planes separately — silently interleaving them as chunky
    # mis-decodes every pixel, and a non-default Orientation transposes
    # or flips the raster. Both are non-baseline here: raise, never
    # mis-decode (the module contract).
    planar = _one(_TAG_PLANAR, default=1)
    if planar != 1:
        raise ValueError(f"unsupported PlanarConfiguration {planar}")
    orientation = _one(_TAG_ORIENTATION, default=1)
    if orientation != 1:
        raise ValueError(f"unsupported Orientation {orientation}")
    if _TAG_STRIP_OFFSETS not in tags or _TAG_STRIP_COUNTS not in tags:
        raise ValueError("TIFF missing strip offsets/byte counts")
    offsets = tags[_TAG_STRIP_OFFSETS]
    counts = tags[_TAG_STRIP_COUNTS]
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    rps = _one(_TAG_ROWS_PER_STRIP, default=h)
    row_bytes = w * spp

    raw = bytearray()
    remaining = h
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(payload):
            raise ValueError("strip extends past end of file")
        strip_rows = min(rps, remaining)
        remaining -= strip_rows
        blob = payload[off : off + cnt]
        if comp == _COMP_NONE:
            if cnt < strip_rows * row_bytes:
                raise ValueError("uncompressed strip shorter than its rows")
            raw += blob[: strip_rows * row_bytes]
        else:
            raw += packbits_decode(blob, strip_rows * row_bytes)
    if remaining != 0:
        raise ValueError(f"strips cover {h - remaining} of {h} rows")
    px = np.frombuffer(bytes(raw), dtype=np.uint8)
    return w, h, px.reshape((h, w) if spp == 1 else (h, w, spp))
