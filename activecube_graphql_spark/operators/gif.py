"""GIF87a/89a codec — dependency-free (r12; beyond-reference
multimodal brief).  With PNG (r11) and baseline JPEG (r12) this
completes the big-three crawl image formats: the only image formats a
web-scale curation pipeline still cannot decode for real are the ones
that genuinely need codec libraries (WebP/AVIF).

* ``encode_gif`` — GIF89a writer: logical screen descriptor, global
  color table (padded to a power of two), image descriptor (optional
  interlace), REAL LZW compression (greedy longest-match dictionary,
  LSB-first variable-width codes, CLEAR on dictionary overflow,
  255-byte sub-block framing).
* ``decode_gif`` — first-frame decode to ``(width, height,
  rgb_bytes)``: header + LSD parse, global/local color tables,
  extension-block skip (graphic control/comment/application), full
  LZW decode (code-width growth, CLEAR reset, the KwKwK case),
  4-pass de-interlace, palette expansion to RGB.  Animated GIFs
  decode frame 0 — the standard still-image semantics (what a
  vision-encoder feed takes).

Rejections are honest ValueError (bad magic, truncated blocks, code
overflow, missing color table, pixel under/overflow) — never a
mis-read raster, the decode_png/decode_jpeg discipline.
"""

from __future__ import annotations

import struct

_MAX_CODE_WIDTH = 12


def _interlace_rows(height: int) -> list[int]:
    """GIF 4-pass interlace row order."""
    rows = list(range(0, height, 8))
    rows += list(range(4, height, 8))
    rows += list(range(2, height, 4))
    rows += list(range(1, height, 2))
    return rows


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """Greedy-longest-match GIF LZW, LSB-first bit packing."""
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    run = b""
    for b in data:
        nxt = run + bytes([b])
        if nxt in table:
            run = nxt
            continue
        emit(table[run], width)
        if next_code < (1 << _MAX_CODE_WIDTH):
            table[nxt] = next_code
            if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    # one-behind width sync for END: the decoder appends one table
    # entry while PROCESSING the flush code above (entry code
    # next_code-1, table size becomes next_code) and bumps its code
    # width if that filled the table — the encoder added nothing after
    # its last in-loop emit, so it must mirror that phantom bump or
    # END is written one bit short exactly when the last dictionary
    # entry lands on (1<<width)-1
    if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
        width += 1
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF LZW decode: variable width, CLEAR reset, KwKwK."""
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]

    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream ended without END code")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW first code out of table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):                      # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW code overruns table")
        if prev is not None and len(table) == (1 << width) \
                and width < _MAX_CODE_WIDTH:
            width += 1
        out += entry
        if len(out) > n_pixels:
            raise ValueError("GIF LZW emits more pixels than the image")
        prev = entry
    if len(out) != n_pixels:
        raise ValueError(
            f"GIF LZW emitted {len(out)} of {n_pixels} pixels")
    return bytes(out)


def encode_gif(width: int, height: int, indices: bytes,
               palette: list[tuple[int, int, int]],
               interlace: bool = False) -> bytes:
    """Encode a palette-indexed raster as GIF89a."""
    if width <= 0 or height <= 0:
        raise ValueError("GIF dimensions must be positive")
    if len(indices) != width * height:
        raise ValueError(
            f"{len(indices)} indices for {width}x{height} raster")
    if not 2 <= len(palette) <= 256:
        raise ValueError("GIF palette must have 2..256 entries")
    if max(indices) >= len(palette):
        raise ValueError("pixel index outside the palette")

    depth = 1
    while (1 << depth) < len(palette):
        depth += 1
    table = bytearray()
    for r, g, b in palette:
        table += bytes((r, g, b))
    table += b"\x00" * (3 * ((1 << depth) - len(palette)))

    out = bytearray(b"GIF89a")
    # logical screen descriptor: global color table flag + depth
    out += struct.pack("<HHBBB", width, height,
                       0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0)
    out += table
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height,
                                 0x40 if interlace else 0x00)
    if interlace:
        src = bytearray(width * height)
        for o, y in enumerate(_interlace_rows(height)):
            src[o * width:(o + 1) * width] = \
                indices[y * width:(y + 1) * width]
        indices = bytes(src)
    min_code = max(2, depth)
    out.append(min_code)
    lzw = _lzw_encode(indices, min_code)
    for i in range(0, len(lzw), 255):
        block = lzw[i:i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3B"                                # terminator+trailer
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, bytes]:
    """Decode the first frame of a GIF to ``(width, height, rgb)`` —
    the LOGICAL-SCREEN-sized raster: a first frame smaller than the
    screen (common in optimized/animated GIFs) is composited at its
    (left, top) placement onto a canvas filled with the background
    color, matching what PIL/browsers render (review r12 finding —
    returning the cropped sub-frame silently mis-sized real crawl
    images)."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = payload[pos:pos + 3 * n]
        if len(gct) != 3 * n:
            raise ValueError("truncated GIF global color table")
        pos += 3 * n

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(payload):
                raise ValueError("truncated GIF sub-blocks")
            n = payload[p]
            p += 1 + n
            if n == 0:
                return p

    transparent = None                  # GCE transparent color index
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:                                 # trailer
            raise ValueError("GIF trailer before any image data")
        if b == 0x21:                                 # extension
            if pos + 2 > len(payload):
                raise ValueError("truncated GIF extension")
            # graphic control extension: remember the transparency
            # flag/index (ADVICE r12 — a transparent BACKGROUND index
            # must not paint the background palette color)
            if payload[pos + 1] == 0xF9 and pos + 7 <= len(payload) \
                    and payload[pos + 2] >= 4 and payload[pos + 3] & 1:
                transparent = payload[pos + 6]
            pos = skip_subblocks(pos + 2)
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        if pos + 10 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        left, top, w, h, iflags = struct.unpack(
            "<HHHHB", payload[pos + 1:pos + 10])
        pos += 10
        if w <= 0 or h <= 0 or left + w > sw or top + h > sh:
            raise ValueError("GIF frame outside the logical screen")
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = payload[pos:pos + 3 * n]
            if len(ct) != 3 * n:
                raise ValueError("truncated GIF local color table")
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image with no color table")
        if pos >= len(payload):
            raise ValueError("truncated GIF before LZW code size")
        min_code = payload[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"GIF LZW min code size {min_code} invalid")
        lzw = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("truncated GIF image data")
            n = payload[pos]
            pos += 1
            if n == 0:
                break
            block = payload[pos:pos + n]
            if len(block) != n:
                raise ValueError("truncated GIF data sub-block")
            lzw += block
            pos += n
        idx = _lzw_decode(bytes(lzw), min_code, w * h)
        if iflags & 0x40:
            de = bytearray(w * h)
            for o, y in enumerate(_interlace_rows(h)):
                de[y * w:(y + 1) * w] = idx[o * w:(o + 1) * w]
            idx = bytes(de)
        n_colors = len(ct) // 3
        if max(idx) >= n_colors:
            raise ValueError("GIF pixel index outside the color table")
        # frame 0 only — the still-image semantics
        if (left, top, w, h) == (0, 0, sw, sh):
            rgb = bytearray(3 * w * h)
            for i, c in enumerate(idx):
                rgb[3 * i:3 * i + 3] = ct[3 * c:3 * c + 3]
            return w, h, bytes(rgb)
        # sub-screen frame: composite at (left, top) onto the
        # background-colored logical-screen canvas; a background index
        # the GCE marks TRANSPARENT renders as browsers/PIL flatten it
        # — a neutral white fill, never the palette entry behind the
        # transparent slot (ADVICE r12)
        if transparent is not None and bg == transparent:
            bg_rgb = b"\xff\xff\xff"
        else:
            bg_rgb = (bytes(gct[3 * bg:3 * bg + 3])
                      if gct is not None and bg < len(gct) // 3
                      else b"\x00\x00\x00")
        canvas = bytearray(bg_rgb * (sw * sh))
        for y in range(h):
            row = idx[y * w:(y + 1) * w]
            o = 3 * ((top + y) * sw + left)
            for x, c in enumerate(row):
                canvas[o + 3 * x:o + 3 * x + 3] = ct[3 * c:3 * c + 3]
        return sw, sh, bytes(canvas)
    raise ValueError("GIF ended without an image block")
