"""Pure-Python GIF (87a/89a) codec: real LZW, interlacing, animation.

Extends the multimodal decode seam (``operators/multimodal.py``) with
the last classic web-crawl image format that needs no native library:
GIF's LZW entropy coding is pure dictionary/bit work, and the palette
model makes every decode EXACT (lossless indices -> lossless raster),
which is what lets ``mm_decode_gif`` hash-check the full path against
a closed-form SQL oracle.

Decoder surface (``decode_gif`` / ``decode_gif_frames``):
- Header GIF87a/GIF89a, logical screen descriptor, global color
  table; extensions (graphic control 0xF9 incl. frame delay, comment,
  application) walked via their sub-block chains; one or MANY image
  blocks (animation frames), each with optional local color table and
  optional interlacing (the classic 8/8-4/8-2/4-1/2 four-pass order).
- LZW: LSB-first variable-width codes (start min+1 bits, grow at
  2^width, cap 12), CLEAR resets the dictionary, the KwKwK corner
  case handled per the spec, END terminates.
- Frames composite onto the logical screen with the full GIF89a
  disposal state machine: 0/1 draw-over, 2 restore-to-background
  (region cleared to the background color after display; black when
  no opaque background is in scope), 3 restore-to-previous (region
  reverts to its pre-draw pixels); transparency index leaves the
  underlying pixel.

Encoder surface (``encode_gif``): full-frame grayscale-or-color
palette frames with REAL LZW compression (dictionary up to 4096 with
CLEAR-and-reset), optional interlacing, optional per-frame delays
(emits GIF89a graphic-control extensions).  decode(encode(x)) == x
bit-for-bit — pinned by round-trip tests including the public 1x1
transparent-GIF byte vector.

Reference parity: the reference pipeline has no media path; this
module is part of the training-data mandate (SURVEY.md §2.3
'multimodal columns': decode / feature-extract per media type).
"""

from __future__ import annotations

import struct


class GifError(ValueError):
    """Malformed or truncated GIF payload."""


# ------------------------------------------------------------- LZW


def _lzw_decode(min_code_size: int, data: bytes, npix: int) -> bytearray:
    # GIF caps the root code size at 8: palettes max out at 256
    # entries, so 9-11 only ever appear in malformed headers.
    if not 2 <= min_code_size <= 8:
        raise GifError("bad LZW minimum code size")
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise GifError("LZW stream truncated")
            acc |= data[pos] << nbits  # LSB-first packing
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise GifError("LZW code before any literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifError("LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= npix:
            break
    if len(out) < npix:
        raise GifError("LZW stream short of pixel count")
    return out[:npix]


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        # widen AFTER the code that fills the current width range
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4097:  # dictionary full: reset
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(raw: bytearray, w: int, h: int) -> bytearray:
    out = bytearray(len(raw))
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y * w : (y + 1) * w] = raw[src : src + w]
            src += w
    return out


def _interlace(raw: bytes, w: int, h: int) -> bytes:
    out = bytearray()
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out += raw[y * w : (y + 1) * w]
    return bytes(out)


# ---------------------------------------------------------- decode


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(data):
            raise GifError("sub-block chain truncated")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(data[pos : pos + n])
        if len(chunks[-1]) != n:
            raise GifError("sub-block truncated")
        pos += n


def decode_gif_frames(data: bytes):
    """Full decode: ``(width, height, [composited_frame, ...])`` where
    each composited frame is a bytes raster of w*h*3 RGB samples (the
    logical screen after drawing that frame).

    Disposal contract (per-function restatement of the module-level
    note): method 2 restores the disposed region to the OPAQUE
    background color from the logical-screen descriptor (black when
    the GCT has none) — the GIF89a spec reading.  Most browser
    renderers instead clear to transparent, so animations that rely on
    a transparent restore will show background-colored rectangles in
    later frames' luma features here.  Deterministic by design; callers
    needing browser parity must composite transparency themselves."""
    if len(data) < 13 or data[:4] != b"GIF8" or data[4:6] not in (
        b"7a",
        b"9a",
    ):
        raise GifError("missing GIF87a/GIF89a signature")
    w, h, packed, bg, _ = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = [tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
        if len(gct[-1]) != 3:
            raise GifError("global color table truncated")
        pos += 3 * n
    screen = bytearray(w * h * 3)
    bg_rgb = gct[bg] if (gct is not None and bg < len(gct)) else None
    frames = []
    transparent = None
    disposal = 0
    # post-display disposal of the PREVIOUS image block, applied just
    # before the next block draws: (method, left, top, iw, ih,
    # saved_region_rows) — saved rows only captured for method 3
    pending: tuple | None = None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise GifError("extension truncated")
            label = data[pos]
            pos += 1
            body, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(body) >= 4:
                flags = body[0]
                disposal = (flags >> 2) & 0x07
                transparent = body[3] if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise GifError(f"unknown block 0x{block:02x}")
        if pos + 9 > len(data):
            raise GifError("image descriptor truncated")
        left, top, iw, ih, ipk = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        ct = gct
        if ipk & 0x80:
            n = 2 << (ipk & 0x07)
            ct = [
                tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)
            ]
            if len(ct[-1]) != 3:
                raise GifError("local color table truncated")
            pos += 3 * n
        if ct is None:
            raise GifError("no color table in scope")
        if pos >= len(data):
            raise GifError("missing LZW minimum code size")
        mcs = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(mcs, lzw, iw * ih)
        if ipk & 0x40:
            idx = _deinterlace(idx, iw, ih)
        # The opaque background fill only applies before the first
        # frame, and only when that frame declares no transparency —
        # a transparent first frame over a bg-filled screen would
        # composite the fill into the output.
        if not frames and bg_rgb is not None and transparent is None:
            screen[:] = bytes(bg_rgb) * (w * h)
        # Apply the PREVIOUS frame's post-display disposal now, before
        # this block draws (GIF89a §23): method 2 restores its region
        # to the background color (black when no opaque background is
        # in scope — the deterministic no-alpha analogue of a
        # transparent clear), method 3 restores the pre-draw pixels.
        if pending is not None:
            pd, pl, pt, pw_, ph_, saved = pending
            if pd == 2:
                fill = bytes(bg_rgb) if bg_rgb is not None else b"\0\0\0"
                for y in range(ph_):
                    if pt + y >= h:
                        break
                    row = ((pt + y) * w + pl) * 3
                    ncols = min(pw_, w - pl)
                    if ncols > 0:
                        screen[row : row + 3 * ncols] = fill * ncols
            elif pd == 3 and saved is not None:
                for y, row_bytes in saved:
                    row = (y * w + pl) * 3
                    screen[row : row + len(row_bytes)] = row_bytes
            pending = None
        saved_rows = None
        if disposal == 3:
            saved_rows = []
            for y in range(ih):
                if top + y >= h:
                    break
                row = ((top + y) * w + left) * 3
                ncols = min(iw, w - left)
                if ncols > 0:
                    saved_rows.append(
                        (top + y, bytes(screen[row : row + 3 * ncols]))
                    )
        for y in range(ih):
            for x in range(iw):
                c = idx[y * iw + x]
                if transparent is not None and c == transparent:
                    continue
                if c >= len(ct):
                    raise GifError("pixel index outside color table")
                px = ((top + y) * w + (left + x)) * 3
                if top + y < h and left + x < w:
                    screen[px : px + 3] = bytes(ct[c])
        frames.append(bytes(screen))
        if disposal in (2, 3):
            pending = (disposal, left, top, iw, ih, saved_rows)
        transparent = None
        disposal = 0
    if not frames:
        raise GifError("no image block found")
    return w, h, frames


def decode_gif(data: bytes) -> tuple[int, int, int, int]:
    """Feature-decoder contract shared with the PNG/netpbm/JPEG
    codecs: ``(width, height, luma_sum, n_samples)`` over the FIRST
    composited frame (R,G,B samples, same convention as
    ``decode_ppm``)."""
    w, h, frames = decode_gif_frames(data)
    return w, h, sum(frames[0]), w * h * 3


def gif_frame_count(data: bytes) -> int:
    return len(decode_gif_frames(data)[2])


# ---------------------------------------------------------- encode


def encode_gif(
    width: int,
    height: int,
    frames: list[bytes],
    palette: list[tuple[int, int, int]],
    interlace: bool = False,
    delay_cs: int | None = None,
    disposals: list[int] | None = None,
) -> bytes:
    """GIF89a with REAL LZW: ``frames`` are full-size index rasters
    (one byte per pixel into ``palette``); multi-frame input emits an
    animation (one graphic-control extension per frame when
    ``delay_cs`` or ``disposals`` is given).  ``disposals`` sets each
    frame's GIF89a disposal method (0/1 draw-over, 2 restore to
    background, 3 restore to previous) in the graphic-control flags."""
    if not frames:
        raise ValueError("need at least one frame")
    if disposals is not None and len(disposals) != len(frames):
        raise ValueError("disposals length must match frames")
    npal = len(palette)
    if npal < 2 or npal > 256 or npal & (npal - 1):
        raise ValueError("palette size must be a power of two in [2,256]")
    for f in frames:
        if len(f) != width * height:
            raise ValueError("frame raster size mismatch")
        if max(f) >= npal:
            raise ValueError("index outside palette")
    depth = npal.bit_length() - 1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    for r, g, b in palette:
        out += bytes((r, g, b))
    mcs = max(2, depth)
    for fi, f in enumerate(frames):
        disp = disposals[fi] if disposals is not None else None
        if delay_cs is not None or disp is not None:
            if disp is not None and not 0 <= disp <= 3:
                raise ValueError("disposal method must be 0..3")
            flags = ((disp or 0) & 0x07) << 2
            out += (
                b"\x21\xf9\x04"
                + bytes([flags])
                + struct.pack("<H", delay_cs or 0)
                + b"\x00\x00"
            )
        ipk = 0x40 if interlace else 0x00
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, ipk)
        raster = _interlace(f, width, height) if interlace else f
        lzw = _lzw_encode(mcs, raster)
        out.append(mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)
