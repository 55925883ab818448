"""GIF codec: exact LZW round-trips (incl. dictionary reset and
KwKwK), interlacing, animation compositing, the public 1x1 vector,
malformed inputs, and dispatcher integration."""

from __future__ import annotations

import base64

import numpy as np
import pytest

from ctgov_ai_etl_spark.functions.gifcodec import (
    GifError,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
    gif_frame_count,
)

PAL16 = [(i * 16, i * 16, i * 16) for i in range(16)]
PAL256 = [(i, i, i) for i in range(256)]


def _expand(pal, idx):
    return b"".join(bytes(pal[i]) for i in idx)


def test_public_1x1_transparent_vector():
    tiny = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    w, h, frames = decode_gif_frames(tiny)
    assert (w, h, len(frames)) == (1, 1, 1)
    assert decode_gif(tiny) == (1, 1, 0, 3)


def test_roundtrip_matrix():
    rng = np.random.default_rng(5)
    for w, h, interlace, nf in [
        (7, 5, False, 1),
        (16, 16, True, 1),
        (9, 13, False, 3),
        (33, 17, True, 2),
        (1, 1, False, 1),
    ]:
        fs = [
            bytes(rng.integers(0, 16, size=w * h, dtype=np.uint8))
            for _ in range(nf)
        ]
        g = encode_gif(
            w, h, fs, PAL16, interlace=interlace,
            delay_cs=10 if nf > 1 else None,
        )
        W, H, dec = decode_gif_frames(g)
        assert (W, H, len(dec)) == (w, h, nf)
        for f_in, f_out in zip(fs, dec):
            assert f_out == _expand(PAL16, f_in)
        assert gif_frame_count(g) == nf


def test_dictionary_reset_roundtrip():
    """128x128 of 256-value noise forces the LZW dictionary past 4096
    (CLEAR-and-reset on both sides)."""
    rng = np.random.default_rng(11)
    big = bytes(rng.integers(0, 256, size=128 * 128, dtype=np.uint8))
    g = encode_gif(128, 128, [big], PAL256)
    assert decode_gif_frames(g)[2][0] == _expand(PAL256, big)


def test_kwkwk_case():
    """aaaa... streams hit the code==len(table) corner (KwKwK)."""
    run = bytes([1]) * 100 + bytes([2]) + bytes([1]) * 100
    enc = _lzw_encode(4, run)
    assert _lzw_decode(4, enc, len(run)) == run


def test_interlace_is_load_bearing():
    """Decoding an interlaced GIF as if sequential must scramble the
    raster: flip the interlace flag off and compare."""
    rng = np.random.default_rng(3)
    idx = bytes(rng.integers(0, 16, size=16 * 16, dtype=np.uint8))
    g = bytearray(encode_gif(16, 16, [idx], PAL16, interlace=True))
    # image descriptor starts right after header+LSD+GCT: find 0x2c
    pos = 13 + 3 * 16
    assert g[pos] == 0x2C
    assert g[pos + 9] & 0x40
    g[pos + 9] &= ~0x40  # lie about interlacing
    scrambled = decode_gif_frames(bytes(g))[2][0]
    assert scrambled != _expand(PAL16, idx)


def test_transparency_leaves_underlying_pixel():
    f1 = bytes([1]) * 4
    f2 = bytes([0, 2, 0, 2])  # 0 will be transparent in frame 2
    import struct

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 2, 0x80 | 1, 0, 0)
    for r, g, b in [(0, 0, 0), (10, 10, 10), (20, 20, 20), (0, 0, 0)]:
        out += bytes((r, g, b))
    for i, (f, transparent) in enumerate([(f1, None), (f2, 0)]):
        if transparent is not None:
            out += b"\x21\xf9\x04\x01\x00\x00" + bytes([transparent]) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        lzw = _lzw_encode(2, f)
        out += bytes([2, len(lzw)]) + lzw + b"\x00"
    out += b"\x3b"
    w, h, frames = decode_gif_frames(bytes(out))
    assert frames[0] == _expand([(0,) * 3, (10,) * 3, (20,) * 3, (0,) * 3], f1)
    # frame 2: transparent 0 keeps the (10,10,10) from frame 1
    assert frames[1] == bytes(
        [10, 10, 10, 20, 20, 20, 10, 10, 10, 20, 20, 20]
    )


def _build_gif(w, h, pal, bg, frame_specs):
    """Hand-built GIF89a with per-frame region/disposal/transparency —
    the test-side writer the disposal state machine is differential-
    tested against.  Each spec: (left, top, iw, ih, idx_bytes,
    disposal, transparent_or_None)."""
    import struct

    depth = len(pal).bit_length() - 1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), bg, 0)
    for rgb in pal:
        out += bytes(rgb)
    mcs = max(2, depth)
    for left, top, iw, ih, idx, disposal, transparent in frame_specs:
        flags = (disposal & 0x07) << 2
        tidx = 0
        if transparent is not None:
            flags |= 0x01
            tidx = transparent
        out += b"\x21\xf9\x04" + bytes([flags]) + b"\x00\x00" + bytes([tidx]) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", left, top, iw, ih, 0)
        lzw = _lzw_encode(mcs, idx)
        out.append(mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def _reference_composite(w, h, pal, bg, frame_specs):
    """Independent GIF89a compositor (numpy 2D, spec §23): returns
    the per-frame composited RGB rasters."""
    screen = np.zeros((h, w, 3), dtype=np.uint8)
    first = frame_specs[0]
    if first[6] is None:  # opaque first frame: background fill shows
        screen[:, :] = pal[bg]
    frames = []
    pending = None  # (disposal, region slice, saved copy)
    for left, top, iw, ih, idx, disposal, transparent in frame_specs:
        if pending is not None:
            pd, (ys, xs), saved = pending
            if pd == 2:
                screen[ys, xs] = pal[bg]
            elif pd == 3:
                screen[ys, xs] = saved
            pending = None
        ys = slice(top, min(top + ih, h))
        xs = slice(left, min(left + iw, w))
        saved = screen[ys, xs].copy() if disposal == 3 else None
        for y in range(ih):
            for x in range(iw):
                c = idx[y * iw + x]
                if transparent is not None and c == transparent:
                    continue
                if top + y < h and left + x < w:
                    screen[top + y, left + x] = pal[c]
        frames.append(screen.tobytes())
        if disposal in (2, 3):
            pending = (disposal, (ys, xs), saved)
    return frames


def test_disposal_restore_to_previous():
    """A disposal-3 frame's region reverts to its pre-draw pixels
    before the next frame draws: an all-transparent third frame must
    re-expose the FIRST frame's screen, not the second's."""
    pal = [(0, 0, 0), (10, 10, 10), (20, 20, 20), (30, 30, 30)]
    f1 = (0, 0, 2, 2, bytes([1, 1, 1, 1]), 0, None)
    f2 = (0, 0, 2, 2, bytes([2, 2, 2, 2]), 3, None)
    f3 = (0, 0, 2, 2, bytes([0, 0, 0, 0]), 0, 0)  # all transparent
    g = _build_gif(2, 2, pal, 0, [f1, f2, f3])
    _, _, frames = decode_gif_frames(g)
    assert frames[0] == bytes([10, 10, 10] * 4)
    assert frames[1] == bytes([20, 20, 20] * 4)
    assert frames[2] == frames[0]  # restored, NOT draw-over


def test_disposal_restore_to_background_region():
    """A disposal-2 frame's REGION (only) clears to the background
    color after display; pixels outside the region keep the prior
    frame's composite."""
    pal = [(5, 5, 5), (10, 10, 10), (20, 20, 20), (30, 30, 30)]
    f1 = (0, 0, 2, 2, bytes([1, 1, 1, 1]), 0, None)
    f2 = (1, 0, 1, 2, bytes([2, 2]), 2, None)  # right column, disposal 2
    f3 = (0, 0, 2, 2, bytes([0] * 4), 0, 0)  # all transparent
    g = _build_gif(2, 2, pal, 0, [f1, f2, f3])
    _, _, frames = decode_gif_frames(g)
    assert frames[1] == bytes([10, 10, 10, 20, 20, 20] * 2)
    # right column restored to bg color (5,5,5), left keeps frame 1
    assert frames[2] == bytes([10, 10, 10, 5, 5, 5] * 2)


def test_disposal_differential_random_animations():
    """Random multi-frame animations with random sub-regions,
    disposals 0-3 and transparency must match the independent
    reference compositor frame-for-frame."""
    rng = np.random.default_rng(1234)
    pal = PAL16
    for _ in range(25):
        w = int(rng.integers(2, 9))
        h = int(rng.integers(2, 9))
        specs = []
        for fi in range(int(rng.integers(2, 6))):
            if fi == 0 or rng.random() < 0.3:
                left = top = 0
                iw, ih = w, h
            else:
                left = int(rng.integers(0, w))
                top = int(rng.integers(0, h))
                iw = int(rng.integers(1, w - left + 1))
                ih = int(rng.integers(1, h - top + 1))
            idx = bytes(rng.integers(0, 16, size=iw * ih, dtype=np.uint8))
            disposal = int(rng.integers(0, 4))
            transparent = (
                int(rng.integers(0, 16)) if (fi > 0 and rng.random() < 0.5)
                else None
            )
            specs.append((left, top, iw, ih, idx, disposal, transparent))
        g = _build_gif(w, h, pal, 0, specs)
        got = decode_gif_frames(g)[2]
        want = _reference_composite(w, h, pal, 0, specs)
        assert got == want


def test_disposal_free_unchanged_vs_draw_over():
    """Property vs the draw-over baseline: on disposal-free (0/1)
    animations the new state machine is a no-op — every composited
    frame equals plain draw-over compositing."""
    rng = np.random.default_rng(77)
    for _ in range(10):
        w, h = int(rng.integers(2, 7)), int(rng.integers(2, 7))
        n = int(rng.integers(2, 5))
        rasters = [
            bytes(rng.integers(0, 16, size=w * h, dtype=np.uint8))
            for _ in range(n)
        ]
        disposals = [int(rng.integers(0, 2)) for _ in range(n)]
        g = encode_gif(w, h, rasters, PAL16, disposals=disposals)
        plain = encode_gif(w, h, rasters, PAL16)
        assert decode_gif_frames(g)[2] == decode_gif_frames(plain)[2]
        # draw-over reference: each frame independently expanded
        # (full-frame opaque rasters overwrite everything)
        assert decode_gif_frames(g)[2] == [
            _expand(PAL16, r) for r in rasters
        ]


def test_lzw_min_code_size_spec_cap():
    """GIF caps the LZW root size at 8 (256-entry palettes); 9-11
    only appear in malformed headers and must fail loudly."""
    for bad in (0, 1, 9, 10, 11, 12):
        with pytest.raises(GifError):
            _lzw_decode(bad, b"\x00", 1)


def test_malformed_inputs_raise():
    good = encode_gif(4, 4, [bytes(16)], PAL16)
    for bad in [
        b"",
        b"GIF8",
        b"GIF85" + good[5:],
        good[:10],
        good[:-5],
        good.replace(b"\x2c", b"\x2d", 1),
    ]:
        with pytest.raises((GifError, ValueError, IndexError)):
            decode_gif_frames(bad)


def test_encoder_rejects_bad_args():
    with pytest.raises(ValueError):
        encode_gif(2, 2, [], PAL16)
    with pytest.raises(ValueError):
        encode_gif(2, 2, [bytes(3)], PAL16)  # size mismatch
    with pytest.raises(ValueError):
        encode_gif(2, 2, [bytes(4)], PAL16[:3])  # non-power-of-two
    with pytest.raises(ValueError):
        encode_gif(2, 2, [bytes([99, 0, 0, 0])], PAL16)  # index range


def test_dispatcher_integration():
    from ctgov_ai_etl_spark.functions.imagecodec import decode_image_bytes

    idx = bytes([5]) * 24
    g = encode_gif(6, 4, [idx], PAL16)
    w, h, mean = decode_image_bytes(g)
    assert (w, h) == (6, 4)
    assert mean == round(80 / 255.0, 6)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 20),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_property(w, h, interlace, seed):
    """Any index raster round-trips exactly through real LZW +
    optional interlacing — the lossless-palette contract the
    mm_decode_gif oracle is built on."""
    rng = np.random.default_rng(seed)
    idx = bytes(rng.integers(0, 16, size=w * h, dtype=np.uint8))
    g = encode_gif(w, h, [idx], PAL16, interlace=interlace)
    assert decode_gif_frames(g)[2][0] == _expand(PAL16, idx)
