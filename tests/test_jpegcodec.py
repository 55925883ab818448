"""Baseline JPEG codec: exact DC round-trips, AC path vs a numpy
reference, subsampling, restart markers, malformed inputs, and the
Spark-side decode query plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ctgov_ai_etl_spark.functions.jpegcodec import (
    _DCT_M,
    JpegError,
    decode_jpeg,
    decode_jpeg_pixels,
    encode_jpeg_baseline,
)


def test_constant_gray_roundtrips_exactly():
    for v in (0, 1, 77, 128, 200, 255):
        raster = bytes([v]) * 128
        w, h, ch, out = decode_jpeg_pixels(
            encode_jpeg_baseline(16, 8, raster)
        )
        assert (w, h, ch) == (16, 8, 1)
        assert out == raster


def test_constant_blocks_dc_differential_exact():
    """Each 8x8 block a different constant: the DC differentials swing
    across Huffman magnitude categories and must all reconstruct."""
    w, h = 32, 24
    arr = np.zeros((h, w), dtype=np.uint8)
    for b in range(12):
        by, bx = divmod(b, 4)
        arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (17 * b + 5) % 256
    W, H, s, n = decode_jpeg(encode_jpeg_baseline(w, h, arr.tobytes()))
    assert (W, H, n) == (w, h, w * h)
    assert s == int(arr.sum())


def test_random_image_matches_numpy_reference():
    """Decoder output must equal IDCT(round(DCT(img))) computed by an
    independent numpy path — validates zigzag, the full AC run-length
    alphabet, bit packing, and IDCT scaling, not just DC."""
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    _, _, _, out = decode_jpeg_pixels(
        encode_jpeg_baseline(24, 16, img.tobytes())
    )
    dec = np.frombuffer(out, dtype=np.uint8).reshape(16, 24)
    ref = np.zeros((16, 24))
    for by in range(2):
        for bx in range(3):
            blk = (
                img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(
                    np.float64
                )
                - 128.0
            )
            qc = np.rint(_DCT_M.T @ blk @ _DCT_M)
            ref[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                _DCT_M @ qc @ _DCT_M.T
            )
    ref = np.clip(np.rint(ref) + 128, 0, 255).astype(np.uint8)
    assert np.array_equal(dec, ref)


def test_lossy_quant_restart_and_odd_dims():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
    quant = bytes(min(255, 1 + z) for z in range(64))
    jpg = encode_jpeg_baseline(
        21, 13, img.tobytes(), quant=quant, restart_interval=2
    )
    w, h, ch, out = decode_jpeg_pixels(jpg)
    assert (w, h, ch) == (21, 13, 1)
    dec = np.frombuffer(out, dtype=np.uint8).reshape(13, 21)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 30


def test_restart_predictor_reset_is_load_bearing():
    """Multi-block image with restart_interval=1 (an RST marker and
    a DC-predictor reset between EVERY pair of blocks): the encoder
    emits each block's DC relative to a reset predictor, so a
    decoder that failed to reset its predictors would reconstruct
    every post-RST block with a cumulative DC offset — exact
    reconstruction here proves the reset is actually applied
    (ADVICE r10: the old form never exercised a multi-block
    stream)."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
    # constant per 8x8 block so the flat quant table round-trips
    # exactly; block means differ so predictors matter
    for by in range(2):
        for bx in range(3):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = img[by * 8, bx * 8]
    jpg = encode_jpeg_baseline(24, 16, img.tobytes(), restart_interval=1)
    assert b"\xff\xdd" in jpg
    assert any(bytes((0xFF, 0xD0 + i)) in jpg for i in range(8))
    w, h, ch, out = decode_jpeg_pixels(jpg)
    assert (w, h, ch) == (24, 16, 1)
    dec = np.frombuffer(out, dtype=np.uint8).reshape(16, 24)
    assert np.array_equal(dec, img)


def test_encoder_rejects_out_of_table_coefficients():
    """An AC coefficient beyond |1023| has no Annex K symbol and
    must surface as a clear ValueError, not a bare KeyError
    (ADVICE r10).  Unreachable through encode_jpeg_baseline itself —
    the orthonormal DCT of a [-128,127] block tops out near |928|
    AC — so the guard is exercised at the block encoder directly."""
    from ctgov_ai_etl_spark.functions.jpegcodec import (
        _AC_LUMA_BITS,
        _AC_LUMA_VALS,
        _BitWriter,
        _DC_LUMA_BITS,
        _DC_LUMA_VALS,
        _build_huffman,
        _encode_block,
        _encode_table,
    )

    dc_tab = _encode_table(_build_huffman(_DC_LUMA_BITS, _DC_LUMA_VALS))
    ac_tab = _encode_table(_build_huffman(_AC_LUMA_BITS, _AC_LUMA_VALS))
    coef = np.zeros((8, 8))
    coef[0, 1] = 1500.0
    with pytest.raises(ValueError, match="Annex K"):
        _encode_block(_BitWriter(), coef, 0, dc_tab, ac_tab)
    coef2 = np.zeros((8, 8))
    coef2[0, 0] = 5000.0  # DC diff category 13 > table max 11
    with pytest.raises(ValueError, match="Annex K"):
        _encode_block(_BitWriter(), coef2, 0, dc_tab, ac_tab)


def test_color_444_and_420_constant_roundtrip():
    for sub in ("444", "420"):
        for w, h in ((16, 16), (17, 9)):
            ycc = np.zeros((h, w, 3), dtype=np.uint8)
            ycc[:, :, 0] = 120
            ycc[:, :, 1] = 64
            ycc[:, :, 2] = 200
            jpg = encode_jpeg_baseline(
                w, h, ycc.tobytes(), channels=3, subsampling=sub
            )
            W, H, ch, out = decode_jpeg_pixels(jpg)
            assert (W, H, ch) == (w, h, 3)
            dec = np.frombuffer(out, dtype=np.uint8).reshape(h, w, 3)
            yv, cb, cr = 120.0, 64.0 - 128, 200.0 - 128
            exp = [
                int(np.clip(np.rint(x), 0, 255))
                for x in (
                    yv + 1.402 * cr,
                    yv - 0.344136 * cb - 0.714136 * cr,
                    yv + 1.772 * cb,
                )
            ]
            assert (dec == np.array(exp, dtype=np.uint8)).all()


def test_malformed_inputs_raise():
    good = encode_jpeg_baseline(8, 8, bytes(64))
    bad_cases = [
        b"",  # empty
        b"\xff\xd8",  # SOI only
        good[:20],  # truncated headers
        good[:-20],  # truncated entropy stream loses EOB budget
        # SOF2 with a baseline scan script: progressive DC scans
        # must have Se=0 (T.81 G.1), so this is malformed
        good.replace(b"\xff\xc0", b"\xff\xc2", 1),
    ]
    for bad in bad_cases:
        with pytest.raises((JpegError, ValueError, NotImplementedError)):
            decode_jpeg(bad)


def test_encoder_rejects_bad_args():
    with pytest.raises(ValueError):
        encode_jpeg_baseline(8, 8, bytes(63))
    with pytest.raises(ValueError):
        encode_jpeg_baseline(8, 8, bytes(64), channels=2)
    with pytest.raises(ValueError):
        encode_jpeg_baseline(8, 8, bytes(64), quant=bytes(64))  # zeros
    with pytest.raises(ValueError):
        encode_jpeg_baseline(8, 8, bytes(64), subsampling="422x")


@settings(max_examples=25, deadline=None)
@given(
    w8=st.integers(1, 3),
    h8=st.integers(1, 3),
    v=st.integers(0, 255),
    step=st.integers(0, 255),
)
def test_constant_block_grid_property(w8, h8, v, step):
    """Any grid of constant blocks round-trips exactly under the flat
    quant table — the property the mm_decode_jpeg oracle relies on."""
    w, h = 8 * w8, 8 * h8
    arr = np.zeros((h, w), dtype=np.uint8)
    for b in range(w8 * h8):
        by, bx = divmod(b, w8)
        arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (v + step * b) % 256
    W, H, s, n = decode_jpeg(encode_jpeg_baseline(w, h, arr.tobytes()))
    assert (W, H, n) == (w, h, w * h)
    assert s == int(arr.sum())


# ------------------------------------------------- progressive (SOF2)


def _prog_cases():
    q = bytes(min(255, 1 + z) for z in range(64))
    return [
        (8, 8, 1, "444", None, 0),
        (21, 13, 1, "444", q, 0),
        (24, 16, 1, "444", None, 3),  # restarts inside every scan
        (16, 16, 3, "444", None, 0),
        (17, 9, 3, "420", bytes([2] * 64), 0),
        (32, 24, 3, "420", q, 2),
    ]


def test_progressive_decode_matches_baseline_decode():
    """Progressive and baseline encoders quantize identically, so
    their decodes must match BIT-FOR-BIT on random images — this
    pins the whole SOF2 surface: spectral-selection bands, DC/AC
    successive approximation, EOB-run coding, buffered correction
    bits, per-scan restart markers, and subsampled component walks."""
    from ctgov_ai_etl_spark.functions.jpegcodec import (
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(3)
    for w, h, ch, sub, q, rst in _prog_cases():
        img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        base = encode_jpeg_baseline(
            w, h, img.tobytes(), channels=ch, quant=q, subsampling=sub
        )
        prog = encode_jpeg_progressive(
            w,
            h,
            img.tobytes(),
            channels=ch,
            quant=q,
            restart_interval=rst,
            subsampling=sub,
        )
        assert b"\xff\xc2" in prog and b"\xff\xc2" not in base
        assert prog.count(b"\xff\xda") > base.count(b"\xff\xda")
        assert decode_jpeg_pixels(prog) == decode_jpeg_pixels(base), (
            w,
            h,
            ch,
            sub,
            rst,
        )


def test_progressive_constant_blocks_exact():
    """Constant 8x8 blocks under the flat quant table are DC-only and
    round-trip EXACTLY through the progressive path too (DC first
    pass at Al=1 plus one refinement bit reassembles the full DC) —
    the property the mm_decode_jpeg_progressive oracle relies on."""
    from ctgov_ai_etl_spark.functions.jpegcodec import (
        encode_jpeg_progressive,
    )

    arr = np.zeros((16, 24), dtype=np.uint8)
    for b in range(6):
        by, bx = divmod(b, 3)
        arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (37 + 41 * b) % 256
    jpg = encode_jpeg_progressive(24, 16, arr.tobytes())
    w, h, s, n = decode_jpeg(jpg)
    assert (w, h, n) == (24, 16, 24 * 16)
    assert s == int(arr.sum())


def test_progressive_truncation_raises():
    from ctgov_ai_etl_spark.functions.jpegcodec import (
        encode_jpeg_progressive,
    )

    jpg = encode_jpeg_progressive(16, 16, bytes(range(256)))
    for cut in (40, len(jpg) // 2, len(jpg) - 10):
        with pytest.raises((JpegError, ValueError)):
            decode_jpeg(jpg[:cut])


def test_multiscan_sequential_decodes():
    """A SOF0 file whose components arrive in SEPARATE sequential
    scans (legal baseline-process JPEG; the r10 ADVICE seam) now
    routes through the coefficient-domain path and must decode
    identically to the single-scan interleaved encoding."""
    from ctgov_ai_etl_spark.functions import jpegcodec as jc

    rng = np.random.default_rng(5)
    w, h = 16, 8
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    q = b"\x01" * 64

    # headers: SOF0 + all four Annex K tables, then one SOS per comp
    import struct

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + q
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for c in range(3):
        sof += bytes((c + 1, 0x11, 0))
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tid, bits, vals in (
        (0x00, jc._DC_LUMA_BITS, jc._DC_LUMA_VALS),
        (0x10, jc._AC_LUMA_BITS, jc._AC_LUMA_VALS),
        (0x01, jc._DC_CHROMA_BITS, jc._DC_CHROMA_VALS),
        (0x11, jc._AC_CHROMA_BITS, jc._AC_CHROMA_VALS),
    ):
        body = bytes([tid]) + bits + vals
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    qmat = np.ones((8, 8))
    for c in range(3):
        plane = img[:, :, c].astype(np.float64)
        grid = jc._quantized_blocks(plane, qmat, h // 8, w // 8)
        sos = bytes((1, c + 1, 0x00 if c == 0 else 0x11, 0, 63, 0))
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        bw = jc._BitWriter()
        dc_tab = jc._encode_table(
            jc._build_huffman(
                *(
                    (jc._DC_LUMA_BITS, jc._DC_LUMA_VALS)
                    if c == 0
                    else (jc._DC_CHROMA_BITS, jc._DC_CHROMA_VALS)
                )
            )
        )
        ac_tab = jc._encode_table(
            jc._build_huffman(
                *(
                    (jc._AC_LUMA_BITS, jc._AC_LUMA_VALS)
                    if c == 0
                    else (jc._AC_CHROMA_BITS, jc._AC_CHROMA_VALS)
                )
            )
        )
        pred = 0
        for by in range(h // 8):
            for bx in range(w // 8):
                spatial = np.zeros(64)
                for k in range(64):
                    spatial[jc.ZIGZAG[k]] = grid[by, bx, k]
                pred = jc._encode_block(
                    bw, spatial.reshape(8, 8), pred, dc_tab, ac_tab
                )
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"

    single = encode_jpeg_baseline(w, h, img.tobytes(), channels=3)
    assert decode_jpeg_pixels(bytes(out)) == decode_jpeg_pixels(single)


def test_dispatch_from_imagecodec():
    from ctgov_ai_etl_spark.functions.imagecodec import (
        decode_image_bytes,
        decode_image_pixels,
    )

    jpg = encode_jpeg_baseline(8, 8, bytes([100]) * 64)
    w, h, mean = decode_image_bytes(jpg)
    assert (w, h) == (8, 8)
    assert mean == round(100 / 255.0, 6)
    assert decode_image_pixels(jpg)[3] == bytes([100]) * 64


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_progressive_equals_baseline_property(w, h, seed):
    """Random grayscale images: the progressive decode must equal the
    baseline decode bit-for-bit at any geometry (both encoders
    quantize identically; the decoders must agree on every Huffman,
    band, and refinement path)."""
    from ctgov_ai_etl_spark.functions.jpegcodec import (
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    base = encode_jpeg_baseline(w, h, img.tobytes())
    prog = encode_jpeg_progressive(w, h, img.tobytes())
    assert decode_jpeg_pixels(prog) == decode_jpeg_pixels(base)
