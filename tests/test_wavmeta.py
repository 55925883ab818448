"""RIFF/WAVE chunk walk: pad rule, fmt cross-checks, fail-loud.

Local-only (no Spark) — the Spark plumbing is covered by the
mm_audio_wav_meta oracle roundtrip in the driver harness.
"""

import struct

import pytest

from ctgov_ai_etl_spark.functions.wavmeta import (
    WavError,
    build_wav,
    parse_wav_meta,
    walk_riff_chunks,
)


def _blob(**over) -> bytes:
    kw = dict(
        sample_rate=22050,
        channels=2,
        bits=16,
        n_samples=1234,
        info_len=7,
        with_fact=False,
    )
    kw.update(over)
    return build_wav(**kw)


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("with_fact", [False, True])
def test_roundtrip(bits, channels, with_fact):
    meta = parse_wav_meta(
        _blob(bits=bits, channels=channels, with_fact=with_fact)
    )
    ba = channels * bits // 8
    assert meta["n_chunks"] == 4 + int(with_fact)
    assert meta["channels"] == channels
    assert meta["bits_per_sample"] == bits
    assert meta["block_align"] == ba
    assert meta["byte_rate"] == 22050 * ba
    assert meta["n_samples"] == 1234
    assert meta["data_bytes"] == 1234 * ba
    assert meta["duration_us"] == 1234 * 1_000_000 // 22050


@pytest.mark.parametrize("info_len", [7, 8])
@pytest.mark.parametrize("n_samples", [1233, 1234])
def test_pad_byte_rule(info_len, n_samples):
    """Odd-sized chunks (INAM text, 8-bit mono data) are followed by
    an unaccounted pad byte; the walk and the total must both honor
    it."""
    blob = _blob(
        bits=8, channels=1, info_len=info_len, n_samples=n_samples
    )
    meta = parse_wav_meta(blob)
    assert meta["data_bytes"] == n_samples
    assert meta["total_bytes"] == len(blob)
    expected = (
        12 + 24 + (20 + info_len + info_len % 2)
        + 8 + n_samples + n_samples % 2
    )
    assert len(blob) == expected


def test_riff_size_desync_rejected():
    blob = bytearray(_blob())
    blob[4:8] = struct.pack("<I", len(blob))  # lies by 8
    with pytest.raises(WavError, match="disagrees"):
        parse_wav_meta(bytes(blob))


def test_chunk_overrun_rejected():
    """A chunk size pointing past the enclosure must raise WavError,
    never parse short (the zipmeta fail-loud contract)."""
    blob = bytearray(_blob())
    # fmt chunk size field is at offset 16 (RIFF 12 + id 4)
    blob[16:20] = struct.pack("<I", 10_000_000)
    with pytest.raises(WavError, match="overruns"):
        parse_wav_meta(bytes(blob))


def test_truncated_header_rejected():
    with pytest.raises(WavError, match="truncated"):
        walk_riff_chunks(_blob()[:40], 12, 43)


def test_fmt_desync_rejected():
    """block_align inconsistent with channels*bits/8 is a lying
    header, not a tolerable variant."""
    blob = bytearray(_blob())
    # block_align is at fmt offset 20+12 = byte 32
    blob[32:34] = struct.pack("<H", 7)
    with pytest.raises(WavError, match="desync"):
        parse_wav_meta(bytes(blob))


def test_non_pcm_rejected():
    blob = bytearray(_blob())
    blob[20:22] = struct.pack("<H", 85)  # MP3-in-WAV
    with pytest.raises(WavError, match="codec seam"):
        parse_wav_meta(bytes(blob))


def test_fractional_frame_rejected():
    """data size not divisible by block_align cannot yield an exact
    sample count."""
    blob = bytearray(_blob(bits=16, channels=2))  # ba=4
    data_hdr = len(blob) - (8 + 1234 * 4)
    blob[data_hdr + 4 : data_hdr + 8] = struct.pack("<I", 1234 * 4 - 2)
    # shrink file to match the shrunk chunk (keep RIFF size honest)
    blob = blob[: len(blob) - 2]
    blob[4:8] = struct.pack("<I", len(blob) - 8)
    with pytest.raises(WavError, match="whole number"):
        parse_wav_meta(bytes(blob))


def test_not_riff_rejected():
    with pytest.raises(WavError, match="RIFF"):
        parse_wav_meta(b"OggS" + b"\x00" * 40)
