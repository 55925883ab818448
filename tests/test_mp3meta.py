"""MP3 frame-header metadata: encoder/parser round-trip and hostile
payloads (functions/mp3meta.py) — pure-Python, no Spark session."""

import pytest

from ctgov_ai_etl_spark.functions.mp3meta import (
    BITRATE_KBPS,
    SAMPLE_RATE,
    Mp3Error,
    encode_id3v2,
    encode_mp3_cbr,
    encode_mp3_header,
    frame_length,
    parse_mp3_meta,
)


def test_roundtrip_plain_cbr():
    blob = encode_mp3_cbr(
        bitrate_index=9, sample_rate_index=0, n_frames=7, pad_seed=1
    )
    m = parse_mp3_meta(blob)
    assert m["id3_bytes"] == 0
    assert m["n_frames"] == 7
    assert m["bitrate_kbps"] == 128
    assert m["sample_rate"] == 44100
    assert m["total_bytes"] == len(blob)
    # pad_seed=1 -> frames j with (1+j)%2==1 -> j even -> (7+1)//2 = 4
    assert m["n_padded"] == 4
    assert m["duration_us"] == 7 * 1152 * 1_000_000 // 44100


def test_roundtrip_with_id3_envelope():
    payload = bytes(range(200))
    blob = encode_mp3_cbr(
        bitrate_index=1,
        sample_rate_index=2,
        n_frames=5,
        pad_seed=0,
        id3_payload=payload,
    )
    m = parse_mp3_meta(blob)
    assert m["id3_bytes"] == 10 + 200
    assert m["n_frames"] == 5
    assert m["bitrate_kbps"] == 32
    assert m["sample_rate"] == 32000
    assert m["total_bytes"] == len(blob)
    # pad_seed=0 -> j odd padded -> 5//2 = 2
    assert m["n_padded"] == 2


@pytest.mark.parametrize("bidx", range(1, 15))
@pytest.mark.parametrize("sidx", range(3))
def test_frame_length_consistency_every_index(bidx, sidx):
    """Every (bitrate, sample-rate) cell: the parser's length-driven
    walk must land exactly on the next header the encoder wrote."""
    blob = encode_mp3_cbr(
        bitrate_index=bidx, sample_rate_index=sidx, n_frames=3, pad_seed=0
    )
    m = parse_mp3_meta(blob)
    assert m["n_frames"] == 3
    assert m["bitrate_kbps"] == BITRATE_KBPS[bidx]
    assert m["sample_rate"] == SAMPLE_RATE[sidx]
    assert m["total_bytes"] == len(blob)


def test_syncsafe_size_large_payload():
    # 300 bytes forces the 2-byte syncsafe split (300 = 2*128 + 44)
    blob = encode_id3v2(bytes(300)) + encode_mp3_cbr(2, 1, 2, 0)
    m = parse_mp3_meta(blob)
    assert m["id3_bytes"] == 310
    assert m["n_frames"] == 2


def test_truncated_frame_raises():
    blob = encode_mp3_cbr(9, 0, 3, 0)
    with pytest.raises(Mp3Error, match="overruns|truncated"):
        parse_mp3_meta(blob[:-10])


def test_lost_sync_raises():
    blob = bytearray(encode_mp3_cbr(9, 0, 2, 0))
    flen = frame_length(128, 44100, 0)  # frame 0 unpadded (seed 0, j=0)
    blob[flen] = 0x00  # corrupt the second frame's sync byte
    with pytest.raises(Mp3Error, match="lost frame sync"):
        parse_mp3_meta(bytes(blob))


def test_mixed_bitrate_rejected_as_vbr():
    a = encode_mp3_cbr(9, 0, 1, 1)  # unpadded single frame, 128 kbps
    b = encode_mp3_cbr(10, 0, 1, 1)  # 160 kbps
    with pytest.raises(Mp3Error, match="CBR contract"):
        parse_mp3_meta(a + b)


def test_no_frames_rejected():
    with pytest.raises(Mp3Error):
        parse_mp3_meta(encode_id3v2(b"tag-only"))


def test_bad_indices_rejected():
    with pytest.raises(Mp3Error):
        encode_mp3_header(0, 0, 0)  # free-format bitrate not supported
    with pytest.raises(Mp3Error):
        encode_mp3_header(15, 0, 0)
    with pytest.raises(Mp3Error):
        encode_mp3_header(5, 3, 0)  # reserved sample-rate index


def test_filler_bytes_never_fake_a_sync():
    """The deterministic filler is mod-251 so no 0xFF bytes exist in
    frame bodies — the only sync-pattern bytes in the payload are the
    real headers, which is what lets the walk's arithmetic be asserted
    in isolation."""
    blob = encode_mp3_cbr(14, 1, 4, 0)
    m = parse_mp3_meta(blob)
    assert m["n_frames"] == 4
    header_offsets = set()
    pos = 0
    for j in range(4):
        header_offsets.add(pos)
        pos += frame_length(320, 48000, (0 + j) % 2)
    assert pos == len(blob)
    for i in range(len(blob)):
        if blob[i] == 0xFF:
            assert i in header_offsets


# --------------------------------------------------- property tests

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=14),
    st.integers(min_value=0, max_value=2),
    st.integers(min_value=1, max_value=60),
    st.integers(min_value=0, max_value=255),
    st.one_of(st.none(), st.binary(min_size=0, max_size=300)),
)
def test_mp3_meta_total_roundtrip(bidx, sidx, nf, seed, id3):
    blob = encode_mp3_cbr(bidx, sidx, nf, seed, id3_payload=id3)
    m = parse_mp3_meta(blob)
    assert m["n_frames"] == nf
    assert m["bitrate_kbps"] == BITRATE_KBPS[bidx]
    assert m["sample_rate"] == SAMPLE_RATE[sidx]
    assert m["total_bytes"] == len(blob)
    assert m["id3_bytes"] == (0 if id3 is None else 10 + len(id3))
    assert m["n_padded"] == sum((seed + j) % 2 for j in range(nf))
    assert m["duration_us"] == nf * 1152 * 1_000_000 // SAMPLE_RATE[sidx]


def test_frame_filler_vectorization_bit_identical():
    """The numpy-broadcast filler must reproduce the original per-byte
    generator exactly (renderer vectorization, r15): same (j*31+k*7)
    % 251 frame bodies, same (k*17) % 256 ID3 payload bytes."""
    import numpy as np

    for j in (0, 1, 7, 23):
        for body in (0, 1, 413, 1440):
            old = bytes(((j * 31 + k * 7) % 251) for k in range(body))
            new = (
                ((j * 31 + 7 * np.arange(body, dtype=np.int64)) % 251)
                .astype(np.uint8)
                .tobytes()
            )
            assert old == new
    for n in (0, 1, 137, 255):
        assert bytes((k * 17) % 256 for k in range(n)) == (
            ((17 * np.arange(n, dtype=np.int64)) % 256)
            .astype(np.uint8)
            .tobytes()
        )
