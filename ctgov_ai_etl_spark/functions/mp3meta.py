"""MP3 (MPEG-1 Layer III) frame-HEADER parsing — metadata extraction
without decoding audio, stdlib-pure.

A real 100 TB crawl's audio corpus is mostly MP3; curation needs
duration / bitrate / sample-rate / frame counts long before it needs
PCM.  Those live entirely in the 4-byte frame headers and the optional
ID3v2 envelope, so metadata-level parsing stays within the container's
no-native-libs constraint while exercising every structural hazard a
real file has: the ID3v2 syncsafe-size skip, the 11-bit frame sync,
the bitrate/sample-rate index tables, the per-frame padding bit, and
the exact Layer III frame-length recurrence

    frame_len = 144000 * bitrate_kbps // sample_rate + padding

(MPEG-1 Layer III: 1152 samples per frame, slot size 1 byte).  Full
PCM decode (Huffman + IMDCT + synthesis filterbank) remains behind the
documented native-codec seam in functions/imagecodec.py — this module
is the metadata half that unlocks audio-corpus curation queries.

Encoder + parser live together (render_test_mp3 in
operators/multimodal.py synthesizes via encode_mp3_cbr) so the oracle
replays the closed-form parameters while the engine walks real bytes:
any defect in either the frame-length math, the sync scan, or the
syncsafe ID3 skip breaks the end-to-end hash match.

Reference behavioral contract: the reference repo has no audio path at
all (/root/reference/etl.py is a REST+LLM ETL); this is part of the
beyond-reference data-pipeline surface SURVEY.md §2.3 tracks.
"""

from __future__ import annotations

import struct


class Mp3Error(ValueError):
    """Malformed MP3 payload (bad sync, truncated frame, bad index)."""


# MPEG-1 Layer III bitrate table, index 1..14 (0 = free, 15 = bad).
BITRATE_KBPS = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
# MPEG-1 sample-rate table, index 0..2 (3 = reserved).
SAMPLE_RATE = (44100, 48000, 32000)
SAMPLES_PER_FRAME = 1152


def frame_length(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    """Exact MPEG-1 Layer III frame size in bytes (header included)."""
    return 144_000 * bitrate_kbps // sample_rate + padding


def encode_mp3_header(
    bitrate_index: int, sample_rate_index: int, padding: int
) -> bytes:
    """4-byte MPEG-1 Layer III frame header: 11-bit sync, version 11
    (MPEG-1), layer 01 (III), no CRC, mono, no emphasis."""
    if not 1 <= bitrate_index <= 14:
        raise Mp3Error(f"bitrate index {bitrate_index} out of range 1..14")
    if not 0 <= sample_rate_index <= 2:
        raise Mp3Error(f"sample-rate index {sample_rate_index} not in 0..2")
    b0 = 0xFF
    b1 = 0b1111_1011  # sync tail 111, version MPEG-1 (11), layer III (01),
    #                   protection off (1)
    b2 = (bitrate_index << 4) | (sample_rate_index << 2) | (padding << 1)
    b3 = 0b1100_0000  # mono channel mode, no mode ext / copyright /
    #                   original / emphasis
    return bytes((b0, b1, b2, b3))


def encode_id3v2(payload: bytes) -> bytes:
    """Minimal ID3v2.3 envelope: 'ID3', version, flags 0, syncsafe
    length, raw payload (tag frames are opaque to the parser — only
    the envelope walk matters for metadata extraction)."""
    n = len(payload)
    if n >= 1 << 28:
        raise Mp3Error("ID3v2 payload too large for syncsafe size")
    size = bytes(
        ((n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F)
    )
    return b"ID3" + bytes((3, 0, 0)) + size + payload


def encode_mp3_cbr(
    bitrate_index: int,
    sample_rate_index: int,
    n_frames: int,
    pad_seed: int,
    id3_payload: bytes | None = None,
) -> bytes:
    """Constant-bitrate MPEG-1 Layer III frame sequence with a
    deterministic padding pattern (frame j padded iff
    (pad_seed + j) % 2 == 1) and deterministic filler bytes, optionally
    wrapped in an ID3v2.3 envelope.  Real headers, fake audio payload —
    exactly what metadata parsing is and isn't sensitive to."""
    import numpy as np

    out = bytearray()
    if id3_payload is not None:
        out += encode_id3v2(id3_payload)
    br = BITRATE_KBPS[bitrate_index]
    sr = SAMPLE_RATE[sample_rate_index]
    for j in range(n_frames):
        padding = (pad_seed + j) % 2
        flen = frame_length(br, sr, padding)
        out += encode_mp3_header(bitrate_index, sample_rate_index, padding)
        body = flen - 4
        # deterministic non-0xFF filler so a sloppy sync scan that
        # ignores frame lengths cannot accidentally resync correctly —
        # numpy broadcast of the same (j*31 + k*7) % 251 formula (byte-
        # identical to the per-byte loop it replaces: values < 251 fit
        # uint8 exactly; verified against the old generator), because a
        # ~1 KB-per-frame Python byte loop dominated the whole query at
        # sf0.1 (the same renderer-loop bug fixed for WAV/MP4/PDF).
        out += (
            ((j * 31 + 7 * np.arange(body, dtype=np.int64)) % 251)
            .astype(np.uint8)
            .tobytes()
        )
    return bytes(out)


def parse_mp3_meta(data: bytes) -> dict:
    """Walk the container structurally and return exact-integer
    metadata:

    ``id3_bytes``  — ID3v2 envelope size skipped (0 when absent),
    ``n_frames``   — frames counted by the length-driven walk,
    ``bitrate_kbps`` / ``sample_rate`` — from the FIRST header; every
                     subsequent header must agree (CBR check) or
                     Mp3Error,
    ``total_bytes``— bytes consumed by envelope + frames (== len(data)
                     for a well-formed file),
    ``n_padded``   — frames with the padding bit set,
    ``duration_us``— n_frames * 1152 * 1_000_000 // sample_rate, exact
                     integer microseconds so SQL replays it without
                     float drift.

    The walk is length-driven (next header at prev + frame_len), not a
    byte-wise sync hunt — a wrong frame-length computation lands off a
    real header and fails loudly instead of miscounting quietly."""
    pos = 0
    id3_bytes = 0
    if data[:3] == b"ID3":
        if len(data) < 10:
            raise Mp3Error("truncated ID3v2 header")
        s = data[6:10]
        if any(b & 0x80 for b in s):
            raise Mp3Error("ID3v2 size bytes not syncsafe")
        id3_bytes = 10 + ((s[0] << 21) | (s[1] << 14) | (s[2] << 7) | s[3])
        pos = id3_bytes
    n_frames = 0
    n_padded = 0
    bitrate = sample_rate = None
    while pos < len(data):
        if pos + 4 > len(data):
            raise Mp3Error(f"truncated frame header at byte {pos}")
        b0, b1, b2, _b3 = struct.unpack_from("BBBB", data, pos)
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise Mp3Error(f"lost frame sync at byte {pos}")
        if (b1 & 0x18) != 0x18 or (b1 & 0x06) != 0x02:
            raise Mp3Error(f"not MPEG-1 Layer III at byte {pos}")
        bidx = b2 >> 4
        sidx = (b2 >> 2) & 0x3
        padding = (b2 >> 1) & 0x1
        if not 1 <= bidx <= 14:
            raise Mp3Error(f"bad bitrate index {bidx} at byte {pos}")
        if sidx > 2:
            raise Mp3Error(f"reserved sample-rate index at byte {pos}")
        br, sr = BITRATE_KBPS[bidx], SAMPLE_RATE[sidx]
        if bitrate is None:
            bitrate, sample_rate = br, sr
        elif (br, sr) != (bitrate, sample_rate):
            raise Mp3Error(
                f"VBR/mixed stream at byte {pos}: ({br},{sr}) after "
                f"({bitrate},{sample_rate}) — CBR contract violated"
            )
        flen = frame_length(br, sr, padding)
        if pos + flen > len(data):
            raise Mp3Error(f"frame at byte {pos} overruns payload")
        n_frames += 1
        n_padded += padding
        pos += flen
    if n_frames == 0:
        raise Mp3Error("no MP3 frames found")
    return {
        "id3_bytes": id3_bytes,
        "n_frames": n_frames,
        "bitrate_kbps": bitrate,
        "sample_rate": sample_rate,
        "total_bytes": pos,
        "n_padded": n_padded,
        "duration_us": n_frames * SAMPLES_PER_FRAME * 1_000_000
        // sample_rate,
    }
