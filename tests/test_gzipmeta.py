"""Concatenated-gzip member walk (functions/gzipmeta.py) —
pure-Python, cross-validated against the stdlib gzip reader."""

import gzip
import io
import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ctgov_ai_etl_spark.functions.gzipmeta import (
    GzipError,
    build_gzip_members,
    parse_gzip_members,
)

BODIES = [b"first record", b"", b"third " * 100, bytes(range(256))]


def test_roundtrip_members():
    blob = build_gzip_members(BODIES)
    recs = parse_gzip_members(blob)
    assert [r["body"] for r in recs] == BODIES
    assert [r["n_bytes"] for r in recs] == [len(b) for b in BODIES]
    # members tile the payload exactly
    assert recs[0]["offset"] == 0
    for a, b in zip(recs, recs[1:]):
        assert b["offset"] == a["offset"] + a["compressed_size"]
    assert recs[-1]["offset"] + recs[-1]["compressed_size"] == len(blob)


def test_stdlib_gzip_agrees_on_concatenation():
    """RFC 1952 §2.2: a conforming reader inflates concatenated
    members to the concatenated payload — cross-check ours against
    the stdlib."""
    blob = build_gzip_members(BODIES)
    assert gzip.GzipFile(fileobj=io.BytesIO(blob)).read() == b"".join(BODIES)


def test_bad_magic_rejected():
    with pytest.raises(GzipError, match="magic"):
        parse_gzip_members(b"\x1f\x8c" + b"x" * 20)


def test_trailing_garbage_rejected():
    blob = build_gzip_members([b"ok"]) + b"not gzip"
    with pytest.raises(GzipError, match="magic"):
        parse_gzip_members(blob)


def test_truncated_member_rejected():
    blob = build_gzip_members([b"hello world, a body long enough"])
    with pytest.raises(GzipError, match="truncated|member at byte"):
        parse_gzip_members(blob[:-5])


def test_crc_mismatch_rejected():
    blob = bytearray(build_gzip_members([b"payload under test"]))
    # flip a bit in the stored CRC (first trailer word, 8 bytes from end)
    blob[-8] ^= 0x01
    with pytest.raises(GzipError, match="CRC|member at byte"):
        parse_gzip_members(bytes(blob))


def test_isize_mismatch_rejected():
    blob = bytearray(build_gzip_members([b"payload under test"]))
    blob[-4:] = struct.pack("<I", 999)
    with pytest.raises(GzipError, match="ISIZE|member at byte"):
        parse_gzip_members(bytes(blob))


def test_empty_payload_rejected():
    with pytest.raises(GzipError):
        parse_gzip_members(b"")


@settings(max_examples=100, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=600), min_size=1,
                max_size=10))
def test_property_roundtrip_and_crc(bodies):
    blob = build_gzip_members(bodies)
    recs = parse_gzip_members(blob)
    assert [r["body"] for r in recs] == bodies
    for r in recs:
        member = blob[r["offset"] : r["offset"] + r["compressed_size"]]
        crc, isize = struct.unpack("<II", member[-8:])
        assert crc == zlib.crc32(r["body"]) & 0xFFFFFFFF
        assert isize == r["n_bytes"] % (1 << 32)
