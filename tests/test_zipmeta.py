"""ZIP central-directory walk (functions/zipmeta.py) — pure-Python,
cross-validated against the stdlib zipfile reader."""

import io
import zipfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ctgov_ai_etl_spark.functions.zipmeta import (
    ZipError,
    build_zip,
    parse_zip_entries,
)

ENTRIES = [
    ("00042-0.txt", b"hello zip"),
    ("00042-1.txt", b""),
    ("dir/00043.bin", bytes(range(256)) * 3),
]


def test_roundtrip_entries():
    recs = parse_zip_entries(build_zip(ENTRIES), include_content=True)
    assert [(r["name"], r["content"]) for r in recs] == ENTRIES
    assert [r["n_bytes"] for r in recs] == [9, 0, 768]


def test_local_offsets_are_closed_form():
    recs = parse_zip_entries(build_zip(ENTRIES))
    # STORED: local header = 30 + name_len, then content verbatim
    offs, pos = [], 0
    for name, content in ENTRIES:
        offs.append(pos)
        pos += 30 + len(name) + len(content)
    assert [r["local_offset"] for r in recs] == offs


def test_stdlib_zipfile_reads_our_archives():
    zf = zipfile.ZipFile(io.BytesIO(build_zip(ENTRIES)))
    assert [(i.filename, i.file_size) for i in zf.infolist()] == [
        (n, len(c)) for n, c in ENTRIES
    ]
    for name, content in ENTRIES:
        assert zf.read(name) == content
    assert zf.testzip() is None  # stdlib CRC pass over every member


def test_crc_mismatch_rejected():
    blob = bytearray(build_zip([("a.txt", b"payload body")]))
    # corrupt one payload byte after the 30+5-byte local header
    blob[35 + 3] ^= 0xFF
    with pytest.raises(ZipError, match="CRC"):
        parse_zip_entries(bytes(blob))


def test_missing_eocd_rejected():
    with pytest.raises(ZipError, match="end-of-central-directory"):
        parse_zip_entries(b"PK\x03\x04 not a real archive")


def test_truncated_cd_rejected():
    blob = build_zip(ENTRIES)
    # drop bytes from the middle (central directory region)
    cut = blob[: len(blob) - 40] + blob[len(blob) - 22 :]
    with pytest.raises(ZipError):
        parse_zip_entries(cut)


def test_truncated_last_cd_entry_raises_ziperror_not_struct_error():
    """A central directory whose cd_size lies but whose LAST entry's
    fixed header (or name) runs past the archive end must fail with
    the module's ZipError, not leak struct.error / silent short
    slices (ADVICE r14)."""
    blob = bytearray(build_zip([("a.txt", b"x"), ("b.txt", b"yy")]))
    # EOCD is the last 22 bytes; cd_size is the 4 bytes at EOCD+12.
    # Inflate cd_size so the walk expects a third entry starting in
    # the EOCD region: its fixed 46-byte header overruns the blob.
    import struct as _s

    eocd = len(blob) - 22
    (cd_size,) = _s.unpack("<I", blob[eocd + 12 : eocd + 16])
    blob[eocd + 8 : eocd + 12] = _s.pack("<HH", 3, 3)  # n_here/n_total: 2 -> 3
    with pytest.raises(ZipError, match="truncated|magic"):
        parse_zip_entries(bytes(blob))
    assert cd_size > 0


def test_name_mismatch_rejected():
    blob = bytearray(build_zip([("abc.txt", b"x")]))
    blob[30:33] = b"zzz"  # local header name; CD still says abc
    with pytest.raises(ZipError, match="mismatch"):
        parse_zip_entries(bytes(blob))


def test_deflate_member_rejected_loudly():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("d.txt", b"deflate me " * 40)
    with pytest.raises(ZipError, match="STORED"):
        parse_zip_entries(buf.getvalue())


def test_stdlib_stored_archive_parses():
    """Symmetric cross-validation: archives the stdlib writes with
    method STORED parse with our walk."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("s1.txt", b"stdlib stored one")
        zf.writestr("s2.txt", b"stdlib stored two")
    recs = parse_zip_entries(buf.getvalue(), include_content=True)
    assert [r["name"] for r in recs] == ["s1.txt", "s2.txt"]
    assert recs[0]["content"] == b"stdlib stored one"


@settings(max_examples=100, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=800), min_size=1,
                max_size=8))
def test_property_roundtrip_and_stdlib_agreement(bodies):
    entries = [(f"e{i:03d}.bin", b) for i, b in enumerate(bodies)]
    blob = build_zip(entries)
    recs = parse_zip_entries(blob, include_content=True)
    assert [(r["name"], r["content"]) for r in recs] == entries
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert zf.testzip() is None
    assert [(i.filename, i.file_size) for i in zf.infolist()] == [
        (n, len(c)) for n, c in entries
    ]
