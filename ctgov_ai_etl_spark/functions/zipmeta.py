"""ZIP central-directory walk — the remaining mainstream dataset
container (APPNOTE.TXT / PKZIP format), stdlib-pure and struct-level.

A ZIP archive is read BACKWARDS: scan from the end for the
end-of-central-directory record (PK\\x05\\x06), which locates the
central directory; each CD entry (PK\\x01\\x02) carries the metadata
plus the offset of its local header (PK\\x03\\x04).  This walk is the
reason ZIP supports random access without inflating anything — the
same seekability story as `.warc.gz` members and tar blocks, with the
index at the END instead of inline.

The builder writes STORED (method 0) entries so every byte offset is
closed-form: local header = 30 + name_len, data = content verbatim —
the SQL oracle replays local-header offsets as a running sum, and the
parser cross-checks each CD entry against its local header (magic,
name equality) and the payload against the stored CRC-32.  DEFLATE
members would make offsets compressor-dependent; the gzip walk
(functions/gzipmeta.py) already covers that regime, so this module
stays in the byte-exact one.  Parser is deliberately not the stdlib
``zipfile`` (tests cross-validate against it) — the framing IS what
the differential checks.

Reference behavioral contract: none in the reference (REST+LLM ETL);
beyond-reference source surface, SURVEY.md §2.3.
"""

from __future__ import annotations

import struct
import zlib

LOCAL_MAGIC = b"PK\x03\x04"
CD_MAGIC = b"PK\x01\x02"
EOCD_MAGIC = b"PK\x05\x06"


class ZipError(ValueError):
    """Malformed ZIP payload (bad magic, CRC, or directory)."""


def build_zip(entries: list[tuple[str, bytes]]) -> bytes:
    """STORED-method archive: local headers + data, then the central
    directory, then EOCD.  Fixed version/time fields so the bytes are
    fully deterministic."""
    out = bytearray()
    cd = bytearray()
    for name, content in entries:
        nb = name.encode()
        crc = zlib.crc32(content) & 0xFFFFFFFF
        off = len(out)
        out += LOCAL_MAGIC + struct.pack(
            "<HHHHHIIIHH",
            20,  # version needed
            0,  # flags
            0,  # method: stored
            0,  # mod time
            0x21,  # mod date (1980-01-01)
            crc,
            len(content),  # compressed (== uncompressed for stored)
            len(content),
            len(nb),
            0,  # extra length
        ) + nb + content
        cd += CD_MAGIC + struct.pack(
            "<HHHHHHIIIHHHHHII",
            20,  # version made by
            20,  # version needed
            0, 0, 0, 0x21,  # flags, method, time, date
            crc,
            len(content),
            len(content),
            len(nb),
            0, 0,  # extra, comment lengths
            0, 0,  # disk number, internal attrs
            0,  # external attrs
            off,
        ) + nb
    cd_off = len(out)
    out += cd
    out += EOCD_MAGIC + struct.pack(
        "<HHHHIIH",
        0, 0,  # disk numbers
        len(entries), len(entries),
        len(cd), cd_off,
        0,  # comment length
    )
    return bytes(out)


def parse_zip_entries(data: bytes, include_content: bool = False) -> list[dict]:
    """End-first walk.  Per entry (central-directory order):

    ``name``         — member path,
    ``n_bytes``      — uncompressed size,
    ``local_offset`` — byte offset of the member's local header,
    ``content``      — only when ``include_content`` (STORED only).

    Invariants enforced: EOCD found and self-consistent (entry count,
    CD size), every CD entry's local header exists at the recorded
    offset with a matching name, and the stored CRC-32 matches the
    payload.  Only method 0 (stored) is readable here; DEFLATE
    members raise (the gzip walk owns that regime)."""
    # EOCD: fixed 22 bytes + comment (<= 64 KiB); scan backwards.
    lo = max(0, len(data) - 22 - 0xFFFF)
    pos = data.rfind(EOCD_MAGIC, lo)
    if pos < 0:
        raise ZipError("no end-of-central-directory record")
    if pos + 22 > len(data):
        raise ZipError("truncated EOCD record")
    (_d0, _d1, n_here, n_total, cd_size, cd_off, _clen) = struct.unpack(
        "<HHHHIIH", data[pos + 4 : pos + 22]
    )
    if n_here != n_total:
        raise ZipError("multi-disk archives unsupported")
    if cd_off + cd_size > pos:
        raise ZipError("central directory overruns the EOCD record")
    out: list[dict] = []
    p = cd_off
    for _ in range(n_total):
        if data[p : p + 4] != CD_MAGIC:
            raise ZipError(f"bad central-directory magic at byte {p}")
        if p + 46 > len(data):
            raise ZipError(
                f"central-directory entry at byte {p} truncated "
                "(fixed header overruns the archive)"
            )
        (
            _vm, _vn, _fl, method, _t, _dt, crc, csize, usize,
            nlen, elen, clen_, _dn, _ia, _ea, loff,
        ) = struct.unpack("<HHHHHHIIIHHHHHII", data[p + 4 : p + 46])
        if p + 46 + nlen > len(data):
            raise ZipError(
                f"central-directory entry at byte {p} truncated "
                "(file name overruns the archive)"
            )
        name = data[p + 46 : p + 46 + nlen].decode()
        p += 46 + nlen + elen + clen_
        if method != 0:
            raise ZipError(
                f"member {name!r} uses method {method}; only STORED is "
                "byte-exact-readable here"
            )
        if csize != usize:
            raise ZipError(f"stored member {name!r} has csize != usize")
        if data[loff : loff + 4] != LOCAL_MAGIC:
            raise ZipError(
                f"member {name!r}: no local header at offset {loff}"
            )
        lnlen, lelen = struct.unpack("<HH", data[loff + 26 : loff + 30])
        lname = data[loff + 30 : loff + 30 + lnlen].decode()
        if lname != name:
            raise ZipError(
                f"central/local name mismatch: {name!r} vs {lname!r}"
            )
        start = loff + 30 + lnlen + lelen
        content = data[start : start + usize]
        if len(content) != usize:
            raise ZipError(f"member {name!r} overruns the archive")
        if zlib.crc32(content) & 0xFFFFFFFF != crc:
            raise ZipError(f"member {name!r}: CRC-32 mismatch")
        rec = {"name": name, "n_bytes": usize, "local_offset": loff}
        if include_content:
            rec["content"] = content
        out.append(rec)
    if p != cd_off + cd_size:
        raise ZipError("central-directory size field inconsistent")
    if not out:
        raise ZipError("no entries in central directory")
    return out
