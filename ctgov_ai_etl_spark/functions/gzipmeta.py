"""Concatenated-gzip member walk — the framing `.warc.gz` actually
uses (one gzip member per WARC record, ISO 28500 annex), stdlib-pure.

A gzip stream may be a CONCATENATION of members (RFC 1952 §2.2); web
archives exploit this so any record can be read by seeking to its
member offset without inflating the rest of the file.  Splitting the
members back out requires inflating each one — the member length is
not in the header — so the walk here drives ``zlib.decompressobj``
with gzip wbits and uses ``unused_data`` to find each boundary, then
re-verifies the RFC 1952 trailer (CRC-32 + ISIZE mod 2^32) against
the inflated bytes.  Unlike the WARC/tar/MP3 walks, member byte
offsets are NOT SQL-replayable (they depend on deflate output), so
the oracle contract for this format checks the inflated payloads
(lengths + digests) and the member sequence, while the parser
enforces every structural invariant internally and fail-loud.

Reference behavioral contract: none in the reference (REST+LLM ETL);
beyond-reference source surface, SURVEY.md §2.3.
"""

from __future__ import annotations

import gzip as _gzip
import struct
import zlib


class GzipError(ValueError):
    """Malformed gzip stream (bad magic, trailer mismatch, garbage)."""


def build_gzip_members(bodies: list[bytes]) -> bytes:
    """Concatenate one gzip member per body (mtime pinned to 0 so the
    bytes are deterministic for a given zlib build)."""
    return b"".join(
        _gzip.compress(b, compresslevel=6, mtime=0) for b in bodies
    )


def parse_gzip_members(data: bytes) -> list[dict]:
    """Split a concatenated-gzip payload into members.  Per member:

    ``offset``          — byte offset of the member's 1f 8b magic,
    ``compressed_size`` — bytes this member occupies,
    ``n_bytes``         — inflated payload length,
    ``body``            — the inflated bytes.

    Each member's RFC 1952 trailer (CRC-32, ISIZE) is re-verified
    against the inflated output — zlib already checks it, but the
    explicit re-check keeps the invariant local and the error message
    ours.  Trailing garbage that is not a gzip magic fails loudly."""
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 2] != b"\x1f\x8b":
            raise GzipError(f"bad gzip magic at byte {pos}")
        if data[pos + 2 : pos + 3] != b"\x08":
            raise GzipError(f"unsupported compression method at byte {pos}")
        d = zlib.decompressobj(wbits=31)
        try:
            body = d.decompress(data[pos:])
            body += d.flush()
        except zlib.error as exc:
            raise GzipError(f"member at byte {pos}: {exc}") from exc
        if not d.eof:
            raise GzipError(f"member at byte {pos} is truncated")
        consumed = n - pos - len(d.unused_data)
        trailer = data[pos + consumed - 8 : pos + consumed]
        crc, isize = struct.unpack("<II", trailer)
        if crc != zlib.crc32(body) & 0xFFFFFFFF:
            raise GzipError(f"member at byte {pos}: CRC-32 mismatch")
        if isize != len(body) % (1 << 32):
            raise GzipError(f"member at byte {pos}: ISIZE mismatch")
        out.append(
            {
                "offset": pos,
                "compressed_size": consumed,
                "n_bytes": len(body),
                "body": body,
            }
        )
        pos += consumed
    if not out:
        raise GzipError("no gzip members found")
    return out
