"""POSIX ustar (tar) member walk — the shard container training
pipelines actually read (WebDataset-style: one sample = the adjacent
members sharing a key prefix), stdlib-pure and struct-level.

A tar archive is a sequence of 512-byte header blocks, each followed
by ceil(size/512) data blocks; the end is two zero blocks.  Header
fields are NUL/space-terminated octal ASCII; the checksum field is
the byte sum of the header with its own field replaced by spaces
(IEEE 1003.1).  The walk here is size-driven — next header at
``offset + 512 + 512*ceil(size/512)`` — and checksum-verified, so a
corrupted size field fails loudly at the next block instead of
silently emitting garbage members.

Deliberately NOT the stdlib ``tarfile`` module: the builder/parser
pair must expose every byte the SQL oracle replays (offsets as a
closed-form running sum over member sizes), and a high-level reader
would hide exactly the framing this differential checks.  Same
fail-loud, byte-exact contract as functions/warc.py (WARC) and
functions/mp3meta.py (MP3).

Reference behavioral contract: the reference repo has no container
formats (/root/reference/etl.py is a REST+LLM ETL); this extends the
beyond-reference source surface of SURVEY.md §2.3.
"""

from __future__ import annotations

BLOCK = 512


class TarError(ValueError):
    """Malformed tar payload (bad magic, checksum, framing)."""


def _octal(value: int, width: int) -> bytes:
    """NUL-terminated zero-padded octal field (ustar convention)."""
    s = format(value, "o").rjust(width - 1, "0")
    if len(s) > width - 1:
        raise TarError(f"value {value} overflows {width}-byte octal field")
    return s.encode() + b"\x00"


def build_member(name: str, content: bytes) -> bytes:
    """One ustar member: header block + zero-padded data blocks.
    Fixed mode/uid/gid/mtime so the header is fully deterministic."""
    nb = name.encode()
    if len(nb) > 100:
        raise TarError(f"name {name!r} exceeds 100 bytes")
    hdr = bytearray(BLOCK)
    hdr[0 : len(nb)] = nb
    hdr[100:108] = _octal(0o644, 8)  # mode
    hdr[108:116] = _octal(0, 8)  # uid
    hdr[116:124] = _octal(0, 8)  # gid
    hdr[124:136] = _octal(len(content), 12)  # size
    hdr[136:148] = _octal(0, 12)  # mtime
    hdr[148:156] = b" " * 8  # checksum placeholder
    hdr[156] = 0x30  # typeflag '0' regular file
    hdr[257:263] = b"ustar\x00"  # POSIX magic
    hdr[263:265] = b"00"  # version
    chk = sum(hdr)
    hdr[148:156] = format(chk, "o").rjust(6, "0").encode() + b"\x00 "
    pad = (-len(content)) % BLOCK
    return bytes(hdr) + content + b"\x00" * pad


def build_tar(members: list[tuple[str, bytes]]) -> bytes:
    """Members in order + the two-zero-block end-of-archive marker."""
    return b"".join(build_member(n, c) for n, c in members) + bytes(
        2 * BLOCK
    )


def parse_tar_members(data: bytes, include_content: bool = False) -> list[dict]:
    """Size-driven member walk.  Per member returns

    ``offset`` — byte offset of the header block,
    ``name``   — the member path,
    ``size``   — content bytes (data blocks are ceil(size/512)),
    ``content``— only when ``include_content``: the exact bytes.

    Every header's checksum is verified (spaces substituted per the
    spec) and the magic must read ``ustar``; the walk ends at the
    first zero block, which must be followed by a second one."""
    out: list[dict] = []
    pos = 0
    n = len(data)
    while True:
        if pos + BLOCK > n:
            raise TarError(f"truncated header block at byte {pos}")
        hdr = data[pos : pos + BLOCK]
        if hdr == bytes(BLOCK):
            if data[pos + BLOCK : pos + 2 * BLOCK] != bytes(BLOCK):
                raise TarError(
                    f"end-of-archive marker at byte {pos} lacks its "
                    "second zero block"
                )
            break
        if hdr[257:262] != b"ustar":
            raise TarError(f"bad ustar magic at byte {pos}")
        stored = int(hdr[148:156].rstrip(b"\x00 ").lstrip() or b"0", 8)
        computed = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if stored != computed:
            raise TarError(
                f"checksum mismatch at byte {pos}: stored {stored}, "
                f"computed {computed}"
            )
        name = hdr[:100].split(b"\x00", 1)[0].decode()
        size = int(hdr[124:136].rstrip(b"\x00 ").lstrip() or b"0", 8)
        datalen = -(-size // BLOCK) * BLOCK
        if pos + BLOCK + datalen > n:
            raise TarError(
                f"member {name!r} at byte {pos} overruns the archive"
            )
        rec = {"offset": pos, "name": name, "size": size}
        if include_content:
            rec["content"] = data[pos + BLOCK : pos + BLOCK + size]
        out.append(rec)
        pos += BLOCK + datalen
    if not out:
        raise TarError("no members before end-of-archive marker")
    return out


def sample_key(name: str) -> str:
    """WebDataset grouping rule: the sample key is everything before
    the FIRST dot of the basename — ``dir/00042.cls`` and
    ``dir/00042.txt`` belong to sample ``dir/00042``; multi-extension
    members (``x.seg.png``) stay with ``x``."""
    d, _, base = name.rpartition("/")
    key = base.split(".", 1)[0]
    return f"{d}/{key}" if d else key
