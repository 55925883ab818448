"""WARC/1.0 container parsing — the record walk a web-crawl corpus
needs before any text curation can start, stdlib-pure.

A 100 TB crawl arrives as WARC files (ISO 28500): length-delimited
records, each a version line + named headers + CRLF + Content-Length
bytes of payload + CRLFCRLF.  Response records embed an HTTP/1.1
message whose status line triage reads without parsing bodies.  The
walk is Content-Length-driven (never a scan for the next "WARC/1.0"),
so a wrong header parse lands mid-payload and fails loudly — the same
fail-loud contract as the MP3 frame walk (functions/mp3meta.py).

Builder + parser live together so the SQL oracle can replay every
byte offset closed-form: build_warc writes records whose header block
has a fully computable length (fixed field names, decimal lengths),
and parse_warc_records re-derives (offset, type, uri, content_length,
http_status) by walking real bytes.  Any defect in either — a missed
CRLF, an off-by-one in the terminator skip, a miscomputed
Content-Length — breaks the end-to-end hash match.

Reference behavioral contract: the reference repo has no container
formats (/root/reference/etl.py is a REST+LLM ETL); this extends the
beyond-reference source surface (SURVEY.md §2.3 'sources') the same
way the XML/ORC/binaryFile scans do.
"""

from __future__ import annotations


class WarcError(ValueError):
    """Malformed WARC payload (bad version, header, or framing)."""


_CRLF = b"\r\n"
# Fixed HTTP response envelope: the status text is always the single
# letter 'S' so the envelope length is constant (44 bytes) and a SQL
# oracle can compute Content-Length without string-building HTTP.
_HTTP_TAIL = b" S\r\nContent-Type: text/plain\r\n\r\n"


def http_envelope(status: int) -> bytes:
    """``HTTP/1.1 NNN S`` + fixed Content-Type header — 44 bytes for
    every 3-digit status code."""
    if not 100 <= status <= 999:
        raise WarcError(f"status {status} is not 3 digits")
    return b"HTTP/1.1 " + str(status).encode() + _HTTP_TAIL


def build_record(
    warc_type: str, record_id: str, target_uri: str, content: bytes
) -> bytes:
    """One WARC/1.0 record with the fixed header set this module
    emits: Type, Record-ID, Target-URI, Content-Length (in that
    order), blank line, content, CRLFCRLF terminator."""
    head = (
        b"WARC/1.0\r\n"
        + b"WARC-Type: " + warc_type.encode() + _CRLF
        + b"WARC-Record-ID: " + record_id.encode() + _CRLF
        + b"WARC-Target-URI: " + target_uri.encode() + _CRLF
        + b"Content-Length: " + str(len(content)).encode() + _CRLF
        + _CRLF
    )
    return head + content + _CRLF + _CRLF


def build_warc(records: list[tuple[str, str, str, bytes]]) -> bytes:
    """Concatenate records (warc_type, record_id, target_uri,
    content) into one WARC payload."""
    return b"".join(build_record(*r) for r in records)


def parse_warc_records(data: bytes, include_body: bool = False) -> list[dict]:
    """Length-driven record walk.  Per record returns exact integers
    and short strings only:

    ``offset``         — byte offset of the record's version line,
    ``warc_type``      — the WARC-Type header value,
    ``target_uri``     — the WARC-Target-URI header value,
    ``content_length`` — declared (and consumed) payload bytes,
    ``http_status``    — status code parsed from the embedded HTTP
                         status line for response records, None
                         otherwise,
    ``body``           — only when ``include_body``: the payload bytes
                         AFTER the HTTP envelope for response records
                         (raw payload for other types) — the text a
                         crawl-ingest pipeline curates.

    Headers are parsed case-insensitively (the spec allows any case);
    unknown headers are skipped, missing mandatory ones raise.  The
    next record MUST begin exactly at
    ``offset + header_block + content_length + 4`` — a framing error
    surfaces as a bad version line there, never as silent resync."""
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        offset = pos
        eol = data.find(_CRLF, pos)
        if eol < 0 or data[pos:eol] != b"WARC/1.0":
            raise WarcError(f"bad WARC version line at byte {pos}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(_CRLF, pos)
            if eol < 0:
                raise WarcError(f"unterminated header block at byte {pos}")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            k, sep, v = line.partition(b": ")
            if not sep:
                raise WarcError(f"malformed header {line!r}")
            headers[k.decode().lower()] = v.decode()
        try:
            wtype = headers["warc-type"]
            uri = headers["warc-target-uri"]
            clen = int(headers["content-length"])
        except KeyError as exc:
            raise WarcError(f"missing mandatory header {exc}") from exc
        if clen < 0 or pos + clen + 4 > n:
            raise WarcError(
                f"record at byte {offset} overruns payload "
                f"(content-length {clen})"
            )
        content = data[pos : pos + clen]
        pos += clen
        if data[pos : pos + 4] != _CRLF + _CRLF:
            raise WarcError(f"missing record terminator at byte {pos}")
        pos += 4
        status = None
        body = content
        if wtype == "response":
            if not content.startswith(b"HTTP/1.1 "):
                raise WarcError(
                    f"response record at byte {offset} lacks HTTP envelope"
                )
            status = int(content[9:12])
            sep = content.find(_CRLF + _CRLF)
            if sep < 0:
                raise WarcError(
                    f"response record at byte {offset} has no header/body "
                    "separator"
                )
            body = content[sep + 4 :]
        rec = {
            "offset": offset,
            "warc_type": wtype,
            "target_uri": uri,
            "content_length": clen,
            "http_status": status,
        }
        if include_body:
            rec["body"] = body
        out.append(rec)
    if not out:
        raise WarcError("no WARC records found")
    return out
