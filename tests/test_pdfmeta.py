"""PDF skeleton walk: xref verification, /Length checks, fail-loud.

Local-only (no Spark) — the Spark plumbing is covered by the
doc_pdf_meta oracle roundtrip in the driver harness.
"""

import re

import pytest

from ctgov_ai_etl_spark.functions.pdfmeta import (
    CONTENT_BASE,
    HEADER_SIZE,
    OBJ1_SIZE,
    OBJ2_BASE,
    PAGE_OBJ_SIZE,
    PdfError,
    build_pdf,
    parse_pdf_meta,
)


def _blob(**over) -> bytes:
    kw = dict(n_pages=2, width=612, height=792, lengths=[137, 901])
    kw.update(over)
    return build_pdf(**kw)


def test_size_constants_match_builders():
    """The closed-form constants the SQL oracle replays (109 + 144k
    + content for the xref offset) are derived from these four; pin
    them so a builder edit cannot silently desync the oracle."""
    assert (HEADER_SIZE, OBJ1_SIZE, OBJ2_BASE, PAGE_OBJ_SIZE, CONTENT_BASE) == (
        9, 49, 51, 87, 51
    )
    assert HEADER_SIZE + OBJ1_SIZE + OBJ2_BASE == 109
    assert 6 + PAGE_OBJ_SIZE + CONTENT_BASE == 144


@pytest.mark.parametrize(
    "n_pages,lengths", [(1, [100]), (2, [137, 901]), (3, [999, 100, 500])]
)
def test_roundtrip(n_pages, lengths):
    meta = parse_pdf_meta(_blob(n_pages=n_pages, lengths=lengths))
    assert meta["n_pages"] == n_pages
    assert meta["n_objects"] == 2 + 2 * n_pages
    assert meta["total_content_bytes"] == sum(lengths)
    assert meta["xref_offset"] == 109 + 144 * n_pages + sum(lengths)
    assert (meta["media_w"], meta["media_h"]) == (612, 792)
    assert meta["pdf_version"] == "1.4"


def test_xref_offset_lie_rejected():
    """An in-use xref entry pointing at the wrong byte must fail —
    offset verification is the walk's whole value."""
    blob = bytearray(_blob())
    m = re.search(rb"\n(\d{10}) 00000 n \n", bytes(blob))
    start = m.start(1)
    blob[start : start + 10] = b"%010d" % (int(m.group(1)) + 1)
    with pytest.raises(PdfError, match="is not"):
        parse_pdf_meta(bytes(blob))


def test_trailer_size_desync_rejected():
    blob = bytearray(_blob())
    i = bytes(blob).index(b"/Size 7")
    blob[i : i + 7] = b"/Size 8"
    with pytest.raises(PdfError, match="xref entry|/Size|disagrees"):
        parse_pdf_meta(bytes(blob))


def test_stream_length_lie_rejected():
    blob = bytearray(_blob(n_pages=1, lengths=[500]))
    i = bytes(blob).index(b"/Length 500")
    blob[i : i + 11] = b"/Length 400"
    with pytest.raises(PdfError, match="stream span"):
        parse_pdf_meta(bytes(blob))


def test_kids_count_desync_rejected():
    blob = bytearray(_blob(n_pages=2, lengths=[100, 100]))
    i = bytes(blob).index(b"/Count 2")
    blob[i : i + 8] = b"/Count 3"
    with pytest.raises(PdfError, match="Count"):
        parse_pdf_meta(bytes(blob))


def test_startxref_lie_rejected():
    blob = bytearray(_blob())
    m = re.search(rb"startxref\n(\d+)\n", bytes(blob))
    blob[m.start(1)] = ord("9")
    with pytest.raises(PdfError, match="does not point"):
        parse_pdf_meta(bytes(blob))


def test_not_pdf_rejected():
    with pytest.raises(PdfError, match="%PDF"):
        parse_pdf_meta(b"PK\x03\x04 not a pdf")


def test_builder_domain_guards():
    with pytest.raises(PdfError):
        build_pdf(n_pages=4, width=612, height=792, lengths=[100] * 4)
    with pytest.raises(PdfError):
        build_pdf(n_pages=1, width=612, height=792, lengths=[99])
    with pytest.raises(PdfError):
        build_pdf(n_pages=1, width=1000, height=792, lengths=[100])
