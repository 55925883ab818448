"""WARC/1.0 container: builder/parser round-trip and framing attacks
(functions/warc.py) — pure-Python, no Spark session."""

import pytest

from ctgov_ai_etl_spark.functions.warc import (
    WarcError,
    build_record,
    build_warc,
    http_envelope,
    parse_warc_records,
)


def _sample():
    return build_warc(
        [
            ("response", "urn:doc1-0", "http://ex.com/1/0",
             http_envelope(200) + b"hello world"),
            ("resource", "urn:doc1-1", "http://ex.com/1/1", b"raw bytes"),
            ("response", "urn:doc1-2", "http://ex.com/1/2",
             http_envelope(404) + b""),
        ]
    )


def test_roundtrip_three_records():
    recs = parse_warc_records(_sample())
    assert [r["warc_type"] for r in recs] == [
        "response", "resource", "response",
    ]
    assert [r["http_status"] for r in recs] == [200, None, 404]
    assert recs[0]["offset"] == 0
    assert recs[0]["content_length"] == 44 + 11
    assert recs[1]["content_length"] == 9
    assert recs[2]["content_length"] == 44
    assert [r["target_uri"] for r in recs] == [
        f"http://ex.com/1/{j}" for j in range(3)
    ]


def test_offsets_are_exact_byte_positions():
    blob = _sample()
    recs = parse_warc_records(blob)
    for r in recs:
        assert blob[r["offset"] : r["offset"] + 8] == b"WARC/1.0"
    # offsets strictly increase and the last record ends at len(blob)
    offs = [r["offset"] for r in recs]
    assert offs == sorted(set(offs))


def test_http_envelope_is_constant_length():
    for code in (200, 301, 404, 503):
        assert len(http_envelope(code)) == 44
    with pytest.raises(WarcError):
        http_envelope(99)


def test_header_case_insensitive():
    raw = _sample().replace(b"WARC-Type:", b"warc-TYPE:", 1)
    recs = parse_warc_records(raw)
    assert recs[0]["warc_type"] == "response"


def test_bad_version_line():
    with pytest.raises(WarcError, match="version"):
        parse_warc_records(b"WARC/0.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n")


def test_truncated_content_raises():
    blob = _sample()
    with pytest.raises(WarcError, match="overruns|terminator|version"):
        parse_warc_records(blob[:-6])


def test_missing_terminator_raises():
    rec = build_record("resource", "urn:x", "http://e/x", b"abc")
    with pytest.raises(WarcError, match="terminator"):
        parse_warc_records(rec[:-4] + b"XXXX")


def test_missing_mandatory_header_raises():
    raw = (
        b"WARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    )
    with pytest.raises(WarcError, match="mandatory"):
        parse_warc_records(raw)


def test_response_without_http_envelope_raises():
    rec = build_record("response", "urn:x", "http://e/x", b"not http")
    with pytest.raises(WarcError, match="HTTP envelope"):
        parse_warc_records(rec)


def test_content_length_walk_not_sync_hunt():
    """A payload whose BODY contains a full fake record must not be
    resynced into: the declared Content-Length carries the walk over
    the decoy in one jump."""
    decoy = build_record("resource", "urn:fake", "http://e/f", b"x")
    blob = build_warc(
        [
            ("resource", "urn:real-0", "http://e/0", decoy),
            ("resource", "urn:real-1", "http://e/1", b"tail"),
        ]
    )
    recs = parse_warc_records(blob)
    assert [r["target_uri"] for r in recs] == ["http://e/0", "http://e/1"]
    assert recs[0]["content_length"] == len(decoy)


def test_empty_payload_rejected():
    with pytest.raises(WarcError):
        parse_warc_records(b"")


def test_include_body_splits_http_envelope():
    recs = parse_warc_records(_sample(), include_body=True)
    assert recs[0]["body"] == b"hello world"
    assert recs[1]["body"] == b"raw bytes"  # resource: raw payload
    assert recs[2]["body"] == b""
    # without the flag, no body key at all
    assert "body" not in parse_warc_records(_sample())[0]


def test_response_missing_separator_raises():
    rec = build_record(
        "response", "urn:x", "http://e/x", b"HTTP/1.1 200 S\r\nno-sep"
    )
    with pytest.raises(WarcError, match="separator"):
        parse_warc_records(rec, include_body=True)
