"""ustar member walk: builder/parser round-trip, checksum/framing
attacks, WebDataset key rule (functions/tarmeta.py) — pure-Python."""

import io
import tarfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ctgov_ai_etl_spark.functions.tarmeta import (
    BLOCK,
    TarError,
    build_member,
    build_tar,
    parse_tar_members,
    sample_key,
)


def _archive():
    return build_tar(
        [
            ("00042.txt", b"hello webdataset"),
            ("00042.cls", b"7"),
            ("dir/00043.txt", b"x" * 513),  # spills into 2 data blocks
            ("dir/00043.cls", b""),  # zero-size member: no data block
        ]
    )


def test_roundtrip_members():
    recs = parse_tar_members(_archive(), include_content=True)
    assert [r["name"] for r in recs] == [
        "00042.txt", "00042.cls", "dir/00043.txt", "dir/00043.cls",
    ]
    assert [r["size"] for r in recs] == [16, 1, 513, 0]
    assert recs[0]["content"] == b"hello webdataset"
    assert recs[3]["content"] == b""


def test_offsets_are_closed_form():
    recs = parse_tar_members(_archive())
    # member m starts at sum of 512 + 512*ceil(size/512) of its
    # predecessors — the formula the SQL oracle replays
    offs, pos = [], 0
    for size in (16, 1, 513, 0):
        offs.append(pos)
        pos += BLOCK + -(-size // BLOCK) * BLOCK
    assert [r["offset"] for r in recs] == offs


def test_stdlib_tarfile_reads_our_archives():
    """Cross-validation against an independent implementation: the
    stdlib tarfile reader must agree on names, sizes, and contents."""
    tf = tarfile.open(fileobj=io.BytesIO(_archive()))
    infos = tf.getmembers()
    assert [(i.name, i.size) for i in infos] == [
        ("00042.txt", 16), ("00042.cls", 1),
        ("dir/00043.txt", 513), ("dir/00043.cls", 0),
    ]
    assert tf.extractfile(infos[0]).read() == b"hello webdataset"


def test_checksum_verified():
    blob = bytearray(_archive())
    blob[0] ^= 0xFF  # corrupt first name byte; checksum now stale
    with pytest.raises(TarError, match="checksum"):
        parse_tar_members(bytes(blob))


def test_bad_magic_rejected():
    blob = bytearray(_archive())
    blob[257:262] = b"notar"
    with pytest.raises(TarError, match="magic"):
        parse_tar_members(bytes(blob))


def test_truncated_archive_rejected():
    with pytest.raises(TarError, match="truncated|overruns|second zero"):
        parse_tar_members(_archive()[:-600])


def test_missing_second_zero_block():
    blob = _archive()[: -BLOCK]  # drop one of the two end blocks
    with pytest.raises(TarError, match="second zero"):
        parse_tar_members(blob)


def test_name_too_long_rejected():
    with pytest.raises(TarError, match="100 bytes"):
        build_member("x" * 101, b"")


def test_sample_key_rule():
    assert sample_key("00042.txt") == "00042"
    assert sample_key("dir/00042.cls") == "dir/00042"
    assert sample_key("a/b/x.seg.png") == "a/b/x"
    assert sample_key("nodot") == "nodot"


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9_999_999),
            st.binary(min_size=0, max_size=1200),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_property_roundtrip_and_stdlib_agreement(entries):
    members = [(f"m{i:03d}-{k}.bin", c) for i, (k, c) in enumerate(entries)]
    blob = build_tar(members)
    recs = parse_tar_members(blob, include_content=True)
    assert [(r["name"], r["content"]) for r in recs] == members
    tf = tarfile.open(fileobj=io.BytesIO(blob))
    assert [(i.name, i.size) for i in tf.getmembers()] == [
        (n, len(c)) for n, c in members
    ]
