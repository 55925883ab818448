"""ISO-BMFF box walk: framing, full-box versions, fail-loud contract.

Local-only (no Spark) — the Spark plumbing is covered by the
mm_video_mp4_boxes oracle roundtrip in the driver harness.
"""

import struct

import pytest

from ctgov_ai_etl_spark.functions.mp4meta import (
    Mp4Error,
    build_box,
    build_mdhd,
    build_mp4,
    build_mvhd,
    build_tkhd,
    parse_mp4_meta,
    walk_boxes,
)


def _blob(**over) -> bytes:
    kw = dict(
        movie_timescale=90000,
        duration=12345,
        width=320,
        height=240,
        n_samples=7,
        sample_size=133,
        mdat_large=False,
        free_pad=13,
        n_traks=1,
        lang="eng",
        version=0,
    )
    kw.update(over)
    return build_mp4(**kw)


def test_fullbox_spec_sizes():
    """v0/v1 total sizes are the §8.2-8.4 constants the SQL oracle
    replays (108/120, 92/104, 32/44)."""
    assert len(build_mvhd(600, 1, 0)) == 108
    assert len(build_mvhd(600, 1, 1)) == 120
    assert len(build_tkhd(1, 1, 320, 240, 0)) == 92
    assert len(build_tkhd(1, 1, 320, 240, 1)) == 104
    assert len(build_mdhd(600, 1, "und", 0)) == 32
    assert len(build_mdhd(600, 1, "und", 1)) == 44


@pytest.mark.parametrize("version", [0, 1])
@pytest.mark.parametrize("large", [False, True])
@pytest.mark.parametrize("n_traks", [1, 2])
def test_roundtrip(version, large, n_traks):
    meta = parse_mp4_meta(
        _blob(version=version, mdat_large=large, n_traks=n_traks)
    )
    assert meta["n_boxes"] == 5 + 5 * n_traks
    assert meta["n_traks"] == n_traks
    assert meta["box_version"] == version
    assert meta["movie_timescale"] == 90000
    assert meta["movie_duration_ms"] == 12345 * 1000 // 90000
    assert (meta["width"], meta["height"]) == (320, 240)
    assert meta["media_lang"] == "eng"
    assert meta["mdat_bytes"] == 7 * 133
    assert meta["mdat_large"] == int(large)


def test_audio_trak_does_not_shadow_video_geometry():
    """Track 2 is audio with zero tkhd geometry; the reported
    dimensions must come from the video track."""
    meta = parse_mp4_meta(_blob(n_traks=2, width=640, height=480))
    assert (meta["width"], meta["height"]) == (640, 480)


def test_size_zero_extends_to_eof():
    """size==0 (last box runs to end of file) is real ISO-BMFF; the
    walk must size it from the enclosure, not reject it."""
    blob = _blob()
    # mdat is the last top-level box; rewrite its 32-bit size to 0
    mdat = [b for b in walk_boxes(blob) if b["type"] == "mdat"][0]
    patched = bytearray(blob)
    patched[mdat["offset"] : mdat["offset"] + 4] = struct.pack(">I", 0)
    meta = parse_mp4_meta(bytes(patched))
    assert meta["mdat_bytes"] == 7 * 133
    assert meta["total_bytes"] == len(blob)


def test_unknown_leaf_box_skipped_but_counted():
    """Forward compat: an unknown box type is skipped by its declared
    size (and counted), never an error."""
    blob = _blob() + build_box(b"uuid", b"\xaa" * 20)
    meta = parse_mp4_meta(blob)
    assert meta["n_boxes"] == 11  # 10 + the uuid leaf


def test_truncated_header_fails_loud():
    with pytest.raises(Mp4Error, match="truncated"):
        walk_boxes(_blob()[:-140][: 32 + 4])  # mid-header cut


def test_box_overrunning_container_fails_loud():
    """A size field pointing past the file end must raise Mp4Error,
    never parse short (same contract as zipmeta, ADVICE r14)."""
    blob = bytearray(_blob())
    blob[0:4] = struct.pack(">I", len(blob) + 100)  # ftyp overruns
    with pytest.raises(Mp4Error, match="overruns"):
        walk_boxes(bytes(blob))


def test_truncated_largesize_fails_loud():
    blob = _blob(mdat_large=True)
    mdat = [b for b in walk_boxes(blob) if b["type"] == "mdat"][0]
    with pytest.raises(Mp4Error, match="truncated"):
        walk_boxes(blob[: mdat["offset"] + 12])


def test_nonintegral_fixed_point_rejected():
    blob = bytearray(_blob())
    tkhd = [b for b in walk_boxes(bytes(blob)) if b["type"] == "tkhd"][0]
    geo = tkhd["offset"] + tkhd["size"] - 8
    blob[geo + 2 : geo + 4] = b"\x80\x00"  # width = 320.5 in 16.16
    with pytest.raises(Mp4Error, match="16.16"):
        parse_mp4_meta(bytes(blob))


def test_lang_pack_roundtrip():
    for code in ("und", "eng", "fra", "deu", "jpn"):
        assert parse_mp4_meta(_blob(lang=code))["media_lang"] == code


def test_not_mp4_rejected():
    with pytest.raises(Mp4Error, match="ftyp"):
        parse_mp4_meta(build_box(b"mdat", b"xx"))
