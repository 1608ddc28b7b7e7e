"""Codec-free video-container probe: hand-built minimal MP4 (ISO-BMFF)
and AVI (RIFF) payloads must yield brand, duration, resolution, and
track count; garbage must yield None (per-row fallback contract)."""

from __future__ import annotations

from apitap_spark.operators.multimodal import probe_video_container


def _box(btype: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + btype + body


def _minimal_mp4(
    timescale=1000, duration=90_000, width=640, height=360, tracks=2
) -> bytes:
    ftyp = _box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isomiso2")
    mvhd = _box(
        b"mvhd",
        bytes(4)  # version 0 + flags
        + bytes(8)  # creation + modification
        + timescale.to_bytes(4, "big")
        + duration.to_bytes(4, "big")
        + bytes(80),  # rate/volume/reserved/matrix/predefined/next_track
    )
    tkhd_body = (
        bytes(4)
        + bytes(20)  # times, track id, reserved, duration (v0)
        + bytes(52)  # reserved, layer, group, volume, reserved, matrix
        + (width << 16).to_bytes(4, "big")
        + (height << 16).to_bytes(4, "big")
    )
    assert len(tkhd_body) == 84
    trak = _box(b"trak", _box(b"tkhd", tkhd_body))
    moov = _box(b"moov", mvhd + trak * tracks)
    return ftyp + moov


def _minimal_avi(
    us_per_frame=40_000, total_frames=250, width=320, height=240, streams=2
) -> bytes:
    def u32(v):
        return v.to_bytes(4, "little")

    avih = (
        b"avih"
        + u32(56)
        + u32(us_per_frame)
        + u32(1_000_000)  # max bytes/sec
        + u32(0)  # padding
        + u32(0x10)  # flags
        + u32(total_frames)
        + u32(0)  # initial frames
        + u32(streams)
        + u32(0)  # suggested buffer
        + u32(width)
        + u32(height)
        + bytes(16)  # reserved
    )
    hdrl = b"LIST" + u32(4 + len(avih)) + b"hdrl" + avih
    payload = b"AVI " + hdrl
    return b"RIFF" + u32(len(payload)) + payload


def test_mp4_probe_reads_brand_duration_resolution_tracks():
    meta = probe_video_container(_minimal_mp4())
    assert meta == {
        "container": "mp4",
        "brand": "isom",
        "duration_ms": 90_000,  # 90000 ticks at timescale 1000
        "width": 640,
        "height": 360,
        "n_tracks": 2,
    }


def test_mp4_probe_64bit_mvhd_version1():
    # version-1 mvhd: 64-bit times and duration, 32-bit timescale
    mvhd = (
        b"\x01" + bytes(3)  # version 1 + flags
        + bytes(16)  # creation + modification (64-bit each)
        + (600).to_bytes(4, "big")  # timescale
        + (1200).to_bytes(8, "big")  # duration -> 2000 ms
        + bytes(80)
    )
    data = (
        _box(b"ftyp", b"mp42" + bytes(4) + b"mp42")
        + _box(b"moov", _box(b"mvhd", mvhd))
    )
    meta = probe_video_container(data)
    assert meta["duration_ms"] == 2000
    assert meta["brand"] == "mp42"
    assert meta["n_tracks"] == 0


def test_truncated_v1_mvhd_yields_no_duration():
    # A version-1 mvhd whose body is only 28 bytes: the 8-byte duration
    # at offset 24-32 would read past the box into the sibling box —
    # duration must stay None (malformed-input fallback), not decode
    # garbage like 8589934592026 ms (round-5 ADVICE repro).
    short_v1 = b"\x01" + bytes(3) + bytes(16) + (600).to_bytes(4, "big") + bytes(4)
    assert len(short_v1) == 28
    sibling = _box(b"free", (0xFFFFFFFF).to_bytes(4, "big") * 4)
    data = (
        _box(b"ftyp", b"mp42" + bytes(4) + b"mp42")
        + _box(b"moov", _box(b"mvhd", short_v1) + sibling)
    )
    meta = probe_video_container(data)
    assert meta is not None and meta["duration_ms"] is None


def test_largesize_smaller_than_header_stops_cleanly():
    # size==1 promises a 64-bit largesize; a decoded largesize in [8,16)
    # would put body_start past body_end (header alone is 16 bytes) —
    # the walk must stop, not yield an inverted range.
    bogus = (
        (1).to_bytes(4, "big")
        + b"moov"
        + (12).to_bytes(8, "big")  # largesize 12 < 16-byte header
        + bytes(32)
    )
    data = _box(b"ftyp", b"isom" + bytes(4) + b"isom") + bogus
    meta = probe_video_container(data)
    assert meta is not None and meta["n_tracks"] == 0


def test_avi_probe_reads_header():
    meta = probe_video_container(_minimal_avi())
    assert meta == {
        "container": "avi",
        "brand": "avi ",
        "duration_ms": 10_000,  # 250 frames x 40ms
        "width": 320,
        "height": 240,
        "n_tracks": 2,
    }


def test_non_video_returns_none():
    assert probe_video_container(b"") is None
    assert probe_video_container(b"\x89PNG\r\n\x1a\n" + bytes(64)) is None
    assert probe_video_container(bytes(1024)) is None


def test_truncated_mp4_is_safe():
    full = _minimal_mp4()
    for cut in (4, 9, 17, 40, len(full) - 3):
        meta = probe_video_container(full[:cut])
        assert meta is None or meta["container"] == "mp4"  # never raises


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=200)
@given(st.binary(max_size=512))
def test_probe_never_raises_on_arbitrary_bytes(payload):
    """Per-row fallback contract: garbage in -> None or a dict, NEVER an
    exception (a 100 TB scan will contain every corruption imaginable)."""
    meta = probe_video_container(payload)
    assert meta is None or isinstance(meta, dict)


@settings(max_examples=100)
@given(st.binary(max_size=256), st.integers(min_value=0, max_value=60))
def test_probe_never_raises_on_mutated_valid_mp4(tail, flip_at):
    """A valid header followed by corrupted/flipped bytes must still
    degrade gracefully."""
    base = bytearray(_minimal_mp4() + tail)
    if flip_at < len(base):
        base[flip_at] ^= 0xFF
    meta = probe_video_container(bytes(base))
    assert meta is None or isinstance(meta, dict)
