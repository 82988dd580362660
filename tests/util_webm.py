"""Minimal WebM muxer for tests: wraps VP9 frames into a valid
single-track WebM (EBML header + Segment/Info/Tracks + one Cluster of
SimpleBlocks).  Test-only fixture generator for the WebM demuxer."""

import struct


def _id(eid):
    out = []
    while eid:
        out.append(eid & 0xFF)
        eid >>= 8
    return bytes(reversed(out))


def _size(n):
    # 8-byte vint size (always wide: simple and valid)
    return struct.pack(">Q", n | (1 << 56))


def _el(eid, body):
    return _id(eid) + _size(len(body)) + body


def _uint(v):
    out = []
    while True:
        out.append(v & 0xFF)
        v >>= 8
        if not v:
            break
    return bytes(reversed(out))


def mux_webm(frames, width, height, codec=b"V_VP9", tc_scale=1000000):
    ebml = _el(0x1A45DFA3,
               _el(0x4286, b"\x01") + _el(0x42F7, b"\x01")
               + _el(0x42F2, b"\x04") + _el(0x42F3, b"\x08")
               + _el(0x4282, b"webm")
               + _el(0x4287, b"\x02") + _el(0x4285, b"\x02"))
    info = _el(0x1549A966, _el(0x2AD7B1, _uint(tc_scale)))
    video = _el(0xE0, _el(0xB0, _uint(width)) + _el(0xBA, _uint(height)))
    track = _el(0xAE, _el(0xD7, b"\x01") + _el(0x73C5, b"\x01")
                + _el(0x83, b"\x01") + _el(0x86, codec) + video)
    tracks = _el(0x1654AE6B, track)
    blocks = b""
    for i, f in enumerate(frames):
        # SimpleBlock: track vint(1), rel timecode int16, flags, payload
        blocks += _el(0xA3, b"\x81" + struct.pack(">h", i) + b"\x80" + f)
    cluster = _el(0x1F43B675, _el(0xE7, _uint(0)) + blocks)
    segment = _el(0x18538067, info + tracks + cluster)
    return ebml + segment
