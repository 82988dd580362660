"""WebM (Matroska) demuxer: extract VP9/VP8 frames from .webm files.

Pure-Python EBML parse, equivalent in capability to the reference's
webmdec.cc (libwebm-based): locates the first video track, iterates
Clusters -> SimpleBlocks/BlockGroups, and yields frame payloads with
timestamps.  Lacing (Xiph/fixed/EBML) is supported.

Reference: libvpx/webmdec.cc (webm_read_frame), Matroska spec element IDs.
"""

from __future__ import annotations

import io
from typing import Iterator, Optional, Tuple

# EBML element IDs (Matroska)
_EBML = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMECODE_SCALE = 0x2AD7B1
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_CLUSTER = 0x1F43B675
_CLUSTER_TIMECODE = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1

_TRACK_TYPE_VIDEO = 1


def _read_vint(f, keep_marker: bool) -> Optional[Tuple[int, int]]:
    """Read an EBML variable-length integer.  Returns (value, length)."""
    b0 = f.read(1)
    if not b0:
        return None
    b0 = b0[0]
    if b0 == 0:
        return None
    length = 1
    mask = 0x80
    while not (b0 & mask):
        mask >>= 1
        length += 1
        if length > 8:
            return None
    value = b0 if keep_marker else (b0 & (mask - 1))
    rest = f.read(length - 1)
    if len(rest) != length - 1:
        return None
    for b in rest:
        value = (value << 8) | b
    return value, length


def _read_id(f):
    r = _read_vint(f, keep_marker=True)
    return None if r is None else r[0]


def _read_size(f):
    r = _read_vint(f, keep_marker=False)
    return None if r is None else r[0]


def _read_uint(data: bytes) -> int:
    v = 0
    for b in data:
        v = (v << 8) | b
    return v


class WebmReader:
    """Iterate video frames of a .webm file: yields (payload, pts_ns)."""

    def __init__(self, path_or_file):
        if hasattr(path_or_file, "read"):
            self._f = path_or_file
            self._own = False
        else:
            self._f = open(path_or_file, "rb")
            self._own = True
        self.codec_id = None        # "V_VP9" / "V_VP8"
        self.width = 0
        self.height = 0
        self.timecode_scale = 1000000  # ns per timecode tick (default)
        self._video_track = None
        self._clusters = []          # (offset, size)
        self._parse_headers()

    # ------------------------------------------------------------ header

    def _parse_headers(self):
        f = self._f
        eid = _read_id(f)
        if eid != _EBML:
            raise ValueError("not an EBML/WebM file")
        sz = _read_size(f)
        f.seek(sz, io.SEEK_CUR)
        eid = _read_id(f)
        if eid != _SEGMENT:
            raise ValueError("missing Segment")
        seg_size = _read_size(f)
        seg_start = f.tell()
        end = seg_start + seg_size if seg_size != (1 << 56) - 1 else None
        while True:
            pos = f.tell()
            if end is not None and pos >= end:
                break
            eid = _read_id(f)
            if eid is None:
                break
            sz = _read_size(f)
            if sz is None:
                break
            body_at = f.tell()
            if eid == _INFO:
                self._parse_info(f.read(sz))
            elif eid == _TRACKS:
                self._parse_tracks(f.read(sz))
            elif eid == _CLUSTER:
                self._clusters.append((body_at, sz))
                f.seek(sz, io.SEEK_CUR)
            else:
                f.seek(sz, io.SEEK_CUR)

    def _parse_info(self, data: bytes):
        f = io.BytesIO(data)
        while True:
            eid = _read_id(f)
            if eid is None:
                break
            sz = _read_size(f)
            body = f.read(sz)
            if eid == _TIMECODE_SCALE:
                self.timecode_scale = _read_uint(body)

    def _parse_tracks(self, data: bytes):
        f = io.BytesIO(data)
        while True:
            eid = _read_id(f)
            if eid is None:
                break
            sz = _read_size(f)
            body = f.read(sz)
            if eid == _TRACK_ENTRY:
                self._parse_track_entry(body)

    def _parse_track_entry(self, data: bytes):
        f = io.BytesIO(data)
        num = None
        ttype = None
        codec = None
        w = h = 0
        while True:
            eid = _read_id(f)
            if eid is None:
                break
            sz = _read_size(f)
            body = f.read(sz)
            if eid == _TRACK_NUMBER:
                num = _read_uint(body)
            elif eid == _TRACK_TYPE:
                ttype = _read_uint(body)
            elif eid == _CODEC_ID:
                codec = body.decode("ascii", "replace").rstrip("\x00")
            elif eid == _VIDEO:
                g = io.BytesIO(body)
                while True:
                    vid = _read_id(g)
                    if vid is None:
                        break
                    vsz = _read_size(g)
                    vbody = g.read(vsz)
                    if vid == _PIXEL_WIDTH:
                        w = _read_uint(vbody)
                    elif vid == _PIXEL_HEIGHT:
                        h = _read_uint(vbody)
        if ttype == _TRACK_TYPE_VIDEO and self._video_track is None:
            self._video_track = num
            self.codec_id = codec
            self.width = w
            self.height = h

    # ------------------------------------------------------------ frames

    def __iter__(self) -> Iterator[Tuple[bytes, int]]:
        f = self._f
        for off, sz in self._clusters:
            f.seek(off)
            data = f.read(sz)
            yield from self._iter_cluster(data)

    def _iter_cluster(self, data: bytes):
        f = io.BytesIO(data)
        cluster_tc = 0
        while True:
            eid = _read_id(f)
            if eid is None:
                break
            sz = _read_size(f)
            body = f.read(sz)
            if eid == _CLUSTER_TIMECODE:
                cluster_tc = _read_uint(body)
            elif eid == _SIMPLE_BLOCK:
                yield from self._iter_block(body, cluster_tc)
            elif eid == _BLOCK_GROUP:
                g = io.BytesIO(body)
                while True:
                    gid = _read_id(g)
                    if gid is None:
                        break
                    gsz = _read_size(g)
                    gbody = g.read(gsz)
                    if gid == _BLOCK:
                        yield from self._iter_block(gbody, cluster_tc)

    def _iter_block(self, data: bytes, cluster_tc: int):
        f = io.BytesIO(data)
        tr = _read_vint(f, keep_marker=False)
        if tr is None or tr[0] != self._video_track:
            return
        rel = int.from_bytes(f.read(2), "big", signed=True)
        flags = f.read(1)[0]
        lacing = (flags >> 1) & 3
        payload = f.read()
        pts = (cluster_tc + rel) * self.timecode_scale
        if lacing == 0:
            yield payload, pts
            return
        n = payload[0] + 1
        pos = 1
        sizes = []
        if lacing == 2:  # fixed
            each = (len(payload) - 1) // n
            sizes = [each] * n
        elif lacing == 1:  # Xiph
            for _ in range(n - 1):
                s = 0
                while True:
                    b = payload[pos]
                    pos += 1
                    s += b
                    if b != 255:
                        break
                sizes.append(s)
            sizes.append(len(payload) - pos - sum(sizes))
        else:  # EBML lacing
            g = io.BytesIO(payload[pos:])
            first = _read_vint(g, keep_marker=False)
            s = first[0]
            consumed = first[1]
            sizes.append(s)
            for _ in range(n - 2):
                d = _read_vint(g, keep_marker=False)
                # signed delta: range-shift by (2^(7*len-1) - 1)
                delta = d[0] - ((1 << (7 * d[1] - 1)) - 1)
                s += delta
                consumed += d[1]
                sizes.append(s)
            pos += consumed
            sizes.append(len(payload) - pos - sum(sizes))
        for s in sizes:
            yield payload[pos:pos + s], pts
            pos += s

    def close(self):
        if self._own:
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
