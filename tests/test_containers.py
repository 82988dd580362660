import io

from cuda_vp9_tpu.containers import IvfReader, IvfWriter, is_ivf

from conftest import fixture_streams


def test_ivf_roundtrip():
    buf = io.BytesIO()
    frames = [(b"\x01\x02\x03", 0), (b"\x04" * 100, 1), (b"", 2)]
    w = IvfWriter(buf, b"VP90", 320, 240, 30, 1)
    for data, pts in frames:
        w.write_frame(data, pts)
    w.close()
    raw = buf.getvalue()
    assert is_ivf(raw)
    r = IvfReader(io.BytesIO(raw))
    assert (r.width, r.height) == (320, 240)
    assert r.header.frame_count == 3
    got = list(r)
    assert got == frames


def test_fixture_headers_parse():
    streams = fixture_streams()
    assert len(streams) >= 10
    for name, ivf, md5 in streams:
        with IvfReader(str(ivf)) as r:
            assert r.fourcc == b"VP90"
            n_md5 = len(md5.read_text().splitlines())
            frames = list(r)
            # superframes can make packet count <= md5 frame count
            assert 0 < len(frames) <= n_md5 + 2
            assert all(len(d) > 0 for d, _ in frames)
