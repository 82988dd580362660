"""Multi-stream batched decode (SURVEY P7): interleaved streams decode
bit-exactly and share compiled steps."""

import hashlib

import pytest

from cuda_vp9_tpu.containers import IvfReader
from cuda_vp9_tpu.runtime.multistream import MultiStreamDecoder
from cuda_vp9_tpu.utils.md5 import frame_md5

from conftest import fixture_streams

FIX = {s[0]: s for s in fixture_streams()}


@pytest.mark.slow
def test_two_streams_interleaved():
    # slow: first run compiles the fused step for two geometries (cached
    # in .jax_cache afterwards)
    names = ["kf01_64x64", "kf03_odd_98x66"]
    packets = []
    goldens = []
    for nm in names:
        _, ivf, md5 = FIX[nm]
        with IvfReader(str(ivf)) as r:
            packets.append([d for d, _ in r])
        goldens.append([line.split()[0]
                        for line in md5.read_text().splitlines()])

    msd = MultiStreamDecoder(n_streams=2, lag=2)
    got = [[], []]
    rounds = max(len(p) for p in packets)
    for i in range(rounds):
        for s in range(2):
            if i < len(packets[s]):
                msd.put(s, packets[s][i])
        for s, f in msd.ready():
            got[s].append(frame_md5(f.visible_planes()))
    for s, f in msd.flush():
        got[s].append(frame_md5(f.visible_planes()))
    for s in range(2):
        assert got[s] == goldens[s][:len(got[s])]
        assert len(got[s]) == len(goldens[s])
    assert all(st["device"] + st["host"] > 0 for st in msd.stats())


@pytest.mark.slow
def test_batched_lockstep_decode():
    """BatchedFusedDecoder: N copies of a stream decode in lockstep with
    ONE vmapped device dispatch per round, bit-exact per stream."""
    from cuda_vp9_tpu.runtime.multistream import BatchedFusedDecoder

    _, ivf, md5 = FIX["in01_176x144"]
    with IvfReader(str(ivf)) as r:
        packets = [d for d, _ in r][:6]
    golden = [line.split()[0]
              for line in md5.read_text().splitlines()][:6]

    N = 4
    bd = BatchedFusedDecoder(n_streams=N)
    for p in packets:
        bd.decode_round([p] * N)
    got = {s: [] for s in range(N)}
    for s, fr in bd.drain():
        got[s].append(frame_md5(fr.visible_planes()))
    for s in range(N):
        assert got[s] == golden, f"stream {s} mismatch"
    assert all(r.frames_on_device == 6 for r in bd.recons)


@pytest.mark.slow
def test_batched_mixed_streams():
    """Two different same-geometry streams in one batch."""
    from cuda_vp9_tpu.runtime.multistream import BatchedFusedDecoder

    names = ["in01_176x144", "kf02_176x144"]
    packets, goldens = [], []
    for nm in names:
        _, ivf, md5 = FIX[nm]
        with IvfReader(str(ivf)) as r:
            packets.append([d for d, _ in r][:4])
        goldens.append([line.split()[0]
                        for line in md5.read_text().splitlines()][:4])

    bd = BatchedFusedDecoder(n_streams=2)
    rounds = max(len(p) for p in packets)
    for i in range(rounds):
        bd.decode_round([p[i] if i < len(p) else None for p in packets])
    got = [[], []]
    for s, fr in bd.drain():
        got[s].append(frame_md5(fr.visible_planes()))
    for s in range(2):
        assert got[s] == goldens[s][:len(got[s])], f"stream {s}"
        assert len(got[s]) == len(goldens[s][:4])


@pytest.mark.slow
def test_batched_geometry_change_survives():
    """A mid-stream resize in ONE stream must not kill the batch: the
    odd-geometry frames take the host oracle while the other streams
    stay on the batched device path, all bit-exact."""
    from cuda_vp9_tpu.runtime.multistream import BatchedFusedDecoder

    names = ["in02_352x288", "sc01_352x288_scaled"]  # sc01 resizes
    packets, goldens = [], []
    for nm in names:
        _, ivf, md5 = FIX[nm]
        with IvfReader(str(ivf)) as r:
            packets.append([d for d, _ in r][:6])
        goldens.append([line.split()[0]
                        for line in md5.read_text().splitlines()][:6])

    bd = BatchedFusedDecoder(n_streams=2)
    rounds = max(len(p) for p in packets)
    for i in range(rounds):
        bd.decode_round([p[i] if i < len(p) else None for p in packets])
    got = [[], []]
    for s, fr in bd.drain():
        got[s].append(frame_md5(fr.visible_planes()))
    for s in range(2):
        assert got[s] == goldens[s][:len(got[s])], f"stream {s}"
        assert len(got[s]) == len(goldens[s][:6])
    assert bd.recons[0].frames_on_device > 0
    assert bd.recons[1].frames_on_host > 0   # resized frames fell back
