"""Native C++ packer vs the Python packer: byte-identical flat buffers.

The C++ packer (native/vp9host_pack.inc) mirrors runtime/pack.py's
emission order exactly, so for every device-eligible frame the two must
produce the same flat int16 tensor.  Frames are reconstructed with the
NumPy oracle so reference state stays bit-exact along the stream.
"""

import numpy as np
import pytest

from cuda_vp9_tpu.containers import IvfReader
from cuda_vp9_tpu.decoder.frame import NativeVp9Decoder
from cuda_vp9_tpu.ops.ref import recon as ref_recon
from cuda_vp9_tpu.runtime import fused, pack
from cuda_vp9_tpu.native import native_compact

from conftest import fixture_streams

MAX_FRAMES = 6


def _eligible(hdr, refs):
    # bd 10/12 exercises the native packer's hi/lo coefficient split
    if hdr.bit_depth not in (8, 10, 12) or hdr.subsampling_x != 1 \
            or hdr.subsampling_y != 1:
        return False
    return True


def _scaled(hdr, refs):
    return not hdr.frame_is_intra_only and any(
        rb is not None and (rb.width != hdr.width
                            or rb.height != hdr.height)
        for rb in refs.values())


def _pool_ha(hdr, refs):
    """Pool canvas height as pipeline._pool_geom_for computes it."""
    pha = ((hdr.mi_rows + 7) & ~7) * 8
    if not hdr.frame_is_intra_only:
        for rb in refs.values():
            if rb is not None:
                mi = (rb.height + 7) // 8
                pha = max(pha, ((mi + 7) & ~7) * 8)
    return pha


@pytest.mark.parametrize("name,ivf,md5", fixture_streams(),
                         ids=[s[0] for s in fixture_streams()])
def test_native_pack_matches_python(name, ivf, md5):
    compared = [0]

    def recon(plan, refs):
        hdr = plan.hdr
        if _eligible(hdr, refs) and compared[0] < MAX_FRAMES:
            scaled = _scaled(hdr, refs)
            pha = _pool_ha(hdr, refs)
            frame_ha = ((hdr.mi_rows + 7) & ~7) * 8
            if scaled:
                tier = "scaled"
            else:
                tier = "full" if hdr.frame_is_intra_only else "tight"
            caps = pack.compute_caps(hdr.mi_rows, hdr.mi_cols, tier,
                                     bool(hdr.lossless), pool_ha=pha)
            layout = pack.build_layout(caps, hdr.mi_rows, hdr.mi_cols,
                                       bool(hdr.lossless),
                                       bd=hdr.bit_depth)
            want = pack.pack_frame(plan, refs, caps, layout, pool_ha=pha)
            if want is not None:
                layout.view(want, "misc")[13] = 7
            got = plan.native_parser.pack(
                plan, refs, caps, layout, ring_slot=7,
                pool_ha=pha if pha != frame_ha else None)
            if want is None or got is None:
                assert (want is None) == (got is None), \
                    f"{name}: overflow behavior diverges"
            else:
                if not np.array_equal(want, got):
                    d = np.nonzero(want != got)[0]
                    segname = None
                    for nm, (off, shape) in layout.segs.items():
                        n = int(np.prod(shape))
                        if off <= d[0] < off + n:
                            segname = (nm, d[0] - off)
                    raise AssertionError(
                        f"{name}: {len(d)} mismatched elements, first at "
                        f"{d[0]} (segment {segname}): "
                        f"py={want[d[0]]} native={got[d[0]]}")
                # compaction parity
                K = want.size // pack.PAGE
                tier_p = 16
                while tier_p < max(16, K // 8):
                    tier_p *= 2
                a = native_compact(want, K, tier_p)
                pg = want.reshape(K, pack.PAGE)
                nz = np.flatnonzero(pg.any(axis=1))
                if len(nz) > tier_p:
                    assert a is None
                else:
                    # gather layout: g[K] page map + zero page + data
                    assert a is not None
                    hr = (K + pack.PAGE - 1) // pack.PAGE
                    g = a[:hr].reshape(-1)[:K].astype(np.int64)
                    assert np.array_equal(np.flatnonzero(g), nz)
                    assert np.array_equal(g[nz], np.arange(1, len(nz) + 1))
                    assert not a[hr].any()  # shared zero page
                    assert np.array_equal(a[hr + g[nz]], pg[nz])
                    # full expansion round-trip
                    assert np.array_equal(
                        a[hr:][g].reshape(-1), want)
            compared[0] += 1
        return ref_recon.reconstruct_frame(plan, refs)

    dec = NativeVp9Decoder(recon_fn=recon)
    with IvfReader(str(ivf)) as r:
        for data, _pts in r:
            dec.decode(data)
            list(dec.frames())
            if compared[0] >= MAX_FRAMES:
                break
    if compared[0] == 0:
        pytest.skip("no device-eligible frames (e.g. 10-bit stream)")
