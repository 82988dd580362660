"""resize_util parity: scale a raw I420 file between resolutions.

Reference: libvpx/examples/resize_util.c (vp9_resize_frame420).  The
scaling here rides the codec's normative scaled-prediction path — the
same 8-tap polyphase convolve with q4 position stepping the decoder
uses for scaled references (vpx_scaled_2d / vp9_scale_and_extend_frame
semantics, ops/ref/inter.convolve_block) — so output pixels match what
an SVC decode of the same ratio would predict.

Usage: python examples/resize_util.py in.yuv W1xH1 out.yuv W2xH2 [frames]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402

from cuda_vp9_tpu import models as M  # noqa: E402
from cuda_vp9_tpu.ops.ref.inter import convolve_block  # noqa: E402

EIGHTTAP = 0


def resize_plane(src, dw, dh):
    """8-tap polyphase resize with edge-clamped sampling (the decoder's
    scaled-MC math at MV 0)."""
    sh, sw = src.shape
    if (sw, sh) == (dw, dh):
        return src.copy()
    xs = max(1, (sw * 16) // dw)
    ys = max(1, (sh * 16) // dh)
    kernel = M.FILTER_KERNELS[EIGHTTAP]
    out = convolve_block(src.astype(np.int64), sw, sh, 0, 0,
                         xs >> 1 & 15, ys >> 1 & 15, xs, ys,
                         dw, dh, kernel, 8, None)
    return out.astype(np.uint8)


def parse_dims(s):
    w, h = s.lower().split("x")
    return int(w), int(h)


def main(argv):
    if len(argv) < 5:
        print(__doc__, file=sys.stderr)
        return 1
    sw, sh = parse_dims(argv[2])
    dw, dh = parse_dims(argv[4])
    limit = int(argv[5]) if len(argv) > 5 else 0
    scw, sch = (sw + 1) // 2, (sh + 1) // 2
    dcw, dch = (dw + 1) // 2, (dh + 1) // 2
    fsz = sw * sh + 2 * scw * sch
    n = 0
    with open(argv[1], "rb") as fi, open(argv[3], "wb") as fo:
        while True:
            buf = fi.read(fsz)
            if len(buf) < fsz or (limit and n >= limit):
                break
            f = np.frombuffer(buf, np.uint8)
            y = f[:sw * sh].reshape(sh, sw)
            u = f[sw * sh:sw * sh + scw * sch].reshape(sch, scw)
            v = f[sw * sh + scw * sch:].reshape(sch, scw)
            fo.write(resize_plane(y, dw, dh).tobytes())
            fo.write(resize_plane(u, dcw, dch).tobytes())
            fo.write(resize_plane(v, dcw, dch).tobytes())
            n += 1
    print(f"resized {n} frames {sw}x{sh} -> {dw}x{dh}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
