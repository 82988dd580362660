"""set_maps parity: apply and clear ROI segmentation maps mid-stream.

Reference: libvpx/examples/set_maps.c — sets an ROI map (4 segments
with quantizer deltas) on one frame, an active map later, and clears it
again, demonstrating per-region encoder control.  Here the ROI rides
VP9 segmentation (SEG_LVL_ALT_Q), applied at frame N/4, remapped at
N/2, and cleared at 3N/4.

Usage: python examples/set_maps.py W H in.yuv out.ivf
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402

from cuda_vp9_tpu.containers.ivf import IvfWriter  # noqa: E402
from cuda_vp9_tpu.encoder import Vp9Encoder  # noqa: E402


def read_i420(path, w, h):
    cw, ch = (w + 1) // 2, (h + 1) // 2
    fsz = w * h + 2 * cw * ch
    with open(path, "rb") as f:
        data = f.read()
    for off in range(0, len(data) - fsz + 1, fsz):
        y = np.frombuffer(data, np.uint8, w * h, off).reshape(h, w)
        u = np.frombuffer(data, np.uint8, cw * ch,
                          off + w * h).reshape(ch, cw)
        v = np.frombuffer(data, np.uint8, cw * ch,
                          off + w * h + cw * ch).reshape(ch, cw)
        yield [y, u, v]


def roi_map(enc):
    """Center-window ROI (set_maps.c's set_roi_map shape): segment 1
    boosts the middle of the frame, segment 2 relaxes the border."""
    seg = np.full((enc.mi_rows, enc.mi_cols), 2, np.int32)
    r0, r1 = enc.mi_rows // 4, 3 * enc.mi_rows // 4
    c0, c1 = enc.mi_cols // 4, 3 * enc.mi_cols // 4
    seg[r0:r1, c0:c1] = 1
    return seg


def main(argv):
    if len(argv) < 5:
        print(__doc__, file=sys.stderr)
        return 1
    w, h = int(argv[1]), int(argv[2])
    enc = Vp9Encoder(w, h, base_qindex=80, gop=9999)
    frames = list(read_i420(argv[3], w, h))
    n_total = len(frames)
    with open(argv[4], "wb") as f:
        wr = IvfWriter(f, b"VP90", w, h, 30, 1)
        for n, planes in enumerate(frames):
            if n == max(1, n_total // 4):
                enc.set_segmentation(roi_map(enc), [0, -40, 24])
                print(f"frame {n}: ROI map set", file=sys.stderr)
            elif n == max(2, n_total // 2):
                enc.set_segmentation(roi_map(enc), [0, -60, 40])
                print(f"frame {n}: ROI map updated", file=sys.stderr)
            elif n == max(3, 3 * n_total // 4):
                enc.set_segmentation(None, None)
                print(f"frame {n}: maps cleared", file=sys.stderr)
            wr.write_frame(enc.encode_frame(planes), n)
        wr.close()
    print(f"encoded {n_total} frames", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
