"""vp8_multi_resolution_encoder parity: encode one input at three
resolutions (1x, 1/2, 1/4) into three VP8 IVF streams.

Reference: libvpx/examples/vp8_multi_resolution_encoder.c — a
simulcast ladder: each level downsamples the source 2x (the reference
uses libyuv's scaler; here the codec's own normative 8-tap polyphase
resize — examples/resize_util.py's path) and encodes with its own
rate budget.

Usage: python examples/vp8_multi_resolution_encoder.py W H in.yuv \
           out1.ivf out2.ivf out3.ivf [kbps1 kbps2 kbps3]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402

from cuda_vp9_tpu.containers.ivf import IvfWriter  # noqa: E402
from cuda_vp9_tpu.vp8 import Vp8Encoder  # noqa: E402
from resize_util import resize_plane  # noqa: E402


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


def main(argv):
    if len(argv) < 7:
        print(__doc__, file=sys.stderr)
        return 1
    w, h = int(argv[1]), int(argv[2])
    outs = argv[4:7]
    rates = [int(x) for x in argv[7:10]] or [0, 0, 0]
    rates += [0] * (3 - len(rates))
    dims = [(w, h), (w // 2, h // 2), (w // 4, h // 4)]
    encs, writers, files = [], [], []
    for (dw, dh), path, kbps in zip(dims, outs, rates):
        encs.append(Vp8Encoder(dw, dh, qindex=40, filter_level=16,
                               bitrate_kbps=kbps, kf_interval=9999))
        f = open(path, "wb")
        files.append(f)
        writers.append(IvfWriter(f, b"VP80", dw, dh, 30, 1))
    n = 0
    for planes in read_i420(argv[3], w, h):
        for li, ((dw, dh), enc, wr) in enumerate(zip(dims, encs, writers)):
            if li == 0:
                lp = planes
            else:
                dcw, dch = (dw + 1) // 2, (dh + 1) // 2
                lp = [resize_plane(planes[0], dw, dh),
                      resize_plane(planes[1], dcw, dch),
                      resize_plane(planes[2], dcw, dch)]
            wr.write_frame(enc.encode_frame(lp), n)
        n += 1
    for wr, f in zip(writers, files):
        wr.close()
        f.close()
    print(f"encoded {n} frames x {len(dims)} resolutions "
          + " ".join(f"{dw}x{dh}" for dw, dh in dims), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
