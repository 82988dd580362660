"""simple_encoder parity: encode raw I420 to a VP9 IVF file.

Reference: libvpx/examples/simple_encoder.c (minimal encode loop).

Usage: python examples/simple_encoder.py W H in.yuv out.ivf [qindex]
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


def main(argv):
    if len(argv) < 5:
        print(__doc__, file=sys.stderr)
        return 1
    w, h = int(argv[1]), int(argv[2])
    q = int(argv[5]) if len(argv) > 5 else 60
    enc = Vp9Encoder(w, h, base_qindex=q, gop=8)
    n = 0
    with open(argv[4], "wb") as f:
        wr = IvfWriter(f, b"VP90", w, h, 30, 1)
        for planes in read_i420(argv[3], w, h):
            wr.write_frame(enc.encode_frame(planes), n)
            n += 1
        wr.close()
    print(f"encoded {n} frames", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
