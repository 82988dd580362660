"""vp9_lossless_encoder parity: mathematically lossless VP9 encode.

Reference: libvpx/examples/vp9_lossless_encoder.c (VP9E_SET_LOSSLESS).
Decoding the output reproduces the input bytes exactly.

Usage: python examples/vp9_lossless_encoder.py W H in.yuv out.ivf
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from cuda_vp9_tpu.containers.ivf import IvfWriter  # noqa: E402
from cuda_vp9_tpu.encoder import Vp9Encoder  # noqa: E402
from simple_encoder import read_i420  # noqa: E402


def main(argv):
    if len(argv) != 5:
        print(__doc__, file=sys.stderr)
        return 1
    w, h = int(argv[1]), int(argv[2])
    enc = Vp9Encoder(w, h, lossless=True)
    n = 0
    with open(argv[4], "wb") as f:
        wr = IvfWriter(f, b"VP90", w, h, 30, 1)
        for planes in read_i420(argv[3], w, h):
            wr.write_frame(enc.encode_frame(planes), n)
            n += 1
        wr.close()
    print(f"encoded {n} lossless frames", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
