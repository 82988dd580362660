"""vpx_temporal_svc_encoder parity: 2 temporal layers over VP9.

Reference: libvpx/examples/vpx_temporal_svc_encoder.c (pattern 1,
"2-layers, 2-frame period").  Even frames are temporal-layer 0: they
predict from and refresh ref slot 0.  Odd frames are temporal-layer 1:
they predict from slot 0 but refresh NOTHING, so dropping every TL1
packet still decodes cleanly at half the frame rate — demonstrated by
examples/decode_with_drops.py or any decoder.

Usage: python examples/vpx_temporal_svc_encoder.py W H in.yuv out.ivf [q]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from cuda_vp9_tpu.containers.ivf import IvfWriter  # noqa: E402
from cuda_vp9_tpu.encoder import Vp9Encoder  # noqa: E402
from simple_encoder import read_i420  # noqa: E402


def main(argv):
    if len(argv) < 5:
        print(__doc__, file=sys.stderr)
        return 1
    w, h = int(argv[1]), int(argv[2])
    q = int(argv[5]) if len(argv) > 5 else 80
    enc = Vp9Encoder(w, h, base_qindex=q, gop=10 ** 9)
    slot0_recon = None
    n = 0
    with open(argv[4], "wb") as f:
        wr = IvfWriter(f, b"VP90", w, h, 30, 1)
        for planes in read_i420(argv[3], w, h):
            tl1 = (n & 1) == 1
            # BOTH layers predict from slot 0 (the last TL0 recon) —
            # never from a TL1 frame, which nothing may reference
            if n > 0:
                enc.set_reference(slot0_recon, (w, h))
            if tl1:
                enc.ref_slot, enc.refresh_slot = 0, None
                payload = enc.encode_frame(planes, force_key=False)
            else:
                enc.ref_slot, enc.refresh_slot = 0, 0
                payload = enc.encode_frame(planes, force_key=(n == 0))
                slot0_recon = [p.copy() for p in enc._last_recon]
            wr.write_frame(payload, n)
            n += 1
        wr.close()
    print(f"encoded {n} frames (2 temporal layers)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
