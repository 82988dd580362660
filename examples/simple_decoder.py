"""simple_decoder parity: decode an IVF file to raw I420.

Reference: libvpx/examples/simple_decoder.c — the minimal codec-API
consumer (dec_init / decode / get_frame loop), writing planar YUV.

Usage: python examples/simple_decoder.py in.ivf out.yuv
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402

from cuda_vp9_tpu.codec import (CodecCtx, DecCfg, FrameIter,  # noqa: E402
                                vp8_dx, vp9_dx, vpx_codec_dec_init,
                                vpx_codec_decode, vpx_codec_destroy,
                                vpx_codec_get_frame, VPX_CODEC_OK)
from cuda_vp9_tpu.containers import IvfReader  # noqa: E402


def main(argv):
    if len(argv) != 3:
        print(__doc__, file=sys.stderr)
        return 1
    with IvfReader(argv[1]) as r:
        iface = vp8_dx() if r.fourcc == b"VP80" else vp9_dx()
        packets = [d for d, _ in r]
    ctx = CodecCtx()
    if vpx_codec_dec_init(ctx, iface, DecCfg()) != VPX_CODEC_OK:
        print("init failed", file=sys.stderr)
        return 1
    n = 0
    with open(argv[2], "wb") as out:
        for pkt in packets:
            if vpx_codec_decode(ctx, pkt) != VPX_CODEC_OK:
                print(f"decode error: {ctx.err_detail}", file=sys.stderr)
                return 1
            it = FrameIter()
            while (img := vpx_codec_get_frame(ctx, it)) is not None:
                for p in range(3):
                    plane = np.asarray(img.planes[p])
                    h = img.d_h if p == 0 else (img.d_h + 1) // 2
                    w = img.d_w if p == 0 else (img.d_w + 1) // 2
                    out.write(plane[:h, :w].astype(np.uint8).tobytes())
                n += 1
    vpx_codec_destroy(ctx)
    print(f"decoded {n} frames", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
