"""decode_with_drops parity: decode an IVF file, dropping a frame range.

Reference: libvpx/examples/decode_with_drops.c — demonstrates that a
decoder keeps working when non-reference frames are dropped (and how
drops corrupt when reference frames go missing; pair with
error-resilient or temporal-SVC streams for clean drops).

Usage: python examples/decode_with_drops.py in.ivf out.yuv N-M
       (drops packets N..M, 1-based inclusive)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402

from cuda_vp9_tpu.codec import (CodecCtx, DecCfg, FrameIter,  # noqa: E402
                                vp9_dx, vpx_codec_dec_init,
                                vpx_codec_decode, vpx_codec_destroy,
                                vpx_codec_get_frame, VPX_CODEC_OK)
from cuda_vp9_tpu.containers import IvfReader  # noqa: E402


def main(argv):
    if len(argv) != 4:
        print(__doc__, file=sys.stderr)
        return 1
    lo, hi = (int(v) for v in argv[3].split("-"))
    ctx = CodecCtx()
    assert vpx_codec_dec_init(ctx, vp9_dx(), DecCfg()) == VPX_CODEC_OK
    n = shown = 0
    with IvfReader(argv[1]) as r, open(argv[2], "wb") as out:
        for pkt, _ in r:
            n += 1
            if lo <= n <= hi:
                continue                       # drop
            if vpx_codec_decode(ctx, pkt) != VPX_CODEC_OK:
                print(f"decode error on packet {n}: {ctx.err_detail}",
                      file=sys.stderr)
                continue
            it = FrameIter()
            while (img := vpx_codec_get_frame(ctx, it)) is not None:
                for p in range(3):
                    plane = np.asarray(img.planes[p])
                    hh = img.d_h if p == 0 else (img.d_h + 1) // 2
                    ww = img.d_w if p == 0 else (img.d_w + 1) // 2
                    out.write(plane[:hh, :ww].astype(np.uint8).tobytes())
                shown += 1
    vpx_codec_destroy(ctx)
    print(f"{n} packets, dropped {max(0, min(hi, n) - lo + 1)}, "
          f"{shown} frames out", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
