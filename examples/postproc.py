"""postproc parity: decode VP8 with display-side post-processing,
reconfiguring the filters mid-stream.

Reference: libvpx/examples/postproc.c — inits the decoder with
VPX_CODEC_USE_POSTPROC and switches VP8_SET_POSTPROC configs while
decoding (no filtering, then deblock+demacroblock+addnoise).

Usage: python examples/postproc.py in.ivf out.yuv
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402

from cuda_vp9_tpu.codec import (CodecCtx, DecCfg, FrameIter, PostProcCfg,  # noqa: E402
                                VP8D_ADDNOISE, VP8D_DEBLOCK,
                                VP8D_DEMACROBLOCK, VP8D_NOFILTERING,
                                VP8_SET_POSTPROC, VPX_CODEC_OK,
                                VPX_CODEC_USE_POSTPROC, vp8_dx,
                                vpx_codec_control, vpx_codec_dec_init,
                                vpx_codec_decode, vpx_codec_get_frame)
from cuda_vp9_tpu.containers import IvfReader  # noqa: E402


def main(argv):
    if len(argv) < 3:
        print(__doc__, file=sys.stderr)
        return 1
    ctx = CodecCtx()
    if vpx_codec_dec_init(ctx, vp8_dx(), DecCfg(),
                          VPX_CODEC_USE_POSTPROC) != VPX_CODEC_OK:
        print("postproc not supported", file=sys.stderr)
        return 1
    n = 0
    with IvfReader(argv[1]) as r, open(argv[2], "wb") as fo:
        for payload, _pts in r:
            # reference shape: frames 0-3 unfiltered, 4-7 full
            # deblock+demacroblock+addnoise, then the defaults
            if n == 0:
                vpx_codec_control(ctx, VP8_SET_POSTPROC,
                                  PostProcCfg(VP8D_NOFILTERING))
            elif n == 4:
                vpx_codec_control(
                    ctx, VP8_SET_POSTPROC,
                    PostProcCfg(VP8D_DEBLOCK | VP8D_DEMACROBLOCK
                                | VP8D_ADDNOISE, 4, 1))
            elif n == 8:
                vpx_codec_control(ctx, VP8_SET_POSTPROC,
                                  PostProcCfg(VP8D_DEBLOCK
                                              | VP8D_DEMACROBLOCK))
            if vpx_codec_decode(ctx, payload) != VPX_CODEC_OK:
                print("decode failed", file=sys.stderr)
                return 1
            it = FrameIter()
            while (img := vpx_codec_get_frame(ctx, it)) is not None:
                for p in img.planes:
                    fo.write(np.ascontiguousarray(p).astype(np.uint8)
                             .tobytes())
                n += 1
    print(f"decoded {n} frames with postproc", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
