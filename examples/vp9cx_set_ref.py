"""vp9cx_set_ref parity: overwrite the encoder's AND decoder's LAST
reference on a chosen frame, then verify encode/decode stay in sync.

Reference: libvpx/examples/vp9cx_set_ref.c — encodes a raw video,
applies VP8_SET_REFERENCE to both the encoder and a test decoder at
`update_frame_num`, and dies on any encoder/decoder mismatch.

Usage: python examples/vp9cx_set_ref.py W H in.yuv out.ivf update_frame_num
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402

from cuda_vp9_tpu.codec import (CodecCtx, DecCfg, FrameIter, RefFrame,  # noqa: E402
                                VP8_LAST_FRAME, VP8_SET_REFERENCE,
                                VPX_CODEC_OK, vp9_dx, vpx_codec_control,
                                vpx_codec_dec_init, vpx_codec_decode,
                                vpx_codec_get_frame)
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
    if len(argv) < 6:
        print(__doc__, file=sys.stderr)
        return 1
    w, h = int(argv[1]), int(argv[2])
    update_frame_num = int(argv[5])
    if update_frame_num <= 1:
        print("update_frame_num must be > 1", file=sys.stderr)
        return 1
    enc = Vp9Encoder(w, h, base_qindex=70, gop=9999)
    ctx = CodecCtx()
    if vpx_codec_dec_init(ctx, vp9_dx(), DecCfg()) != VPX_CODEC_OK:
        print("decoder init failed", file=sys.stderr)
        return 1
    cw, ch = (w + 1) // 2, (h + 1) // 2
    mismatch = 0
    n = 0
    with open(argv[4], "wb") as f:
        wr = IvfWriter(f, b"VP90", w, h, 30, 1)
        for planes in read_i420(argv[3], w, h):
            if n == update_frame_num:
                # the C example sets a gray-ish reference; any content
                # works as long as BOTH sides get the same one
                mod = [p[:h, :w].astype(np.int64) for p in enc._ref_recon]
                crop = [((mod[0] + 128) // 2).astype(np.uint16)[:h, :w],
                        mod[1].astype(np.uint16)[:ch, :cw],
                        mod[2].astype(np.uint16)[:ch, :cw]]
                enc.set_reference([c.copy() for c in crop], (w, h))
                rc = vpx_codec_control(
                    ctx, VP8_SET_REFERENCE,
                    RefFrame(VP8_LAST_FRAME, [c.copy() for c in crop]))
                if rc != VPX_CODEC_OK:
                    print("set_reference failed on decoder",
                          file=sys.stderr)
                    return 1
            payload = enc.encode_frame(planes)
            wr.write_frame(payload, n)
            if vpx_codec_decode(ctx, payload) != VPX_CODEC_OK:
                print("decode failed", file=sys.stderr)
                return 1
            it = FrameIter()
            while (img := vpx_codec_get_frame(ctx, it)) is not None:
                rec = enc._last_recon
                dims = [(h, w), (ch, cw), (ch, cw)]
                for p in range(3):
                    dh, dw = dims[p]
                    if not np.array_equal(
                            np.asarray(img.planes[p])[:dh, :dw]
                            .astype(np.int64),
                            np.asarray(rec[p])[:dh, :dw].astype(np.int64)):
                        mismatch += 1
                        print(f"frame {n} plane {p}: enc/dec mismatch",
                              file=sys.stderr)
            n += 1
        wr.close()
    if mismatch:
        print(f"FAILED: {mismatch} plane mismatches", file=sys.stderr)
        return 1
    print(f"encoded and verified {n} frames "
          f"(reference updated at frame {update_frame_num})",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
