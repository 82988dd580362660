"""vpxdec parity: decode IVF VP9 streams via the public codec API.

Reference: libvpx/vpxdec.c (main_loop) — same decode/get_frame loop,
--md5 per-frame digests (update_image_md5), raw/Y4M output writers.

Usage:
  python -m cuda_vp9_tpu.tools.vpxdec in.{ivf,webm} [--md5] [--limit N]
         [-o out.y4m|out.yuv] [--summary] [--host-recon]
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import time

from ..codec import (CodecCtx, DecCfg, FrameIter, vp9_dx, vpx_codec_decode,
                     vpx_codec_dec_init, vpx_codec_destroy,
                     vpx_codec_get_frame)
from ..containers import open_video


def _write_y4m_header(f, w, h, bit_depth, fps=(30, 1)):
    c = "420" if bit_depth == 8 else f"420p{bit_depth}"
    f.write(f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{c}\n"
            .encode())


def _write_frame(f, img, y4m):
    if y4m:
        f.write(b"FRAME\n")
    for p in img.planes:
        f.write(p.tobytes())


def _md5(img):
    m = hashlib.md5()
    for p in img.planes:
        m.update(p.tobytes())
    return m.hexdigest()


def main(argv=None):
    ap = argparse.ArgumentParser(prog="vpxdec", description=__doc__)
    ap.add_argument("input")
    ap.add_argument("--md5", action="store_true",
                    help="print per-frame MD5 (decode_to_md5 format)")
    ap.add_argument("--limit", type=int, default=0, metavar="N",
                    help="stop after N frames")
    ap.add_argument("-o", "--output", default=None,
                    help="write frames (.y4m or raw .yuv)")
    ap.add_argument("--summary", action="store_true",
                    help="print decode rate summary")
    ap.add_argument("--host-recon", action="store_true",
                    help="force the host (numpy) reconstruction path")
    ap.add_argument("-t", "--threads", type=int, default=1,
                    help="tile-parallel host parse threads (vpxdec -t)")
    args = ap.parse_args(argv)

    if args.host_recon:
        import os
        os.environ["CUDA_VP9_TPU_HOST_RECON"] = "1"

    ctx = CodecCtx()
    # pick the codec by container fourcc (vpxdec.c probes the input)
    from ..codec import vp8_dx
    base = vp9_dx()
    try:
        from ..containers import IvfReader
        with IvfReader(args.input) as probe:
            if probe.fourcc == b"VP80":
                base = vp8_dx()
    except Exception:
        pass
    iface = base
    if args.host_recon:
        class _HostIface:
            name = base.name

            def make_decoder(self, cfg, use_device):
                return base.make_decoder(cfg, False)
        iface = _HostIface()
    if vpx_codec_dec_init(ctx, iface, DecCfg(threads=args.threads)) != 0:
        print("failed to init decoder", file=sys.stderr)
        return 1

    from collections import deque
    out = None
    y4m = False
    n = 0
    q = deque()  # consume 32 behind decode: keeps the TPU output ring
    t0 = time.time()  # batched (Image planes are lazy)

    def consume(img):
        nonlocal out, y4m, n
        if args.output and out is None:
            y4m = args.output.endswith(".y4m")
            out = open(args.output, "wb")
            if y4m:
                _write_y4m_header(out, img.d_w, img.d_h, img.bit_depth)
        if args.md5:
            print(f"{_md5(img)}  img-{img.d_w}x{img.d_h}-"
                  f"{n + 1:04d}.i420")
        if out:
            _write_frame(out, img, y4m)
        n += 1

    with open_video(args.input) as r:
        for data, _pts in r:
            if vpx_codec_decode(ctx, data) != 0:
                print(f"decode error: {ctx.err_detail}", file=sys.stderr)
                return 1
            it = FrameIter()
            while (img := vpx_codec_get_frame(ctx, it)) is not None:
                q.append(img)
            while len(q) > 32:
                consume(q.popleft())
                if args.limit and n >= args.limit:
                    break
            if args.limit and n >= args.limit:
                break
    while q and not (args.limit and n >= args.limit):
        consume(q.popleft())
    dt = time.time() - t0
    if out:
        out.close()
    if args.summary:
        print(f"{n} frames in {dt:.2f}s ({n / dt:.2f} fps)",
              file=sys.stderr)
    vpx_codec_destroy(ctx)
    return 0


if __name__ == "__main__":
    sys.exit(main())
