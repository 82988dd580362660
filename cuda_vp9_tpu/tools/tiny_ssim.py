"""tiny_ssim parity: per-frame and global PSNR/SSIM between two raw
YUV (I420) files or a decoded stream and a raw file.

Reference behavior: libvpx/tools/tiny_ssim.c — SSIM is the mean of
8x8-window similarities sampled every 4 pixels (ssim2 :272,
ssim_8x8 :255, similarity :226 with the cc1/cc2 constants scaled by
count^2 >> 12), PSNR from summed squared error (mse2psnr :79, capped
at 100 dB).  Vectorized in numpy; bit-identical windows/aggregation.

Usage:
    python -m cuda_vp9_tpu.tools.tiny_ssim a.yuv b.yuv WxH
    python -m cuda_vp9_tpu.tools.tiny_ssim a.ivf b.yuv      # decode a
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

MAX_PSNR = 100.0
_CC = {8: (26634, 239708), 10: (428658, 3857925),
       12: (6857236, 61862325)}


def _window_sums(x, y):
    """8x8 window sums at every 4-px offset: [wy, wx] maps."""
    # integral images for O(1) window sums
    def integ(a):
        return np.pad(a.astype(np.int64).cumsum(0).cumsum(1),
                      ((1, 0), (1, 0)))

    def win(ii):
        return (ii[8::4, 8::4] - ii[8::4, :-8:4][:, :ii[8::4, 8::4].shape[1]]
                - ii[:-8:4, 8::4][:ii[8::4, 8::4].shape[0]]
                + ii[:-8:4, :-8:4][:ii[8::4, 8::4].shape[0],
                                   :ii[8::4, 8::4].shape[1]])

    return (win(integ(x)), win(integ(y)), win(integ(x * x)),
            win(integ(y * y)), win(integ(x * y)))


def ssim2(a, b, bd=8):
    """tools/tiny_ssim.c ssim2: mean 8x8-window SSIM, 4-px sampling."""
    h, w = a.shape
    if h < 8 or w < 8:
        return 1.0
    x = a.astype(np.int64)
    y = b.astype(np.int64)
    s, r, ss, rr, sr = _window_sums(x, y)
    count = 64
    cc1, cc2 = _CC[bd]
    c1 = (cc1 * count * count) >> 12
    c2 = (cc2 * count * count) >> 12
    s = s.astype(np.float64)
    r = r.astype(np.float64)
    n = (2.0 * s * r + c1) * (2.0 * count * sr - 2.0 * s * r + c2)
    d = (s * s + r * r + c1) * (count * ss - s * s
                                + count * rr - r * r + c2)
    return float((n / d).mean())


def mse2psnr(samples, peak, mse):
    if mse > 0.0:
        psnr = 10.0 * np.log10(peak * peak * samples / mse)
    else:
        psnr = MAX_PSNR
    return min(psnr, MAX_PSNR)


def frame_metrics(planes_a, planes_b, bd=8):
    """(psnr, ssim_y, ssim_u, ssim_v, sse, samples) for one frame."""
    peak = (1 << bd) - 1
    sse = 0
    n = 0
    ssims = []
    for pa, pb in zip(planes_a, planes_b):
        d = pa.astype(np.int64) - pb.astype(np.int64)
        sse += int((d * d).sum())
        n += d.size
        ssims.append(ssim2(pa, pb, bd))
    return mse2psnr(n, peak, sse), ssims[0], ssims[1], ssims[2], sse, n


def _read_yuv(path, w, h, bd=8):
    dt = np.uint16 if bd > 8 else np.uint8
    itemsize = 2 if bd > 8 else 1
    cw, ch = (w + 1) // 2, (h + 1) // 2
    fsz = (w * h + 2 * cw * ch) * itemsize
    with open(path, "rb") as f:
        while True:
            buf = f.read(fsz)
            if len(buf) < fsz:
                return
            a = np.frombuffer(buf, dt)
            yield [a[:w * h].reshape(h, w),
                   a[w * h:w * h + cw * ch].reshape(ch, cw),
                   a[w * h + cw * ch:].reshape(ch, cw)]


def _frames_of(path, size):
    if path.endswith(".ivf") or path.endswith(".webm"):
        from ..containers import open_video
        from ..decoder.frame import NativeVp9Decoder
        dec = NativeVp9Decoder()
        with open_video(path) as r:
            for data, _pts in r:
                dec.decode(data)
                for fr in dec.frames():
                    yield fr.visible_planes()
    else:
        if not size:
            raise SystemExit("raw .yuv inputs need an explicit WxH size")
        w, h = (int(v) for v in size.split("x"))
        yield from _read_yuv(path, w, h)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tiny_ssim", description=__doc__)
    ap.add_argument("file1")
    ap.add_argument("file2")
    ap.add_argument("size", nargs="?", default=None, metavar="WxH",
                    help="frame size (required for raw .yuv inputs)")
    ap.add_argument("--bd", type=int, default=8)
    args = ap.parse_args(argv)

    ssim_t = np.zeros(3)
    sse_t = 0
    n_t = 0
    nf = 0
    for fa, fb in zip(_frames_of(args.file1, args.size),
                      _frames_of(args.file2, args.size)):
        psnr, sy, su, sv, sse, n = frame_metrics(fa, fb, args.bd)
        print(f"Frame {nf}: psnr={psnr:.4f} ssim_y={sy:.6f} "
              f"ssim_u={su:.6f} ssim_v={sv:.6f}")
        ssim_t += (sy, su, sv)
        sse_t += sse
        n_t += n
        nf += 1
    if nf == 0:
        print("no frames", file=sys.stderr)
        return 1
    peak = (1 << args.bd) - 1
    print(f"PSNR: {mse2psnr(n_t, peak, sse_t):.6f}")
    print(f"SSIM-Y: {ssim_t[0] / nf:.6f}")
    print(f"SSIM-U: {ssim_t[1] / nf:.6f}")
    print(f"SSIM-V: {ssim_t[2] / nf:.6f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
