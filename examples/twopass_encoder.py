"""twopass_encoder parity: two-pass VP9 encode of a raw I420 file.

Reference: libvpx/examples/twopass_encoder.c — pass 1 gathers stats
(VPX_RC_FIRST_PASS), pass 2 encodes using them (VPX_RC_LAST_PASS).
Here pass 1 computes per-frame intra/inter complexity (the
vp9_firstpass.c coded_error/intra_error shape) and pass 2 turns the
stats into per-frame byte targets and scene-cut keyframes.

Usage: python examples/twopass_encoder.py W H in.yuv out.ivf bitrate_kbps
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402

from cuda_vp9_tpu.containers.ivf import IvfWriter  # noqa: E402
from cuda_vp9_tpu.encoder import Vp9Encoder  # noqa: E402

FPS = 30.0


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


def first_pass(src):
    """Per-frame (intra_err, inter_err) stats (vp9_firstpass.c shape)."""
    stats = []
    prev = None
    for planes in src:
        y = np.asarray(planes[0], np.int64)
        intra_err = float(np.abs(y - int(y.mean())).mean())
        inter_err = (float(np.abs(y - prev).mean())
                     if prev is not None else intra_err)
        stats.append((intra_err, inter_err))
        prev = y
    return stats


def allocate(stats, bitrate_kbps):
    """Stats -> (per-frame byte targets, keyframe decisions)."""
    budget = bitrate_kbps * 1000.0 / 8.0 * len(stats) / FPS
    keys = [i == 0 or (s[1] > 0.9 * s[0] and s[1] > 12.0)
            for i, s in enumerate(stats)]
    weights = [(4.0 if keys[i] else 1.0)
               * (0.2 + stats[i][0 if keys[i] else 1])
               for i in range(len(stats))]
    wsum = sum(weights) or 1.0
    return [budget * wt / wsum for wt in weights], keys


def main(argv):
    if len(argv) < 6:
        print(__doc__, file=sys.stderr)
        return 1
    w, h = int(argv[1]), int(argv[2])
    bitrate = int(argv[5])
    # ---- pass 1
    stats = first_pass(read_i420(argv[3], w, h))
    targets, keys = allocate(stats, bitrate)
    print(f"first pass: {len(stats)} frames, "
          f"{sum(keys)} keyframes planned", file=sys.stderr)
    # ---- pass 2
    enc = Vp9Encoder(w, h, base_qindex=90, gop=9999,
                     target_bitrate_kbps=bitrate, fps=FPS)
    total = 0
    with open(argv[4], "wb") as f:
        wr = IvfWriter(f, b"VP90", w, h, int(FPS), 1)
        for n, planes in enumerate(read_i420(argv[3], w, h)):
            enc.next_frame_target = targets[n]
            payload = enc.encode_frame(planes, force_key=keys[n])
            wr.write_frame(payload, n)
            total += len(payload)
        wr.close()
    kbps = total * 8.0 * FPS / (len(stats) * 1000.0)
    print(f"second pass: {len(stats)} frames, {total} bytes "
          f"({kbps:.0f} kbps vs target {bitrate})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
