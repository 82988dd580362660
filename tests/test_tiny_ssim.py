"""tiny_ssim parity (libvpx/tools/tiny_ssim.c): windowed SSIM and PSNR."""

import numpy as np

from cuda_vp9_tpu.tools.tiny_ssim import _CC, frame_metrics, ssim2


def _brute_ssim2(a, b):
    def ssim8(s, r):
        s = s.astype(np.int64)
        r = r.astype(np.int64)
        count = 64
        cc1, cc2 = _CC[8]
        c1 = (cc1 * count * count) >> 12
        c2 = (cc2 * count * count) >> 12
        n = ((2.0 * s.sum() * r.sum() + c1)
             * (2.0 * count * (s * r).sum()
                - 2.0 * s.sum() * r.sum() + c2))
        d = ((float(s.sum() ** 2) + float(r.sum() ** 2) + c1)
             * (float(count * (s * s).sum()) - float(s.sum() ** 2)
                + float(count * (r * r).sum()) - float(r.sum() ** 2) + c2))
        return n / d

    h, w = a.shape
    tot, cnt = 0.0, 0
    for i in range(0, h - 7, 4):
        for j in range(0, w - 7, 4):
            tot += ssim8(a[i:i + 8, j:j + 8], b[i:i + 8, j:j + 8])
            cnt += 1
    return tot / cnt


def test_ssim2_matches_reference_windows():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (36, 44)).astype(np.uint8)
    b = np.clip(a.astype(int) + rng.integers(-20, 21, a.shape),
                0, 255).astype(np.uint8)
    assert abs(ssim2(a, b) - _brute_ssim2(a, b)) < 1e-12


def test_identity_and_psnr():
    rng = np.random.default_rng(5)
    y = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    c = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    psnr, sy, su, sv, sse, n = frame_metrics([y, c, c], [y, c, c])
    assert psnr == 100.0 and sy == su == sv == 1.0 and sse == 0
    y2 = y.copy()
    y2[0, 0] ^= 4
    psnr2, *_ = frame_metrics([y2, c, c], [y, c, c])
    assert psnr2 < 100.0
