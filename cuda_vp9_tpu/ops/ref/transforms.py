"""Bit-exact inverse transforms (DCT/ADST/WHT 4..32), batched in NumPy.

Oracle implementations of the normative integer transforms
(vpx_dsp/inv_txfm.c: idct4_c:133, idct8_c:271, idct16_c:557, idct32_c:813,
iadst4_c:96, iadst8_c:196, iadst16_c:389, vpx_iwht4x4_16_add_c:18; 2-D
wrappers vp9/common/vp9_idct.c vp9_iht*).  All arithmetic is int64 with the
normative WRAPLOW points: int16 wrapping for the 8-bit path,
(bd+8)-bit wrapping for the high-bit-depth path.

Every function operates on a batch: input [N, n] (1-D) or [N, n, n] (2-D).
The 2-D entry returns the *residual* block after the final round shift;
callers add it to prediction with pixel clipping (clip_pixel_add).
"""

from __future__ import annotations

import numpy as np

# cosine/sine constants (vpx_dsp/txfm_common.h — normative)
COSPI = [16384, 16364, 16305, 16207, 16069, 15893, 15679, 15426, 15137,
         14811, 14449, 14053, 13623, 13160, 12665, 12140, 11585, 11003,
         10394, 9760, 9102, 8423, 7723, 7005, 6270, 5520, 4756, 3981,
         3196, 2404, 1606, 804]
SINPI = [0, 5283, 9929, 13377, 15212]


def _c(i):
    return COSPI[i]


def make_wrap(bd: int):
    if bd == 8:
        def wrap(x):
            return ((x + 0x8000) & 0xFFFF) - 0x8000
    else:
        m = 1 << (bd + 7)

        def wrap(x):
            return ((x + m) & (2 * m - 1)) - m
    return wrap


def _rs(x):
    """dct_const_round_shift."""
    return (x + 8192) >> 14


def idct4(inp, wrap, cast_in, xp=np):
    i0, i1, i2, i3 = (cast_in(inp[:, k]) for k in range(4))
    s0 = wrap(_rs((i0 + i2) * _c(16)))
    s1 = wrap(_rs((i0 - i2) * _c(16)))
    s2 = wrap(_rs(i1 * _c(24) - i3 * _c(8)))
    s3 = wrap(_rs(i1 * _c(8) + i3 * _c(24)))
    return xp.stack([wrap(s0 + s3), wrap(s1 + s2),
                     wrap(s1 - s2), wrap(s0 - s3)], axis=1)


def iadst4(inp, wrap, cast_in, xp=np):
    x0, x1, x2, x3 = (inp[:, k] for k in range(4))
    s0 = SINPI[1] * x0
    s1 = SINPI[2] * x0
    s2 = SINPI[3] * x1
    s3 = SINPI[4] * x2
    s4 = SINPI[1] * x2
    s5 = SINPI[2] * x3
    s6 = SINPI[4] * x3
    s7 = wrap(x0 - x2 + x3)
    s0 = s0 + s3 + s5
    s1 = s1 - s4 - s6
    s3b = s2
    s2b = SINPI[3] * s7
    return xp.stack([wrap(_rs(s0 + s3b)), wrap(_rs(s1 + s3b)),
                     wrap(_rs(s2b)), wrap(_rs(s0 + s1 - s3b))], axis=1)


def idct8(inp, wrap, cast_in, xp=np):
    i = [cast_in(inp[:, k]) for k in range(8)]
    # stage 1
    s1_0, s1_2, s1_1, s1_3 = i[0], i[4], i[2], i[6]
    s1_4 = wrap(_rs(i[1] * _c(28) - i[7] * _c(4)))
    s1_7 = wrap(_rs(i[1] * _c(4) + i[7] * _c(28)))
    s1_5 = wrap(_rs(i[5] * _c(12) - i[3] * _c(20)))
    s1_6 = wrap(_rs(i[5] * _c(20) + i[3] * _c(12)))
    # stage 2
    s2_0 = wrap(_rs((s1_0 + s1_2) * _c(16)))
    s2_1 = wrap(_rs((s1_0 - s1_2) * _c(16)))
    s2_2 = wrap(_rs(s1_1 * _c(24) - s1_3 * _c(8)))
    s2_3 = wrap(_rs(s1_1 * _c(8) + s1_3 * _c(24)))
    s2_4 = wrap(s1_4 + s1_5)
    s2_5 = wrap(s1_4 - s1_5)
    s2_6 = wrap(-s1_6 + s1_7)
    s2_7 = wrap(s1_6 + s1_7)
    # stage 3
    t0 = wrap(s2_0 + s2_3)
    t1 = wrap(s2_1 + s2_2)
    t2 = wrap(s2_1 - s2_2)
    t3 = wrap(s2_0 - s2_3)
    t4 = s2_4
    t5 = wrap(_rs((s2_6 - s2_5) * _c(16)))
    t6 = wrap(_rs((s2_5 + s2_6) * _c(16)))
    t7 = s2_7
    return xp.stack([wrap(t0 + t7), wrap(t1 + t6), wrap(t2 + t5),
                     wrap(t3 + t4), wrap(t3 - t4), wrap(t2 - t5),
                     wrap(t1 - t6), wrap(t0 - t7)], axis=1)


def iadst8(inp, wrap, cast_in, xp=np):
    x = [inp[:, 7], inp[:, 0], inp[:, 5], inp[:, 2],
         inp[:, 3], inp[:, 4], inp[:, 1], inp[:, 6]]
    # stage 1
    s0 = _c(2) * x[0] + _c(30) * x[1]
    s1 = _c(30) * x[0] - _c(2) * x[1]
    s2 = _c(10) * x[2] + _c(22) * x[3]
    s3 = _c(22) * x[2] - _c(10) * x[3]
    s4 = _c(18) * x[4] + _c(14) * x[5]
    s5 = _c(14) * x[4] - _c(18) * x[5]
    s6 = _c(26) * x[6] + _c(6) * x[7]
    s7 = _c(6) * x[6] - _c(26) * x[7]
    x0 = wrap(_rs(s0 + s4))
    x1 = wrap(_rs(s1 + s5))
    x2 = wrap(_rs(s2 + s6))
    x3 = wrap(_rs(s3 + s7))
    x4 = wrap(_rs(s0 - s4))
    x5 = wrap(_rs(s1 - s5))
    x6 = wrap(_rs(s2 - s6))
    x7 = wrap(_rs(s3 - s7))
    # stage 2
    s0, s1, s2, s3 = x0, x1, x2, x3
    s4 = _c(8) * x4 + _c(24) * x5
    s5 = _c(24) * x4 - _c(8) * x5
    s6 = -_c(24) * x6 + _c(8) * x7
    s7 = _c(8) * x6 + _c(24) * x7
    x0 = wrap(s0 + s2)
    x1 = wrap(s1 + s3)
    x2 = wrap(s0 - s2)
    x3 = wrap(s1 - s3)
    x4 = wrap(_rs(s4 + s6))
    x5 = wrap(_rs(s5 + s7))
    x6 = wrap(_rs(s4 - s6))
    x7 = wrap(_rs(s5 - s7))
    # stage 3
    s2 = _c(16) * (x2 + x3)
    s3 = _c(16) * (x2 - x3)
    s6 = _c(16) * (x6 + x7)
    s7 = _c(16) * (x6 - x7)
    x2 = wrap(_rs(s2))
    x3 = wrap(_rs(s3))
    x6 = wrap(_rs(s6))
    x7 = wrap(_rs(s7))
    return xp.stack([wrap(x0), wrap(-x4), wrap(x6), wrap(-x2),
                     wrap(x3), wrap(-x7), wrap(x5), wrap(-x1)], axis=1)


def idct16(inp, wrap, cast_in, xp=np):
    order = [0, 8, 4, 12, 2, 10, 6, 14, 1, 9, 5, 13, 3, 11, 7, 15]
    s1 = [cast_in(inp[:, k]) for k in order]
    s2 = [None] * 16
    # stage 2
    s2[:8] = s1[:8]
    s2[8] = wrap(_rs(s1[8] * _c(30) - s1[15] * _c(2)))
    s2[15] = wrap(_rs(s1[8] * _c(2) + s1[15] * _c(30)))
    s2[9] = wrap(_rs(s1[9] * _c(14) - s1[14] * _c(18)))
    s2[14] = wrap(_rs(s1[9] * _c(18) + s1[14] * _c(14)))
    s2[10] = wrap(_rs(s1[10] * _c(22) - s1[13] * _c(10)))
    s2[13] = wrap(_rs(s1[10] * _c(10) + s1[13] * _c(22)))
    s2[11] = wrap(_rs(s1[11] * _c(6) - s1[12] * _c(26)))
    s2[12] = wrap(_rs(s1[11] * _c(26) + s1[12] * _c(6)))
    # stage 3
    t = [None] * 16
    t[:4] = s2[:4]
    t[4] = wrap(_rs(s2[4] * _c(28) - s2[7] * _c(4)))
    t[7] = wrap(_rs(s2[4] * _c(4) + s2[7] * _c(28)))
    t[5] = wrap(_rs(s2[5] * _c(12) - s2[6] * _c(20)))
    t[6] = wrap(_rs(s2[5] * _c(20) + s2[6] * _c(12)))
    t[8] = wrap(s2[8] + s2[9])
    t[9] = wrap(s2[8] - s2[9])
    t[10] = wrap(-s2[10] + s2[11])
    t[11] = wrap(s2[10] + s2[11])
    t[12] = wrap(s2[12] + s2[13])
    t[13] = wrap(s2[12] - s2[13])
    t[14] = wrap(-s2[14] + s2[15])
    t[15] = wrap(s2[14] + s2[15])
    # stage 4
    u = [None] * 16
    u[0] = wrap(_rs((t[0] + t[1]) * _c(16)))
    u[1] = wrap(_rs((t[0] - t[1]) * _c(16)))
    u[2] = wrap(_rs(t[2] * _c(24) - t[3] * _c(8)))
    u[3] = wrap(_rs(t[2] * _c(8) + t[3] * _c(24)))
    u[4] = wrap(t[4] + t[5])
    u[5] = wrap(t[4] - t[5])
    u[6] = wrap(-t[6] + t[7])
    u[7] = wrap(t[6] + t[7])
    u[8] = t[8]
    u[15] = t[15]
    u[9] = wrap(_rs(-t[9] * _c(8) + t[14] * _c(24)))
    u[14] = wrap(_rs(t[9] * _c(24) + t[14] * _c(8)))
    u[10] = wrap(_rs(-t[10] * _c(24) - t[13] * _c(8)))
    u[13] = wrap(_rs(-t[10] * _c(8) + t[13] * _c(24)))
    u[11] = t[11]
    u[12] = t[12]
    # stage 5
    v = [None] * 16
    v[0] = wrap(u[0] + u[3])
    v[1] = wrap(u[1] + u[2])
    v[2] = wrap(u[1] - u[2])
    v[3] = wrap(u[0] - u[3])
    v[4] = u[4]
    v[5] = wrap(_rs((u[6] - u[5]) * _c(16)))
    v[6] = wrap(_rs((u[5] + u[6]) * _c(16)))
    v[7] = u[7]
    v[8] = wrap(u[8] + u[11])
    v[9] = wrap(u[9] + u[10])
    v[10] = wrap(u[9] - u[10])
    v[11] = wrap(u[8] - u[11])
    v[12] = wrap(-u[12] + u[15])
    v[13] = wrap(-u[13] + u[14])
    v[14] = wrap(u[13] + u[14])
    v[15] = wrap(u[12] + u[15])
    # stage 6
    w = [None] * 16
    w[0] = wrap(v[0] + v[7])
    w[1] = wrap(v[1] + v[6])
    w[2] = wrap(v[2] + v[5])
    w[3] = wrap(v[3] + v[4])
    w[4] = wrap(v[3] - v[4])
    w[5] = wrap(v[2] - v[5])
    w[6] = wrap(v[1] - v[6])
    w[7] = wrap(v[0] - v[7])
    w[8] = v[8]
    w[9] = v[9]
    w[10] = wrap(_rs((-v[10] + v[13]) * _c(16)))
    w[13] = wrap(_rs((v[10] + v[13]) * _c(16)))
    w[11] = wrap(_rs((-v[11] + v[12]) * _c(16)))
    w[12] = wrap(_rs((v[11] + v[12]) * _c(16)))
    w[14] = v[14]
    w[15] = v[15]
    # stage 7
    out = [wrap(w[k] + w[15 - k]) for k in range(8)] + \
          [wrap(w[15 - k] - w[k]) for k in range(8, 16)]
    return xp.stack(out, axis=1)


def iadst16(inp, wrap, cast_in, xp=np):
    order = [15, 0, 13, 2, 11, 4, 9, 6, 7, 8, 5, 10, 3, 12, 1, 14]
    x = [inp[:, k] for k in order]
    # stage 1
    cp = [(1, 31), (5, 27), (9, 23), (13, 19), (17, 15), (21, 11),
          (25, 7), (29, 3)]
    s = [None] * 16
    for k in range(8):
        a, b = cp[k]
        s[2 * k] = x[2 * k] * _c(a) + x[2 * k + 1] * _c(b)
        s[2 * k + 1] = x[2 * k] * _c(b) - x[2 * k + 1] * _c(a)
    for k in range(8):
        x[k] = wrap(_rs(s[k] + s[k + 8]))
        x[k + 8] = wrap(_rs(s[k] - s[k + 8]))
    # stage 2
    s[:8] = x[:8]
    s[8] = x[8] * _c(4) + x[9] * _c(28)
    s[9] = x[8] * _c(28) - x[9] * _c(4)
    s[10] = x[10] * _c(20) + x[11] * _c(12)
    s[11] = x[10] * _c(12) - x[11] * _c(20)
    s[12] = -x[12] * _c(28) + x[13] * _c(4)
    s[13] = x[12] * _c(4) + x[13] * _c(28)
    s[14] = -x[14] * _c(12) + x[15] * _c(20)
    s[15] = x[14] * _c(20) + x[15] * _c(12)
    for k in range(4):
        x[k] = wrap(s[k] + s[k + 4])
        x[k + 4] = wrap(s[k] - s[k + 4])
    for k in range(8, 12):
        x[k] = wrap(_rs(s[k] + s[k + 4]))
        x[k + 4] = wrap(_rs(s[k] - s[k + 4]))
    # stage 3
    s[:4] = x[:4]
    s[4] = x[4] * _c(8) + x[5] * _c(24)
    s[5] = x[4] * _c(24) - x[5] * _c(8)
    s[6] = -x[6] * _c(24) + x[7] * _c(8)
    s[7] = x[6] * _c(8) + x[7] * _c(24)
    s[8], s[9], s[10], s[11] = x[8], x[9], x[10], x[11]
    s[12] = x[12] * _c(8) + x[13] * _c(24)
    s[13] = x[12] * _c(24) - x[13] * _c(8)
    s[14] = -x[14] * _c(24) + x[15] * _c(8)
    s[15] = x[14] * _c(8) + x[15] * _c(24)
    x[0] = wrap(s[0] + s[2])
    x[1] = wrap(s[1] + s[3])
    x[2] = wrap(s[0] - s[2])
    x[3] = wrap(s[1] - s[3])
    x[4] = wrap(_rs(s[4] + s[6]))
    x[5] = wrap(_rs(s[5] + s[7]))
    x[6] = wrap(_rs(s[4] - s[6]))
    x[7] = wrap(_rs(s[5] - s[7]))
    x[8] = wrap(s[8] + s[10])
    x[9] = wrap(s[9] + s[11])
    x[10] = wrap(s[8] - s[10])
    x[11] = wrap(s[9] - s[11])
    x[12] = wrap(_rs(s[12] + s[14]))
    x[13] = wrap(_rs(s[13] + s[15]))
    x[14] = wrap(_rs(s[12] - s[14]))
    x[15] = wrap(_rs(s[13] - s[15]))
    # stage 4
    s[2] = (-_c(16)) * (x[2] + x[3])
    s[3] = _c(16) * (x[2] - x[3])
    s[6] = _c(16) * (x[6] + x[7])
    s[7] = _c(16) * (-x[6] + x[7])
    s[10] = _c(16) * (x[10] + x[11])
    s[11] = _c(16) * (-x[10] + x[11])
    s[14] = (-_c(16)) * (x[14] + x[15])
    s[15] = _c(16) * (x[14] - x[15])
    x[2] = wrap(_rs(s[2]))
    x[3] = wrap(_rs(s[3]))
    x[6] = wrap(_rs(s[6]))
    x[7] = wrap(_rs(s[7]))
    x[10] = wrap(_rs(s[10]))
    x[11] = wrap(_rs(s[11]))
    x[14] = wrap(_rs(s[14]))
    x[15] = wrap(_rs(s[15]))
    out = [x[0], -x[8], x[12], -x[4], x[6], x[14], x[10], x[2],
           x[3], x[11], x[15], x[7], x[5], -x[13], x[9], -x[1]]
    return xp.stack([wrap(o) for o in out], axis=1)


def idct32(inp, wrap, cast_in, xp=np):
    order = [0, 16, 8, 24, 4, 20, 12, 28, 2, 18, 10, 26, 6, 22, 14, 30]
    s1 = [None] * 32
    for k in range(16):
        s1[k] = cast_in(inp[:, order[k]])
    pairs = [(1, 31, 31, 1), (17, 15, 15, 17), (9, 23, 23, 9),
             (25, 7, 7, 25), (5, 27, 27, 5), (21, 11, 11, 21),
             (13, 19, 19, 13), (29, 3, 3, 29)]
    for k in range(8):
        ia, ib, ca, cb = pairs[k]
        a = cast_in(inp[:, ia])
        b = cast_in(inp[:, ib])
        s1[16 + k] = wrap(_rs(a * _c(ca) - b * _c(cb)))
        s1[31 - k] = wrap(_rs(a * _c(cb) + b * _c(ca)))
    # stage 2
    s2 = [None] * 32
    s2[:8] = s1[:8]
    s2[8] = wrap(_rs(s1[8] * _c(30) - s1[15] * _c(2)))
    s2[15] = wrap(_rs(s1[8] * _c(2) + s1[15] * _c(30)))
    s2[9] = wrap(_rs(s1[9] * _c(14) - s1[14] * _c(18)))
    s2[14] = wrap(_rs(s1[9] * _c(18) + s1[14] * _c(14)))
    s2[10] = wrap(_rs(s1[10] * _c(22) - s1[13] * _c(10)))
    s2[13] = wrap(_rs(s1[10] * _c(10) + s1[13] * _c(22)))
    s2[11] = wrap(_rs(s1[11] * _c(6) - s1[12] * _c(26)))
    s2[12] = wrap(_rs(s1[11] * _c(26) + s1[12] * _c(6)))
    for k in range(16, 32, 2):
        s2[k] = wrap(s1[k] + s1[k + 1])
        s2[k + 1] = wrap(s1[k] - s1[k + 1])
    s2[18], s2[19] = wrap(-s1[18] + s1[19]), wrap(s1[18] + s1[19])
    s2[22], s2[23] = wrap(-s1[22] + s1[23]), wrap(s1[22] + s1[23])
    s2[26], s2[27] = wrap(-s1[26] + s1[27]), wrap(s1[26] + s1[27])
    s2[30], s2[31] = wrap(-s1[30] + s1[31]), wrap(s1[30] + s1[31])
    # stage 3
    t = [None] * 32
    t[:4] = s2[:4]
    t[4] = wrap(_rs(s2[4] * _c(28) - s2[7] * _c(4)))
    t[7] = wrap(_rs(s2[4] * _c(4) + s2[7] * _c(28)))
    t[5] = wrap(_rs(s2[5] * _c(12) - s2[6] * _c(20)))
    t[6] = wrap(_rs(s2[5] * _c(20) + s2[6] * _c(12)))
    t[8] = wrap(s2[8] + s2[9])
    t[9] = wrap(s2[8] - s2[9])
    t[10] = wrap(-s2[10] + s2[11])
    t[11] = wrap(s2[10] + s2[11])
    t[12] = wrap(s2[12] + s2[13])
    t[13] = wrap(s2[12] - s2[13])
    t[14] = wrap(-s2[14] + s2[15])
    t[15] = wrap(s2[14] + s2[15])
    t[16] = s2[16]
    t[31] = s2[31]
    t[17] = wrap(_rs(-s2[17] * _c(4) + s2[30] * _c(28)))
    t[30] = wrap(_rs(s2[17] * _c(28) + s2[30] * _c(4)))
    t[18] = wrap(_rs(-s2[18] * _c(28) - s2[29] * _c(4)))
    t[29] = wrap(_rs(-s2[18] * _c(4) + s2[29] * _c(28)))
    t[19] = s2[19]
    t[20] = s2[20]
    t[21] = wrap(_rs(-s2[21] * _c(20) + s2[26] * _c(12)))
    t[26] = wrap(_rs(s2[21] * _c(12) + s2[26] * _c(20)))
    t[22] = wrap(_rs(-s2[22] * _c(12) - s2[25] * _c(20)))
    t[25] = wrap(_rs(-s2[22] * _c(20) + s2[25] * _c(12)))
    t[23] = s2[23]
    t[24] = s2[24]
    t[27] = s2[27]
    t[28] = s2[28]
    # stage 4
    u = [None] * 32
    u[0] = wrap(_rs((t[0] + t[1]) * _c(16)))
    u[1] = wrap(_rs((t[0] - t[1]) * _c(16)))
    u[2] = wrap(_rs(t[2] * _c(24) - t[3] * _c(8)))
    u[3] = wrap(_rs(t[2] * _c(8) + t[3] * _c(24)))
    u[4] = wrap(t[4] + t[5])
    u[5] = wrap(t[4] - t[5])
    u[6] = wrap(-t[6] + t[7])
    u[7] = wrap(t[6] + t[7])
    u[8] = t[8]
    u[15] = t[15]
    u[9] = wrap(_rs(-t[9] * _c(8) + t[14] * _c(24)))
    u[14] = wrap(_rs(t[9] * _c(24) + t[14] * _c(8)))
    u[10] = wrap(_rs(-t[10] * _c(24) - t[13] * _c(8)))
    u[13] = wrap(_rs(-t[10] * _c(8) + t[13] * _c(24)))
    u[11] = t[11]
    u[12] = t[12]
    u[16] = wrap(t[16] + t[19])
    u[17] = wrap(t[17] + t[18])
    u[18] = wrap(t[17] - t[18])
    u[19] = wrap(t[16] - t[19])
    u[20] = wrap(-t[20] + t[23])
    u[21] = wrap(-t[21] + t[22])
    u[22] = wrap(t[21] + t[22])
    u[23] = wrap(t[20] + t[23])
    u[24] = wrap(t[24] + t[27])
    u[25] = wrap(t[25] + t[26])
    u[26] = wrap(t[25] - t[26])
    u[27] = wrap(t[24] - t[27])
    u[28] = wrap(-t[28] + t[31])
    u[29] = wrap(-t[29] + t[30])
    u[30] = wrap(t[29] + t[30])
    u[31] = wrap(t[28] + t[31])
    # stage 5
    v = [None] * 32
    v[0] = wrap(u[0] + u[3])
    v[1] = wrap(u[1] + u[2])
    v[2] = wrap(u[1] - u[2])
    v[3] = wrap(u[0] - u[3])
    v[4] = u[4]
    v[5] = wrap(_rs((u[6] - u[5]) * _c(16)))
    v[6] = wrap(_rs((u[5] + u[6]) * _c(16)))
    v[7] = u[7]
    v[8] = wrap(u[8] + u[11])
    v[9] = wrap(u[9] + u[10])
    v[10] = wrap(u[9] - u[10])
    v[11] = wrap(u[8] - u[11])
    v[12] = wrap(-u[12] + u[15])
    v[13] = wrap(-u[13] + u[14])
    v[14] = wrap(u[13] + u[14])
    v[15] = wrap(u[12] + u[15])
    v[16] = u[16]
    v[17] = u[17]
    v[18] = wrap(_rs(-u[18] * _c(8) + u[29] * _c(24)))
    v[29] = wrap(_rs(u[18] * _c(24) + u[29] * _c(8)))
    v[19] = wrap(_rs(-u[19] * _c(8) + u[28] * _c(24)))
    v[28] = wrap(_rs(u[19] * _c(24) + u[28] * _c(8)))
    v[20] = wrap(_rs(-u[20] * _c(24) - u[27] * _c(8)))
    v[27] = wrap(_rs(-u[20] * _c(8) + u[27] * _c(24)))
    v[21] = wrap(_rs(-u[21] * _c(24) - u[26] * _c(8)))
    v[26] = wrap(_rs(-u[21] * _c(8) + u[26] * _c(24)))
    v[22] = u[22]
    v[23] = u[23]
    v[24] = u[24]
    v[25] = u[25]
    v[30] = u[30]
    v[31] = u[31]
    # stage 6
    w = [None] * 32
    w[0] = wrap(v[0] + v[7])
    w[1] = wrap(v[1] + v[6])
    w[2] = wrap(v[2] + v[5])
    w[3] = wrap(v[3] + v[4])
    w[4] = wrap(v[3] - v[4])
    w[5] = wrap(v[2] - v[5])
    w[6] = wrap(v[1] - v[6])
    w[7] = wrap(v[0] - v[7])
    w[8] = v[8]
    w[9] = v[9]
    w[10] = wrap(_rs((-v[10] + v[13]) * _c(16)))
    w[13] = wrap(_rs((v[10] + v[13]) * _c(16)))
    w[11] = wrap(_rs((-v[11] + v[12]) * _c(16)))
    w[12] = wrap(_rs((v[11] + v[12]) * _c(16)))
    w[14] = v[14]
    w[15] = v[15]
    w[16] = wrap(v[16] + v[23])
    w[17] = wrap(v[17] + v[22])
    w[18] = wrap(v[18] + v[21])
    w[19] = wrap(v[19] + v[20])
    w[20] = wrap(v[19] - v[20])
    w[21] = wrap(v[18] - v[21])
    w[22] = wrap(v[17] - v[22])
    w[23] = wrap(v[16] - v[23])
    w[24] = wrap(-v[24] + v[31])
    w[25] = wrap(-v[25] + v[30])
    w[26] = wrap(-v[26] + v[29])
    w[27] = wrap(-v[27] + v[28])
    w[28] = wrap(v[27] + v[28])
    w[29] = wrap(v[26] + v[29])
    w[30] = wrap(v[25] + v[30])
    w[31] = wrap(v[24] + v[31])
    # stage 7
    p = [None] * 32
    for k in range(8):
        p[k] = wrap(w[k] + w[15 - k])
    for k in range(8, 16):
        p[k] = wrap(w[15 - k] - w[k])
    p[16] = w[16]
    p[17] = w[17]
    p[18] = w[18]
    p[19] = w[19]
    p[20] = wrap(_rs((-w[20] + w[27]) * _c(16)))
    p[27] = wrap(_rs((w[20] + w[27]) * _c(16)))
    p[21] = wrap(_rs((-w[21] + w[26]) * _c(16)))
    p[26] = wrap(_rs((w[21] + w[26]) * _c(16)))
    p[22] = wrap(_rs((-w[22] + w[25]) * _c(16)))
    p[25] = wrap(_rs((w[22] + w[25]) * _c(16)))
    p[23] = wrap(_rs((-w[23] + w[24]) * _c(16)))
    p[24] = wrap(_rs((w[23] + w[24]) * _c(16)))
    p[28] = w[28]
    p[29] = w[29]
    p[30] = w[30]
    p[31] = w[31]
    # final stage
    out = [wrap(p[k] + p[31 - k]) for k in range(16)] + \
          [wrap(p[31 - k] - p[k]) for k in range(16, 32)]
    return xp.stack(out, axis=1)


_1D = {
    (0, 0): idct4, (0, 1): iadst4,
    (1, 0): idct8, (1, 1): iadst8,
    (2, 0): idct16, (2, 1): iadst16,
    (3, 0): idct32,
}
_SHIFT = [4, 5, 6, 6]


def inv_txfm2d(coeffs: np.ndarray, tx_size: int, tx_type: int,
               bd: int, xp=np, work_dtype=None) -> np.ndarray:
    """Batched 2-D inverse transform.  coeffs [N, n*n] row-major (post-scan).

    Returns residual [N, n, n] (after the final round shift), i.e. the
    value passed to clip_pixel_add in the reference.

    `xp` selects the array backend (numpy for the oracle, jax.numpy for the
    TPU path).  For bd=8 the working dtype may be int32: the int16 WRAPLOW
    points bound every product to < 2^30.
    """
    n = 4 << tx_size
    N = coeffs.shape[0]
    if work_dtype is None:
        work_dtype = np.int64
    wrap = make_wrap(bd)
    if bd == 8:
        def cast_in(x):
            return ((x + 0x8000) & 0xFFFF) - 0x8000
    else:
        def cast_in(x):
            return x
    # iadst reads inputs without the int16 cast even in the 8-bit path
    def no_cast(x):
        return x

    # ADST_DCT: column transform ADST, row transform DCT (vp9_idct.c:22-27).
    # 32x32 has no ADST variant: always 2-D DCT (vp9_idct.c vp9_idct32x32_add
    # is used for every tx type at TX_32X32).
    if tx_size == 3:
        tx_type = 0
    col_is_adst = tx_type in (1, 3)
    row_is_adst = tx_type in (2, 3)
    row_fn = _1D[(tx_size, 1 if row_is_adst else 0)]
    col_fn = _1D[(tx_size, 1 if col_is_adst else 0)]

    x = coeffs.astype(work_dtype).reshape(N, n, n)
    # row pass: each of the N*n rows
    rows = x.reshape(N * n, n)
    rows = row_fn(rows, wrap, no_cast if row_is_adst else cast_in, xp)
    inter = rows.reshape(N, n, n)
    # column pass
    cols = inter.transpose(0, 2, 1).reshape(N * n, n)
    cols = col_fn(cols, wrap, no_cast if col_is_adst else cast_in, xp)
    out = cols.reshape(N, n, n).transpose(0, 2, 1)
    shift = _SHIFT[tx_size]
    return (out + (1 << (shift - 1))) >> shift


def inv_txfm2d_select(coeffs, tx_size: int, tt, bd: int, xp=np,
                      work_dtype=None):
    """inv_txfm2d with a per-unit tx_type vector tt [N] (0..3).

    Runs one DCT and one ADST 1-D pass per dimension and selects per unit,
    so a mixed batch costs 4 one-D passes instead of four full 2-D
    transforms.  Bit-exact with inv_txfm2d for each unit.  Not valid for
    tx_size == 3 (no ADST variant; use inv_txfm2d)."""
    assert tx_size < 3
    n = 4 << tx_size
    N = coeffs.shape[0]
    if work_dtype is None:
        work_dtype = np.int64
    wrap = make_wrap(bd)
    if bd == 8:
        def cast_in(x):
            return ((x + 0x8000) & 0xFFFF) - 0x8000
    else:
        def cast_in(x):
            return x

    def no_cast(x):
        return x

    dct = _1D[(tx_size, 0)]
    adst = _1D[(tx_size, 1)]
    row_is_adst = ((tt & 2) != 0).reshape(N, 1, 1)
    col_is_adst = ((tt & 1) != 0).reshape(N, 1, 1)

    x = coeffs.astype(work_dtype).reshape(N, n, n)
    rows_in = x.reshape(N * n, n)
    r_d = dct(rows_in, wrap, cast_in, xp).reshape(N, n, n)
    r_a = adst(rows_in, wrap, no_cast, xp).reshape(N, n, n)
    inter = xp.where(row_is_adst, r_a, r_d)
    cols_in = inter.transpose(0, 2, 1).reshape(N * n, n)
    c_d = dct(cols_in, wrap, cast_in, xp).reshape(N, n, n)
    c_a = adst(cols_in, wrap, no_cast, xp).reshape(N, n, n)
    out = xp.where(col_is_adst, c_a, c_d).transpose(0, 2, 1)
    shift = _SHIFT[tx_size]
    return (out + (1 << (shift - 1))) >> shift


def inv_wht2d(coeffs: np.ndarray, bd: int, xp=np,
              work_dtype=None) -> np.ndarray:
    """Batched 4x4 inverse Walsh-Hadamard (lossless).  coeffs [N,16]."""
    wrap = make_wrap(bd)
    if work_dtype is None:
        work_dtype = np.int64
    x = coeffs.astype(work_dtype).reshape(-1, 4, 4)

    def wht1d(v):  # v: [..., 4] along last axis
        a1 = v[..., 0]
        c1 = v[..., 1]
        d1 = v[..., 2]
        b1 = v[..., 3]
        a1 = a1 + c1
        d1 = d1 - b1
        e1 = (a1 - d1) >> 1
        b1 = e1 - b1
        c1 = e1 - c1
        a1 = a1 - b1
        d1 = d1 + c1
        return xp.stack([wrap(a1), wrap(b1), wrap(c1), wrap(d1)], axis=-1)

    rows = wht1d(x >> 2)
    cols = wht1d(rows.transpose(0, 2, 1)).transpose(0, 2, 1)
    return cols  # residual, no final shift (vpx_iwht4x4_16_add_c)
