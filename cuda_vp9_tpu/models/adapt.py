"""Backward probability adaptation (end-of-frame context update).

Parity with vp9_adapt_mode_probs (vp9/common/vp9_entropymode.c:345),
vp9_adapt_mv_probs (vp9_entropymv.c), vp9_adapt_coef_probs
(vp9_entropy.c:1105) and the merge helpers in vpx_dsp/prob.h:
merge_probs / mode_mv_merge_probs / vpx_tree_merge_probs.
"""

from __future__ import annotations

import numpy as np

from . import (INTER_MODE_TREE, INTRA_MODE_TREE, MV_CLASS0_TREE,
               MV_CLASS_TREE, MV_FP_TREE, MV_JOINT_TREE, PARTITION_TREE,
               SWITCHABLE_INTERP_TREE, FrameContext, FrameCounts)

MODE_MV_COUNT_SAT = 20
MODE_MV_MAX_UPDATE_FACTOR = 128
COEF_COUNT_SAT = 24
COEF_MAX_UPDATE_FACTOR = 112
COEF_COUNT_SAT_AFTER_KEY = 24
COEF_MAX_UPDATE_FACTOR_AFTER_KEY = 128


def _get_prob(num: int, den: int) -> int:
    if den == 0:
        return 128  # caller guards; merge_probs returns pre_prob when den==0
    p = (num * 256 + (den >> 1)) // den
    return max(1, min(255, p))


def merge_probs(pre_prob: int, ct0: int, ct1: int, count_sat: int,
                max_update: int) -> int:
    den = ct0 + ct1
    if den == 0:
        return int(pre_prob)
    count = min(den, count_sat)
    factor = max_update * count // count_sat
    prob = _get_prob(ct0, den)
    # weighted_prob
    return (int(pre_prob) * (256 - factor) + prob * factor + 128) >> 8


def mode_mv_merge(pre_prob, ct0, ct1):
    return merge_probs(int(pre_prob), int(ct0), int(ct1),
                       MODE_MV_COUNT_SAT, MODE_MV_MAX_UPDATE_FACTOR)


def tree_merge_probs(tree, pre_probs, counts, probs_out):
    """vpx_tree_merge_probs (recursive branch-count accumulation)."""
    def walk(i):
        left = int(tree[i])
        lc = int(counts[-left]) if left <= 0 else walk(left)
        right = int(tree[i + 1])
        rc = int(counts[-right]) if right <= 0 else walk(right)
        probs_out[i >> 1] = mode_mv_merge(pre_probs[i >> 1], lc, rc)
        return lc + rc
    walk(0)


def adapt_mode_probs(fc: FrameContext, pre: FrameContext, counts: FrameCounts,
                     interp_filter_switchable: bool, tx_mode_select: bool):
    for i in range(4):
        fc.intra_inter[i] = mode_mv_merge(pre.intra_inter[i],
                                          counts.intra_inter[i][0],
                                          counts.intra_inter[i][1])
    for i in range(5):
        fc.comp_inter[i] = mode_mv_merge(pre.comp_inter[i],
                                         counts.comp_inter[i][0],
                                         counts.comp_inter[i][1])
        fc.comp_ref[i] = mode_mv_merge(pre.comp_ref[i],
                                       counts.comp_ref[i][0],
                                       counts.comp_ref[i][1])
        for j in range(2):
            fc.single_ref[i][j] = mode_mv_merge(pre.single_ref[i][j],
                                                counts.single_ref[i][j][0],
                                                counts.single_ref[i][j][1])
    for i in range(7):
        tree_merge_probs(INTER_MODE_TREE, pre.inter_mode[i],
                         counts.inter_mode[i], fc.inter_mode[i])
    for i in range(4):
        tree_merge_probs(INTRA_MODE_TREE, pre.y_mode[i],
                         counts.y_mode[i], fc.y_mode[i])
    for i in range(10):
        tree_merge_probs(INTRA_MODE_TREE, pre.uv_mode[i],
                         counts.uv_mode[i], fc.uv_mode[i])
    for i in range(16):
        tree_merge_probs(PARTITION_TREE, pre.partition[i],
                         counts.partition[i], fc.partition[i])
    if interp_filter_switchable:
        for i in range(4):
            tree_merge_probs(SWITCHABLE_INTERP_TREE, pre.switchable_interp[i],
                             counts.switchable_interp[i],
                             fc.switchable_interp[i])
    if tx_mode_select:
        for i in range(2):
            # tx_counts_to_branch_counts_* (vp9_entropymode.c:291-340)
            t8 = counts.tx8[i]
            fc.tx8[i][0] = mode_mv_merge(pre.tx8[i][0], t8[0], t8[1])
            t16 = counts.tx16[i]
            fc.tx16[i][0] = mode_mv_merge(pre.tx16[i][0], t16[0],
                                          t16[1] + t16[2])
            fc.tx16[i][1] = mode_mv_merge(pre.tx16[i][1], t16[1], t16[2])
            t32 = counts.tx32[i]
            fc.tx32[i][0] = mode_mv_merge(pre.tx32[i][0], t32[0],
                                          t32[1] + t32[2] + t32[3])
            fc.tx32[i][1] = mode_mv_merge(pre.tx32[i][1], t32[1],
                                          t32[2] + t32[3])
            fc.tx32[i][2] = mode_mv_merge(pre.tx32[i][2], t32[2], t32[3])
    for i in range(3):
        fc.skip[i] = mode_mv_merge(pre.skip[i], counts.skip[i][0],
                                   counts.skip[i][1])


def adapt_mv_probs(fc: FrameContext, pre: FrameContext, counts: FrameCounts,
                   allow_hp: bool):
    tree_merge_probs(MV_JOINT_TREE, pre.mv_joints, counts.mv_joints,
                     fc.mv_joints)
    for i in range(2):
        fc.mv_sign[i] = mode_mv_merge(pre.mv_sign[i], counts.mv_sign[i][0],
                                      counts.mv_sign[i][1])
        tree_merge_probs(MV_CLASS_TREE, pre.mv_classes[i],
                         counts.mv_classes[i], fc.mv_classes[i])
        tree_merge_probs(MV_CLASS0_TREE, pre.mv_class0[i],
                         counts.mv_class0[i], fc.mv_class0[i])
        for j in range(10):
            fc.mv_bits[i][j] = mode_mv_merge(pre.mv_bits[i][j],
                                             counts.mv_bits[i][j][0],
                                             counts.mv_bits[i][j][1])
    for i in range(2):
        for j in range(2):
            tree_merge_probs(MV_FP_TREE, pre.mv_class0_fp[i][j],
                             counts.mv_class0_fp[i][j], fc.mv_class0_fp[i][j])
        tree_merge_probs(MV_FP_TREE, pre.mv_fp[i], counts.mv_fp[i],
                         fc.mv_fp[i])
    if allow_hp:
        for i in range(2):
            fc.mv_class0_hp[i] = mode_mv_merge(pre.mv_class0_hp[i],
                                               counts.mv_class0_hp[i][0],
                                               counts.mv_class0_hp[i][1])
            fc.mv_hp[i] = mode_mv_merge(pre.mv_hp[i], counts.mv_hp[i][0],
                                        counts.mv_hp[i][1])


def adapt_coef_probs(fc: FrameContext, pre: FrameContext, counts: FrameCounts,
                     frame_is_intra_only: bool, last_frame_was_key: bool):
    # vp9_adapt_coef_probs (vp9_entropy.c:1084): intra frames use the KEY
    # factors (same as normal); only the frame AFTER a key frame adapts fast
    if frame_is_intra_only:
        update_factor = 112  # COEF_MAX_UPDATE_FACTOR_KEY
        count_sat = 24
    elif last_frame_was_key:
        update_factor = COEF_MAX_UPDATE_FACTOR_AFTER_KEY
        count_sat = COEF_COUNT_SAT_AFTER_KEY
    else:
        update_factor = COEF_MAX_UPDATE_FACTOR
        count_sat = COEF_COUNT_SAT
    for tx in range(4):
        c = counts.coef[tx]
        eobs = counts.eob_branch[tx]
        pp = pre.coef[tx]
        out = fc.coef[tx]
        for i in range(2):
            for j in range(2):
                for k in range(6):
                    for l in range(3 if k == 0 else 6):
                        n0 = int(c[i][j][k][l][0])
                        n1 = int(c[i][j][k][l][1])
                        n2 = int(c[i][j][k][l][2])
                        neob = int(c[i][j][k][l][3])
                        branch = ((neob, int(eobs[i][j][k][l]) - neob),
                                  (n0, n1 + n2), (n1, n2))
                        for m in range(3):
                            out[i][j][k][l][m] = merge_probs(
                                int(pp[i][j][k][l][m]), branch[m][0],
                                branch[m][1], count_sat, update_factor)
