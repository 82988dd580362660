#!/usr/bin/env python3
"""Generate cuda_vp9_tpu/vp8/tables_gen.py from the reference's C sources.

Like tools/gen_tables.py for VP9: the VP8 bitstream specification
(RFC 6386) normatively fixes these constant tables — default mode and
coefficient probabilities, coding trees, scan order, quantizer lookups.
Every conformant implementation contains bit-identical values; this
script extracts the *data* (no code) mechanically and records
provenance per table.

Run: python tools/gen_vp8_tables.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_tables import find_initializer, parse_init, strip_comments  # noqa

REF = "/root/reference/libvpx"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "cuda_vp9_tpu", "vp8", "tables_gen.py")

# vp8/common/blockd.h + entropy.h enum values (tree leaves are -value)
VP8_SYMBOLS = {
    "DC_PRED": 0, "V_PRED": 1, "H_PRED": 2, "TM_PRED": 3, "B_PRED": 4,
    "NEARESTMV": 5, "NEARMV": 6, "ZEROMV": 7, "NEWMV": 8, "SPLITMV": 9,
    "B_DC_PRED": 0, "B_TM_PRED": 1, "B_VE_PRED": 2, "B_HE_PRED": 3,
    "B_LD_PRED": 4, "B_RD_PRED": 5, "B_VR_PRED": 6, "B_VL_PRED": 7,
    "B_HD_PRED": 8, "B_HU_PRED": 9,
    "LEFT4X4": 10, "ABOVE4X4": 11, "ZERO4X4": 12, "NEW4X4": 13,
    "ZERO_TOKEN": 0, "ONE_TOKEN": 1, "TWO_TOKEN": 2, "THREE_TOKEN": 3,
    "FOUR_TOKEN": 4, "DCT_VAL_CATEGORY1": 5, "DCT_VAL_CATEGORY2": 6,
    "DCT_VAL_CATEGORY3": 7, "DCT_VAL_CATEGORY4": 8, "DCT_VAL_CATEGORY5": 9,
    "DCT_VAL_CATEGORY6": 10, "DCT_EOB_TOKEN": 11,
}


def load(path):
    with open(os.path.join(REF, path), "r", errors="replace") as f:
        return strip_comments(f.read())


def resolve(s):
    return re.sub(r"\b([A-Z][A-Z0-9_]+)\b",
                  lambda m: str(VP8_SYMBOLS[m.group(1)])
                  if m.group(1) in VP8_SYMBOLS else m.group(1), s)


def grab(text, name):
    return parse_init(resolve(find_initializer(text, name)))


def main():
    emd = load("vp8/common/vp8_entropymodedata.h")
    emo = load("vp8/common/entropymode.c")
    ent = load("vp8/common/entropy.c")
    dcp = load("vp8/common/default_coef_probs.h")
    cup = load("vp8/common/coefupdateprobs.h")
    qnt = load("vp8/common/quant_common.c")

    tables = []

    def add(pyname, value, src):
        tables.append((pyname, value, src))

    add("KF_YMODE_PROB", grab(emd, "vp8_kf_ymode_prob"),
        "vp8/common/vp8_entropymodedata.h vp8_kf_ymode_prob")
    add("KF_UV_MODE_PROB", grab(emd, "vp8_kf_uv_mode_prob"),
        "vp8/common/vp8_entropymodedata.h vp8_kf_uv_mode_prob")
    add("KF_BMODE_PROB", grab(emd, "vp8_kf_bmode_prob"),
        "vp8/common/vp8_entropymodedata.h vp8_kf_bmode_prob")
    add("YMODE_PROB", grab(emd, "vp8_ymode_prob"),
        "vp8/common/vp8_entropymodedata.h vp8_ymode_prob")
    add("UV_MODE_PROB", grab(emd, "vp8_uv_mode_prob"),
        "vp8/common/vp8_entropymodedata.h vp8_uv_mode_prob")
    add("BMODE_PROB", grab(emd, "vp8_bmode_prob"),
        "vp8/common/vp8_entropymodedata.h vp8_bmode_prob")
    add("KF_YMODE_TREE", grab(emo, "vp8_kf_ymode_tree"),
        "vp8/common/entropymode.c vp8_kf_ymode_tree")
    add("YMODE_TREE", grab(emo, "vp8_ymode_tree"),
        "vp8/common/entropymode.c vp8_ymode_tree")
    add("UV_MODE_TREE", grab(emo, "vp8_uv_mode_tree"),
        "vp8/common/entropymode.c vp8_uv_mode_tree")
    add("BMODE_TREE", grab(emo, "vp8_bmode_tree"),
        "vp8/common/entropymode.c vp8_bmode_tree")
    add("COEF_TREE", grab(ent, "vp8_coef_tree"),
        "vp8/common/entropy.c vp8_coef_tree")
    add("COEF_BANDS", grab(ent, "vp8_coef_bands"),
        "vp8/common/entropy.c vp8_coef_bands")
    add("ZIGZAG", grab(ent, "vp8_default_zig_zag1d"),
        "vp8/common/entropy.c vp8_default_zig_zag1d")
    for c in range(1, 7):
        add(f"PCAT{c}", grab(ent, f"Pcat{c}"),
            f"vp8/common/entropy.c Pcat{c}")
    add("DEFAULT_COEF_PROBS", grab(dcp, "default_coef_probs"),
        "vp8/common/default_coef_probs.h default_coef_probs")
    add("COEF_UPDATE_PROBS", grab(cup, "vp8_coef_update_probs"),
        "vp8/common/coefupdateprobs.h vp8_coef_update_probs")
    add("DC_QLOOKUP", grab(qnt, "dc_qlookup"),
        "vp8/common/quant_common.c dc_qlookup")
    add("AC_QLOOKUP", grab(qnt, "ac_qlookup"),
        "vp8/common/quant_common.c ac_qlookup")

    # ---- inter-frame tables ----
    emv = load("vp8/common/entropymv.c")
    mco = load("vp8/common/modecont.c")
    fnm = load("vp8/common/findnearmv.c")
    dmv = load("vp8/decoder/decodemv.c")
    flt = load("vp8/common/filter.c")

    add("MV_UPDATE_PROBS", grab(emv, "vp8_mv_update_probs"),
        "vp8/common/entropymv.c vp8_mv_update_probs")
    add("DEFAULT_MV_CONTEXT", grab(emv, "vp8_default_mv_context"),
        "vp8/common/entropymv.c vp8_default_mv_context")
    add("SMALL_MVTREE", grab(emo, "vp8_small_mvtree"),
        "vp8/common/entropymode.c vp8_small_mvtree")
    add("MODE_CONTEXTS", grab(mco, "vp8_mode_contexts"),
        "vp8/common/modecont.c vp8_mode_contexts")
    add("MBSPLITS", grab(emo, "vp8_mbsplits"),
        "vp8/common/entropymode.c vp8_mbsplits")
    add("MBSPLIT_COUNT", grab(emo, "vp8_mbsplit_count"),
        "vp8/common/entropymode.c vp8_mbsplit_count")
    add("MBSPLIT_PROBS", grab(emo, "vp8_mbsplit_probs"),
        "vp8/common/entropymode.c vp8_mbsplit_probs")
    add("MBSPLIT_OFFSET", grab(fnm, "vp8_mbsplit_offset"),
        "vp8/common/findnearmv.c vp8_mbsplit_offset")
    add("SUB_MV_REF_PROB3", grab(dmv, "vp8_sub_mv_ref_prob3"),
        "vp8/decoder/decodemv.c vp8_sub_mv_ref_prob3")
    add("MBSPLIT_FILL_COUNT", grab(dmv, "mbsplit_fill_count"),
        "vp8/decoder/decodemv.c mbsplit_fill_count")
    add("MBSPLIT_FILL_OFFSET", grab(dmv, "mbsplit_fill_offset"),
        "vp8/decoder/decodemv.c mbsplit_fill_offset")
    add("SUBPEL_FILTERS", grab(flt, "vp8_sub_pel_filters"),
        "vp8/common/filter.c vp8_sub_pel_filters")
    add("BILINEAR_FILTERS", grab(flt, "vp8_bilinear_filters"),
        "vp8/common/filter.c vp8_bilinear_filters")

    with open(OUT, "w") as f:
        f.write('"""AUTO-GENERATED by tools/gen_vp8_tables.py '
                '— do not edit.\n\n'
                'Normative VP8 constant tables (RFC 6386).  These values '
                'are fixed by\nthe VP8 bitstream specification; every '
                'conformant implementation\ncontains identical data.  '
                'Extracted mechanically from the reference\'s\nlibvpx '
                'sources (paths noted per table).\n"""\n\n# fmt: off\n\n')
        for pyname, value, src in tables:
            f.write(f"# from {src}\n{pyname} = {value!r}\n\n")
    print(f"wrote {OUT} ({len(tables)} tables)")


if __name__ == "__main__":
    main()
