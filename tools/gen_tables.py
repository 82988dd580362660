#!/usr/bin/env python3
"""Generate cuda_vp9_tpu/models/tables_gen.py from the reference's C sources.

The VP9 bitstream specification normatively fixes a large set of constant
tables (default probabilities, token trees, scan orders, quantizer lookups,
interpolation filter taps, block-geometry lookups).  Every conformant
implementation must contain bit-identical values; re-typing thousands of
numbers by hand only adds transcription bugs.  This script mechanically
extracts those *data tables* (no code) out of the reference's libvpx sources
and emits them as Python lists, recording provenance for each.

Run: python tools/gen_tables.py   (regenerates models/tables_gen.py)
"""

from __future__ import annotations

import os
import re
import sys

REF = "/root/reference/libvpx"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "cuda_vp9_tpu", "models", "tables_gen.py")

# Enum values (from vp9/common/vp9_enums.h and vp9/common/vp9_blockd.h)
SYMBOLS = {
    # intra/inter prediction modes
    "DC_PRED": 0, "V_PRED": 1, "H_PRED": 2, "D45_PRED": 3, "D135_PRED": 4,
    "D117_PRED": 5, "D153_PRED": 6, "D207_PRED": 7, "D63_PRED": 8,
    "TM_PRED": 9, "NEARESTMV": 10, "NEARMV": 11, "ZEROMV": 12, "NEWMV": 13,
    # partitions
    "PARTITION_NONE": 0, "PARTITION_HORZ": 1, "PARTITION_VERT": 2,
    "PARTITION_SPLIT": 3, "PARTITION_INVALID": 4,
    # block sizes
    "BLOCK_4X4": 0, "BLOCK_4X8": 1, "BLOCK_8X4": 2, "BLOCK_8X8": 3,
    "BLOCK_8X16": 4, "BLOCK_16X8": 5, "BLOCK_16X16": 6, "BLOCK_16X32": 7,
    "BLOCK_32X16": 8, "BLOCK_32X32": 9, "BLOCK_32X64": 10, "BLOCK_64X32": 11,
    "BLOCK_64X64": 12, "BLOCK_INVALID": 13,
    # tx sizes
    "TX_4X4": 0, "TX_8X8": 1, "TX_16X16": 2, "TX_32X32": 3,
    # interp filters
    "EIGHTTAP": 0, "EIGHTTAP_SMOOTH": 1, "EIGHTTAP_SHARP": 2, "BILINEAR": 3,
    # tokens
    "ZERO_TOKEN": 0, "ONE_TOKEN": 1, "TWO_TOKEN": 2, "THREE_TOKEN": 3,
    "FOUR_TOKEN": 4, "CATEGORY1_TOKEN": 5, "CATEGORY2_TOKEN": 6,
    "CATEGORY3_TOKEN": 7, "CATEGORY4_TOKEN": 8, "CATEGORY5_TOKEN": 9,
    "CATEGORY6_TOKEN": 10, "EOB_TOKEN": 11,
    # motion vector joints / classes (vp9/common/vp9_entropymv.h)
    "MV_JOINT_ZERO": 0, "MV_JOINT_HNZVZ": 1, "MV_JOINT_HZVNZ": 2,
    "MV_JOINT_HNZVNZ": 3,
    "MV_CLASS_0": 0, "MV_CLASS_1": 1, "MV_CLASS_2": 2, "MV_CLASS_3": 3,
    "MV_CLASS_4": 4, "MV_CLASS_5": 5, "MV_CLASS_6": 6, "MV_CLASS_7": 7,
    "MV_CLASS_8": 8, "MV_CLASS_9": 9, "MV_CLASS_10": 10,
}


def strip_comments(text: str) -> str:
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    text = re.sub(r"//[^\n]*", " ", text)
    return text


def load(path: str) -> str:
    with open(os.path.join(REF, path), "r", errors="replace") as f:
        return strip_comments(f.read())


def find_initializer(text: str, name: str) -> str:
    """Return the balanced {...} initializer for array/struct `name`."""
    # name may appear as `name[...]...=` or `name[..])` (DECLARE_ALIGNED)
    pat = re.compile(r"\b" + re.escape(name) + r"\s*(\[[^\]]*\]\s*)*\)?\s*=\s*\{")
    m = pat.search(text)
    if not m:
        raise KeyError(f"initializer for {name} not found")
    i = text.index("{", m.start())
    depth = 0
    for j in range(i, len(text)):
        c = text[j]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return text[i:j + 1]
    raise ValueError(f"unbalanced braces for {name}")


def resolve_tokens(s: str) -> str:
    s = re.sub(r"INTER_OFFSET\(\s*(\w+)\s*\)",
               lambda m: str(SYMBOLS[m.group(1)] - 10), s)
    s = re.sub(r"\b([A-Z][A-Z0-9_]+)\b",
               lambda m: str(SYMBOLS[m.group(1)]) if m.group(1) in SYMBOLS
               else m.group(1), s)
    return s


def parse_init(init: str):
    """Parse a C initializer {...} into nested Python lists of ints."""
    init = resolve_tokens(init)
    pos = 0

    def parse():
        nonlocal pos
        assert init[pos] == "{"
        pos += 1
        items = []
        while True:
            while pos < len(init) and init[pos] in " \t\n\r,":
                pos += 1
            if init[pos] == "}":
                pos += 1
                return items
            if init[pos] == "{":
                items.append(parse())
            else:
                m = re.match(r"-?\d+", init[pos:])
                if not m:
                    raise ValueError(f"unparsable at: {init[pos:pos+40]!r}")
                items.append(int(m.group(0)))
                pos += len(m.group(0))

    return parse()


def extract(text: str, name: str):
    return parse_init(find_initializer(text, name))


def main():
    out = {}
    prov = {}

    def grab(path, text, names, rename=None):
        for name in names:
            key = rename.get(name, name) if rename else name
            out[key] = extract(text, name)
            prov[key] = path

    em = load("vp9/common/vp9_entropymode.c")
    grab("vp9/common/vp9_entropymode.c", em, [
        "vp9_kf_y_mode_prob", "vp9_kf_uv_mode_prob", "default_if_y_probs",
        "default_if_uv_probs", "vp9_kf_partition_probs",
        "default_partition_probs", "default_inter_mode_probs",
        "vp9_intra_mode_tree", "vp9_inter_mode_tree", "vp9_partition_tree",
        "vp9_switchable_interp_tree", "default_intra_inter_p",
        "default_comp_inter_p", "default_comp_ref_p", "default_single_ref_p",
        "default_tx_probs", "default_skip_probs",
        "default_switchable_interp_prob",
    ])

    emv = load("vp9/common/vp9_entropymv.c")
    grab("vp9/common/vp9_entropymv.c", emv, [
        "vp9_mv_joint_tree", "vp9_mv_class_tree", "vp9_mv_class0_tree",
        "vp9_mv_fp_tree", "default_nmv_context",
    ])

    ent = load("vp9/common/vp9_entropy.c")
    grab("vp9/common/vp9_entropy.c", ent, [
        "vp9_cat1_prob", "vp9_cat2_prob", "vp9_cat3_prob", "vp9_cat4_prob",
        "vp9_cat5_prob", "vp9_cat6_prob", "vp9_cat6_prob_high12",
        "vp9_coefband_trans_8x8plus", "vp9_coefband_trans_4x4",
        "vp9_pareto8_full", "default_coef_probs_4x4", "default_coef_probs_8x8",
        "default_coef_probs_16x16", "default_coef_probs_32x32",
        "vp9_pt_energy_class",
    ])

    sc = load("vp9/common/vp9_scan.c")
    scan_names = []
    for sz in ("4x4", "8x8", "16x16"):
        for kind in ("default", "col", "row"):
            scan_names += [f"{kind}_scan_{sz}", f"{kind}_scan_{sz}_neighbors"]
    scan_names += ["default_scan_32x32", "default_scan_32x32_neighbors"]
    grab("vp9/common/vp9_scan.c", sc, scan_names)

    qc = load("vp9/common/vp9_quant_common.c")
    grab("vp9/common/vp9_quant_common.c", qc, [
        "dc_qlookup", "dc_qlookup_10", "dc_qlookup_12",
        "ac_qlookup", "ac_qlookup_10", "ac_qlookup_12",
    ])

    fl = load("vp9/common/vp9_filter.c")
    grab("vp9/common/vp9_filter.c", fl, [
        "bilinear_filters", "sub_pel_filters_8", "sub_pel_filters_8s",
        "sub_pel_filters_8lp", "sub_pel_filters_4",
    ])

    cd = load("vp9/common/vp9_common_data.c")
    grab("vp9/common/vp9_common_data.c", cd, [
        "b_width_log2_lookup", "b_height_log2_lookup",
        "num_4x4_blocks_wide_lookup", "num_4x4_blocks_high_lookup",
        "mi_width_log2_lookup", "num_8x8_blocks_wide_lookup",
        "num_8x8_blocks_high_lookup", "size_group_lookup",
        "num_pels_log2_lookup", "partition_lookup", "subsize_lookup",
        "max_txsize_lookup", "txsize_to_bsize", "tx_mode_to_biggest_tx_size",
        "ss_size_lookup", "uv_txsize_lookup", "partition_context_lookup",
    ])

    ds = load("vp9/decoder/vp9_dsubexp.c")
    grab("vp9/decoder/vp9_dsubexp.c", ds, ["inv_map_table"])

    mr = load("vp9/common/vp9_mvref_common.h")
    grab("vp9/common/vp9_mvref_common.h", mr,
         ["mv_ref_blocks", "idx_n_column_to_subblock"])

    with open(OUT, "w") as f:
        f.write('"""AUTO-GENERATED by tools/gen_tables.py — do not edit.\n\n')
        f.write("Normative VP9 constant tables (default probabilities, token\n"
                "trees, scan orders, quantizer lookups, interpolation filter\n"
                "taps, block-geometry lookups).  These values are fixed by the\n"
                "VP9 bitstream specification; every conformant implementation\n"
                "contains identical data.  Extracted mechanically from the\n"
                "reference's libvpx sources (paths noted per table).\n"
                '"""\n\n# fmt: off\n')
        for key in out:
            f.write(f"\n# from {prov[key]}\n{key.upper()} = {out[key]!r}\n")
        f.write("\n# fmt: on\n")
    n = sum(1 for _ in open(OUT))
    print(f"wrote {OUT}: {len(out)} tables, {n} lines")


if __name__ == "__main__":
    sys.exit(main())
