"""ASAN subprocess worker for test_native_robustness: bitflip a packet
of a real stream, then drive parse + native pack + oracle recon — any
out-of-bounds access aborts under AddressSanitizer.  (JAX-free: ASAN's
interceptors collide with jaxlib.)"""
import sys

from cuda_vp9_tpu.containers import IvfReader
from cuda_vp9_tpu.decoder.frame import NativeVp9Decoder
from cuda_vp9_tpu.ops.ref import recon as ref_recon
from cuda_vp9_tpu.runtime import pack as packmod


def main():
    ivf, pi, pos_frac = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    with IvfReader(ivf) as r:
        pkts = [d for d, _ in r][:6]

    def tap(plan, refs):
        hdr = plan.hdr
        nparser = getattr(plan, "native_parser", None)
        if nparser is not None and not hdr.lossless:
            for tier in ("tight", "wide"):
                caps = packmod.compute_caps(hdr.mi_rows, hdr.mi_cols,
                                            tier, False)
                lay = packmod.build_layout(caps, hdr.mi_rows,
                                           hdr.mi_cols, False)
                if nparser.pack(plan, refs, caps, lay,
                                ring_slot=0) is not None:
                    break
        return ref_recon.reconstruct_frame(plan, refs)

    dec = NativeVp9Decoder(recon_fn=tap)
    for i, p in enumerate(pkts):
        if i == pi:
            pos = min(len(p) - 1, pos_frac * max(1, len(p) // 10))
            p = p[:pos] + bytes([p[pos] ^ 0x40]) + p[pos + 1:]
        try:
            dec.decode(p)
            list(dec.frames())
        except Exception:
            pass
    print("ok")


if __name__ == "__main__":
    main()
